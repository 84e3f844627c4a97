package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Materialize}

/** Scratch profiler for the prefix-filtered jaccard stages (not part of the contract). */
object ProfilePrefix {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }
  private[graft] def run(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val t = 0.8

    // staged decomposition of jaccardPairsThresholded
    (1 to 2).foreach { round =>
      val idx = time(s"r$round idx materialize")(
        Materialize.viaParquet(Dedup.shingleIndex(docs, "doc_id", "text", 3), s"pp_idx"))
      val dfreq = idx.groupBy(col("feat")).agg(count(lit(1)).as("dfreq"))
      val ordW = Window.partitionBy(col("id")).orderBy(col("dfreq"), col("feat"))
      val fullFrame = ordW.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val prefix = time(s"r$round prefix materialize")(Materialize.viaParquet(
        idx.join(dfreq, "feat")
          .withColumn("sz", count(lit(1)).over(fullFrame))
          .withColumn("rn", row_number().over(ordW))
          .filter(col("rn") <= col("sz") - ceil(lit(t) * col("sz") - lit(1e-9)) + 1)
          .select(col("id"), col("feat"), col("sz")), "pp_prefix"))
      val cands = time(s"r$round cands materialize")(Materialize.viaParquet(
        prefix.as("x").join(prefix.as("y"), Seq("feat"))
          .filter(col("x.id") < col("y.id"))
          .filter(col("y.sz") >= ceil(lit(t) * col("x.sz") - lit(1e-9)) &&
            col("y.sz") <= floor(col("x.sz") / lit(t) + lit(1e-9)))
          .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct(), "pp_cands"))
      val candIds = cands.select(col("id_a").as("id"))
        .union(cands.select(col("id_b").as("id"))).distinct()
      val docFeats = idx.join(candIds, Seq("id"), "left_semi")
        .groupBy(col("id"))
        .agg(collect_list(col("feat")).as("feats"), count(lit(1)).as("sz"))
      val out = cands
        .join(docFeats.select(col("id").as("id_a"), col("feats").as("fa"), col("sz").as("size_a")), "id_a")
        .join(docFeats.select(col("id").as("id_b"), col("feats").as("fb"), col("sz").as("size_b")), "id_b")
        .withColumn("inter", size(array_intersect(col("fa"), col("fb"))).cast("long"))
        .withColumn("jaccard",
          col("inter").cast("double") / (col("size_a") + col("size_b") - col("inter")).cast("double"))
        .filter(col("jaccard") >= t)
      time(s"r$round verify+out")(out.write.format("noop").mode("overwrite").save())
    }
    time("whole op t=0.8")(
      Dedup.jaccardPairsThresholded(docs, "doc_id", "text", minJaccard = 0.8)
        .write.format("noop").mode("overwrite").save())
    time("whole op t=0.6")(
      Dedup.jaccardPairsThresholded(docs, "doc_id", "text", minJaccard = 0.6)
        .write.format("noop").mode("overwrite").save())
    time("full jaccard>=0.6")(
      Dedup.jaccardPairs(docs, "doc_id", "text").filter(col("jaccard") >= 0.6)
        .write.format("noop").mode("overwrite").save())

    // experiment: aggregate-based prefix (hash agg + per-doc sort_array +
    // slice) instead of the two windows (count full-frame + row_number)
    (1 to 2).foreach { round =>
      val idx = Materialize.viaParquet(Dedup.shingleIndex(docs, "doc_id", "text", 3), s"pa_idx")
      val dfreq = idx.groupBy(col("feat")).agg(count(lit(1)).as("dfreq"))
      val prefLen = (c: org.apache.spark.sql.Column) =>
        (c - ceil(lit(t) * c - lit(1e-9)) + 1).cast("int")
      val prefixAgg = time(s"agg r$round prefix materialize")(Materialize.viaParquet(
        idx.join(dfreq, "feat")
          .groupBy(col("id"))
          .agg(sort_array(collect_list(struct(col("dfreq"), col("feat")))).as("fs"),
            count(lit(1)).as("sz"))
          .select(col("id"), col("sz"),
            explode(slice(col("fs"), lit(1), prefLen(col("sz")))).as("s"))
          .select(col("id"), col("s.feat").as("feat"), col("sz")), "pa_prefix"))
      val cands = time(s"agg r$round cands materialize")(Materialize.viaParquet(
        prefixAgg.as("x").join(prefixAgg.as("y"), Seq("feat"))
          .filter(col("x.id") < col("y.id"))
          .filter(col("y.sz") >= ceil(lit(t) * col("x.sz") - lit(1e-9)) &&
            col("y.sz") <= floor(col("x.sz") / lit(t) + lit(1e-9)))
          .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct(), "pa_cands"))
      val candIds = cands.select(col("id_a").as("id"))
        .union(cands.select(col("id_b").as("id"))).distinct()
      val docFeats = idx.join(candIds, Seq("id"), "left_semi")
        .groupBy(col("id"))
        .agg(collect_list(col("feat")).as("feats"), count(lit(1)).as("sz"))
      val out = cands
        .join(docFeats.select(col("id").as("id_a"), col("feats").as("fa"), col("sz").as("size_a")), "id_a")
        .join(docFeats.select(col("id").as("id_b"), col("feats").as("fb"), col("sz").as("size_b")), "id_b")
        .withColumn("inter", size(array_intersect(col("fa"), col("fb"))).cast("long"))
        .withColumn("jaccard",
          col("inter").cast("double") / (col("size_a") + col("size_b") - col("inter")).cast("double"))
        .filter(col("jaccard") >= t)
      time(s"agg r$round verify+out")(out.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
