package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Round-11 operating-point measurements (run via `graft.Profile r11
  * [planted|clustered|imi]`):
  *  - default: IVF recall vs exact on the RAW ISOTROPIC fixture (the
  *    negative result — nAssign=8 needed, worse than quadratic here);
  *  - `planted`: near-identical copies on the isotropic fixture (the
  *    second negative result — recall collapses at sf1);
  *  - `clustered`: the registered operating point — clustered corpus,
  *    ivfPairs(k=nC, nAssign=2), recall 1.0 at every SF incl. 10×;
  *  - `imi`: two-level product quantizer vs flat IVF (recall 1.0 to
  *    sf0.1, 0.997 at sf1 — the documented epsilon).
  */
object ProfileR11 {

  /** Deterministic planted near-dup corpus: each vector gets a copy under
    * a shifted id, component-wise scaled by f_i = 1 + 0.02*((i mod 5) - 2)
    * (cos(v, f⊙v) ≈ 0.9997 for isotropic v; background pairs stay ≪ 0.9).
    * Same arithmetic is expressible in DuckDB list_transform. */
  def planted(emb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val copies = emb
      .withColumn("vec_id", col("vec_id") + lit(10000000L))
      .withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          (x.cast("double") * (lit(1.0) + lit(0.02) * ((i % 5) - lit(2)).cast("double")))
            .cast("float")))
    emb.unionByName(copies)
  }

  /** The canonical clustered corpus — ONE definition, shared with the
    * registered queries, so this measurement can't drift from what
    * Verify/Bench actually run. */
  def clustered(emb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    PipelineQueries.clusteredEmbeddings(emb)._1

  /** IMI operating point on the clustered corpus: recall of the product-
    * cell feed vs the exact cos≥0.9 pair set, wall vs flat ivfPairs. */
  def imiMain(): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = Seq(
      "sf0.001" -> "/root/testdata/sf0.001",
      "sf0.01" -> "/root/testdata/sf0.01",
      "sf0.1" -> "/root/testdata/sf0.1") ++
      (if (new java.io.File(s"${ProfileScale.Sf1Dir}/embeddings.parquet").exists())
        Seq("sf1" -> ProfileScale.Sf1Dir) else Nil)
    for ((tag, dir) <- dirs) {
      val corpus = clustered(spark.read.parquet(s"$dir/embeddings.parquet")).cache()
      val n = corpus.count()
      val nC = ((n + 19) / 20).toInt
      val exact = Similarity.exactCosinePairs(corpus, "vec_id", "embedding", minCos = 0.9)
        .select("id_a", "id_b").cache()
      val nExact = exact.count()
      for (nAssign <- Seq(1, 2, 3)) {
        val t0 = System.nanoTime()
        val imi = Similarity.imiPairs(corpus, "vec_id", "embedding",
            nAssign = nAssign, minCos = 0.9).select("id_a", "id_b")
        val found = exact.intersect(imi).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[r11i] $tag imi nAssign=$nAssign: n=$n nC=$nC exact=$nExact " +
          f"found=$found recall=${if (nExact == 0) 1.0 else found.toDouble / nExact}%.4f " +
          f"wall=$secs%.2f s")
      }
      val t0f = System.nanoTime()
      Similarity.ivfPairs(corpus, "vec_id", "embedding",
        k = nC, nAssign = 2, minCos = 0.9).select("id_a", "id_b").count()
      println(f"[r11i] $tag flat-ivf k=$nC nAssign=2 wall=${(System.nanoTime() - t0f) / 1e9}%.2f s")
      exact.unpersist(); corpus.unpersist()
    }
    spark.stop()
  }

  private[graft] def run(args: Array[String]): Unit = {
    if (args.headOption.contains("planted")) { plantedMain(); return }
    if (args.headOption.contains("clustered")) { clusteredMain(); return }
    if (args.headOption.contains("imi")) { imiMain(); return }
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val exact = Similarity.exactCosinePairs(emb, "vec_id", "embedding", minCos = 0.45)
        .select("id_a", "id_b").cache()
      val nExact = exact.count()
      for (nAssign <- Seq(2, 3, 4, 8)) {
        val ivf = Similarity.ivfPairs(emb, "vec_id", "embedding",
            nAssign = nAssign, minCos = 0.45)
          .select("id_a", "id_b")
        val found = exact.intersect(ivf).count()
        println(s"[r11] $sf dedup nAssign=$nAssign: exact=$nExact ivf_found=$found " +
          s"recall=${if (nExact == 0) 1.0 else found.toDouble / nExact}")
      }
      // kNN: exact top-5 neighbor pairs per vector must all be IVF candidates
      val all = Similarity.exactCosinePairs(emb, "vec_id", "embedding", minCos = -1.0)
      val sym = all.select(col("id_a").as("id"), col("id_b").as("nb"), col("cos_sim"))
        .unionByName(all.select(col("id_b").as("id"), col("id_a").as("nb"), col("cos_sim")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("cos_sim").desc, col("nb"))
      val top5 = sym.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select(least(col("id"), col("nb")).as("id_a"),
          greatest(col("id"), col("nb")).as("id_b")).distinct().cache()
      val nTop = top5.count()
      for (nAssign <- Seq(2, 4, 8)) {
        val ivf = Similarity.ivfPairs(emb, "vec_id", "embedding",
            nAssign = nAssign, minCos = -1.0).select("id_a", "id_b")
        val found = top5.intersect(ivf).count()
        println(s"[r11] $sf knn-top5 nAssign=$nAssign: need=$nTop ivf_found=$found " +
          s"recall=${if (nTop == 0) 1.0 else found.toDouble / nTop}")
      }
      exact.unpersist(); top5.unpersist()
    }
    spark.stop()
  }

  /** Clustered-corpus operating point: exact cos≥0.9 pairs + exact top-5
    * vs ivfPairs(k = nC) recall, plus wall at each SF. */
  def clusteredMain(): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = Seq(
      "sf0.001" -> "/root/testdata/sf0.001",
      "sf0.01" -> "/root/testdata/sf0.01",
      "sf0.1" -> "/root/testdata/sf0.1") ++
      (if (new java.io.File(s"${ProfileScale.Sf1Dir}/embeddings.parquet").exists())
        Seq("sf1" -> ProfileScale.Sf1Dir) else Nil)
    for ((tag, dir) <- dirs) {
      val corpus = clustered(spark.read.parquet(s"$dir/embeddings.parquet")).cache()
      val n = corpus.count()
      val nC = ((n + 19) / 20).toInt
      val t0e = System.nanoTime()
      val exact = Similarity.exactCosinePairs(corpus, "vec_id", "embedding", minCos = 0.9)
        .select("id_a", "id_b").cache()
      val nExact = exact.count()
      val exactWall = (System.nanoTime() - t0e) / 1e9
      for (nAssign <- Seq(1, 2)) {
        val t0 = System.nanoTime()
        val ivf = Similarity.ivfPairs(corpus, "vec_id", "embedding",
            k = nC, nAssign = nAssign, minCos = 0.9).select("id_a", "id_b")
        val found = exact.intersect(ivf).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[r11c] $tag dedup k=$nC nAssign=$nAssign: n=$n exact=$nExact " +
          f"(exact wall=$exactWall%.1f s) found=$found " +
          f"recall=${if (nExact == 0) 1.0 else found.toDouble / nExact}%.4f wall=$secs%.2f s")
      }
      // kNN top-5 containment
      val all = Similarity.exactCosinePairs(corpus, "vec_id", "embedding", minCos = -1.0)
      val sym = all.select(col("id_a").as("id"), col("id_b").as("nb"), col("cos_sim"))
        .unionByName(all.select(col("id_b").as("id"), col("id_a").as("nb"), col("cos_sim")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("cos_sim").desc, col("nb"))
      val top5 = sym.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select(least(col("id"), col("nb")).as("id_a"),
          greatest(col("id"), col("nb")).as("id_b")).distinct().cache()
      val nTop = top5.count()
      for (nAssign <- Seq(1, 2)) {
        val ivf = Similarity.ivfPairs(corpus, "vec_id", "embedding",
            k = nC, nAssign = nAssign, minCos = -1.0).select("id_a", "id_b")
        val found = top5.intersect(ivf).count()
        println(f"[r11c] $tag knn-top5 k=$nC nAssign=$nAssign: need=$nTop found=$found " +
          f"recall=${if (nTop == 0) 1.0 else found.toDouble / nTop}%.4f")
      }
      exact.unpersist(); top5.unpersist(); corpus.unpersist()
    }
    spark.stop()
  }

  /** Planted-corpus operating point: exact cos≥0.9 pairs vs ivfPairs
    * recall at low nAssign, plus wall at sf0.1 / synthesized sf1. */
  def plantedMain(): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = Seq(
      "sf0.001" -> "/root/testdata/sf0.001",
      "sf0.01" -> "/root/testdata/sf0.01",
      "sf0.1" -> "/root/testdata/sf0.1") ++
      (if (new java.io.File(s"${ProfileScale.Sf1Dir}/embeddings.parquet").exists())
        Seq("sf1" -> ProfileScale.Sf1Dir) else Nil)
    for ((tag, dir) <- dirs) {
      val corpus = planted(spark.read.parquet(s"$dir/embeddings.parquet"))
      val nVec = corpus.count() / 2
      val exact = Similarity.exactCosinePairs(corpus, "vec_id", "embedding", minCos = 0.9)
        .select("id_a", "id_b").cache()
      val nExact = exact.count()
      for (nAssign <- Seq(1, 2, 3)) {
        val t0 = System.nanoTime()
        val ivf = Similarity.ivfPairs(corpus, "vec_id", "embedding",
            nAssign = nAssign, minCos = 0.9).select("id_a", "id_b")
        val found = exact.intersect(ivf).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[r11p] $tag planted nAssign=$nAssign: n=$nVec exact=$nExact " +
          f"found=$found recall=${if (nExact == 0) 1.0 else found.toDouble / nExact}%.4f " +
          f"wall=$secs%.2f s")
      }
      exact.unpersist()
    }
    spark.stop()
  }
}
