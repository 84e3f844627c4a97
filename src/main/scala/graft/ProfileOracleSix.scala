package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Scratch measurement harness (not part of the contract): picks the
  * exact-verification thresholds at which the hash-based ops have measured
  * recall 1.0 on the test corpora, so their outputs become deterministic
  * and DuckDB-oracle-able. */
object ProfileOracleSix {
  private[graft] def run(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")  // events.ts is TIMESTAMP(NANOS)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      println(s"===== $sf =====")

      // exact pairs at thresholds
      val exact = Dedup.jaccardPairs(docs, "doc_id", "text")
        .select("id_a", "id_b", "jaccard").cache()
      for (t <- Seq(0.7, 0.8, 0.9)) {
        val ex = exact.filter(col("jaccard") >= t)
        val n = ex.count()
        // minhash candidate recall
        val mh = Dedup.minHashPairs(docs, "doc_id", "text").select("id_a", "id_b")
        val missMh = ex.join(mh, Seq("id_a", "id_b"), "left_anti").count()
        // simhash candidate recall
        val sh = Dedup.simHashPairs(docs, "doc_id", "text").select("id_a", "id_b")
        val missSh = ex.join(sh, Seq("id_a", "id_b"), "left_anti").count()
        println(f"jaccard>=$t%.1f: n=$n minhash_miss=$missMh simhash_miss=$missSh")
      }
      // simhash hamming distribution of strong pairs
      val sigs = Dedup.simHashSignatures(docs, "doc_id", "text", 3)
      val withH = exact.filter(col("jaccard") >= 0.85)
        .join(sigs.select(col("id").as("id_a"), col("sig").as("sa")), "id_a")
        .join(sigs.select(col("id").as("id_b"), col("sig").as("sb")), "id_b")
        .select(col("jaccard"), graft.functions.TextFunctions.hamming64(col("sa"), col("sb")).as("h"))
      println("strong-pair hamming: " + withH.agg(max("h"), avg("h")).collect().mkString)
      exact.unpersist()

      // ANN: true-cos of pairs the sketch filter would drop, at the
      // REGISTERED operating point (512-bit sketch, est-cos cut 0.25 —
      // round 5's measured config, round 6's registered one)
      val bits = 512
      val sigsE = emb.select(col("vec_id").as("id"),
        graft.plans.GraftExtensions.graftSimSig(spark, col("embedding"), bits, 42L).as("sig"))
      val hamming = (0 until bits / 64).map(w =>
          bit_count(element_at(col("x.sig"), w + 1).bitwiseXOR(element_at(col("y.sig"), w + 1))))
        .reduce(_ + _)
      val estAll = sigsE.as("x").join(sigsE.as("y"), col("x.id") < col("y.id"))
        .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
          cos(lit(math.Pi) * hamming.cast("double") / lit(bits.toDouble)).as("est_cos"))
      val vecs = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      val trueCos = estAll
        .join(vecs.select(col("id").as("id_a"), col("v").as("va")), "id_a")
        .join(vecs.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
        .select(col("id_a"), col("id_b"), col("est_cos"),
          graft.plans.GraftExtensions.graftCosine(spark, col("va"), col("vb")).as("tc")).cache()
      for (t <- Seq(0.3, 0.35, 0.4, 0.45)) {
        val above = trueCos.filter(col("tc") >= t)
        val n = above.count()
        val dropped = above.filter(col("est_cos") < 0.25).count()
        val minEst = above.agg(min("est_cos")).as[Double].collect().headOption.getOrElse(Double.NaN)
        println(f"cos>=$t%.2f: n=$n dropped_by_sketch=$dropped min_est=$minEst%.4f")
      }
      trueCos.unpersist()

      // IVF full probe vs brute force top-20
      val (assign, cents) = Similarity.ivfIndex(emb, "vec_id", "embedding", k = 16, iters = 2)
      val full = Similarity.ivfTopK(emb, "vec_id", "embedding", assign, cents,
        queryId = 0L, kTop = 20, nProbe = 16).select("vec_id", "cos_sim")
      val brute = Similarity.topKForId(emb, "vec_id", "embedding", 0L, 20).select("vec_id", "cos_sim")
      println("ivf_fullprobe==brute: " +
        (full.exceptAll(brute).count() == 0 && brute.exceptAll(full).count() == 0))

      // sketch error bounds
      val ev = spark.read.parquet(s"$dir/events.parquet")
      val ad = ev.groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("a"), countDistinct(col("user_id")).as("e"))
        .select(max(abs(col("a") - col("e")) / col("e")).as("maxrel")).as[Double].collect().head
      println(f"approx_distinct max rel err = $ad%.4f")
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val aq = li.groupBy("l_returnflag")
        .agg(expr("approx_percentile(l_extendedprice, array(0.5,0.95,0.99), 1000)").as("ap"),
          expr("percentile(l_extendedprice, array(0.5,0.95,0.99))").as("ep"))
        .select(explode(arrays_zip(col("ap"), col("ep"))).as("z"))
        .select((abs(col("z.ap") - col("z.ep")) / col("z.ep")).as("rel"))
        .agg(max("rel")).as[Double].collect().head
      println(f"approx_quantile max rel err = $aq%.4f")
    }
    spark.stop()
  }
}
