package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Scratch measurement harness (not part of the contract): round-9
  * operating-point measurements that let the last three rows-only queries
  * become exact-verified and DuckDB-oracle-able, and the candidates-fed
  * kNN register as the scale path.
  *
  *  1. ivfPairs candidate recall vs the exact pair set at thresholds —
  *     if recall is 1.0 at T, the verified output equals the exact set.
  *  2. PQ reconstruction RMSE envelope → an in-row tolerance flag bound.
  *  3. ADC top-M containment of the exact top-20 → the re-rank width at
  *     which PQ search returns exactly the brute-force answer.
  *  4. Prediction equality of knnClassify fed by mined candidates vs the
  *     exact quadratic baseline.
  */
object ProfileR9 {
  private[graft] def run(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      println(s"===== $sf =====")

      // 1. ivfPairs recall vs exact pairs (registered config: auto k,
      // iters=2, nAssign=2), sweeping the verify threshold
      val exact = Similarity.exactCosinePairs(emb, "vec_id", "embedding", minCos = 0.25)
        .cache()
      val ivf = Similarity.ivfPairs(emb, "vec_id", "embedding",
        iters = 2, nAssign = 2, minCos = 0.25).cache()
      for (t <- Seq(0.30, 0.35, 0.40, 0.45)) {
        val ex = exact.filter(col("cos_sim") >= t)
        val n = ex.count()
        val miss = ex.join(ivf.filter(col("cos_sim") >= t), Seq("id_a", "id_b"), "left_anti").count()
        println(f"ivf_pairs cos>=$t%.2f: exact_n=$n ivf_miss=$miss")
      }
      exact.unpersist(); ivf.unpersist()

      // 2. PQ rmse envelope at the registered config
      val (codes, book, dim) = Similarity.pqEncode(emb, "vec_id", "embedding",
        m = 8, k = 16, iters = 2)
      val rmse = Similarity.pqReconstructionRmse(emb, "vec_id", "embedding",
        codes, book, m = 8, dim = dim)
      val Array(mx, av) = rmse.agg(max("rmse"), avg("rmse")).as[(Double, Double)]
        .collect().flatMap(t => Array(t._1, t._2))
      println(f"pq rmse: max=$mx%.4f avg=$av%.4f dim=$dim")
      // rms norm of the raw vectors, for a relative bound
      val nrm = emb.select(
        sqrt(aggregate(col("embedding"), lit(0.0), (a, x) => a + x * x) / lit(dim)).as("rn"))
        .agg(min("rn"), avg("rn")).as[(Double, Double)].collect().head
      println(f"vector rms-coord: min=${nrm._1}%.4f avg=${nrm._2}%.4f")

      // 3. ADC top-M containment of exact top-20 (query 0)
      val exactTop = Similarity.topKForId(emb, "vec_id", "embedding", 0L, 20)
        .select(col("vec_id")).as[Long].collect().toSet
      for (mWide <- Seq(40, 60, 100)) {
        val adc = Similarity.pqTopK(emb, "vec_id", "embedding", codes, book,
          m = 8, dim = dim, queryId = 0L, kTop = mWide)
          .select(col("id")).as[Long].collect().toSet
        println(s"adc top-$mWide contains exact top-20: ${exactTop.subsetOf(adc)} " +
          s"(missing ${(exactTop -- adc).size})")
      }

      // 4. kNN prediction equality: candidates vs exact
      val exactPred = Similarity.knnClassify(emb, "vec_id", "embedding", "label", k = 5)
        .select("id", "pred_label").cache()
      for (nA <- Seq(2, 4)) {
        val cands = Similarity.ivfPairs(emb, "vec_id", "embedding",
          iters = 2, nAssign = nA, minCos = -1.0)
        val annPred = Similarity.knnClassify(emb, "vec_id", "embedding", "label",
          k = 5, candidates = Some(cands)).select("id", "pred_label")
        val nDiff = exactPred.as("e").join(annPred.as("a"), "id")
          .filter(col("e.pred_label") =!= col("a.pred_label")).count()
        val nMissing = exactPred.join(annPred, Seq("id"), "left_anti").count()
        println(s"knn candidates nAssign=$nA: pred_diff=$nDiff missing_ids=$nMissing")
      }
      exactPred.unpersist()
    }
    spark.stop()
  }
}
