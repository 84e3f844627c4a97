package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Similarity

/** Round-9 follow-up measurements after ProfileR9 showed IVF/PQ bucketing
  * cannot reach recall 1.0 on the isotropic corpus:
  *  1. PQ (m,k) grid → the operating point where ADC top-M re-rank
  *     provably returns the exact top-20.
  *  2. Sketch est-cos floor over each vector's exact top-5 pairs → the
  *     minEstCos cut for candidates-fed kNN with prediction equality.
  *  3. Sanity: ivf ∪ sketch candidates exact-verified == exact pair set.
  */
object ProfileR9b {
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

      // 1. PQ grid: rmse + ADC containment of exact top-20
      val exactTop = Similarity.topKForId(emb, "vec_id", "embedding", 0L, 20)
        .select(col("vec_id")).as[Long].collect().toSet
      for ((m, k, iters) <- Seq((32, 64, 2), (64, 256, 2))) {
        val t0 = System.nanoTime()
        val (codes, book, dim) = Similarity.pqEncode(emb, "vec_id", "embedding",
          m = m, k = k, iters = iters)
        val mx = Similarity.pqReconstructionRmse(emb, "vec_id", "embedding",
          codes, book, m, dim).agg(max("rmse")).as[Double].collect().head
        val conts = Seq(30, 60).map { mWide =>
          val adc = Similarity.pqTopK(emb, "vec_id", "embedding", codes, book,
            m, dim, queryId = 0L, kTop = mWide)
            .select(col("id")).as[Long].collect().toSet
          s"top$mWide=${(exactTop -- adc).size}miss"
        }
        println(f"pq m=$m k=$k iters=$iters: max_rmse=$mx%.4f ${conts.mkString(" ")} " +
          f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
      }

      // 2. est-cos floor over exact top-5 pairs (the kNN candidate cut)
      val bits = 512
      val sigs = emb.select(col("vec_id").as("id"),
        graft.plans.GraftExtensions.graftSimSig(spark, col("embedding"), bits, 42L).as("sig"))
      val exact = Similarity.exactCosinePairs(emb, "vec_id", "embedding", minCos = -1.0)
      val sym = exact.select(col("id_a").as("id"), col("id_b").as("nbr"), col("cos_sim"))
        .unionAll(exact.select(col("id_b").as("id"), col("id_a").as("nbr"), col("cos_sim")))
      val w = Window.partitionBy(col("id")).orderBy(col("cos_sim").desc, col("nbr"))
      val top5 = sym.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
        .select(col("id"), col("nbr"), col("cos_sim"))
      val hammingXY = (0 until bits / 64).map(wd =>
          bit_count(element_at(col("xsig"), wd + 1).bitwiseXOR(element_at(col("ysig"), wd + 1))))
        .reduce(_ + _)
      val withEst = top5
        .join(sigs.select(col("id").as("xid"), col("sig").as("xsig")), col("id") === col("xid"))
        .join(sigs.select(col("id").as("yid"), col("sig").as("ysig")), col("nbr") === col("yid"))
        .select(col("cos_sim"),
          cos(lit(math.Pi) * hammingXY.cast("double") / lit(bits.toDouble)).as("est"))
      val st = withEst.agg(min("cos_sim"), min("est")).as[(Double, Double)].collect().head
      println(f"top5 pairs: min_cos=${st._1}%.4f min_est=${st._2}%.4f")
      // candidate fraction at cuts near the floor
      val n = emb.count()
      for (cut <- Seq(st._2 - 0.02, st._2 - 0.05)) {
        val frac = Similarity.annPairs(emb, "vec_id", "embedding",
          minEstCos = cut, minCos = -1.0).count().toDouble / (n * (n - 1) / 2)
        println(f"annPairs cut=$cut%.3f candidate_frac=$frac%.3f")
      }

      // 3. ivf ∪ sketch == exact at 0.45
      val uni = Similarity.ivfPairs(emb, "vec_id", "embedding", iters = 2,
          nAssign = 2, minCos = 0.45)
        .unionByName(Similarity.annPairs(emb, "vec_id", "embedding", minCos = 0.45))
        .distinct()
      val ex45 = exact.filter(col("cos_sim") >= 0.45)
      val a = uni.count(); val b = ex45.count()
      val miss = ex45.join(uni, Seq("id_a", "id_b"), "left_anti").count()
      println(s"union==exact@0.45: union_n=$a exact_n=$b miss=$miss")
    }
    spark.stop()
  }
}
