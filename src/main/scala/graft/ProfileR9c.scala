package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Component timing for the round-9 q_embed_ivf_pairs union (9.8 s at
  * sf0.1 vs 3.4 s for the old IVF-only form): which stage pays. */
object ProfileR9c {
  private[graft] def run(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[r9c] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    emb.count()
    // twice each: first run takes codegen/JIT warmup
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      time("ivfPairs(0.45)") {
        Similarity.ivfPairs(emb, "vec_id", "embedding", iters = 2, nAssign = 2,
          minCos = 0.45).write.format("noop").mode("overwrite").save()
      }
      time("annPairs(0.45)") {
        Similarity.annPairs(emb, "vec_id", "embedding", minCos = 0.45)
          .write.format("noop").mode("overwrite").save()
      }
      time("union+distinct+sort") {
        Similarity.ivfPairs(emb, "vec_id", "embedding", iters = 2, nAssign = 2,
            minCos = 0.45)
          .unionByName(Similarity.annPairs(emb, "vec_id", "embedding", minCos = 0.45))
          .distinct()
          .orderBy(col("cos_sim").desc, col("id_a"), col("id_b"))
          .write.format("noop").mode("overwrite").save()
      }
      time("ivfIndex only") {
        val (a, c) = Similarity.ivfIndex(emb, "vec_id", "embedding", k = 40, iters = 2)
        a.count(); c.count()
      }
    }
    spark.stop()
  }
}
