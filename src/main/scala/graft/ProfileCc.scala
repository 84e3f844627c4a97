package graft

import org.apache.spark.sql.functions._

/** One-off profiler for the connected-components loop feeding
  * q_dedup_clusters: phase timings on sf0.1 to locate where its bench
  * seconds go (upstream Jaccard pairs vs CC rounds vs materialize), and
  * inline-index vs spilled-index pair generation. */
object ProfileCc {
  private[graft] def run(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[cc] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // warm the corpus
    docs.count()
    for (it <- 1 to 2) {
      t(s"it$it inline: pairs+cc") {
        val pairs = graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text")
          .filter(col("jaccard") >= 0.6)
        val out = graft.operators.Dedup.clusterPairs(pairs)
        System.err.println(s"[cc] labels=${out.count()}")
      }
      t(s"it$it spilled: pairs+cc") {
        val idx = t(s"it$it   spill idx") {
          graft.operators.Materialize.viaParquet(
            graft.operators.Dedup.featureIndex(docs, "doc_id", "text", 3, 10000),
            "cc_idx")
        }
        val pairs = graft.operators.Dedup.jaccardPairsFromIndex(idx)
          .filter(col("jaccard") >= 0.6)
        val out = graft.operators.Dedup.clusterPairs(pairs)
        System.err.println(s"[cc] labels=${out.count()}")
      }
    }
    spark.stop()
  }
}
