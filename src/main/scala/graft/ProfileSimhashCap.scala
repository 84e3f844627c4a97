package graft
import org.apache.spark.sql.SparkSession
import graft.operators.Dedup
object ProfileSimhashCap {
  private[graft] def run(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf1 = spark.read.parquet("/tmp/graft_sf1/documents.parquet")
    for (cap <- Seq(500, 1000, 2000, Int.MaxValue)) {
      val t0 = System.nanoTime()
      val n = Dedup.simHashPairs(sf1, "doc_id", "text", hotBucketCap = cap).count()
      println(f"[cap] cap=$cap%-11d pairs=$n ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
