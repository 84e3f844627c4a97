package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch profiler for the prefix-filtered jaccard stages (not part of the contract). */
object ProfilePrefix {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    time("full jaccard>=0.6")(
      Dedup.jaccardPairs(docs, "doc_id", "text").filter(col("jaccard") >= 0.6).count())
    time("thresholded 0.6")(
      Dedup.jaccardPairsThresholded(docs, "doc_id", "text", minJaccard = 0.6).count())
    time("full jaccard>=0.6 (2)")(
      Dedup.jaccardPairs(docs, "doc_id", "text").filter(col("jaccard") >= 0.6).count())
    time("thresholded 0.6 (2)")(
      Dedup.jaccardPairsThresholded(docs, "doc_id", "text", minJaccard = 0.6).count())
    spark.stop()
  }
}
