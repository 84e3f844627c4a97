package graft
import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** Scratch profiler for dedup pipelines at sf0.1 (not part of the contract). */
object ProfileDedup {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    System.err.println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
  }
  private[graft] def run(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    time("minhash pairs")(Dedup.minHashPairs(docs, "doc_id", "text").count())
    time("simhash pairs")(Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 40).count())
    time("jaccard pairs")(Dedup.jaccardPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
