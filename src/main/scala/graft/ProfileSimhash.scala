package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.TextFunctions._

/** Scratch profiler: hamming distance of simhash sigs vs exact jaccard on
  * the test corpus (not part of the contract). */
object ProfileSimhash {
  private[graft] def run(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val sigs = Dedup.simHashSignatures(docs, "doc_id", "text", k = 3)
      val jp = Dedup.jaccardPairs(docs, "doc_id", "text").filter(col("jaccard") >= 0.5)
      val joined = jp
        .join(sigs.select(col("id").as("id_a"), col("sig").as("sa")), "id_a")
        .join(sigs.select(col("id").as("id_b"), col("sig").as("sb")), "id_b")
        .select(col("id_a"), col("id_b"), col("jaccard"),
          hamming64(col("sa"), col("sb")).as("hamming"))
        .orderBy(col("jaccard").desc)
      println(s"== $sf : jaccard>=0.5 pairs with simhash hamming ==")
      joined.collect().foreach(r => println(f"${r.getLong(0)}%6d ${r.getLong(1)}%6d j=${r.getDouble(2)}%.3f h=${r.getInt(3)}%d"))
    }
    spark.stop()
  }
}
