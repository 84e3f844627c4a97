package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions._

object ProfileShingles {
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
    time("warmup count")(docs.count())
    // current: per-row HOF construction
    time("HOF shingles explode")(
      docs.select(col("doc_id"), explode(distinctShingles(col("text"), 3)).as("f")).count())
    time("HOF shingles explode x2")(
      docs.select(col("doc_id"), explode(distinctShingles(col("text"), 3)).as("f")).count())
    // relational: posexplode + window lead
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val rel = docs.select(col("doc_id"), posexplode(split(col("text"), " +")).as(Seq("pos", "tok")))
      .select(col("doc_id"), concat_ws(" ", col("tok"),
        lead(col("tok"), 1).over(w), lead(col("tok"), 2).over(w)).as("f"),
        lead(col("tok"), 2).over(w).as("ok"))
      .filter(col("ok").isNotNull).select(col("doc_id"), col("f")).distinct()
    time("window-lead shingles")(rel.count())
    time("window-lead shingles x2")(rel.count())
    spark.stop()
  }
}
