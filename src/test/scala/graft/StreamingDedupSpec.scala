package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ingest dedup == batch exact dedup on a doubled corpus: the
  * streamed survivor count equals the number of distinct texts, and no
  * content hash survives twice. */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming content dedup drains to the batch exact-dedup result") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .select("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft-sdd").toString
    // simulate a crawl re-delivering the corpus: originals + shifted ids
    docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 100000L))
      .write.parquet(s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$base/in")
      // event time derived so a doc and its redelivery share a timestamp
      // inside the horizon
      .withColumn("ts", timestamp_micros(lit(1700000000000000L) + pmod(col("doc_id"), lit(100000L)) * 1000L))
    val q = Streams.runToMemory(
      Streams.contentDedupStream(stream, "ts", "text", watermark = "1 hour"), "sdd")
    try {
      val got = spark.table("sdd")
      assert(got.count() == docs.select("text").distinct().count())
      // no text survives twice
      assert(got.groupBy(sha2(col("text"), 256)).count().filter(col("count") > 1).count() == 0)
    } finally q.stop()
  }
}
