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

/** CDC ingest: micro-batches MERGE into keyed generations; _CURRENT
  * always points at a fully-written table (write-new, point-later). */
class StreamingUpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming upsert sink merges micro-batches to latest-wins generations") {
    val base = java.nio.file.Files.createTempDirectory("graft-sus").toString
    // two update files → two micro-batches (maxFilesPerTrigger=1); the
    // version column makes the final state batch-order-independent
    (1L to 50L).map(k => (k, "a", 1L)).toDF("k", "payload", "v")
      .coalesce(1).write.parquet(s"$base/in/f0")
    (26L to 75L).map(k => (k, "b", 2L)).toDF("k", "payload", "v")
      .coalesce(1).write.parquet(s"$base/in/f1")
    val schema = spark.read.parquet(s"$base/in/f0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/in/*")
    val q = Streams.upsertSink(stream, s"$base/table", s"$base/ckpt",
      Seq("k"), "v", parts = 2)
    try q.processAllAvailable() finally q.stop()
    val cur = Streams.currentGeneration(s"$base/table")
    assert(cur.isDefined, "_CURRENT must exist after the stream drains")
    val out = spark.read.parquet(cur.get)
      .select("k", "payload", "v").as[(Long, String, Long)].collect()
    assert(out.length == 75)
    val m = out.map(r => r._1 -> ((r._2, r._3))).toMap
    assert((1L to 25L).forall(k => m(k) == ("a", 1L)), "untouched keys keep batch-0 rows")
    assert((26L to 75L).forall(k => m(k) == ("b", 2L)), "overlapping keys take the v2 update")
    // two generations on disk, pointer at the later merge
    val gens = new java.io.File(s"$base/table").listFiles().map(_.getName).filter(_.startsWith("gen"))
    assert(gens.length == 2, s"expected 2 generations, got ${gens.toSeq}")
  }
}
