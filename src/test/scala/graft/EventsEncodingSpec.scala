package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/**
 * Fixture-drift guard (round 11): the driver regenerates /root/testdata
 * between rounds and has already switched `events.ts` from parquet
 * TIMESTAMP(NANOS) to TIMESTAMP(MICROS) once, which killed 23 of 117
 * queries while the reader hard-coded the nanos path. This spec writes
 * events-shaped data in every encoding `RelationalQueries.normalizeEventsTs`
 * supports and asserts the shared reader yields IDENTICAL µs-truncated rows
 * for each, so the next regeneration cannot silently halve the battery.
 *
 * The int64 file is a faithful proxy for a real TIMESTAMP(NANOS) column:
 * under `spark.sql.legacy.parquet.nanosAsLong` (which Spark 4 requires to
 * load nanos at all) such a column arrives as exactly this LongType shape.
 */
class EventsEncodingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // µs instants with sub-ms components; the nanos variant adds sub-µs
  // residue that must truncate away, not round.
  private val rowsUs = Seq(
    (1L, 1700000000123456L, 7L, "signup", 1.5, """{"k":1}"""),
    (2L, 1700000086654321L, 8L, "error", 2.0, """{"k":2}"""),
    (3L, 1700003600999999L, 7L, "purchase", 3.25, """{"k":3}"""))

  private def writeVariant(dir: String, tsCol: org.apache.spark.sql.Column): Unit =
    rowsUs.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select($"event_id", tsCol.as("ts"), $"user_id", $"event_type", $"value", $"props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def readUs(dir: String): Seq[(Long, Long)] = {
    val df = RelationalQueries.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType,
      s"reader must always emit session-TZ TIMESTAMP, got ${df.schema("ts").dataType}")
    df.select($"event_id", unix_micros($"ts")).orderBy($"event_id")
      .as[(Long, Long)].collect().toSeq
  }

  test("events reader yields identical µs rows for int64-nanos, TIMESTAMP_NTZ and TIMESTAMP encodings") {
    val tmp = java.nio.file.Files.createTempDirectory("events-enc").toString
    // epoch-nanos as raw int64 (+789 ns sub-µs residue per row)
    writeVariant(s"$tmp/nanos", ($"us" * 1000L + 789L))
    // TIMESTAMP_NTZ µs — what pyarrow writes by default (the Aug-13 fixtures)
    writeVariant(s"$tmp/ntz", timestamp_micros($"us").cast("timestamp_ntz"))
    // tz-aware TIMESTAMP µs
    writeVariant(s"$tmp/tsz", timestamp_micros($"us"))

    val expected = rowsUs.map { case (id, us, _, _, _, _) => (id, us) }
    assert(readUs(s"$tmp/nanos") == expected, "int64-nanos path drifted")
    assert(readUs(s"$tmp/ntz") == expected, "TIMESTAMP_NTZ path drifted")
    assert(readUs(s"$tmp/tsz") == expected, "TIMESTAMP path drifted")
  }

  test("events reader rejects an unsupported ts encoding loudly, not silently") {
    val tmp = java.nio.file.Files.createTempDirectory("events-enc-bad").toString
    writeVariant(tmp, $"us".cast("string"))
    val e = intercept[IllegalArgumentException](RelationalQueries.events(spark, tmp))
    assert(e.getMessage.contains("unsupported"))
  }

  test("streaming events source goes through the same normalization (NTZ fixture)") {
    val tmp = java.nio.file.Files.createTempDirectory("events-enc-stream").toString
    writeVariant(tmp, timestamp_micros($"us").cast("timestamp_ntz"))
    val st = graft.streaming.Streams.eventsStream(spark, tmp)
    assert(st.isStreaming)
    assert(st.schema("ts").dataType == TimestampType)
  }
}
