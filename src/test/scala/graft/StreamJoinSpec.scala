package graft

import graft.streaming.Streams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join == the identical batch transform: every
  * attributed (view, purchase) pair the batch range join finds is emitted
  * by the watermarked streaming join, exactly once. The oracle gate for
  * the same transform is `q_stream_join`; this spec pins the
  * readStream==batch equality leg (and that the join runs as a genuine
  * stream-stream join, i.e. both sides unbounded). */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def shape(ev: DataFrame): (DataFrame, DataFrame) = {
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value"))
    (views, purchases)
  }

  test("watermarked stream-stream interval join equals the batch range join") {
    val (bv, bp) = shape(RelationalQueries.rd(spark, TestSpark.sf, "events"))
    val expected = Streams.attributionJoin(bv, bp).collect().toSet
    assert(expected.nonEmpty, "fixture should produce at least one attributed pair")

    // two independent file-source streams — a genuine two-stream join
    val (sv, _) = shape(Streams.eventsStream(spark, TestSpark.sf))
    val (_, sp) = shape(Streams.eventsStream(spark, TestSpark.sf))
    val q = Streams.runToMemory(Streams.attributionJoin(sv, sp), "sjoin")
    try {
      val got = spark.table("sjoin").collect().toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("left-outer streaming join: matches exact, null rows watermark-bounded") {
    // outer null-rows are only emitted once the watermark PROVES no match
    // can still arrive, so at end-of-stream the streamed outer result is:
    // all inner matches (exactly), plus a subset of the batch null rows —
    // every streamed null row must appear in the batch result, and every
    // batch null row old enough for the final watermark must be streamed.
    val (bv, bp) = shape(RelationalQueries.rd(spark, TestSpark.sf, "events"))
    val batchOuter = Streams.attributionJoin(bv, bp, joinType = "left_outer")
      .collect().toSet
    val batchInner = Streams.attributionJoin(bv, bp).collect().toSet
    assert(batchOuter.size > batchInner.size, "fixture should have unattributed views")

    val (sv, _) = shape(Streams.eventsStream(spark, TestSpark.sf))
    val (_, sp) = shape(Streams.eventsStream(spark, TestSpark.sf))
    val q = Streams.runToMemory(
      Streams.attributionJoin(sv, sp, joinType = "left_outer"), "sjoin_outer")
    try {
      val got = spark.table("sjoin_outer").collect().toSet
      assert(got.filter(_.get(2) != null) == batchInner,
        "matched rows must equal the batch inner join exactly")
      assert(got.subsetOf(batchOuter),
        "every streamed row (incl. nulls) must appear in the batch outer join")
    } finally q.stop()
  }
}
