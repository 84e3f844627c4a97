package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs on sf0.001 and yields rows; the oracle map
  * stays consistent with the query map (t1-smoke analogue of the driver's
  * t2 DuckDB gate, which scripts/compare_oracle.py reproduces fully). */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry (flagship merge) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // queries that can legitimately be empty at tiny SF (candidate-pair ops)
  private val mayBeEmpty = Set("q_join_anti", "q_except")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, TestSpark.sf)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
      // storage-hygiene gate (round-2 finding: operator-internal caches
      // accreted across the session): no query may leave persisted RDDs
      // behind once it has produced its result
      val leaked = spark.sparkContext.getPersistentRDDs
      assert(leaked.isEmpty,
        s"$name leaked ${leaked.size} persisted RDDs: ${leaked.values.map(_.name).mkString(", ")}")
    }
  }
}

class StreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming windowed counts == batch equivalent on the same files") {
    val stream = graft.streaming.Streams.eventsStream(spark, TestSpark.sf)
    val agg = graft.streaming.Streams.windowedCounts(stream, "1 hour", watermark = "0 seconds")
    val q = agg.writeStream.format("memory").queryName("wc_test").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("wc_test")
      .selectExpr("sum(n) as total").collect()(0).getLong(0)
    val batch = RelationalQueries.queries("q_events_hourly")(spark, TestSpark.sf)
      .selectExpr("sum(n) as total").collect()(0).getLong(0)
    assert(streamed == batch && streamed == 1000L)
  }

  test("sliding windowed counts: streamed == batch, every event in two panes") {
    import org.apache.spark.sql.functions._
    val stream = graft.streaming.Streams.eventsStream(spark, TestSpark.sf)
    val agg = graft.streaming.Streams.windowedCounts(stream, "2 hours",
      slide = Some("1 hour"), watermark = "0 seconds")
    val q = agg.writeStream.format("memory").queryName("swc_test").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("swc_test")
    // a 2h window sliding by 1h puts every event in exactly two panes
    assert(streamed.agg(sum(col("n"))).collect()(0).getLong(0) == 2000L)
    // batch mirror: the SAME transform over the static read (watermark is
    // a no-op in batch) — streamed rows must equal it exactly
    val batch = graft.streaming.Streams.windowedCounts(
      RelationalQueries.events(spark, TestSpark.sf), "2 hours",
      slide = Some("1 hour"), watermark = "0 seconds")
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("session windows: streamed == batch (the q_stream_sessions transform)") {
    val stream = graft.streaming.Streams.eventsStream(spark, TestSpark.sf)
    val agg = graft.streaming.Streams.sessionCounts(stream)
    val q = agg.writeStream.format("memory").queryName("sc_test").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sc_test")
    val batch = graft.streaming.Streams.sessionCounts(
      RelationalQueries.events(spark, TestSpark.sf))
    assert(streamed.count() > 0)
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("dropDuplicatesWithinWatermark removes re-delivered events") {
    val stream = graft.streaming.Streams.eventsStream(spark, TestSpark.sf)
    val deduped = graft.streaming.Streams.dedupWithinWatermark(stream.union(stream), "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dd_test").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("dd_test").count() == 1000L)
  }
}

class StatefulSessionsSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("flatMapGroupsWithState sessionization over the events stream") {
    import graft.streaming.{StatefulSessions, Streams}
    val stream = Streams.eventsStream(spark, TestSpark.sf)
      .withWatermark("ts", "2 hours")
    val sessions = StatefulSessions.sessionize(StatefulSessions.asEvents(stream))
    val q = sessions.toDF().writeStream.format("memory")
      .queryName("sess_test").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("sess_test")
    assert(out.count() > 0)
    // every terminal-closed session ends with an error event, stats positive
    val bad = out.filter("n_events <= 0 OR total_value < 0").count()
    assert(bad == 0)
    assert(out.filter("closed_by = 'terminal'").count() > 0)
  }
}

/** Plan-posture guard: no accidental cartesian/BNLJ sneaks into the
  * inventory (q_cross intentionally crosses; tiny sides broadcast). */
class PlanAuditSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val redFlags = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
  private val allowed = Map(
    "q_cross" -> Seq("CartesianProduct", "BroadcastNestedLoopJoin"),
    "q_embed_topk" -> Seq("BroadcastNestedLoopJoin"),  // 1-row broadcast query side
    "q_embed_topk_multi" -> Seq("BroadcastNestedLoopJoin"), // 5-row broadcast query set
    "q_embed_ivf" -> Seq("BroadcastNestedLoopJoin"),   // 1-row broadcast query vector + k-row centroid arrays
    "q_embed_pq_topk" -> Seq("BroadcastNestedLoopJoin"), // 1-row broadcast query vector (pqAdcCheck exact side)
    "q_embed_ivf_pairs" -> Seq("BroadcastNestedLoopJoin"), // k-row broadcast centroid arrays (k ≤ 4096)
    "q_doc_logprob" -> Seq("BroadcastNestedLoopJoin"), // 1-row broadcast corpus total
    "q_tfidf" -> Seq("BroadcastNestedLoopJoin"),       // 1-row broadcast doc count
    "q_bm25" -> Seq("BroadcastNestedLoopJoin"),        // 1-row broadcast (n_docs, avgdl)
    "q_bm25_multi" -> Seq("BroadcastNestedLoopJoin"),  // same 1-row stats broadcast
    "q_hybrid_search" -> Seq("BroadcastNestedLoopJoin"), // 1-row stats + 1-row query vector
    "q_sample_temperature" -> Seq("BroadcastNestedLoopJoin"), // 1-row broadcast Z normalizer
    "q_sketch_merge" -> Seq("BroadcastNestedLoopJoin"), // two 1-row broadcasts (merged est, exact total)
    "q_sketch_freq" -> Seq("BroadcastNestedLoopJoin"),  // two 1-row broadcasts (merged CMS, exact total)
    "q_sketch_quant" -> Seq("BroadcastNestedLoopJoin"), // two 1-row broadcasts (merged GK, exact totals)
    "q_events_gapfill" -> Seq("BroadcastNestedLoopJoin"), // 1-row broadcast span onto the |series| list
    "q_token_pmi" -> Seq("BroadcastNestedLoopJoin"),   // two 1-row broadcast totals (N1, N2)
    "q_source_mix" -> Seq("BroadcastNestedLoopJoin"),  // 1-row broadcast corpus token total
    "q_compact_zorder" -> Seq("BroadcastNestedLoopJoin"), // 1-row broadcast per-key min/max bounds (withZValue)
    "q_expectations" -> Seq("BroadcastNestedLoopJoin")) // 1-row × 1-row cross join (total count × orphan count in checkReferential)
  // q_embed_pairs / q_embed_ann carry NO exemption since round 6: both
  // enumerate pairs with the block-matrix self-join (no full-table
  // broadcast) — a BNLJ reappearing there must fail this audit

  test("no unexpected cartesian products or nested-loop joins") {
    val flagged = SparkEntry.queries.flatMap { case (name, fn) =>
      val plan = fn(spark, TestSpark.sf).queryExecution.executedPlan.toString
      val hits = redFlags.filter(plan.contains).filterNot(allowed.getOrElse(name, Nil).contains)
      if (hits.nonEmpty) Some(s"$name: ${hits.mkString(",")}") else None
    }
    assert(flagged.isEmpty, flagged.mkString("; "))
  }
}

class StreamStreamJoinSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("watermarked stream-stream interval join matches the batch range join") {
    import org.apache.spark.sql.functions._
    val ev = graft.streaming.Streams.eventsStream(spark, TestSpark.sf)
    val sg = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("signup_id"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "2 hours")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val joined = sg.join(p,
      col("user_id") === col("p_user") &&
        col("p_ts") > col("s_ts") && col("p_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"))
    val q = joined.writeStream.format("memory").queryName("ssj_test").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ssj_test").count()
    val batch = RelationalQueries.queries("q_range_join")(spark, TestSpark.sf)
      .agg(sum(col("n_purchases_1h"))).collect()(0).getLong(0)
    assert(streamed == batch && streamed > 0)
  }
}

class StreamParquetSinkSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("foreachBatch parquet sink: stream drains to files identical in count to batch") {
    val base = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val stream = graft.streaming.Streams.eventsStream(spark, TestSpark.sf)
      .select("event_id", "user_id", "value")
    val q = graft.streaming.Streams.parquetSink(stream, s"$base/out", s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()
    val back = spark.read.parquet(s"$base/out")
    assert(back.count() == 1000L)
    assert(back.columns.sorted.toSeq == Seq("event_id", "user_id", "value"))
  }
}
