package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxTable

/**
 * Round-19 streaming READ surface: `spark.readStream.format("txtable")`
 * tails the transactional table's change feed as a real Structured
 * Streaming source — offsets are commit ids, the stream's checkpoint is
 * the cursor, restart resumes exactly after the last committed batch.
 *
 * Gates:
 *  - default start = snapshot bootstrap (i-rows at the tip), then
 *    deltas — uniform on folded and unfolded tables;
 *  - startingCursor=-1 = the full historical feed, byte-equal to
 *    `TxTable.changeFeed`; loud (never a changelog with holes) once
 *    history was folded;
 *  - startingCursor=latest skips history;
 *  - a checkpointed RESTART emits only commits after the stored offset
 *    (nothing twice, nothing skipped), across table mutations made
 *    while the stream was down;
 *  - consumerName registers a retention cursor after every batch, so a
 *    lagging stream survives checkpoint+expire maintenance.
 */
class TxFeedSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def tmp(): String = Files.createTempDirectory("graft-txsrc").toString

  private def rows(n: Int, v: Long, tag: String = "x") = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"$tag$i", v)).toDF("id", "s", "version")
  }

  /** Drain every available commit once (AvailableNow), appending the
    * feed to `outDir` parquet with `checkpoint` as the stream's state. */
  private def drain(root: String, outDir: String, checkpoint: String,
      options: Map[String, String] = Map.empty): Unit = {
    var reader = spark.readStream.format("txtable").option("keys", "id")
    options.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load(root).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def feedSet(df: DataFrame): Set[(Long, String, String, Long, Long)] =
    df.select("id", "op", "s", "version", "commit").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet

  test("snapshot bootstrap then deltas; checkpointed restart emits only new commits") {
    val dir = tmp()
    val t = s"$dir/t"
    val out = s"$dir/out"
    val cp = s"$dir/cp"
    TxTable.create(spark, t, rows(40, 0L))                       // commit 0
    TxTable.upsert(spark, t,                                      // commit 1
      rows(40, 1L, "y").filter(col("id") % 4 === 0),
      Seq("id"), "version")

    drain(t, out, cp)
    val first = spark.read.parquet(out)
    // bootstrap = the live snapshot as i-rows stamped with the tip
    assert(feedSet(first) === feedSet(
      TxTable.read(spark, t).select(col("id"), lit("i").as("op"),
        col("s"), col("version"), lit(1L).as("commit"))))

    // mutate while the stream is DOWN: an update batch and a tombstone
    TxTable.upsert(spark, t,                                      // commit 2
      rows(40, 2L, "z").filter(col("id") % 10 === 0), Seq("id"), "version")
    TxTable.upsert(spark, t,                                      // commit 3
      rows(40, 3L).filter(col("id") % 7 === 3)
        .withColumn("op", lit("d")),
      Seq("id"), "version", opCol = Some("op"))

    drain(t, out, cp)
    val all = spark.read.parquet(out)
    // restart emitted EXACTLY commits 2..3 — the real feed, nothing twice
    assert(feedSet(all.filter(col("commit") >= 2L)) ===
      feedSet(TxTable.changeFeed(spark, t, Seq("id"), fromCommit = 2L)))
    assert(all.filter(col("commit") >= 2L && col("op") === "d").count() ===
      (0 until 40).count(_ % 7 == 3).toLong)
    // and the bootstrap rows were not re-emitted
    assert(all.count() === first.count() +
      TxTable.changeFeed(spark, t, Seq("id"), fromCommit = 2L).count())

    // a drained re-poll lands nothing
    drain(t, out, cp)
    assert(spark.read.parquet(out).count() === all.count())
  }

  test("startingCursor=-1 streams the full historical feed; latest skips history") {
    val dir = tmp()
    val t = s"$dir/t"
    TxTable.create(spark, t, rows(30, 0L))
    TxTable.upsert(spark, t, rows(30, 1L, "y").filter(col("id") < 10),
      Seq("id"), "version")

    drain(t, s"$dir/hist", s"$dir/histcp", Map("startingCursor" -> "-1"))
    assert(feedSet(spark.read.parquet(s"$dir/hist")) ===
      feedSet(TxTable.changeFeed(spark, t, Seq("id"))),
      "full-history stream == the batch change feed")

    drain(t, s"$dir/late", s"$dir/latecp", Map("startingCursor" -> "latest"))
    assert(!Fs.exists(s"$dir/late") ||
      spark.read.parquet(s"$dir/late").isEmpty,
      "latest start emits nothing historical")
    TxTable.upsert(spark, t, rows(30, 2L, "z").filter(col("id") === 5L),
      Seq("id"), "version")
    drain(t, s"$dir/late", s"$dir/latecp", Map("startingCursor" -> "latest"))
    val late = spark.read.parquet(s"$dir/late")
    assert(feedSet(late) ===
      feedSet(TxTable.changeFeed(spark, t, Seq("id"), fromCommit = 2L)),
      "after latest start, only post-start commits flow")
  }

  test("folded history: full-history start fails loudly, default start bootstraps") {
    val dir = tmp()
    val t = s"$dir/t"
    TxTable.create(spark, t, rows(20, 0L))
    TxTable.upsert(spark, t, rows(20, 1L, "y").filter(col("id") % 2 === 0),
      Seq("id"), "version")
    TxTable.checkpoint(spark, t)
    TxTable.expire(spark, t)

    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(t, s"$dir/out1", s"$dir/cp1", Map("startingCursor" -> "-1"))
    }
    def messages(e: Throwable): Seq[String] =
      if (e == null) Seq.empty
      else Option(e.getMessage).toSeq ++ messages(e.getCause)
    assert(messages(ex).exists(_.contains("feed-invisible")),
      s"unexpected failure: ${messages(ex).mkString(" | ")}")

    drain(t, s"$dir/out2", s"$dir/cp2")
    assert(feedSet(spark.read.parquet(s"$dir/out2")).map(r => (r._1, r._3, r._4)) ===
      feedSet(TxTable.read(spark, t).select(col("id"), lit("i").as("op"),
        col("s"), col("version"), lit(0L).as("commit")))
        .map(r => (r._1, r._3, r._4)),
      "default start bootstraps the folded table's snapshot")
  }

  test("withPreimage emits up rows; consumerName registers a retention cursor") {
    val dir = tmp()
    val t = s"$dir/t"
    TxTable.create(spark, t, rows(20, 0L))
    TxTable.upsert(spark, t, rows(20, 1L, "y").filter(col("id") < 5),
      Seq("id"), "version")

    drain(t, s"$dir/out", s"$dir/cp",
      Map("startingCursor" -> "-1", "withPreimage" -> "true",
        "consumerName" -> "specstream"))
    val got = spark.read.parquet(s"$dir/out")
    assert(feedSet(got) === feedSet(TxTable.changeFeed(spark, t, Seq("id"),
      withPreimage = true)), "preimage stream == the batch preimage feed")
    assert(got.filter(col("op") === "up").count() === 5L)

    // the stream registered its applied position → expire keeps nothing
    // it hasn't read; the floor is the first commit it has NOT applied
    assert(TxTable.registeredCursors(t).toMap.get("specstream") === Some(1L))
    assert(TxTable.cursorFloor(t) === Some(2L))

    // lag the stream: two more commits + maintenance — the registered
    // cursor holds those commits for the next drain
    TxTable.upsert(spark, t, rows(20, 2L, "z").filter(col("id") === 7L),
      Seq("id"), "version")
    TxTable.checkpoint(spark, t)
    TxTable.expire(spark, t)
    drain(t, s"$dir/out", s"$dir/cp",
      Map("startingCursor" -> "-1", "withPreimage" -> "true",
        "consumerName" -> "specstream"))
    val afterLag = spark.read.parquet(s"$dir/out")
    assert(afterLag.filter(col("commit") === 2L).count() === 2L,
      "the lagged commit (u + up) survived maintenance and was streamed")
    TxTable.unregisterCursor(t, "specstream")
  }

  test("maxCommitsPerTrigger bounds each batch; the drain still reaches the tip") {
    val dir = tmp()
    val t = s"$dir/t"
    TxTable.create(spark, t, rows(20, 0L))                    // commit 0
    (1L to 4L).foreach { v =>                                  // commits 1-4
      TxTable.upsert(spark, t,
        rows(20, v, s"v$v").filter(col("id") % 5 === v % 5), Seq("id"), "version")
    }
    val q = spark.readStream.format("txtable")
      .option("keys", "id").option("startingCursor", "-1")
      .option("maxCommitsPerTrigger", "2")
      .load(t)
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/cp")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(feedSet(spark.read.parquet(s"$dir/out")) ===
      feedSet(TxTable.changeFeed(spark, t, Seq("id"))),
      "capped drain == the full feed")
    // 5 commits / cap 2 → at least 3 data batches instead of one mega-batch
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches >= 3, s"expected >=3 capped batches, got $dataBatches")
  }

  test("lagged unregistered stream fails loudly on restart after maintenance folded its range") {
    val dir = tmp()
    val t = s"$dir/t"
    TxTable.create(spark, t, rows(20, 0L))                      // commit 0
    TxTable.upsert(spark, t, rows(20, 1L, "y").filter(col("id") < 5),
      Seq("id"), "version")                                     // commit 1
    // drain to offset 1 WITHOUT consumerName (no retention floor)
    drain(t, s"$dir/out", s"$dir/cp", Map("startingCursor" -> "-1"))
    // the stream lags; maintenance folds commits 0..3 away
    TxTable.upsert(spark, t, rows(20, 2L, "z").filter(col("id") === 9L),
      Seq("id"), "version")                                     // commit 2
    TxTable.checkpoint(spark, t)                                // commit 3
    TxTable.expire(spark, t)
    assert(TxTable.committedIds(t).min === 3L, "history folded")
    // restart: offset 1 predates retained history — LOUD, never a
    // changelog with silent holes
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(t, s"$dir/out", s"$dir/cp", Map("startingCursor" -> "-1"))
    }
    def messages(e: Throwable): Seq[String] =
      if (e == null) Seq.empty
      else Option(e.getMessage).toSeq ++ messages(e.getCause)
    assert(messages(ex).exists(_.contains("predates the retained history")),
      s"unexpected: ${messages(ex).mkString(" | ")}")
  }

  test("batch feed read on a folded table: default fromCommit fails loudly") {
    val dir = tmp()
    val t = s"$dir/t"
    TxTable.create(spark, t, rows(10, 0L))
    TxTable.upsert(spark, t, rows(10, 1L, "y"), Seq("id"), "version")
    TxTable.checkpoint(spark, t)
    TxTable.expire(spark, t)
    val oldest = TxTable.committedIds(t).min
    val ex = intercept[Exception] {
      spark.read.format("txtable").option("feed", "true")
        .option("keys", "id").load(t).collect()
    }
    def messages(e: Throwable): Seq[String] =
      if (e == null) Seq.empty
      else Option(e.getMessage).toSeq ++ messages(e.getCause)
    assert(messages(ex).exists(_.contains("predates the retained history")),
      s"unexpected: ${messages(ex).mkString(" | ")}")
    // an in-range fromCommit still reads
    val ok = spark.read.format("txtable").option("feed", "true")
      .option("keys", "id").option("fromCommit", oldest.toString).load(t)
    assert(feedSet(ok) === feedSet(
      TxTable.changeFeed(spark, t, Seq("id"), fromCommit = oldest)))
  }

  test("batch feed read: option(feed) == TxTable.changeFeed, bounded and preimaged") {
    val dir = tmp()
    val t = s"$dir/t"
    TxTable.create(spark, t, rows(25, 0L))
    TxTable.upsert(spark, t, rows(25, 1L, "y").filter(col("id") % 5 === 0),
      Seq("id"), "version")
    TxTable.upsert(spark, t,
      rows(25, 2L).filter(col("id") % 6 === 1).withColumn("op", lit("d")),
      Seq("id"), "version", opCol = Some("op"))

    val full = spark.read.format("txtable")
      .option("feed", "true").option("keys", "id").load(t)
    assert(feedSet(full) === feedSet(TxTable.changeFeed(spark, t, Seq("id"))),
      "batch feed read == the library change feed")

    val bounded = spark.read.format("txtable")
      .option("feed", "true").option("keys", "id")
      .option("fromCommit", "2").option("withPreimage", "true").load(t)
    assert(feedSet(bounded) === feedSet(TxTable.changeFeed(spark, t,
      Seq("id"), fromCommit = 2L, withPreimage = true)),
      "fromCommit bound + preimages route through")

    // feed relations are SQL-usable like any DataFrame
    bounded.createOrReplaceTempView("feed_v")
    assert(spark.sql("SELECT count(*) FROM feed_v WHERE op = 'd'")
      .head().getLong(0) === (0 until 25).count(_ % 6 == 1).toLong)

    val ex = intercept[IllegalArgumentException] {
      spark.read.format("txtable").option("feed", "true").load(t)
    }
    assert(ex.getMessage.contains("key columns"))
  }

  test("schema evolution: a mid-stream evolved commit's new column is " +
      "absent until restart, present after (round 20)") {
    import spark.implicits._
    val dir = tmp()
    val t = s"$dir/t"
    val out = s"$dir/out"   // ONE sink dir: the FileSink's metadata log
    val cp = s"$dir/cp"     // tracks the checkpoint's batch ids
    TxTable.create(spark, t, rows(10, 0L))                        // commit 0
    // the stream's schema is FIXED when the streaming relation is
    // DEFINED — this is the drop-until-restart contract under test
    // (TxFeedSource class doc): pin it so a future refactor cannot
    // silently start leaking half-schema'd batches
    val stream1 = spark.readStream.format("txtable")
      .option("keys", "id").load(t)
    assert(!stream1.schema.fieldNames.contains("extra"))
    // an EVOLVED commit lands before the run drains it
    TxTable.upsert(spark, t,                                      // commit 1
      Seq((100L, "n", 1L, "EXTRA")).toDF("id", "s", "version", "extra"),
      Seq("id"), "version")
    val q1 = stream1.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination()
    val got1 = spark.read.parquet(out)
    assert(!got1.columns.contains("extra"),
      "a column added after stream definition must be DROPPED until restart")
    assert(got1.filter(col("id") === 100L).count() === 1L,
      "the evolved commit's ROWS still flow — only the new column is absent")
    // RESTART from the same checkpoint: the new column is now part of
    // the stream schema and carries values for post-restart commits
    TxTable.upsert(spark, t,                                      // commit 2
      Seq((101L, "m", 2L, "AFTER")).toDF("id", "s", "version", "extra"),
      Seq("id"), "version")
    val stream2 = spark.readStream.format("txtable")
      .option("keys", "id").load(t)
    assert(stream2.schema.fieldNames.contains("extra"),
      "after restart the evolved column joins the stream schema")
    val q2 = stream2.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val got2 = spark.read.option("mergeSchema", "true").parquet(out)
    assert(got2.columns.contains("extra"))
    assert(got2.filter(col("id") === 101L).head.getAs[String]("extra") === "AFTER")
    assert(got2.filter(col("id") === 100L).count() === 1L,
      "the restart resumes AFTER the stored offset — nothing re-emitted")
  }

  private object Fs {
    def exists(p: String): Boolean =
      graft.sources.Fs.isDirectory(p) &&
        graft.sources.Fs.listFiles(p).nonEmpty
  }
}
