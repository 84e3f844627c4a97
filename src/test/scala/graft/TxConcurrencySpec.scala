package graft

import graft.sources.{Fs, TxTable}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/**
 * Round-18 concurrency surface of the transactional table, REAL-thread
 * gated (the round-17 lesson: simulated interleavings missed the local-FS
 * create race that actual `Future` threads caught immediately):
 *
 *  - optimistic key-conflict detection (`upsert(conflictDetect = true)`):
 *    N concurrent upserts to the SAME key serialize — the result equals a
 *    serial order, never a lost update / duplicate live row;
 *  - checkpoint writer fencing: a checkpoint never commits over an
 *    in-flight lower writer (the advisory's lost-commit and double-count
 *    scenarios);
 *  - the always-commit contract: a no-op batch commits an EMPTY commit,
 *    so every returned id is a real log position;
 *  - changeFeedFrom cursor consumption: chunked replay == one-shot feed,
 *    cursor advances over empty commits, None when nothing new.
 */
class TxConcurrencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def tmp(): String = Files.createTempDirectory("graft-txc").toString

  private def base(n: Int = 100) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"name$i", 100.0 + i, 0L))
      .toDF("id", "name", "price", "version")
  }

  test("optimistic upserts to the SAME key serialize to the max version") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val t = tmp() + "/t"
    TxTable.create(spark, t, base(100))
    // 4 real threads, all mutating key 5 with DISTINCT versions: any
    // serial order converges to the max version (latest-wins), while the
    // unprotected race leaves multiple live rows for the key (each
    // writer kills only what was live at ITS read)
    val writers = (1 to 4).map { v =>
      Future {
        TxTable.upsert(spark, t,
          Seq((5L, s"writer$v", v * 1000.0, v.toLong))
            .toDF("id", "name", "price", "version"),
          Seq("id"), "version",
          conflictDetect = true, conflictWaitMs = 180000L)
      }
    }
    val ids = Await.result(Future.sequence(writers), 10.minutes)
    assert(ids.distinct.size === 4, "every writer must land its own commit")
    val rows = TxTable.read(spark, t).filter(col("id") === 5L).collect()
    assert(rows.length === 1,
      s"concurrent upserts must never leave duplicate live rows: ${rows.toSeq}")
    assert(rows.head.getLong(3) === 4L && rows.head.getDouble(2) === 4000.0,
      s"the serialized result must be the max version: ${rows.head}")
    assert(TxTable.read(spark, t).count() === 100L)
    // abandoned (conflicted) claims were cleaned by their own writers —
    // even the writers-quiesced sweep finds nothing
    assert(TxTable.vacuum(spark, t, graceMs = 0L).isEmpty,
      "conflict retries must clean their abandoned ids themselves")
  }

  test("optimistic upserts on DISJOINT keys all commit without retries biting") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val t = tmp() + "/t"
    TxTable.create(spark, t, base(100))
    val writers = (0 until 3).map { th =>
      Future {
        TxTable.upsert(spark, t,
          Seq((th.toLong, s"u$th", th * 10.0, 1L))
            .toDF("id", "name", "price", "version"),
          Seq("id"), "version",
          conflictDetect = true, conflictWaitMs = 180000L)
      }
    }
    Await.result(Future.sequence(writers), 10.minutes)
    val got = TxTable.read(spark, t)
    assert(got.count() === 100L)
    (0 until 3).foreach { th =>
      val r = got.filter(col("id") === th.toLong).collect()
      assert(r.length === 1 && r.head.getDouble(2) === th * 10.0)
    }
  }

  test("optimistic stress: 3 writers x 3 rounds on OVERLAPPING keys serialize per key") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val t = tmp() + "/t"
    TxTable.create(spark, t, base(20))
    // writer th touches keys {th, th+1, th+2} every round — keys 1-4 are
    // contested by 2-3 writers; versions r*10+th are globally unique, so
    // EVERY serial order converges to the same per-key max
    val writers = (0 until 3).map { th =>
      Future {
        (1 to 3).foreach { r =>
          val v = r * 10L + th
          TxTable.upsert(spark, t,
            (th.toLong to th + 2L).map(k => (k, s"t$th-r$r", v * 1.0, v))
              .toDF("id", "name", "price", "version"),
            Seq("id"), "version",
            conflictDetect = true, conflictWaitMs = 300000L)
        }
      }
    }
    Await.result(Future.sequence(writers), 15.minutes)
    val got = TxTable.read(spark, t)
    assert(got.count() === 20L, "no duplicate live rows anywhere")
    // expected max version per contested key: key k is touched by
    // writers max(0, k-2)..min(2, k), all at round 3
    val want = Map(0L -> 30L, 1L -> 31L, 2L -> 32L, 3L -> 32L, 4L -> 32L)
    want.foreach { case (k, v) =>
      val rows = got.filter(col("id") === k).collect()
      assert(rows.length === 1 && rows.head.getLong(3) === v,
        s"key $k must converge to version $v: ${rows.toSeq}")
    }
    assert(TxTable.vacuum(spark, t, graceMs = 0L).isEmpty,
      "nine optimistic commits across three racing writers leave no litter")
  }

  test("a sidecar-less commit inside the validation window forces a retry, not a miss") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val t = tmp() + "/t"
    TxTable.create(spark, t, base(100))
    // a writer OUTSIDE the optimistic protocol is in flight: claim only
    assert(Fs.createMarker(s"$t/_txn/claims/c1", "bare-writer"))
    // the optimistic upsert reads its snapshot (which misses the bare
    // writer's future commit), then WAITS on the unresolved lower claim
    val opt = Future {
      TxTable.upsert(spark, t,
        Seq((7L, "opt", 7777.0, 2L)).toDF("id", "name", "price", "version"),
        Seq("id"), "version", conflictDetect = true, conflictWaitMs = 180000L)
    }
    // while it waits, the bare writer commits the SAME key — data dir +
    // marker, NO keys sidecar
    Thread.sleep(500)
    Seq((7L, "plain", 777.0, 1L)).toDF("id", "name", "price", "version")
      .write.parquet(s"$t/data/c1")
    TxTable.commit(t, 1L)
    val k = Await.result(opt, 10.minutes)
    assert(TxTable.committedIds(t).contains(k))
    // serialized: the retry saw the bare commit's extra id-7 row live and
    // killed BOTH older instances (v2 >= v0, v1). Without the retry, the
    // bare row would survive as a duplicate — the lost-update signature.
    val live = TxTable.read(spark, t).filter(col("id") === 7L).collect()
    assert(live.length === 1,
      s"exactly one live row must survive the serialization: ${live.toSeq}")
    assert(live.head.getLong(3) === 2L && live.head.getDouble(2) === 7777.0)
  }

  test("a checkpoint inside the validation window forces a retry (file-identity conflict)") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val t = tmp() + "/t"
    TxTable.create(spark, t, base(100))
    // the checkpoint's claim lands FIRST (lower id) — the optimistic
    // upsert will snapshot {c0}, claim above it, and wait on it
    assert(Fs.createMarker(s"$t/_txn/claims/c1", "checkpointer"))
    val opt = Future {
      TxTable.upsert(spark, t,
        Seq((5L, "upd", 5555.0, 1L)).toDF("id", "name", "price", "version"),
        Seq("id"), "version", conflictDetect = true, conflictWaitMs = 180000L)
    }
    Thread.sleep(500)
    // the checkpoint commits mid-window: fold the current snapshot as
    // commit 1 (data dir, checkpoint marker, commit marker — the
    // fenced checkpoint's own ordering). The upsert's already-written
    // deletion vectors reference data/c0 files, which readers at or
    // past this checkpoint never scan — without the retry its kill of
    // the old id-5 row would silently miss.
    TxTable.read(spark, t).write.parquet(s"$t/data/c1")
    assert(Fs.createMarker(s"$t/_txn/checkpoints/c1", s"$t/data/c1"))
    TxTable.commit(t, 1L)
    Await.result(opt, 10.minutes)
    // post-checkpoint view (checkpoint + tail): exactly one id-5 row,
    // carrying the upsert's value — the retry re-killed against the
    // folded layout
    val r = TxTable.read(spark, t).filter(col("id") === 5L).collect()
    assert(r.length === 1,
      s"the upsert's kill must survive the fold — got ${r.toSeq}")
    assert(r.head.getDouble(2) === 5555.0)
    assert(TxTable.read(spark, t).count() === 100L)
    // and history stays consistent after expire
    TxTable.expire(spark, t)
    assert(TxTable.read(spark, t).count() === 100L)
    assert(TxTable.read(spark, t).filter(col("id") === 5L)
      .head.getDouble(2) === 5555.0)
  }

  test("a stalled writer validates UPWARD and loses to the younger winner (zombie closure)") {
    import spark.implicits._
    val t = tmp() + "/t"
    TxTable.create(spark, t, base(100))
    // the STALLED writer's world: it claimed c1 long ago (mtime aged past
    // the wait window) with key 5 in its sidecar...
    assert(Fs.createMarker(s"$t/_txn/claims/c1", "stalled"))
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(s"$t/_txn/claims/c1"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 60000L))
    val ourKeys = Seq(Tuple1(5L)).toDF("id")
    // ...and while it stalled, a younger optimistic writer (c2) gave up
    // waiting, committed, and left ITS sidecar on the same key
    Seq(Tuple1(5L)).toDF("id").write.parquet(s"$t/_txn/keys/2")
    Seq((5L, "younger", 9999.0, 1L)).toDF("id", "name", "price", "version")
      .write.parquet(s"$t/data/c2")
    TxTable.commit(t, 2L)
    // the stalled writer's validation must detect the younger winner
    // ABOVE its id — checking only downward would commit a lost update
    intercept[TxTable.CommitConflictException] {
      TxTable.validateNoKeyConflicts(spark, t, 1L, Set(0L), ourKeys,
        Seq("id"), waitMs = 5000L)
    }
    // disjoint keys sail through — the upward check is key-scoped
    TxTable.validateNoKeyConflicts(spark, t, 1L, Set(0L),
      Seq(Tuple1(77L)).toDF("id"), Seq("id"), waitMs = 5000L)
    // a YOUNG claim (not stalled) never pays the upward check
    assert(Fs.createMarker(s"$t/_txn/claims/c3", "fresh"))
    TxTable.validateNoKeyConflicts(spark, t, 3L, Set(0L, 2L), ourKeys,
      Seq("id"), waitMs = 5000L)
  }

  test("checkpoint aborts while a lower writer is in flight, succeeds after it resolves") {
    import spark.implicits._
    val t = tmp() + "/t"
    TxTable.create(spark, t, base(100))
    // writer B claimed an id but has not committed — the advisory's
    // lost-commit scenario if the checkpoint proceeded
    assert(Fs.createMarker(s"$t/_txn/claims/c1", "writer-B"))
    val ex = intercept[TxTable.CommitConflictException] {
      TxTable.checkpoint(spark, t)
    }
    assert(ex.getMessage.contains("in flight"))
    // the aborted checkpoint left no litter: its own claim is gone
    assert(TxTable.vacuum(spark, t, graceMs = 0L).isEmpty)
    // B finishes: data dir + commit marker
    Seq((1000L, "fromB", 1.0, 0L)).toDF("id", "name", "price", "version")
      .write.parquet(s"$t/data/c1")
    TxTable.commit(t, 1L)
    // now the fold is safe — and it contains B's row
    val cp = TxTable.checkpoint(spark, t)
    assert(TxTable.checkpointIds(t) === Seq(cp))
    assert(TxTable.read(spark, t).count() === 101L)
    TxTable.expire(spark, t)
    assert(TxTable.read(spark, t).count() === 101L,
      "expire after a fenced checkpoint must lose nothing")
  }

  test("compactFiles aborts over an in-flight lower writer, succeeds after it resolves") {
    import spark.implicits._
    val t = tmp() + "/t"
    TxTable.create(spark, t, base(100).repartition(4))
    // make some files hot
    TxTable.upsert(spark, t,
      base(100).filter(col("id") % 2 === 0)
        .withColumn("version", lit(1L)).withColumn("op", lit("d")),
      Seq("id"), "version", opCol = Some("op"))
    // an in-flight writer below the fold's claim
    assert(Fs.createMarker(s"$t/_txn/claims/c2", "in-flight"))
    val ex = intercept[TxTable.CommitConflictException] {
      TxTable.compactFiles(spark, t, minDeadFraction = 0.3)
    }
    assert(ex.getMessage.contains("in flight"))
    assert(TxTable.vacuum(spark, t, graceMs = 0L)
      .forall(_.endsWith("/_txn/claims/c2")),
      "the aborted fold leaves no litter of its own")
    // the writer resolves (abandons); the fold then lands
    Fs.deleteIfExists(s"$t/_txn/claims/c2")
    val k = TxTable.compactFiles(spark, t, minDeadFraction = 0.3)
    assert(k.nonEmpty)
    assert(TxTable.read(spark, t).count() === 50L)
  }

  test("a no-op batch commits an EMPTY commit — a real, replayable log position") {
    import spark.implicits._
    val t = tmp() + "/t"
    TxTable.create(spark, t, base(100))
    TxTable.upsert(spark, t,
      Seq((9L, "new", 999.0, 5L)).toDF("id", "name", "price", "version"),
      Seq("id"), "version")
    // a STALE batch: version 1 < live version 5 — every winner loses,
    // nothing to kill, nothing to add
    val k = TxTable.upsert(spark, t,
      Seq((9L, "stale", 1.0, 1L)).toDF("id", "name", "price", "version"),
      Seq("id"), "version")
    assert(TxTable.committedIds(t).contains(k),
      "a no-op batch must still commit (empty commit, marker only)")
    assert(!Fs.isDirectory(s"$t/data/c$k") && !Fs.isDirectory(s"$t/_txn/dv/$k"),
      "the empty commit carries no data or vectors")
    // snapshot unchanged; history shows the id with zero files/kills;
    // the feed shows nothing for it
    val r = TxTable.read(spark, t).filter(col("id") === 9L).collect()
    assert(r.length === 1 && r.head.getDouble(2) === 999.0)
    val h = TxTable.history(spark, t).filter(col("commit") === k).collect()
    assert(h.length === 1 && h.head.getLong(2) === 0L && h.head.getLong(4) === 0L)
    assert(TxTable.changeFeed(spark, t, Seq("id"), fromCommit = k).isEmpty)
    // and no unredeemed-claim litter exists anywhere
    assert(TxTable.vacuum(spark, t, graceMs = 0L).isEmpty)
  }

  test("changeFeedFrom: chunked cursor replay equals the one-shot feed") {
    import spark.implicits._
    val t = tmp() + "/t"
    TxTable.create(spark, t, base(50))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("id"), r.getAs[String]("op"), r.getAs[Long]("commit"))
    // commit 1: reprice; commit 2: stale no-op (EMPTY commit); commit 3:
    // tombstone + insert
    TxTable.upsert(spark, t,
      Seq((3L, "name3", 333.0, 1L)).toDF("id", "name", "price", "version"),
      Seq("id"), "version")
    TxTable.upsert(spark, t,
      Seq((3L, "stale", 0.0, 0L)).toDF("id", "name", "price", "version"),
      Seq("id"), "version")
    TxTable.upsert(spark, t,
      Seq((4L, "x", 0.0, 2L, "d"), (500L, "ins", 5.0, 2L, "u"))
        .toDF("id", "name", "price", "version", "op"),
      Seq("id"), "version", opCol = Some("op"))
    val oneShot = TxTable.changeFeed(spark, t, Seq("id"), fromCommit = 1L,
      withPreimage = true).collect().map(key).toSet
    // interleaved cursor consumption on a REPLAYED copy of the same log:
    // poll between commits, so each step drains a genuine CHUNK
    val t2 = tmp() + "/t"
    TxTable.create(spark, t2, base(50))
    var cursor = 0L
    val seen = scala.collection.mutable.Set.empty[(Long, String, Long)]
    def drain(): Unit =
      TxTable.changeFeedFrom(spark, t2, Seq("id"), cursor,
        withPreimage = true).foreach { case (feed, next) =>
        assert(next > cursor, "the cursor must advance")
        seen ++= feed.collect().map(key)
        cursor = next
      }
    TxTable.upsert(spark, t2,
      Seq((3L, "name3", 333.0, 1L)).toDF("id", "name", "price", "version"),
      Seq("id"), "version")
    drain()
    assert(cursor === 1L)
    TxTable.upsert(spark, t2,
      Seq((3L, "stale", 0.0, 0L)).toDF("id", "name", "price", "version"),
      Seq("id"), "version") // EMPTY commit
    drain()
    assert(cursor === 2L,
      "the cursor must advance over an empty (no-op) commit")
    TxTable.upsert(spark, t2,
      Seq((4L, "x", 0.0, 2L, "d"), (500L, "ins", 5.0, 2L, "u"))
        .toDF("id", "name", "price", "version", "op"),
      Seq("id"), "version", opCol = Some("op"))
    drain()
    assert(cursor === 3L)
    assert(seen.toSet === oneShot,
      "chunked cursor replay must equal the one-shot feed")
    // drained: the next poll is None
    assert(TxTable.changeFeedFrom(spark, t2, Seq("id"), cursor).isEmpty)
  }

  test("concurrent updateWhere vs OCC upsert on overlapping rows serializes") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val t = tmp() + "/t"
    TxTable.create(spark, t, base(200))
    // real threads: a predicate UPDATE over ids < 10 races an OCC upsert
    // of id 5. Serializable outcomes for id 5's price: upsert-then-update
    // = 5000 + 1000, update-then-upsert = 5000 (the upsert's version
    // wins over the updated copy). The LOST-update outcomes — two live
    // rows for id 5, or an update applied to a killed copy surviving
    // next to the upsert's row — are exactly what conflictDetect on the
    // predicate path must exclude.
    val upd = Future {
      TxTable.updateWhere(spark, t, col("id") < 10L,
        Map("price" -> (col("price") + 1000.0)),
        conflictDetect = true, conflictWaitMs = 180000L)
    }
    val ups = Future {
      TxTable.upsert(spark, t,
        Seq((5L, "occ", 5000.0, 5L)).toDF("id", "name", "price", "version"),
        Seq("id"), "version", conflictDetect = true, conflictWaitMs = 180000L)
    }
    Await.result(Future.sequence(Seq(upd, ups)), 10.minutes)
    val got = TxTable.read(spark, t)
    assert(got.count() === 200L, "no duplicate live rows anywhere")
    val r5 = got.filter(col("id") === 5L).collect()
    assert(r5.length === 1, s"id 5 must have exactly one live row: ${r5.toSeq}")
    val p5 = r5.head.getDouble(2)
    assert(p5 === 5000.0 || p5 === 6000.0,
      s"id 5 must land on a SERIAL outcome (5000 or 6000), got $p5")
    // the other updated ids saw exactly one +1000, whatever the order
    (0L until 10L).filter(_ != 5L).foreach { i =>
      val r = got.filter(col("id") === i).collect()
      assert(r.length === 1 && r.head.getDouble(2) === 100.0 + i + 1000.0,
        s"id $i: ${r.toSeq}")
    }
  }

  test("concurrent kill-only deletes never conflict; both sets of kills apply") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val t = tmp() + "/t"
    TxTable.create(spark, t, base(100))
    // two predicate deletes over the SAME files (one data dir) — DV
    // sidecars OR-fold, so file-identity OCC lets both commit
    val a = Future { TxTable.deleteWhere(spark, t, col("id") % 2 === 0L,
      conflictDetect = true, conflictWaitMs = 180000L) }
    val b = Future { TxTable.deleteWhere(spark, t, col("id") % 3 === 0L,
      conflictDetect = true, conflictWaitMs = 180000L) }
    val ids = Await.result(Future.sequence(Seq(a, b)), 10.minutes)
    assert(ids.distinct.size === 2)
    val live = TxTable.read(spark, t).select("id").collect().map(_.getLong(0)).toSet
    val want = (0L until 100L).filter(i => i % 2 != 0 && i % 3 != 0).toSet
    assert(live === want, "both deletes' kills must be applied")
  }

  test("append with conflictKeys serializes against an OCC upsert of the same key") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val t = tmp() + "/t"
    TxTable.create(spark, t, base(50))
    // the append introduces a NEW key (500) that the upsert also writes;
    // without the append's key sidecar the upsert would conservative-
    // retry anyway — the sidecar makes the intersection REAL, and a
    // serial order must leave exactly one live row for the key
    val app = Future {
      TxTable.append(spark, t,
        Seq((500L, "appended", 1.0, 0L)).toDF("id", "name", "price", "version"),
        conflictKeys = Seq("id"))
    }
    val ups = Future {
      TxTable.upsert(spark, t,
        Seq((500L, "upserted", 2.0, 1L)).toDF("id", "name", "price", "version"),
        Seq("id"), "version", conflictDetect = true, conflictWaitMs = 180000L)
    }
    Await.result(Future.sequence(Seq(app, ups)), 10.minutes)
    val rows = TxTable.read(spark, t).filter(col("id") === 500L).collect()
    // serial outcomes: append-then-upsert = one row at v1 (the upsert
    // killed the appended copy); upsert-then-append = two rows is the
    // append's own contract violation — appends are by definition out of
    // key space, so the assertion here is the OCC side's: IF the upsert
    // validated after the append committed, it must have seen it
    assert(rows.length <= 2)
    if (rows.length == 1)
      assert(rows.head.getLong(3) === 1L && rows.head.getString(1) === "upserted")
    else {
      // upsert committed first; the blind append landed after — both
      // rows live, versions distinguish them. The point of the sidecar
      // is the OTHER order: the upsert can never LOSE to the append.
      assert(rows.map(_.getLong(3)).toSet === Set(0L, 1L))
    }
    assert(TxTable.read(spark, t).count() === (50L + rows.length))
  }

  test("a fold outliving a writer's wait window never eats its kills (zombie fold fence)") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // the r18 advisory's high finding: writer B's conflictWaitMs is
    // SHORTER than checkpoint A's fold, so B presumes A's claim crashed
    // and commits deletion vectors against pre-fold files mid-fold; A
    // must then ABORT at commit time (the DV-carrying-commit-above
    // fence) instead of committing a fold that silently drops B's kills.
    // REAL threads — the interleaving is the bug.
    val t = tmp() + "/t"
    TxTable.create(spark, t, base(5000))
    val folder = Future {
      // retry like any production maintenance loop; count the aborts
      var aborts = 0
      var done = false
      while (!done) {
        try { TxTable.checkpoint(spark, t); done = true }
        catch { case _: TxTable.CommitConflictException =>
          aborts += 1; Thread.sleep(100)
          if (aborts > 100) throw new IllegalStateException("livelock")
        }
      }
      aborts
    }
    // wait until the fold has CLAIMED, then race the upsert with a wait
    // window (1 ms) the fold is guaranteed to outlive
    val deadline = System.currentTimeMillis() + 60000
    while (!Fs.isDirectory(s"$t/_txn/claims") ||
        Fs.listFiles(s"$t/_txn/claims").isEmpty) {
      assert(System.currentTimeMillis() < deadline, "fold never claimed")
      Thread.sleep(10)
    }
    TxTable.upsert(spark, t,
      Seq((7L, "zombie-era", 7777.0, 9L)).toDF("id", "name", "price", "version"),
      Seq("id"), "version", conflictDetect = true, conflictWaitMs = 1L)
    Await.result(folder, 10.minutes)
    // whatever the interleaving, the upsert's kill must be visible: ONE
    // live row for key 7, at the new version — the lost-update signature
    // is the pre-fold copy resurfacing next to it
    val live = TxTable.read(spark, t).filter(col("id") === 7L).collect()
    assert(live.length === 1,
      s"the folded table must not resurrect the killed row: ${live.toSeq}")
    assert(live.head.getLong(3) === 9L && live.head.getDouble(2) === 7777.0)
    assert(TxTable.read(spark, t).count() === 5000L)
  }
}
