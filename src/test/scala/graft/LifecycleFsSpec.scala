package graft

import graft.sources.{Fs, ParquetIO}
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 port gate: the table-maintenance tier (partition TTL,
  * fragmented-partition compaction, generation pointer/list/vacuum) runs
  * entirely through `org.apache.hadoop.fs.FileSystem`, so it works on any
  * Hadoop-supported scheme. These tests drive scheme-QUALIFIED `file:`
  * URIs through every entry point — a regression back to `java.io.File`
  * fails loudly here, because `new java.io.File("file:/x")` treats the
  * scheme as a literal path segment and lists nothing. */
class LifecycleFsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def schemeDir(tag: String): String =
    "file:" + java.nio.file.Files.createTempDirectory(tag).toString

  test("dropPartitionsBelow runs against a scheme-qualified file: URI") {
    val dir = schemeDir("graft-fs-ttl") + "/t"
    val rows = Seq(("2024-01-30", 1L), ("2024-01-31", 2L), ("2024-02-01", 3L))
      .flatMap { case (dt, b) => (1L to 4L).map(i => (dt, b * 10 + i)) }
      .toDF("dt", "v")
    ParquetIO.writePartitioned(rows, dir, Seq("dt"))
    val dropped = ParquetIO.dropPartitionsBelow(dir, "dt", "2024-02-01")
    assert(dropped == Seq("2024-01-30", "2024-01-31"))
    val back = spark.read.parquet(dir)
    assert(back.select("dt").distinct().as[String].collect().toSeq == Seq("2024-02-01"))
    assert(back.count() == 4)
  }

  test("compactFragmentedPartitions runs against a scheme-qualified file: URI") {
    val dir = schemeDir("graft-fs-frag") + "/t"
    val base = (1L to 20L).map(i => (s"p${i % 2}", i)).toDF("pc", "v")
    ParquetIO.writePartitioned(base, dir, Seq("pc"))
    for (i <- 100L to 109L)
      Seq(("p0", i)).toDF("pc", "v").coalesce(1)
        .write.mode("append").partitionBy("pc").parquet(dir)
    val before = spark.read.parquet(dir).count()
    val compacted = ParquetIO.compactFragmentedPartitions(spark, dir, "pc", maxFiles = 8)
    assert(compacted == Seq("p0"))
    assert(Fs.listFiles(s"$dir/pc=p0").count(_.getPath.getName.endsWith(".parquet")) == 1)
    assert(spark.read.parquet(dir).count() == before)
  }

  test("countFilesDistributed (forced Spark path) agrees with the driver loop") {
    // the compaction spec exercises the small-table driver short-circuit;
    // this forces the DISTRIBUTED listing over the same scheme-qualified
    // dirs (driverLoopBelow = 0) and pins result equality — the 10⁵-
    // partition path must count exactly what the sequential loop counts
    val dir = schemeDir("graft-fs-cnt") + "/t"
    val base = (1L to 20L).map(i => (s"p${i % 4}", i)).toDF("pc", "v")
    ParquetIO.writePartitioned(base, dir, Seq("pc"))
    for (i <- 100L to 105L)
      Seq(("p0", i)).toDF("pc", "v").coalesce(1)
        .write.mode("append").partitionBy("pc").parquet(dir)
    val dirs = Fs.listDirs(dir).map(_.getPath.toString).filter(_.contains("pc="))
    assert(dirs.size == 4)
    val seqCounts = dirs.map(p => p -> Fs.listFiles(p)
      .count(_.getPath.getName.endsWith(".parquet")).toLong).toMap
    val distCounts = Fs.countFilesDistributed(spark, dirs, ".parquet", driverLoopBelow = 0)
    assert(distCounts == seqCounts, s"distributed=$distCounts sequential=$seqCounts")
    // the 6 appended files all landed in pc=p0 and are visible to both paths
    assert(distCounts(dirs.find(_.endsWith("pc=p0")).get) >= 6L)
    // a missing dir counts 0 on the distributed path, not an exception
    val withMissing = Fs.countFilesDistributed(
      spark, dirs :+ s"$dir/pc=absent", ".parquet", driverLoopBelow = 0)
    assert(withMissing(s"$dir/pc=absent") == 0L)
  }

  test("compaction schema probe merges schemas across fragmented partitions") {
    // round-12 advice: appends with an EVOLVED schema (extra column) into
    // a second fragmented partition must survive compaction — probing
    // only the first dir's schema would silently drop the new column
    val dir = schemeDir("graft-fs-evo") + "/t"
    val base = (1L to 10L).map(i => (s"a", i)).toDF("pc", "v")
    ParquetIO.writePartitioned(base, dir, Seq("pc"))
    for (i <- 100L to 109L)  // fragment pc=a with the original schema
      Seq(("a", i)).toDF("pc", "v").coalesce(1)
        .write.mode("append").partitionBy("pc").parquet(dir)
    for (i <- 200L to 209L)  // fragment pc=b with an EVOLVED schema
      Seq(("b", i, s"tag$i")).toDF("pc", "v", "extra").coalesce(1)
        .write.mode("append").partitionBy("pc").parquet(dir)
    val compacted = ParquetIO.compactFragmentedPartitions(spark, dir, "pc", maxFiles = 8)
    assert(compacted == Seq("a", "b"))
    val back = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(back.columns.toSet == Set("pc", "v", "extra"))
    // the evolved column survived the rewrite with its values intact
    assert(back.filter(col("extra").isNotNull).count() == 10)
    assert(back.filter(col("pc") === "b" && col("extra") === "tag205").count() == 1)
  }

  test("generation lifecycle (commit markers, list, read, vacuum) on a file: URI") {
    val table = schemeDir("graft-fs-gen") + "/table"
    // build three committed generations by hand through the same Fs
    // primitives the sink uses (no stream needed to exercise the layer)
    for (g <- 0 to 2) {
      (1L to (g + 1) * 3L).map(i => (i, s"g$g")).toDF("id", "tag")
        .coalesce(1).write.parquet(s"$table/gen$g")
      assert(Fs.createMarker(s"$table/_commits/gen$g", s"$table/gen$g"))
    }
    assert(Streams.listGenerations(table).map(_._1) == Seq(0L, 1L, 2L))
    assert(Streams.committedGenerations(table).map(_._1) == Seq(0L, 1L, 2L))
    assert(Streams.currentGeneration(table).get.endsWith("gen2"))
    assert(Streams.readGeneration(spark, table, 1L).count() == 6)
    val deleted = Streams.vacuumGenerations(table, keepLast = 1)
    assert(deleted.map(p => p.substring(p.lastIndexOf('/') + 1)) == Seq("gen0", "gen1"))
    assert(Streams.listGenerations(table).map(_._1) == Seq(2L))
    // vacuumed generations' markers are swept with them
    assert(Fs.listFiles(s"$table/_commits").map(_.getPath.getName).toSet == Set("gen2"))
    assert(Streams.vacuumGenerations(table, keepLast = 1).isEmpty)
    assert(Streams.listGenerations(table).map(_._1) == Seq(2L))
  }

  test("a crash between generation write and commit marker leaves the OLD generation current") {
    // the round-14 'done' criterion for the object-store-safe protocol:
    // gen2's data is fully written but the marker never landed (crash in
    // the commit window) — every reader must keep resolving gen1, vacuum
    // must keep the dangling dir (it is the replay target), and the
    // late-arriving marker (the replayed batch committing) flips the
    // table forward with no rename anywhere.
    val table = schemeDir("graft-fs-crash") + "/table"
    for (g <- 0 to 1) {
      (1L to (g + 1) * 3L).map(i => (i, s"g$g")).toDF("id", "tag")
        .coalesce(1).write.parquet(s"$table/gen$g")
      Fs.createMarker(s"$table/_commits/gen$g", s"$table/gen$g")
    }
    (1L to 9L).map(i => (i, "g2")).toDF("id", "tag")
      .coalesce(1).write.parquet(s"$table/gen2") // written, NEVER committed
    assert(Streams.currentGeneration(table).get.endsWith("gen1"),
      "uncommitted generation must not become current")
    assert(Streams.committedGenerations(table).map(_._1) == Seq(0L, 1L))
    // time travel refuses the dangling dir, loudly
    val err = intercept[IllegalArgumentException] {
      Streams.readGeneration(spark, table, 2L)
    }
    assert(err.getMessage.contains("uncommitted (crashed batch): 2"))
    // vacuum keeps the replay target even at keepLast=1
    val deleted = Streams.vacuumGenerations(table, keepLast = 1)
    assert(deleted.map(p => p.substring(p.lastIndexOf('/') + 1)) == Seq("gen0"))
    assert(Streams.listGenerations(table).map(_._1) == Seq(1L, 2L))
    // the replayed batch commits: one create-once PUT flips the table
    Fs.createMarker(s"$table/_commits/gen2", s"$table/gen2")
    assert(Streams.currentGeneration(table).get.endsWith("gen2"))
    assert(Streams.readGeneration(spark, table, 2L).count() == 9)
  }

  test("legacy _CURRENT-pointer tables: unmigrated reads are empty+loud; migration restores them") {
    // tables written before round 14 have no _commits dir — the pointer
    // names generation P, and every generation id <= P was once pointed
    // at (a committed snapshot). Since round 15 the read path is
    // marker-ONLY: an unmigrated legacy table resolves to zero committed
    // generations and readGeneration fails loudly, until a one-time
    // migrateLegacyGenerations (automatic at upsertSink creation and at
    // vacuum, both write paths) mints markers and deletes the pointer.
    // The qualified-path compare still matters: the pointer may spell
    // the target dir without the scheme.
    val table = schemeDir("graft-fs-legacy") + "/table"
    for (g <- 0 to 2)
      (1L to (g + 1) * 3L).map(i => (i, s"g$g")).toDF("id", "tag")
        .coalesce(1).write.parquet(s"$table/gen$g")
    val localGen2 = table.stripPrefix("file:") + "/gen2" // unqualified spelling
    Fs.writeUtf8(s"$table/_CURRENT", localGen2)
    // pre-migration contract: nothing committed, loud error, no silent reads
    assert(Streams.committedGenerations(table).isEmpty)
    assert(Streams.currentGeneration(table).isEmpty)
    val err = intercept[IllegalArgumentException](Streams.readGeneration(spark, table, 1L))
    assert(err.getMessage.contains("not committed"))
    // migration: a marker per id <= pointer target, pointer deleted LAST
    assert(Streams.migrateLegacyGenerations(table) == 3)
    assert(Fs.readUtf8(s"$table/_CURRENT").isEmpty)
    for (g <- 0 to 2) assert(Fs.exists(s"$table/_commits/gen$g"))
    // resolution now matches the old pointer-fallback semantics exactly
    assert(Streams.committedGenerations(table).map(_._1) == Seq(0L, 1L, 2L))
    assert(Streams.currentGeneration(table).get.endsWith("gen2"))
    assert(Streams.readGeneration(spark, table, 1L).count() == 6)
    // idempotent: marker-native table migrates as a no-op
    assert(Streams.migrateLegacyGenerations(table) == 0)
    // crash-mid-migration: markers partially written, pointer still
    // present (it goes last) — a re-run completes the remainder
    Fs.deleteIfExists(s"$table/_commits/gen1")
    Fs.writeUtf8(s"$table/_CURRENT", localGen2)
    assert(Streams.migrateLegacyGenerations(table) == 1)
    assert(Streams.committedGenerations(table).map(_._1) == Seq(0L, 1L, 2L))
    assert(Fs.readUtf8(s"$table/_CURRENT").isEmpty)
    // vacuum honors keepLast over the migrated snapshots
    val deleted = Streams.vacuumGenerations(table, keepLast = 1)
    assert(deleted.map(p => p.substring(p.lastIndexOf('/') + 1)) == Seq("gen0", "gen1"))
    assert(Streams.listGenerations(table).map(_._1) == Seq(2L))
    assert(Streams.vacuumGenerations(table, keepLast = 1).isEmpty)
  }

  test("vacuum on a MIXED legacy+marker table auto-migrates instead of deleting legacy snapshots") {
    // round-16 review: legacy generations on a mixed table (pointer-era
    // snapshots plus a newer marker-era one) have no markers, so without
    // migration they classify as crashed leftovers (id < maxCommitted)
    // and vacuum would DELETE committed data. Vacuum is a write path, so
    // it migrates first; with keepLast covering them nothing is deleted.
    val table = schemeDir("graft-fs-mixed") + "/table"
    for (g <- 0 to 3)
      (1L to 3L).map(i => (i, s"g$g")).toDF("id", "tag")
        .coalesce(1).write.parquet(s"$table/gen$g")
    Fs.writeUtf8(s"$table/_CURRENT", s"$table/gen2") // legacy era: gens 0..2
    Fs.createMarker(s"$table/_commits/gen3", s"$table/gen3") // marker era
    assert(Streams.vacuumGenerations(table, keepLast = 4).isEmpty)
    assert(Streams.committedGenerations(table).map(_._1) == Seq(0L, 1L, 2L, 3L))
    assert(Fs.readUtf8(s"$table/_CURRENT").isEmpty)
    assert(Streams.readGeneration(spark, table, 0L).count() == 3)
  }

  test("migrateLegacyGenerations surfaces a dangling _CURRENT pointer") {
    val table = schemeDir("graft-fs-dangle") + "/table"
    (1L to 3L).map(i => (i, "g0")).toDF("id", "tag")
      .coalesce(1).write.parquet(s"$table/gen0")
    Fs.writeUtf8(s"$table/_CURRENT", s"$table/gen9") // names no live generation
    val err = intercept[IllegalArgumentException](Streams.migrateLegacyGenerations(table))
    assert(err.getMessage.contains("matches no generation directory"))
    // the pointer survives the failure — nothing was swallowed
    assert(Fs.readUtf8(s"$table/_CURRENT").isDefined)
  }

  test("upsertSink attachment auto-migrates a legacy _CURRENT table") {
    val root = schemeDir("graft-fs-attach")
    val table = root + "/table"
    (1L to 4L).map(i => (i, "seed", 0L)).toDF("id", "tag", "v")
      .coalesce(1).write.parquet(s"$table/gen0")
    Fs.writeUtf8(s"$table/_CURRENT", s"$table/gen0")
    val src = java.nio.file.Files.createTempDirectory("graft-fs-attach-src").toString
    Seq((100L, "b0", 1L)).toDF("id", "tag", "v").coalesce(1)
      .write.mode("append").json(src)
    val stream = spark.readStream.schema("id LONG, tag STRING, v LONG").json(src)
    val q = Streams.upsertSink(stream, table, root + "/ckpt", Seq("id"), "v", parts = 1)
    try {
      // batch 0 collides with the migrated legacy gen0 and is replay-
      // skipped (documented contract: generation ids ARE batch ids; a
      // fresh checkpoint against a non-empty table drops colliding ids)
      q.processAllAvailable()
      assert(Fs.readUtf8(s"$table/_CURRENT").isEmpty) // migration ran at attach
      assert(Fs.exists(s"$table/_commits/gen0"))
      assert(Streams.committedGenerations(table).map(_._1) == Seq(0L))
      // batch 1 merges ON TOP of the migrated legacy snapshot
      Seq((200L, "b1", 2L)).toDF("id", "tag", "v").coalesce(1)
        .write.mode("append").json(src)
      q.processAllAvailable()
    } finally q.stop()
    val cur = Streams.currentGeneration(table).get
    assert(cur.endsWith("gen1"))
    val rows = spark.read.parquet(cur)
    assert(rows.count() == 5) // 4 legacy-seed rows + batch-1 upsert
    assert(rows.filter(col("tag") === "seed").count() == 4)
  }

  test("upsertSink replay guard matches the commit across path spellings") {
    // round-13 review (re-keyed on markers in round 14): a restart that
    // spells the SAME tableDir with a scheme ('file:/t' vs '/t') must
    // still recognize the replayed batch as committed — the marker file
    // resolves to the same object under either spelling — or the stream
    // wedges overwriting the directory it is reading.
    // Scenario: run with the unqualified spelling, crash inside the
    // commit window, restart with the file:-qualified spelling.
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-fs-replay").toString
    (1L to 40L).map(k => (k, "a", 1L)).toDF("k", "payload", "v")
      .coalesce(1).write.parquet(s"$base/in/f0")
    (21L to 60L).map(k => (k, "b", 2L)).toDF("k", "payload", "v")
      .coalesce(1).write.parquet(s"$base/in/f1")
    val schema = spark.read.parquet(s"$base/in/f0").schema
    def start(table: String, ckpt: String) = Streams.upsertSink(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$base/in/*"),
      table, ckpt, Seq("k"), "v", parts = 2)
    val q = start(s"$base/table", s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()
    // crash window: checkpoint copied minus the last commit marker
    val src = java.nio.file.Paths.get(s"$base/ckpt")
    val dst = java.nio.file.Paths.get(s"$base/ckpt2")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(src).iterator().asScala.toSeq.sortBy(_.toString)
      .foreach { p =>
        val t = dst.resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t)
      }
    val commits = new java.io.File(s"$base/ckpt2/commits").listFiles()
      .filter(_.getName.forall(_.isDigit))
    val last = commits.maxBy(_.getName.toInt)
    assert(last.delete())
    new java.io.File(last.getParentFile, s".${last.getName}.crc").delete()
    // restart with the SCHEME-QUALIFIED table spelling: the replayed
    // batch must still be recognized as already applied
    val q2 = start(s"file:$base/table", s"$base/ckpt2")
    try q2.processAllAvailable() finally q2.stop()
    val out = spark.read.parquet(Streams.currentGeneration(s"$base/table").get)
      .select("k", "payload", "v").as[(Long, String, Long)].collect()
    assert(out.length == 60, "replayed batch must not change the table")
    assert(out.count(_._2 == "b") == 40)
  }

  test("Fs.createMarker is create-once and idempotent; readUtf8 round-trips") {
    val dir = schemeDir("graft-fs-mark")
    val p = s"$dir/_commits/gen7"
    assert(Fs.readUtf8(p).isEmpty)
    assert(Fs.createMarker(p, "alpha"), "first create must win")
    assert(Fs.readUtf8(p).contains("alpha"))
    // a second create (replay race) is a no-op — the commit bit and its
    // content are immutable once set
    assert(!Fs.createMarker(p, "beta"))
    assert(Fs.readUtf8(p).contains("alpha"))
    // no stray temp file left behind
    assert(Fs.listFiles(s"$dir/_commits").map(_.getPath.getName).toSet == Set("gen7"))
    assert(Fs.deleteIfExists(p))
    assert(Fs.readUtf8(p).isEmpty)
    assert(Fs.deleteIfExists(p), "deleting an absent file reports gone")
  }
}
