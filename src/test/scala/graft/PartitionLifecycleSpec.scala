package graft

import graft.sources.ParquetIO
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition lifecycle: date-cutoff retention drops whole directories
  * without reading data; fragmented-partition compaction rewrites ONLY
  * the hot partitions (cold partitions keep their exact bytes) and
  * collapses each to one sized file. Plus the streaming progress
  * listener's observability contract. */
class PartitionLifecycleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def partDirs(root: String): Map[String, Int] =
    new java.io.File(root).listFiles().filter(_.isDirectory).map { d =>
      d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))
    }.toMap

  test("dropPartitionsBelow removes only partitions sorting below the cutoff") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ttl").toString + "/t"
    val rows = Seq(
      ("2024-01-30", 1L), ("2024-01-31", 2L), ("2024-02-01", 3L),
      ("2024-02-02", 4L)).flatMap { case (dt, base) =>
      (1L to 5L).map(i => (dt, base * 100 + i))
    }.toDF("dt", "v")
    ParquetIO.writePartitioned(rows, dir, Seq("dt"))
    val dropped = ParquetIO.dropPartitionsBelow(dir, "dt", "2024-02-01")
    assert(dropped == Seq("2024-01-30", "2024-01-31"))
    val back = spark.read.parquet(dir)
    assert(back.select("dt").distinct().as[String].collect().sorted.toSeq ==
      Seq("2024-02-01", "2024-02-02"))
    assert(back.count() == 10)
  }

  test("compactFragmentedPartitions rewrites only hot partitions, cold bytes untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft-frag").toString + "/t"
    val base = (1L to 40L).map(i => (s"p${i % 4}", i)).toDF("pc", "v")
    ParquetIO.writePartitioned(base, dir, Seq("pc"))
    // fragment partitions p0 and p1 with ten 1-row appends each
    for (i <- 100L to 109L) {
      Seq(("p0", i)).toDF("pc", "v").coalesce(1)
        .write.mode("append").partitionBy("pc").parquet(dir)
      Seq(("p1", i + 50)).toDF("pc", "v").coalesce(1)
        .write.mode("append").partitionBy("pc").parquet(dir)
    }
    val before = partDirs(dir)
    assert(before("pc=p0") > 8 && before("pc=p1") > 8)
    val coldFiles = new java.io.File(s"$dir/pc=p2").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => s"${f.getName}@${f.lastModified}").toSet
    val totalBefore = spark.read.parquet(dir).count()

    val compacted = ParquetIO.compactFragmentedPartitions(spark, dir, "pc", maxFiles = 8)
    assert(compacted == Seq("p0", "p1"))
    val after = partDirs(dir)
    assert(after("pc=p0") == 1 && after("pc=p1") == 1, s"after=$after")
    // cold partitions keep byte-identical files
    val coldAfter = new java.io.File(s"$dir/pc=p2").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => s"${f.getName}@${f.lastModified}").toSet
    assert(coldAfter == coldFiles)
    // no rows lost anywhere
    assert(spark.read.parquet(dir).count() == totalBefore)
    // idempotent: nothing left to compact
    assert(ParquetIO.compactFragmentedPartitions(spark, dir, "pc", maxFiles = 8).isEmpty)
  }

  test("compaction handles partition values that don't round-trip type inference") {
    // zero-padded hour partitions: inference would parse "00" as int 0
    // and a cast-to-string match (or a typed rewrite) would miss /
    // rename the directory — the r12 review scenario, locked in
    val dir = java.nio.file.Files.createTempDirectory("graft-zp").toString + "/t"
    val base = Seq(("00", 1L), ("00", 2L), ("07", 3L), ("12", 4L)).toDF("hh", "v")
    ParquetIO.writePartitioned(base, dir, Seq("hh"))
    for (i <- 10L to 19L)
      Seq(("00", i)).toDF("hh", "v").coalesce(1)
        .write.mode("append").partitionBy("hh").parquet(dir)
    assert(partDirs(dir)("hh=00") > 8)
    val compacted = ParquetIO.compactFragmentedPartitions(spark, dir, "hh", maxFiles = 8)
    assert(compacted == Seq("00"))
    val after = partDirs(dir)
    assert(after("hh=00") == 1, s"after=$after") // same dir NAME, one file
    assert(!after.contains("hh=0"), "must not have written a renamed hh=0 dir")
    assert(spark.read.parquet(dir).count() == 14)
    // second run: nothing fragmented
    assert(ParquetIO.compactFragmentedPartitions(spark, dir, "hh", maxFiles = 8).isEmpty)
  }

  test("progress listener captures per-batch rows and bounded state") {
    val collector = new graft.streaming.Streams.ProgressCollector()
    spark.streams.addListener(collector)
    try {
      val base = java.nio.file.Files.createTempDirectory("graft-obs").toString
      (1L to 30L).map(i => (i, i * 2.0)).toDF("id", "x")
        .coalesce(1).write.parquet(s"$base/in/f0")
      (31L to 50L).map(i => (i, i * 2.0)).toDF("id", "x")
        .coalesce(1).write.parquet(s"$base/in/f1")
      val schema = spark.read.parquet(s"$base/in/f0").schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/in/*")
      val q = stream.writeStream.format("memory").queryName("obs_q")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      // listener events are async — wait for the bus to drain
      var tries = 0
      def rows() = collector.toDF(spark)
      while (tries < 50 && rows().agg(sum(col("input_rows"))).collect()(0).isNullAt(0)) {
        Thread.sleep(100); tries += 1
      }
      val progress = rows().filter(col("input_rows") > 0)
      assert(progress.agg(sum(col("input_rows"))).collect()(0).getLong(0) == 50L)
      assert(progress.select("batch_id").distinct().count() >= 2)
    } finally spark.streams.removeListener(collector)
  }

  test("observability invariants across a multi-batch stateful attribution join") {
    // round-13 hardening: the listener's rows must carry enough to assert
    // the three production invariants — monotone watermark, input/output
    // conservation, and watermark-bounded (non-monotone) state growth —
    // over a genuinely multi-batch stream-stream interval join.
    import java.sql.Timestamp
    val collector = new graft.streaming.Streams.ProgressCollector()
    spark.streams.addListener(collector)
    try {
      val base = java.nio.file.Files.createTempDirectory("graft-obs2").toString
      val day = 86400L * 1000000L // µs
      var nViews = 0L; var nPurch = 0L
      // three day-files per side, ascending event time: the 12h watermark
      // must sweep past day k while day k+2 loads, evicting old state
      for (d <- 0 until 3) {
        val views = (0 until 40).map { u =>
          (u.toLong, (d * 100 + u).toLong,
            new Timestamp((d * day + u * 60000000L) / 1000))
        }.toDF("user_id", "view_id", "view_ts")
        views.coalesce(1).write.parquet(s"$base/v/f$d")
        nViews += 40
        val purch = (0 until 20).map { u =>
          (u.toLong, (d * 100 + u + 10000).toLong,
            new Timestamp((d * day + u * 60000000L + 3600000000L) / 1000), u * 1.0)
        }.toDF("p_user", "purchase_id", "purchase_ts", "value")
        purch.coalesce(1).write.parquet(s"$base/p/f$d")
        nPurch += 20
      }
      val vSchema = spark.read.parquet(s"$base/v/f0").schema
      val pSchema = spark.read.parquet(s"$base/p/f0").schema
      val sv = spark.readStream.schema(vSchema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/v/*")
      val sp = spark.readStream.schema(pSchema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/p/*")
      val joined = graft.streaming.Streams.attributionJoin(sv, sp)
      val q = joined.writeStream.format("memory").queryName("obs_join")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      // listener events are async — drain until the full input is visible
      var tries = 0
      def mine() = collector.toDF(spark).filter(col("query_name") === "obs_join")
      def seen() = mine().agg(sum(col("input_rows"))).collect()(0)
      while (tries < 100 && (seen().isNullAt(0) || seen().getLong(0) < nViews + nPurch)) {
        Thread.sleep(100); tries += 1
      }
      val rows = mine().orderBy(col("batch_id")).collect()
      assert(rows.count(_.getAs[Long]("input_rows") > 0) >= 3,
        "file-per-trigger must produce at least three loaded batches")
      // (1) input conservation: every source row is accounted exactly once
      assert(rows.map(_.getAs[Long]("input_rows")).sum == nViews + nPurch)
      // (2) output conservation: Σ per-batch sink rows == sink table rows
      val sinkRows = spark.table("obs_join").count()
      assert(sinkRows > 0)
      assert(rows.map(_.getAs[Long]("output_rows")).filter(_ > 0).sum == sinkRows)
      // (3) monotone watermark: non-decreasing, and it genuinely advances
      val wms = rows.map(_.getAs[String]("watermark")).filter(_.nonEmpty)
        .map(java.time.Instant.parse)
      assert(wms.nonEmpty)
      assert(wms.zip(wms.tail).forall { case (a, b) => !b.isBefore(a) },
        s"watermark must never regress: ${wms.mkString(", ")}")
      assert(wms.last.isAfter(wms.head), "watermark must advance across days")
      // (4) state boundedness: the join buffers at most what it has read,
      // and eviction at the advanced watermark shrinks it below its peak
      val states = rows.map(_.getAs[Long]("state_rows"))
      assert(states.max <= nViews + nPurch)
      assert(states.last < states.max,
        s"old-day state must be evicted as the watermark passes: $states")
    } finally spark.streams.removeListener(collector)
  }
}
