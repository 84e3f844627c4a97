package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Fs, ParquetIO, StatsManifest}

/**
 * File-skipping at file-count scale (round 16, SCALE.md): the dimension
 * that matters for the manifest is FILES, not rows — the claim under
 * test is "planning reads ONE small parquet instead of N footers". Two
 * corpora:
 *
 *   range: 15 M rows sort-clustered into 2 048 files (≈7.3 k rows each,
 *   disjoint o_orderkey spans — the compactSorted layout shape).
 *   Measures: `build` (the distributed footer pass over all 2 048),
 *   `prune` planning wall (one small-parquet query), the skipped vs
 *   unskipped range scan-aggregate, and `refresh` after an 8-file
 *   append (must be ∝ files ADDED, not table size).
 *
 *   bloom: the same rows hash-scattered into 256 files with a bloom on
 *   o_custkey (expectedNdv = per-file distinct count) — the layout
 *   where min/max is USELESS (every file spans the domain) and only
 *   bitsets cut. Measures: `pruneEquality` (range stage keeps all 256,
 *   bloom stage cuts) and the point-lookup scan pruned vs full.
 *
 * 100 TB read-through: 2 048 local footers stand in for 2·10⁵ object
 * -store footer GETs — locally the footer pass is tens of seconds; on
 * an object store each GET is a ~10 ms round-trip, so the unpruned
 * PLANNING alone costs minutes-to-hours of aggregate latency that the
 * manifest replaces with one small read. The pruned/unpruned SCAN
 * ratio measured here transfers directly (it is file-count
 * arithmetic), and `refresh` bounds maintenance at ingest cost.
 */
object ProfileStatsManifest {

  private val Root = "/tmp/graft_manifest"
  private val RangeTable = s"$Root/range2048"
  private val BloomTable = s"$Root/bloom256"
  private val Replicas = 100

  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[manifest] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  /** ×100 replica corpus. `shiftCust` decides the bloom story: the range
    * corpus keeps the 15 k-key domain (skipping there is the SORT key's
    * job); the bloom corpus shifts custkey per replica → 1.5 M distinct
    * keys, ~10 rows each — the "find one customer in N files" shape
    * where a per-file key-set bitmap is the ONLY thing that can prune
    * (with the unshifted domain every 58 k-row file contains every key
    * and keeping all files is the CORRECT bloom answer, as the first
    * run of this rehearsal measured). */
  private def orders100x(spark: SparkSession, shiftCust: Boolean): DataFrame = {
    val src = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    (0 until Replicas).map { r =>
      val shifted = src.withColumn("o_orderkey",
        col("o_orderkey") + lit(r * 10000000L))
      if (shiftCust) shifted.withColumn("o_custkey",
        col("o_custkey") + lit(r * 1000000L))
      else shifted
    }.reduce(_ unionByName _)
  }

  private def synthesize(spark: SparkSession): Unit = {
    // a prior run's refresh leg appended 8 files — restore the 2 048-file
    // baseline so every rehearsal measures the same corpus
    if (Fs.isDirectory(RangeTable) && Fs.listFiles(RangeTable)
        .count(_.getPath.getName.endsWith(".parquet")) != 2048)
      Fs.deleteRecursive(new org.apache.hadoop.fs.Path(RangeTable))
    if (!Fs.isDirectory(RangeTable)) {
      time("synthesize range2048 (15 M rows, 2 048 sorted files)") {
        orders100x(spark, shiftCust = false)
          .repartitionByRange(2048, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey")
          .write.mode("overwrite").parquet(RangeTable)
      }
    }
    if (!Fs.isDirectory(BloomTable)) {
      time("synthesize bloom256 (15 M rows 1.5 M custkeys, 256 scattered files, blooms)") {
        ParquetIO.writeWithBloomFilters(
          orders100x(spark, shiftCust = true).repartition(256), BloomTable,
          Seq("o_custkey"), expectedNdv = 60000L)
      }
    }
  }

  private def agg(df: DataFrame, label: String): Unit = {
    val r = df.agg(count(lit(1)), sum("o_totalprice")).head()
    println(s"[manifest]   -> $label: n=${r.get(0)} sum=${r.get(1)}")
  }

  private[graft] def run(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    synthesize(spark)

    // ---- range corpus: 2 048 sorted files --------------------------------
    val nFiles = Fs.listFiles(RangeTable)
      .count(_.getPath.getName.endsWith(".parquet"))
    println(s"[manifest] range table: $nFiles data files")

    time(s"build (distributed footer pass, $nFiles files)") {
      StatsManifest.build(spark, RangeTable, Seq("o_orderkey"))
    }

    // a ~0.5% key range (replica 3's orders 1000..75000)
    val (lo, hi) = (30001000L, 30075000L)
    val survivors = time("prune planning wall (one manifest query)") {
      StatsManifest.prune(spark, RangeTable, "o_orderkey", lo, hi)
    }
    println(s"[manifest]   -> ${survivors.size} of $nFiles files survive")

    time("skipped range scan-aggregate") {
      agg(StatsManifest.readSkipping(spark, RangeTable, "o_orderkey", lo, hi),
        "skipped")
    }
    time("UNPRUNED range scan-aggregate (opens every footer)") {
      agg(spark.read.parquet(RangeTable)
        .filter(col("o_orderkey") >= lo && col("o_orderkey") <= hi), "full")
    }

    // refresh ∝ files ADDED: an 8-file ingest against the 2 048-file base
    time("append 8 files + refresh (must be ingest-sized, not table-sized)") {
      spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("o_orderkey", col("o_orderkey") + lit(2000000000L))
        .repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
        .write.mode("append").parquet(RangeTable)
      val m = StatsManifest.refresh(spark, RangeTable, Seq("o_orderkey"))
      println(s"[manifest]   -> manifest now covers " +
        s"${m.select("file").distinct().count()} files")
    }

    // ---- bloom corpus: 256 scattered files, point lookup -----------------
    println(s"[manifest] bloom table: 256 scattered files")
    time("build on bloom256") {
      StatsManifest.build(spark, BloomTable, Seq("o_custkey"))
    }
    val key = 3000071L // replica 3's customer 71: ~10 rows in 15 M
    val rangeStage = time("range stage alone (expected: keeps ~everything)") {
      StatsManifest.prune(spark, BloomTable, "o_custkey", key, key)
    }
    println(s"[manifest]   -> range stage keeps ${rangeStage.size} of 256")
    val bloomStage = time("pruneEquality (distributed bloom probe)") {
      StatsManifest.pruneEquality(spark, BloomTable, "o_custkey", key)
    }
    println(s"[manifest]   -> blooms keep ${bloomStage.size} of ${rangeStage.size}")
    time("point-lookup scan, bloom-pruned files only") {
      agg(StatsManifest.readSkippingEquality(spark, BloomTable, "o_custkey", key),
        "pruned")
    }
    time("point-lookup scan, UNPRUNED") {
      agg(spark.read.parquet(BloomTable).filter(col("o_custkey") === key),
        "full")
    }
    spark.stop()
  }
}
