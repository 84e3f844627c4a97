package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Fs, TxTable}

/**
 * Round-17 TxTable rehearsal (SCALE.md): the size-gated upsert
 * broadcast measured in BOTH regimes, file-level fold-down vs the
 * whole-table checkpoint on a skewed delete, and the change feed — all
 * on the 15 M-row delvec corpus, re-laid out by RANGE on the key so a
 * key-range delete skews to few files (the day-partitioned shape
 * deletes actually have at 100 TB).
 *
 *   - upsert regimes: a 0.1 % CDC batch through the default broadcast
 *     gate and through the forced shuffled fallback; then a 20 %
 *     backfill through BOTH (the regime the `broadcastKeyLimit`
 *     default is protecting against).
 *   - `compactFiles`: tombstone one replica (1 % of rows, resident in
 *     ~one range file), fold ONLY the hot file — wall + bytes vs
 *     `checkpoint`'s whole-table fold.
 *   - `changeFeed` over the full log (create + 5 mutation commits).
 */
object ProfileTxTable17 {

  private val Source = "/tmp/graft_delvec/orders" // ProfileDeleteVectors corpus
  private val Base = "/tmp/graft_txtable17"
  private val Root = s"$Base/t"

  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[txtable17] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  private def dirBytes(path: String): Long =
    if (!Fs.isDirectory(path)) 0L
    else Fs.listFiles(path).map(_.getLen).sum

  private def agg(df: DataFrame): Unit = {
    val r = df.agg(count(lit(1)), sum("o_totalprice")).head()
    println(s"[txtable17]   -> n=${r.get(0)} sum=${r.get(1)}")
  }

  private[graft] def run(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    require(Fs.isDirectory(Source),
      s"run `Profile delvec` first to synthesize $Source")
    Fs.deleteRecursive(new org.apache.hadoop.fs.Path(Base))

    val src = spark.read.parquet(Source)
    time("create (15 M rows, RANGE layout on o_orderkey -> 32 files)") {
      TxTable.create(spark, Root, src.withColumn("version", lit(0L))
        .repartitionByRange(32, col("o_orderkey")))
    }

    def reprice(pred: org.apache.spark.sql.Column, v: Long,
        path: String): DataFrame = {
      src.filter(pred)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        .withColumn("version", lit(v))
        .write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }

    val cdc1 = reprice(col("o_orderkey") % 1000 === 0, 1L, s"$Base/cdc1")
    println(s"[txtable17] CDC batch: ${cdc1.count()} rows (0.1%)")
    time("upsert 0.1% CDC — broadcast regime (default gate)") {
      TxTable.upsert(spark, Root, cdc1, Seq("o_orderkey"), "version")
    }
    val cdc2 = reprice(col("o_orderkey") % 1000 === 0, 2L, s"$Base/cdc2")
    time("upsert 0.1% CDC — FORCED shuffled fallback (limit=0)") {
      TxTable.upsert(spark, Root, cdc2, Seq("o_orderkey"), "version",
        broadcastKeyLimit = 0L)
    }

    val back3 = reprice(col("o_orderkey") % 5 === 0, 3L, s"$Base/back3")
    println(s"[txtable17] backfill batch: ${back3.count()} rows (20%)")
    time("upsert 20% backfill — FORCED broadcast (limit=MaxValue)") {
      TxTable.upsert(spark, Root, back3, Seq("o_orderkey"), "version",
        broadcastKeyLimit = Long.MaxValue)
    }
    val back4 = reprice(col("o_orderkey") % 5 === 0, 4L, s"$Base/back4")
    time("upsert 20% backfill — shuffled fallback (limit=0)") {
      TxTable.upsert(spark, Root, back4, Seq("o_orderkey"), "version",
        broadcastKeyLimit = 0L)
    }

    // one replica's keys (< 10M) live in ~one range file: the skewed
    // delete shape — tombstones via DV, then fold ONLY the hot file
    val dels = src.filter(col("o_orderkey") < 10000000L)
      .withColumn("version", lit(5L)).withColumn("op", lit("d"))
    dels.write.mode("overwrite").parquet(s"$Base/dels")
    val d = spark.read.parquet(s"$Base/dels")
    println(s"[txtable17] tombstones: ${d.count()} rows (one replica, ~1 file)")
    time("tombstone upsert (DV only, no data dir)") {
      TxTable.upsert(spark, Root, d, Seq("o_orderkey"), "version",
        opCol = Some("op"))
    }

    val folded = time("compactFiles (fold ONLY hot files, >=25% dead)") {
      TxTable.compactFiles(spark, Root, minDeadFraction = 0.25,
        targetFileBytes = 64L * 1024 * 1024)
    }
    folded.foreach { k =>
      println(f"[txtable17]   -> commit $k wrote ${dirBytes(s"$Root/data/c$k") / 1024}%d KB data + ${dirBytes(s"$Root/_txn/dv/$k") / 1024}%d KB vectors")
    }
    time("read scan-aggregate after the fold") { agg(TxTable.read(spark, Root)) }

    time("changeFeed over the full log (6 mutation commits, 15 M i-rows)") {
      val f = TxTable.changeFeed(spark, Root, Seq("o_orderkey"))
      val r = f.groupBy("op").count().orderBy("op").collect()
      println(s"[txtable17]   -> ${r.map(x => s"${x.get(0)}=${x.get(1)}").mkString(" ")}")
    }

    val cp = time("checkpoint for comparison (whole-table fold)") {
      TxTable.checkpoint(spark, Root, targetFileBytes = 64L * 1024 * 1024)
    }
    println(f"[txtable17]   -> checkpoint wrote ${dirBytes(s"$Root/data/c$cp") / 1024}%d KB")
    time("final read scan-aggregate (checkpoint only)") {
      TxTable.expire(spark, Root)
      agg(TxTable.read(spark, Root))
    }
    println(s"[txtable17] committed=${TxTable.committedIds(Root)}")
    spark.stop()
  }
}
