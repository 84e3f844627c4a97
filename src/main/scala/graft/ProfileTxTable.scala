package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Fs, ParquetIO, TxTable}

/**
 * Transactional MOR MERGE vs copy-on-write MERGE at 100× (round 16,
 * SCALE.md): a 15 M-row orders table (the delvec replica corpus) takes
 * a 0.1 % CDC reprice batch through BOTH merge paths:
 *
 *   - `TxTable.upsert` — one snapshot scan + batch-sized winner/DV
 *     work; the commit writes the 15 k winners + a KB DV sidecar.
 *   - `ParquetIO.upsert` — the same semantics, but the surviving
 *     generation is REWRITTEN whole.
 *
 * The walls matter less than the WRITE VOLUME (printed): at 100 TB and
 * 0.1 % batches the CoW path writes ~1000× the bytes per batch. Also
 * measured: the standing read tax after the commit (one DV broadcast),
 * `checkpoint` (the deliberate fold — pays the rewrite ONCE to bound
 * the tail), `expire`, and a post-checkpoint upsert proving the tail
 * composes.
 */
object ProfileTxTable {

  private val Source = "/tmp/graft_delvec/orders" // ProfileDeleteVectors corpus
  private val Root = "/tmp/graft_txtable/t"

  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[txtable] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  private def dirBytes(path: String): Long =
    if (!Fs.isDirectory(path)) 0L
    else Fs.listFiles(path).map(_.getLen).sum

  private def agg(df: DataFrame): Unit = {
    val r = df.agg(count(lit(1)), sum("o_totalprice")).head()
    println(s"[txtable]   -> n=${r.get(0)} sum=${r.get(1)}")
  }

  private[graft] def run(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    require(Fs.isDirectory(Source),
      s"run `Profile delvec` first to synthesize $Source")
    Fs.deleteRecursive(new org.apache.hadoop.fs.Path("/tmp/graft_txtable"))

    val src = spark.read.parquet(Source)
    time("create (15 M rows -> c0)") {
      TxTable.create(spark, Root, src.withColumn("version", lit(0L)))
    }

    val batch = src.filter(col("o_orderkey") % 1000 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .withColumn("version", lit(1L))
    batch.write.mode("overwrite").parquet("/tmp/graft_txtable/batch")
    val b = spark.read.parquet("/tmp/graft_txtable/batch")
    println(s"[txtable] batch: ${b.count()} rows (0.1%)")

    val k = time("MOR upsert (mark + append, one snapshot scan)") {
      TxTable.upsert(spark, Root, b, Seq("o_orderkey"), "version")
    }
    println(f"[txtable]   -> commit $k wrote ${dirBytes(s"$Root/data/c$k") / 1024}%d KB data + ${dirBytes(s"$Root/_txn/dv/$k") / 1024}%d KB vectors")

    time("read scan-aggregate after the MOR commit (standing tax)") {
      agg(TxTable.read(spark, Root))
    }

    time("copy-on-write alternative: ParquetIO.upsert (generation rewrite)") {
      ParquetIO.upsert(spark, Seq(s"$Root/data/c0"),
        Seq("/tmp/graft_txtable/batch"), "/tmp/graft_txtable/cow",
        Seq("o_orderkey"), "version",
        targetFileBytes = 64L * 1024 * 1024)
    }
    println(f"[txtable]   -> CoW wrote ${dirBytes("/tmp/graft_txtable/cow") / 1024}%d KB")

    val cp = time("checkpoint (the fold, paid once by choice)") {
      TxTable.checkpoint(spark, Root, targetFileBytes = 64L * 1024 * 1024)
    }
    time("expire (history below the checkpoint)") {
      println(s"[txtable]   -> expired ${TxTable.expire(spark, Root)}")
    }
    time("read scan-aggregate after checkpoint+expire") {
      agg(TxTable.read(spark, Root))
    }

    time("post-checkpoint upsert (the tail composes)") {
      TxTable.upsert(spark, Root,
        b.withColumn("version", lit(2L))
          .withColumn("o_totalprice", col("o_totalprice") + 1.0),
        Seq("o_orderkey"), "version")
    }
    time("final read scan-aggregate (checkpoint + 1 tail commit)") {
      agg(TxTable.read(spark, Root))
    }
    println(s"[txtable] committed=${TxTable.committedIds(Root)} checkpoint=$cp")
    spark.stop()
  }
}
