package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.DeleteVectors

/**
 * Merge-on-read vs copy-on-write at 100× (round 16, SCALE.md): a 15 M-row
 * 32-file orders table (the bench corpus ×100, same replica recipe as
 * ProfileScale100) takes a 0.1 % keyed erasure. Measures the four walls
 * that decide the operating point:
 *
 *   1. baseline scan-aggregate on the untouched table
 *   2. `deleteWhere` (mark) — matched-rows shuffle + sidecar write only
 *   3. DV-applied scan-aggregate — the standing per-query tax
 *   4. the copy-on-write alternative: filter + full rewrite
 *
 * The 100 TB claim under test: (2) is proportional to MATCHED rows and
 * (3) to file COUNT (one broadcast + an O(1) bit test per row), while
 * (4) is proportional to TABLE size — so merge-on-read wins whenever the
 * dead fraction is small, which is exactly the GDPR-batch / spam-sweep
 * regime. A second overlapping sweep shows epoch OR-composition doesn't
 * compound the read tax.
 */
object ProfileDeleteVectors {

  private val Table = "/tmp/graft_delvec/orders"
  private val Replicas = 100

  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[delvec] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  private def synthesize(spark: SparkSession): Unit = {
    if (!new java.io.File(Table).exists()) {
      val src = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      (0 until Replicas).map { r =>
        src.withColumn("o_orderkey", col("o_orderkey") + lit(r * 10000000L))
      }.reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(Table)
      println(s"[delvec] wrote $Table")
    }
  }

  private def agg(df: DataFrame): Unit = {
    val r = df.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum("o_totalprice").as("s"))
      .orderBy("o_orderstatus").collect()
    println(s"[delvec]   -> ${r.map(x => s"${x.get(0)}:${x.get(1)}").mkString(" ")}")
  }

  private[graft] def run(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // fresh vectors every run: the rehearsal measures the mark, not a
    // pre-existing state
    graft.sources.Fs.deleteRecursive(new org.apache.hadoop.fs.Path(s"$Table/_deletes"))
    synthesize(spark)

    val n = spark.read.parquet(Table).count()
    println(s"[delvec] table: $n rows, " +
      s"${graft.sources.Fs.listFiles(Table).count(_.getPath.getName.endsWith(".parquet"))} files")

    time("baseline scan-aggregate")(agg(spark.read.parquet(Table)))

    val marked = time("deleteWhere 0.1% (o_orderkey % 1000 = 0)") {
      DeleteVectors.deleteWhere(spark, Table, col("o_orderkey") % 1000 === 0)
    }
    println(s"[delvec]   marked $marked rows (${100.0 * marked / n}%)")

    time("DV-applied scan-aggregate (1 epoch)")(agg(DeleteVectors.read(spark, Table)))

    val marked2 = time("overlapping sweep (o_custkey % 997 = 0)") {
      DeleteVectors.deleteWhere(spark, Table, col("o_custkey") % 997 === 0)
    }
    println(s"[delvec]   marked $marked2 more rows")

    time("DV-applied scan-aggregate (2 epochs, OR-composed)") {
      agg(DeleteVectors.read(spark, Table))
    }

    time("deletedCount (vectors only, no scan)") {
      println(s"[delvec]   -> ${DeleteVectors.deletedCount(spark, Table)}")
    }

    time("copy-on-write alternative: full filtered rewrite") {
      spark.read.parquet(Table)
        .filter(!(col("o_orderkey") % 1000 === 0) &&
          !(col("o_custkey") % 997 === 0))
        .repartition(32)
        .write.mode("overwrite").parquet("/tmp/graft_delvec/rewrite")
    }

    time("rewriteDeleted (fold-down at the threshold)") {
      DeleteVectors.rewriteDeleted(spark, Table, "/tmp/graft_delvec/folded",
        targetFileBytes = 32L * 1024 * 1024)
    }
    spark.stop()
  }
}
