package graft

import graft.operators.Materialize
import graft.sources.ParquetIO
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The CDC closure property: replaying `changeFeed(old → new)` through the
  * MERGE sink (upsertWrite with tombstones) must reconstruct `new`
  * exactly — the read side and the write side of the CDC contract are
  * inverses. Plus: incremental aggregate refresh converges to the
  * from-scratch result regardless of how the delta is batched. */
class ChangeFeedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def snapshots = {
    val old = (1L to 200L).map(k => (k, s"p$k", k * 1.5)).toDF("k", "name", "amt")
    val nu = old.filter(col("k") % 10 =!= 1)
      .withColumn("amt", when(col("k") % 10 === 0, col("amt") + 100.0).otherwise(col("amt")))
      .unionByName(old.filter(col("k") % 10 === 2).withColumn("k", col("k") + 1000L))
    (old, nu)
  }

  test("changeFeed classifies i/u/d and drops unchanged keys") {
    val (old, nu) = snapshots
    val feed = ParquetIO.changeFeed(old, nu, Seq("k")).collect()
    val byOp = feed.groupBy(_.getAs[String]("op")).view.mapValues(_.length).toMap
    assert(byOp == Map("i" -> 20, "u" -> 20, "d" -> 20))
    // unchanged keys (%10 in 3..9) never appear
    assert(feed.forall(r => Set(0L, 1L, 2L).contains(r.getLong(0) % 10)))
  }

  test("replaying the feed through the MERGE sink reconstructs the new snapshot") {
    val (old, nu) = snapshots
    val tmp = java.nio.file.Files.createTempDirectory("graft-cf").toString
    val updates = ParquetIO.changeFeed(old, nu, Seq("k"))
      .withColumn("op", when(col("op") === "d", lit("d")).otherwise(lit("u")))
      .withColumn("v", lit(1L))
    ParquetIO.upsertWrite(old.withColumn("v", lit(0L)), updates,
      s"$tmp/out", Seq("k"), "v", parts = 2, opCol = Some("op"))
    val got = spark.read.parquet(s"$tmp/out").drop("v").collect()
      .map(r => (r.getLong(r.fieldIndex("k")), r.getAs[String]("name"),
        r.getAs[Double]("amt"))).toSet
    val want = nu.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == want)
  }

  test("incremental aggregate refresh is batching-independent and exact") {
    val rows = (1L to 300L).map(k => (k % 7, k * 0.25)).toDF("g", "x")
    val scratch = Materialize.incrementalAgg(None, rows, Seq("g"), Seq("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2))).toSet
    // fold the same rows in three unequal batches
    val b = Seq(rows.filter(col("x") < 20), rows.filter(col("x") >= 20 && col("x") < 21),
      rows.filter(col("x") >= 21))
    val folded = b.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
      (st, batch) => Some(Materialize.incrementalAgg(st, batch, Seq("g"), Seq("x")))
    }.get.collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2))).toSet
    assert(folded == scratch)
  }
}
