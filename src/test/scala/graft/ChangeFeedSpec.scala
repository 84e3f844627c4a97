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

  test("withPreimage pairs every u with an up carrying the OLD values") {
    val (old, nu) = snapshots
    val feed = ParquetIO.changeFeed(old, nu, Seq("k"), withPreimage = true)
      .collect()
    val byOp = feed.groupBy(_.getAs[String]("op")).view.mapValues(_.length).toMap
    assert(byOp == Map("i" -> 20, "u" -> 20, "up" -> 20, "d" -> 20))
    // each up row holds the OLD amount for exactly the key its u row
    // repriced: k%10==0 went amt -> amt+100
    val ups = feed.filter(_.getAs[String]("op") == "up")
    assert(ups.forall(r => r.getLong(0) % 10 == 0 &&
      r.getAs[Double]("amt") == r.getLong(0) * 1.5))
    val us = feed.filter(_.getAs[String]("op") == "u")
    assert(us.forall(r => r.getAs[Double]("amt") == r.getLong(0) * 1.5 + 100.0))
  }

  test("incrementalAggCdc folds i/u/up/d into the from-scratch aggregate") {
    val (old, nu) = snapshots
    // state built from the OLD snapshot (insert-only fold) ...
    val st0 = Materialize.incrementalAgg(None,
      old.withColumn("g", col("k") % 10).select(col("g"), col("amt")),
      Seq("g"), Seq("amt"))
    // ... advanced by the preimage feed: updates retract-then-add,
    // deletes retract, inserts add
    val feed = ParquetIO.changeFeed(old, nu, Seq("k"), withPreimage = true)
      .withColumn("g", col("k") % 10).select(col("g"), col("op"), col("amt"))
    val got = Materialize.incrementalAggCdc(Some(st0), feed, Seq("g"), Seq("amt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2))).toSet
    val want = Materialize.incrementalAgg(None,
      nu.withColumn("g", col("k") % 10).select(col("g"), col("amt")),
      Seq("g"), Seq("amt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2))).toSet
    assert(got == want, "CDC-advanced state must equal the from-scratch aggregate")
    // total-retraction drop-out rides the same fixture: group 1 lost all
    // 20 members (every k%10==1 deleted), so it must VANISH from the
    // state exactly as it is absent from the from-scratch aggregate
    assert(!got.exists(_._1 == 1L),
      "a fully-retracted key must drop out of the state, not linger at n=0")
  }

  test("incrementalAggCdc is batching-independent across cursor chunks") {
    val (old, nu) = snapshots
    val feed = ParquetIO.changeFeed(old, nu, Seq("k"), withPreimage = true)
      .withColumn("g", col("k") % 10).select(col("g"), col("op"), col("amt"), col("k"))
    val oneShot = Materialize.incrementalAggCdc(None,
      feed.drop("k"), Seq("g"), Seq("amt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2))).toSet
    // same feed in three unequal chunks — ONLY key-complete chunks are a
    // valid cursor split (a u separated from its up is a torn update),
    // so chunk by key ranges
    val chunks = Seq(feed.filter(col("k") <= 70),
      feed.filter(col("k") > 70 && col("k") <= 140), feed.filter(col("k") > 140))
    val folded = chunks.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
      (st, c) => Some(Materialize.incrementalAggCdc(st, c.drop("k"), Seq("g"), Seq("amt")))
    }.get.collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2))).toSet
    assert(folded == oneShot)
  }

  test("incrementalAggCdc raises on an op code outside i/u/up/d") {
    val bad = Seq((1L, "x", 2.5)).toDF("g", "op", "amt")
    val ex = intercept[Exception] {
      Materialize.incrementalAggCdc(None, bad, Seq("g"), Seq("amt")).collect()
    }
    assert(ex.getMessage != null)
  }
}
