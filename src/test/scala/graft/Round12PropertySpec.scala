package graft

import graft.operators.{Bpe, Expectations, Materialize}
import graft.sources.ParquetIO
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property coverage for the round-12 operators, on randomized inputs:
 *
 *  - CDC closure: for ARBITRARY mutation sets (random deletes, updates,
 *    inserts), replaying changeFeed(old → new) through the MERGE sink
 *    reconstructs `new` exactly — the deterministic ChangeFeedSpec case
 *    generalized.
 *  - MV refresh: incrementalAgg over ANY random batching of the rows
 *    equals the from-scratch aggregate (merge-order independence is what
 *    makes a standing pipeline trustworthy).
 *  - BPE determinism: the learned merge table is invariant under input
 *    partitioning (distributed argmax must not depend on row order).
 *  - Expectations: per-rule violation counts equal direct filter counts
 *    for random thresholds.
 */
class Round12PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("CDC closure holds for arbitrary mutation sets") {
    val genMutation = for {
      n <- Gen.chooseNum(40, 120)
      dels <- Gen.someOf(1L to n)
      upds <- Gen.someOf(1L to n)
      nIns <- Gen.chooseNum(0, 30)
    } yield (n.toLong, dels.toSet, upds.toSet, nIns)
    for (seed <- 1L to 3L) {
      val (n, dels, upds, nIns) = sample(genMutation, seed)
      val old = (1L to n).map(k => (k, s"v$k", k * 2.0)).toDF("k", "name", "amt")
      val nu = old.filter(!col("k").isInCollection(if (dels.isEmpty) Set(-1L) else dels))
        .withColumn("amt",
          when(col("k").isInCollection(if (upds.isEmpty) Set(-1L) else upds),
            col("amt") + 7.5).otherwise(col("amt")))
        .unionByName((1 to nIns).map(i => (n + i, s"new$i", i * 3.0))
          .toDF("k", "name", "amt"))
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-p12-$seed").toString
      val updates = ParquetIO.changeFeed(old, nu, Seq("k"))
        .withColumn("op", when(col("op") === "d", lit("d")).otherwise(lit("u")))
        .withColumn("v", lit(1L))
      ParquetIO.upsertWrite(old.withColumn("v", lit(0L)), updates,
        s"$tmp/out", Seq("k"), "v", parts = 2, opCol = Some("op"))
      val got = spark.read.parquet(s"$tmp/out").select("k", "name", "amt")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      val want = nu.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(got == want, s"seed=$seed dels=${dels.size} upds=${upds.size} ins=$nIns")
    }
  }

  test("incremental aggregate equals from-scratch under random batching") {
    val rows = (1L to 500L).map(k => (k % 13, (k % 97) * 0.5)).toDF("g", "x")
    val scratch = Materialize.incrementalAgg(None, rows, Seq("g"), Seq("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2))).toSet
    for (seed <- 1L to 3L) {
      val cuts = sample(Gen.listOfN(3, Gen.chooseNum(1, 96)), seed).distinct.sorted
      val bounds = (0 +: cuts :+ 97).distinct.sorted
      val batches = bounds.sliding(2).map { case Seq(lo, hi) =>
        rows.filter(col("x") >= lo * 0.5 && col("x") < hi * 0.5)
      }.toSeq
      val folded = batches.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
        (st, b) => Some(Materialize.incrementalAgg(st, b, Seq("g"), Seq("x")))
      }.get.collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2))).toSet
      assert(folded == scratch, s"seed=$seed bounds=$bounds")
    }
  }

  test("BPE merge table is invariant under input partitioning") {
    val words = Seq.fill(4)("low") ++ Seq.fill(3)("lower") ++
      Seq.fill(5)("newest") ++ Seq.fill(2)("widest") ++ Seq.fill(3)("newer")
    val docs = words.grouped(3).map(_.mkString(" ")).toSeq.toDF("text")
    val m1 = Bpe.learnMerges(docs.repartition(1), "text", numMerges = 6)
    val m7 = Bpe.learnMerges(docs.repartition(7), "text", numMerges = 6)
    assert(m1 == m7)
    assert(m1.size == 6)
  }

  test("quarantine partitions the batch consistently with the report") {
    val df = (1L to 200L).map(k => (k, if (k % 7 == 0) -1.0 else k * 1.0)).toDF("k", "x")
    val rules = Seq(
      Expectations.Rule("x_positive", col("x") > 0.0),
      Expectations.Rule("k_below_190", col("k") < 190L))
    val (good, bad) = Expectations.quarantine(df, rules)
    assert(good.count() + bad.count() == df.count())
    // good satisfies every rule; bad violates at least one
    assert(good.filter(!(col("x") > 0.0) || !(col("k") < 190L)).count() == 0)
    assert(bad.filter(col("x") > 0.0 && col("k") < 190L).count() == 0)
    // the report's per-rule counts bound the quarantine size
    val report = Expectations.check(df, rules).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(bad.count() <= report.values.sum && bad.count() >= report.values.max)
  }

  test("expectations violation counts equal direct filter counts") {
    val df = (1L to 300L).map(k => (k, k * 1.5)).toDF("k", "x")
    for (seed <- 1L to 3L) {
      val cut = sample(Gen.chooseNum(0, 500), seed).toDouble
      val report = Expectations.check(df, Seq(
        Expectations.Rule("above", col("x") > cut),
        Expectations.Rule("even", col("k") % 2 === 0)))
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(report("above") == df.filter(!(col("x") > cut)).count(), s"cut=$cut")
      assert(report("even") == df.filter(col("k") % 2 =!= 0).count())
    }
  }
}
