package graft

import graft.operators.Materialize
import graft.sources.TxTable
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property gate for the round-18 CDC-retraction chain: on ARBITRARY
 * mutation sequences — random updates, deletes (including of keys that
 * never existed — empty commits), re-inserts, across random commit
 * batching — the change-feed-maintained COUNT/SUM state
 * (`incrementalAggCdc` over `changeFeed(withPreimage = true)`, folded
 * in random cursor chunks) must equal the from-scratch aggregate of
 * the live table. Random sequences are where a retraction bug hides:
 * a key updated twice then deleted, a delete-then-reinsert at a later
 * version, a group that fully drains and must vanish.
 */
class CdcPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private case class Op(key: Long, value: Double, op: String)

  /** One commit's batch: at most one op per key (the in-batch race is
    * TxTableSpec's subject; here versions are the batch index, so a
    * duplicate key at one version would tie nondeterministically). */
  private def genBatch(seed: Long): List[Op] = {
    val gen = for {
      n <- Gen.chooseNum(3, 12)
      ops <- Gen.listOfN(n, for {
        key <- Gen.chooseNum(0L, 14L) // overlaps the 10-key base + misses
        value <- Gen.chooseNum(1, 999).map(_ * 0.25)
        op <- Gen.frequency(7 -> Gen.const("u"), 3 -> Gen.const("d"))
      } yield Op(key, value, op))
    } yield ops.groupBy(_.key).map(_._2.head).toList
    gen(Gen.Parameters.default, Seed(seed)).get
  }

  test("feed-maintained state == from-scratch aggregate on random mutation sequences") {
    (1 to 5).foreach { trial =>
      val t = java.nio.file.Files.createTempDirectory("graft-cdcprop").toString + "/t"
      val base = (0L until 10L).map(k => (k, k % 3, k * 1.0, 0L))
        .toDF("key", "grp", "value", "version")
      TxTable.create(spark, t, base)
      val nBatches = 2 + trial % 3
      (1 to nBatches).foreach { b =>
        val ops = genBatch(trial * 1000L + b)
        TxTable.upsert(spark, t,
          ops.map(o => (o.key, o.key % 3, o.value, b.toLong, o.op))
            .toDF("key", "grp", "value", "version", "op"),
          Seq("key"), "version", opCol = Some("op"))
      }
      // from-scratch truth over the live table
      val want = Materialize.incrementalAgg(None,
        TxTable.read(spark, t).select(col("grp"), col("value")),
        Seq("grp"), Seq("value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2))).toSet
      // feed-maintained state, folded in random commit chunks (the
      // cursor shape: every chunk is a consecutive commit range)
      val tip = TxTable.committedIds(t).max
      val cutGen = Gen.someOf(1L to tip)
      val cuts = cutGen(Gen.Parameters.default, Seed(trial * 77L)).get
        .toList.sorted
      val bounds = (0L +: cuts :+ tip).distinct.sorted
      val chunks = bounds.zip(bounds.tail).map { case (lo, hi) =>
        TxTable.changeFeed(spark, t, Seq("key"), fromCommit = lo + 1,
          withPreimage = true, toCommit = hi)
          .select(col("grp"), col("op"), col("value"))
      } :+ TxTable.changeFeed(spark, t, Seq("key"),
        fromCommit = 0, withPreimage = true, toCommit = 0)
        .select(col("grp"), col("op"), col("value")) // the create chunk
      val got = chunks.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
        (st, c) => Some(Materialize.incrementalAggCdc(st, c, Seq("grp"), Seq("value")))
      }.get.collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2))).toSet
      assert(got === want,
        s"trial $trial (batches=$nBatches, cuts=$cuts): state diverged from scratch")
    }
  }

  test("partitioned and flat tables agree on random mutation sequences") {
    (1 to 4).foreach { trial =>
      val dir = java.nio.file.Files.createTempDirectory("graft-cdcpart").toString
      val tFlat = s"$dir/flat"
      val tPart = s"$dir/part"
      val base = (0L until 10L).map(k => (k, k % 3, k * 1.0, 0L))
        .toDF("key", "grp", "value", "version")
      TxTable.create(spark, tFlat, base)
      TxTable.create(spark, tPart, base, partitionCols = Seq("grp"))
      val nBatches = 2 + trial % 3
      (1 to nBatches).foreach { b =>
        val ops = genBatch(trial * 5000L + b)
        val batch = ops.map(o => (o.key, o.key % 3, o.value, b.toLong, o.op))
          .toDF("key", "grp", "value", "version", "op")
        TxTable.upsert(spark, tFlat, batch, Seq("key"), "version",
          opCol = Some("op"))
        TxTable.upsert(spark, tPart, batch, Seq("key"), "version",
          opCol = Some("op"), partitionCols = Seq("grp"))
      }
      // grp comes back through partition-value INFERENCE on the hive
      // layout (INT for small ints — the documented hive-layout type
      // caveat), so values compare through an explicit cast
      def rows(t: String) = TxTable.read(spark, t)
        .select(col("key"), col("grp").cast("long").as("grp"),
          col("value"), col("version")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
      assert(rows(tPart) === rows(tFlat),
        s"trial $trial: partitioned layout diverged from flat")
      // and the two FEEDS carry identical changes
      def feed(t: String) = TxTable.changeFeed(spark, t, Seq("key"),
        fromCommit = 1, withPreimage = true)
        .select("key", "op", "value", "commit").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
        .toSet
      assert(feed(tPart) === feed(tFlat),
        s"trial $trial: partitioned feed diverged from flat")
    }
  }
}
