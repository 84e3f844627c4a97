package graft

import graft.sources.TxTable
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/**
 * Round-20 SQL maintenance surface: `CALL graft.system.<proc>(…)` on
 * [[graft.sources.txtable.GraftCatalog]] routes to the SAME library
 * entry points the Scala surface uses — these specs pin that the CALL
 * has the library's effect (real checkpoint markers, real expiry, real
 * cursors), that receipts come back as rows, and that persisted layout
 * shapes SQL-triggered maintenance exactly like library-triggered.
 */
class TxProceduresSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def tmp(): String = Files.createTempDirectory("graft-txproc").toString

  private def base(n: Int = 200) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"cat${i % 4}", 100.0 + i, 0L))
      .toDF("id", "cat", "price", "version")
  }

  private def upsert(root: String, ids: Seq[Long], v: Long,
      parts: Seq[String] = Seq.empty): Unit = {
    import spark.implicits._
    TxTable.upsert(spark, root,
      ids.map(i => (i, s"cat${i % 4}", 1000.0 * v + i, v))
        .toDF("id", "cat", "price", "version"),
      Seq("id"), "version", partitionCols = parts)
  }

  private def withCatalog[A](name: String)(f: String => A): A = {
    val wh = tmp()
    spark.conf.set(s"spark.sql.catalog.$name",
      "graft.sources.txtable.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    try f(wh)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$name")
      spark.conf.unset(s"spark.sql.catalog.$name.warehouse")
    }
  }

  test("CALL checkpoint folds the snapshot; expire trims below it; reads unchanged") {
    withCatalog("gp1") { wh =>
      val root = s"$wh/t"
      TxTable.create(spark, root, base())
      upsert(root, Seq(1L, 2L), 1L)
      upsert(root, Seq(3L, 4L), 2L)
      val before = spark.sql("SELECT * FROM gp1.t").collect().toSet
      // named-argument CALL returns the folded commit id
      val ck = spark.sql("CALL gp1.system.checkpoint(table => 't')").collect()
      assert(ck.length === 1)
      val k = ck.head.getLong(0)
      assert(TxTable.checkpointIds(root).contains(k),
        s"the receipt's commit $k must be a REAL checkpoint marker")
      // positional CALL; receipt lists the expired ids
      val ex = spark.sql("CALL gp1.system.expire('t')").head
      assert(ex.getLong(0) === 3L, s"commits 0,1,2 fold below checkpoint $k")
      assert(ex.getString(1) === "0,1,2")
      assert(TxTable.committedIds(root) === Seq(k),
        "expire leaves exactly the checkpoint")
      assert(spark.sql("SELECT * FROM gp1.t").collect().toSet === before,
        "maintenance must never change the answer")
    }
  }

  test("CALL compact: null receipt when nothing qualifies, real commit when DVs accrue") {
    withCatalog("gp2") { wh =>
      val root = s"$wh/t"
      TxTable.create(spark, root, base(100))
      val clean = spark.sql(
        "CALL gp2.system.compact('t', min_dead_fraction => 0.99)").head
      assert(clean.isNullAt(0), "a clean table has nothing to compact")
      // kill most of the base file's rows → dead fraction over any threshold
      upsert(root, (0L until 90L), 1L)
      val hit = spark.sql(
        "CALL gp2.system.compact('t', min_dead_fraction => 0.5)").head
      assert(!hit.isNullAt(0), "90% dead must qualify at threshold 0.5")
      assert(TxTable.committedIds(root).contains(hit.getLong(0)))
      assert(spark.sql("SELECT count(*) AS n FROM gp2.t").head.getLong(0) === 100L)
      assert(spark.sql("SELECT sum(CASE WHEN version = 1 THEN 1 ELSE 0 END) AS n FROM gp2.t")
        .head.getLong(0) === 90L, "compaction keeps the LATEST versions")
    }
  }

  test("CALL maintain ticks like the library; vacuum receipt counts swept paths") {
    withCatalog("gp3") { wh =>
      val root = s"$wh/t"
      TxTable.create(spark, root, base(100))
      upsert(root, Seq(5L), 1L)
      upsert(root, Seq(6L), 2L)
      val acts = spark.sql(
        "CALL gp3.system.maintain('t', max_tail => 2, grace_ms => 0)")
        .collect().map(_.getString(0))
      assert(acts.exists(_.contains("checkpoint")),
        s"tail 3 > max_tail 2 must checkpoint: ${acts.toSeq}")
      assert(spark.sql("SELECT count(*) AS n FROM gp3.t").head.getLong(0) === 100L)
      assert(spark.sql("CALL gp3.system.vacuum('t', grace_ms => 0)")
        .head.getLong(0) === 0L, "nothing crashed — nothing swept")
    }
  }

  test("CALL register_cursor floors expire at the consumer's position") {
    withCatalog("gp4") { wh =>
      val root = s"$wh/t"
      TxTable.create(spark, root, base(100))
      upsert(root, Seq(1L), 1L)
      upsert(root, Seq(2L), 2L)
      val rc = spark.sql(
        "CALL gp4.system.register_cursor('t', 'nightly_sync', 1)").head
      assert((rc.getString(0), rc.getLong(1)) === ("nightly_sync", 1L))
      // the cursor is visible through the metadata table …
      val cur = spark.sql("SELECT * FROM gp4.`t$cursors`").collect()
      assert(cur.map(r => (r.getString(0), r.getLong(1))).toSet
        === Set(("nightly_sync", 1L)))
      // … and a checkpoint+expire keeps the consumer's unapplied range
      spark.sql("CALL gp4.system.checkpoint('t')")
      spark.sql("CALL gp4.system.expire('t')")
      assert(TxTable.committedIds(root).min <= 1L,
        "expire must not delete commits a registered cursor still needs")
      assert(spark.sql("SELECT count(*) AS n FROM gp4.t").head.getLong(0) === 100L)
    }
  }

  test("persisted layout shapes CALL checkpoint output; SHOW/DESCRIBE/unknown routes") {
    withCatalog("gp5") { wh =>
      base(200).createOrReplaceTempView("gp5_src")
      spark.sql(
        """CREATE TABLE gp5.t TBLPROPERTIES ('partitionCols'='cat')
           AS SELECT * FROM gp5_src""")
      upsert(s"$wh/t", Seq(1L, 2L), 1L, parts = Seq("cat"))
      val k = spark.sql("CALL gp5.system.checkpoint('t')").head.getLong(0)
      val dirs = new java.io.File(s"$wh/t/data/c$k").listFiles()
      assert(dirs != null && dirs.exists(_.getName.startsWith("cat=")),
        "SQL-triggered checkpoint must honor the persisted hive layout")
      assert(spark.sql("SELECT count(*) AS n FROM gp5.t").head.getLong(0) === 200L)
      // discovery surface
      val shown = spark.sql("SHOW PROCEDURES IN gp5.system")
      val nameCol = shown.schema.fieldNames
        .find(_.toLowerCase.contains("procedure"))
        .getOrElse(shown.schema.fieldNames.last)
      val procs = shown.collect().map(_.getAs[String](nameCol)).toSet
      assert(procs === Set("checkpoint", "expire", "compact", "maintain",
        "vacuum", "register_cursor"), s"got $procs")
      assert(spark.sql("DESCRIBE PROCEDURE gp5.system.checkpoint")
        .collect().mkString.contains("checkpoint"))
      // loud miss names the namespace and the inventory (Spark wraps
      // loadProcedure failures as FAILED_TO_LOAD_ROUTINE — the
      // inventory rides the cause)
      val miss = intercept[Exception] {
        spark.sql("CALL gp5.system.optimize('t')").collect()
      }
      val chain = Iterator.iterate[Throwable](miss)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
      assert(chain.contains("register_cursor"),
        s"the miss must list the real procedures: $chain")
      // a procedure on a missing table fails like a read would
      val noTable = intercept[Exception] {
        spark.sql("CALL gp5.system.checkpoint('nope')").collect()
      }
      assert(noTable.getMessage.toLowerCase.contains("nope"))
    }
  }
}
