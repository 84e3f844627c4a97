package graft

import graft.sources.TxTable
import graft.sources.txtable.TxSql
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/**
 * Round-19 user surface: the DSv2 read (`format("txtable")`, time travel
 * via `option("asOf", k)`, the `graft` catalog with `VERSION AS OF`) and
 * SQL-callable DML (`TxSql.exec` routing MERGE/DELETE/UPDATE to the
 * library). The architecture under test is the REWRITE: the V2 relation
 * must analyze into the SAME plan `TxTable.readAt` builds, so the specs
 * pin plan posture (PartitionFilters / PushedFilters on the DSv2 read)
 * as much as values.
 */
class TxSqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def tmp(): String = Files.createTempDirectory("graft-txsql").toString

  private def base(n: Int = 200) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"cat${i % 4}", 100.0 + i, 0L))
      .toDF("id", "cat", "price", "version")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "cat", "price").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("format(txtable): load == TxTable.read; asOf == readAt") {
    import spark.implicits._
    val t = tmp() + "/t"
    TxTable.create(spark, t, base())
    TxTable.upsert(spark, t,
      Seq((7L, "cat3", 7777.0, 1L)).toDF("id", "cat", "price", "version"),
      Seq("id"), "version")
    val v2 = spark.read.format("txtable").load(t)
    assert(rows(v2) === rows(TxTable.read(spark, t)))
    assert(v2.filter(col("id") === 7L).head.getAs[Double]("price") === 7777.0)
    // time travel: the pre-upsert snapshot
    val v0 = spark.read.format("txtable").option("asOf", "0").load(t)
    assert(rows(v0) === rows(TxTable.readAt(spark, t, 0L)))
    assert(v0.filter(col("id") === 7L).head.getAs[Double]("price") === 107.0)
    // SQL over a temp view of the DSv2 read
    v2.createOrReplaceTempView("txsql_v2_view")
    assert(spark.sql(
      "SELECT count(*) AS n FROM txsql_v2_view WHERE cat = 'cat2'")
      .head.getLong(0) === 50L)
  }

  test("the DSv2 read carries PartitionFilters and PushedFilters like TxTable.read") {
    import spark.implicits._
    val t = tmp() + "/t"
    TxTable.create(spark, t, base(), partitionCols = Seq("cat"))
    TxTable.upsert(spark, t,
      Seq((2L, "cat2", 9999.0, 1L)).toDF("id", "cat", "price", "version"),
      Seq("id"), "version", partitionCols = Seq("cat"))
    val q = spark.read.format("txtable").load(t)
      .filter(col("cat") === "cat2" && col("price") > 0.0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cat2"),
      s"the partition predicate must prune through the DSv2 read:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(price"),
      s"the data predicate must push into the parquet scan:\n$plan")
    assert(q.count() === 50L)
    assert(q.filter(col("id") === 2L).head.getAs[Double]("price") === 9999.0)
    // and the scan reads ONLY the matching partition directories
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val parts = scans(q.queryExecution.executedPlan)
      .flatMap(_.selectedPartitions.toPartitionArray.map(_.toPath.toString))
      .filterNot(_.contains("/_txn/dv/")) // the DV sidecar is its own tiny scan
    assert(parts.nonEmpty && parts.forall(_.contains("cat=cat2")),
      s"only cat=cat2 directories may be admitted: $parts")
  }

  test("graft catalog: SQL SELECT, SHOW TABLES, VERSION AS OF, drop") {
    import spark.implicits._
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.graft_test",
      "graft.sources.txtable.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_test.warehouse", wh)
    TxTable.create(spark, s"$wh/orders_t", base())
    TxTable.upsert(spark, s"$wh/orders_t",
      Seq((7L, "cat3", 7777.0, 1L)).toDF("id", "cat", "price", "version"),
      Seq("id"), "version")
    assert(spark.sql("SHOW TABLES IN graft_test").collect()
      .map(_.getString(1)).toSet === Set("orders_t"))
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft_test.orders_t WHERE cat = 'cat1'")
      .head.getLong(0) === 50L)
    assert(spark.sql(
      "SELECT price FROM graft_test.orders_t WHERE id = 7")
      .head.getDouble(0) === 7777.0)
    // time travel through SQL
    assert(spark.sql(
      "SELECT price FROM graft_test.orders_t VERSION AS OF 0 WHERE id = 7")
      .head.getDouble(0) === 107.0)
    // a timestamp predating the whole retained history is a loud error
    // (serving the oldest snapshot instead would silently misdate it)
    val ex = intercept[Exception] {
      spark.sql("SELECT * FROM graft_test.orders_t TIMESTAMP AS OF '2026-01-01'")
        .collect()
    }
    assert(ex.getMessage.contains("predates"),
      s"pre-history timestamp travel must fail loudly: ${ex.getMessage}")
    // plain DROP refuses committed history (round 20) — one SQL verb
    // must not irrevocably delete data AND history; PURGE is the
    // explicit escape hatch
    val drop = intercept[Exception] {
      spark.sql("DROP TABLE graft_test.orders_t")
    }
    assert(drop.getMessage.contains("PURGE"),
      s"plain DROP must route to the purge escape hatch: ${drop.getMessage}")
    assert(spark.sql("SHOW TABLES IN graft_test").count() === 1L,
      "the refused DROP must leave the table intact")
    assert(spark.sql("DROP TABLE graft_test.orders_t PURGE").collect().isEmpty)
    assert(spark.sql("SHOW TABLES IN graft_test").count() === 0L)
  }

  test("CREATE TABLE AS SELECT through the catalog honors layout knobs (round 20)") {
    import spark.implicits._
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.graft_ctas",
      "graft.sources.txtable.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_ctas.warehouse", wh)
    try {
      base(200).createOrReplaceTempView("ctas_src")
      spark.sql(
        """CREATE TABLE graft_ctas.t1
           TBLPROPERTIES ('partitionCols'='cat', 'bloomCols'='id')
           AS SELECT * FROM ctas_src""")
      val root = s"$wh/t1"
      // the CTAS result IS the source
      assert(rows(spark.sql("SELECT * FROM graft_ctas.t1").toDF())
        === rows(base(200)))
      assert(rows(TxTable.read(spark, root)) === rows(base(200)),
        "the library read agrees — one table, two surfaces")
      // layout knobs honored: the DATA commit (c1; c0 is the empty
      // schema-bearing create) lays out hive-style per cat value
      val dataDirs = new java.io.File(s"$root/data/c1").listFiles()
      assert(dataDirs != null && dataDirs.exists(_.getName.startsWith("cat=")),
        s"CTAS data commit must be hive-partitioned: ${Option(dataDirs).toSeq.flatten.map(_.getName)}")
      // declared layout persists: a later SQL INSERT also lands partitioned
      spark.sql("INSERT INTO graft_ctas.t1 SELECT id + 1000, cat, price, version FROM ctas_src")
      assert(spark.sql("SELECT count(*) AS n FROM graft_ctas.t1").head.getLong(0) === 400L)
      val insDirs = new java.io.File(s"$root/data/c2").listFiles()
      assert(insDirs != null && insDirs.exists(_.getName.startsWith("cat=")),
        "the CREATE-time layout must shape later INSERTs too")
      // partition pruning reaches the SQL read
      val pruned = spark.sql("SELECT * FROM graft_ctas.t1 WHERE cat = 'cat2'")
      assert(pruned.count() === 100L)
      assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters: [isnotnull(cat"),
        "the declared partitioning must prune SQL reads")
      // bare CREATE TABLE: an empty, readable table in the declared schema
      spark.sql(
        "CREATE TABLE graft_ctas.t2 (k BIGINT, v STRING) PARTITIONED BY (v)")
      assert(spark.sql("SELECT * FROM graft_ctas.t2").count() === 0L)
      assert(spark.table("graft_ctas.t2").schema.fieldNames.toSeq === Seq("k", "v"))
      spark.sql("INSERT INTO graft_ctas.t2 VALUES (1, 'a'), (2, 'b')")
      assert(spark.sql("SELECT sum(k) AS s FROM graft_ctas.t2").head.getLong(0) === 3L)
      // duplicate create refuses
      val dup = intercept[Exception] {
        spark.sql("CREATE TABLE graft_ctas.t2 (k BIGINT) ")
      }
      assert(dup.getMessage.toLowerCase.contains("already exists"))
    } finally {
      spark.conf.unset("spark.sql.catalog.graft_ctas")
      spark.conf.unset("spark.sql.catalog.graft_ctas.warehouse")
    }
  }

  test("one snapshot derivation serves inferSchema AND the rewrite; self-join safe") {
    import spark.implicits._
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.graft_pc",
      "graft.sources.txtable.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_pc.warehouse", wh)
    try {
      val root = s"$wh/pc_t"
      TxTable.create(spark, root, base(100))
      val before = graft.sources.txtable.TxTableSource.snapshotDerivations.get()
      // two SELECTs at the same tip: ONE derivation total (schema +
      // analyzed plan from the same cache entry — the round-19 verdict's
      // double-construction tax)
      assert(spark.sql("SELECT count(*) AS n FROM graft_pc.pc_t").head.getLong(0) === 100L)
      assert(spark.sql("SELECT sum(id) AS s FROM graft_pc.pc_t WHERE cat = 'cat1'")
        .head.getLong(0) > 0L)
      val after = graft.sources.txtable.TxTableSource.snapshotDerivations.get()
      assert(after - before === 1L,
        s"expected ONE snapshot derivation for two same-tip SELECTs, got ${after - before}")
      // the cached analyzed plan must survive SELF-JOIN reuse (Spark's
      // DeduplicateRelations re-instances the duplicated leaves)
      val sj = spark.sql(
        """SELECT count(*) AS n FROM graft_pc.pc_t a
           JOIN graft_pc.pc_t b ON a.id = b.id
           WHERE a.cat = 'cat2' AND b.price > 0""")
      assert(sj.head.getLong(0) === 25L, "self-join over the cached plan")
      // a commit moves the tip → exactly one fresh derivation
      TxTable.upsert(spark, root,
        Seq((7L, "cat3", 7777.0, 1L)).toDF("id", "cat", "price", "version"),
        Seq("id"), "version")
      assert(spark.sql("SELECT price FROM graft_pc.pc_t WHERE id = 7")
        .head.getDouble(0) === 7777.0)
      val third = graft.sources.txtable.TxTableSource.snapshotDerivations.get()
      assert(third - after === 1L,
        s"a new tip must cost exactly one derivation, got ${third - after}")
    } finally {
      spark.conf.unset("spark.sql.catalog.graft_pc")
      spark.conf.unset("spark.sql.catalog.graft_pc.warehouse")
    }
  }

  test("drop + recreate at the same tip is never served the stale schema") {
    import spark.implicits._
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.graft_rc",
      "graft.sources.txtable.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_rc.warehouse", wh)
    try {
      val root = s"$wh/rc_t"
      TxTable.create(spark, root, base(10))  // schema: id,cat,price,version
      assert(spark.sql("SELECT * FROM graft_rc.rc_t").columns.toSeq
        === Seq("id", "cat", "price", "version"))
      spark.sql("DROP TABLE graft_rc.rc_t PURGE")
      // recreate with a DIFFERENT schema at the same (root, tip=0)
      TxTable.create(spark, root,
        Seq((1L, "x")).toDF("k", "name"))
      assert(spark.sql("SELECT * FROM graft_rc.rc_t").columns.toSeq
        === Seq("k", "name"),
        "the post-recreate SELECT must see the NEW schema (identity-keyed cache)")
    } finally {
      spark.conf.unset("spark.sql.catalog.graft_rc")
      spark.conf.unset("spark.sql.catalog.graft_rc.warehouse")
    }
  }

  test("TIMESTAMP AS OF resolves via stamped commit wall-clocks (round 20)") {
    import spark.implicits._
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.graft_ts",
      "graft.sources.txtable.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_ts.warehouse", wh)
    try {
      val root = s"$wh/ts_t"
      TxTable.create(spark, root, base())                       // c0
      Thread.sleep(50)
      val mid = System.currentTimeMillis()                      // between c0 and c1
      Thread.sleep(50)
      TxTable.upsert(spark, root,
        Seq((7L, "cat3", 7777.0, 1L)).toDF("id", "cat", "price", "version"),
        Seq("id"), "version")                                   // c1
      // history carries the stamped wall-clock, non-decreasing by commit
      val h = TxTable.history(spark, root).orderBy("commit").collect()
      val ts = h.map(_.getAs[java.sql.Timestamp]("commit_ts"))
      assert(ts.forall(_ != null), "every commit must carry commit_ts")
      assert(ts(0).getTime <= ts(1).getTime,
        "commit wall-clocks must be non-decreasing for one writer")
      assert(math.abs(ts(0).getTime - mid) < 5L * 60 * 1000,
        s"c0's stamp must be wall-clock-accurate, got ${ts(0)}")
      // the SQL metadata table serves the same column
      val metaTs = spark.sql(s"SELECT commit, commit_ts FROM graft_ts.`ts_t$$history`")
        .orderBy("commit").collect()
      assert(metaTs.map(_.getAs[java.sql.Timestamp]("commit_ts")).forall(_ != null))
      // TIMESTAMP AS OF between the commits sees the pre-upsert snapshot
      def fmt(millis: Long): String =
        java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
          .withZone(java.time.ZoneOffset.UTC)
          .format(java.time.Instant.ofEpochMilli(millis))
      assert(spark.sql(
        s"SELECT price FROM graft_ts.ts_t TIMESTAMP AS OF '${fmt(mid)}' WHERE id = 7")
        .head.getDouble(0) === 107.0)
      // and after c1, the live value
      assert(spark.sql(
        s"SELECT price FROM graft_ts.ts_t TIMESTAMP AS OF " +
          s"'${fmt(System.currentTimeMillis() + 1000)}' WHERE id = 7")
        .head.getDouble(0) === 7777.0)
    } finally {
      spark.conf.unset("spark.sql.catalog.graft_ts")
      spark.conf.unset("spark.sql.catalog.graft_ts.warehouse")
    }
  }

  test("reader option(timestampAsOf): the path-based half of TIMESTAMP AS OF (round 20)") {
    import spark.implicits._
    val root = tmp() + "/t"
    TxTable.create(spark, root, base())                       // c0
    Thread.sleep(50)
    val mid = System.currentTimeMillis()                      // between c0 and c1
    Thread.sleep(50)
    TxTable.upsert(spark, root,
      Seq((7L, "cat3", 7777.0, 1L)).toDF("id", "cat", "price", "version"),
      Seq("id"), "version")                                   // c1
    def priceAt(ts: String): Double =
      spark.read.format("txtable").option("timestampAsOf", ts).load(root)
        .filter(col("id") === 7L).head.getAs[Double]("price")
    // epoch millis between the commits binds to c0; now binds to c1
    assert(priceAt(mid.toString) === 107.0)
    assert(priceAt((System.currentTimeMillis() + 1000).toString) === 7777.0)
    // ISO instant form binds identically (same millis, Z offset)
    assert(priceAt(java.time.Instant.ofEpochMilli(mid).toString) === 107.0)
    // both time-travel options together: loud
    val both = intercept[Exception] {
      spark.read.format("txtable").option("timestampAsOf", mid.toString)
        .option("asOf", "0").load(root).collect()
    }
    assert(both.getMessage.contains("not both"), both.getMessage)
    // predating the whole retained history: loud, names the floor
    val early = intercept[Exception] {
      spark.read.format("txtable").option("timestampAsOf", "2000-01-01")
        .load(root).collect()
    }
    assert(early.getMessage.contains("predates"), early.getMessage)
    // garbage: loud with the accepted forms
    val bad = intercept[Exception] {
      spark.read.format("txtable").option("timestampAsOf", "yesterday-ish")
        .load(root).collect()
    }
    assert(bad.getMessage.contains("cannot parse"), bad.getMessage)
  }

  test("TxSql.exec routes DELETE and UPDATE statements to the predicate DML") {
    val t = tmp() + "/t"
    TxTable.create(spark, t, base())
    TxSql.exec(spark,
      "UPDATE tbl SET price = price + 1000 WHERE cat = 'cat1'",
      Map("tbl" -> t))
    TxSql.exec(spark, "DELETE FROM tbl WHERE id % 10 = 3", Map("tbl" -> t))
    val got = TxTable.read(spark, t)
    assert(got.count() === 180L)
    assert(got.filter(col("cat") === "cat1" && col("id") % 10 =!= 3)
      .collect().forall(_.getAs[Double]("price") >= 1100.0))
    assert(got.filter(col("cat") === "cat0")
      .collect().forall(_.getAs[Double]("price") < 400.0))
    // the routed statements are REAL log positions: history shows them
    assert(TxTable.history(spark, t).count() === 3L)
    // a multipart SET target is refused loudly (collapsing addr.city to
    // its last part would silently overwrite an unrelated top-level
    // column named city)
    val multi = intercept[Exception] {
      TxSql.exec(spark, "UPDATE tbl SET addr.city = 'x' WHERE id = 1",
        Map("tbl" -> t))
    }
    assert(multi.getMessage.contains("multipart"))
  }

  test("SQL DML against a catalog relation refuses with the routing message") {
    val wh = tmp()
    val t = s"$wh/dml_t"
    TxTable.create(spark, t, base(20))
    spark.conf.set("spark.sql.catalog.graft_dml",
      "graft.sources.txtable.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_dml.warehouse", wh)
    try {
      // without the intercept the rule rewrote the TARGET into the
      // snapshot plan and Spark failed with a misleading derived-plan
      // error; now the documented routing message fires
      def messages(e: Throwable): Seq[String] =
        if (e == null) Seq.empty
        else Option(e.getMessage).toSeq ++ messages(e.getCause)
      Seq("DELETE FROM graft_dml.dml_t WHERE id = 1",
        "UPDATE graft_dml.dml_t SET price = 0 WHERE id = 1").foreach { st =>
        val ex = intercept[Exception] { spark.sql(st).collect() }
        assert(messages(ex).exists(_.contains("routes through")),
          s"$st: ${messages(ex).mkString(" | ")}")
      }
    } finally {
      spark.conf.unset("spark.sql.catalog.graft_dml")
      spark.conf.unset("spark.sql.catalog.graft_dml.warehouse")
    }
  }

  test("TxSql.exec routes MERGE INTO: update * + insert *") {
    import spark.implicits._
    val t = tmp() + "/t"
    TxTable.create(spark, t, base(50))
    Seq((3L, "catX", 3333.0, 9L), (500L, "catN", 5.0, 9L))
      .toDF("id", "cat", "price", "version")
      .createOrReplaceTempView("txsql_updates")
    TxSql.exec(spark,
      """MERGE INTO tbl AS t USING txsql_updates AS u ON t.id = u.id
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""",
      Map("tbl" -> t))
    val got = TxTable.read(spark, t)
    assert(got.count() === 51L)
    assert(got.filter(col("id") === 3L).head.getAs[Double]("price") === 3333.0)
    assert(got.filter(col("id") === 500L).head.getAs[String]("cat") === "catN")
  }

  test("MERGE: matched DELETE, and NOT MATCHED BY SOURCE DELETE (full sync)") {
    import spark.implicits._
    val t = tmp() + "/t"
    TxTable.create(spark, t, base(50))
    // kill the matched ids
    Seq(1L, 2L, 3L).toDF("id").createOrReplaceTempView("txsql_kill")
    TxSql.exec(spark,
      "MERGE INTO tbl USING txsql_kill k ON tbl.id = k.id WHEN MATCHED THEN DELETE",
      Map("tbl" -> t))
    assert(TxTable.read(spark, t).count() === 47L)
    assert(TxTable.read(spark, t).filter(col("id") <= 3L && col("id") >= 1L).count() === 0L)
    // full sync: keep only the source's ids, updating their payloads
    (0L until 10L).map(i => (i, "sync", 1.0 * i, 99L))
      .toDF("id", "cat", "price", "version")
      .createOrReplaceTempView("txsql_sync")
    TxSql.exec(spark,
      """MERGE INTO tbl USING txsql_sync s ON tbl.id = s.id
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *
         WHEN NOT MATCHED BY SOURCE THEN DELETE""",
      Map("tbl" -> t))
    val got = TxTable.read(spark, t)
    assert(got.count() === 10L)
    assert(rows(got) === (0L until 10L).map(i => (i, "sync", 1.0 * i)).toSet)
  }

  test("DSv2 writes: INSERT INTO / INSERT OVERWRITE via SQL, DataFrameWriter modes") {
    import spark.implicits._
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.graft_wtest",
      "graft.sources.txtable.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_wtest.warehouse", wh)
    val t = s"$wh/w1"
    TxTable.create(spark, t, base(20))
    // SQL INSERT INTO appends one atomic commit
    spark.sql("INSERT INTO graft_wtest.w1 VALUES (500, 'catN', 5.0, 9)")
    assert(TxTable.read(spark, t).count() === 21L)
    assert(spark.sql("SELECT cat FROM graft_wtest.w1 WHERE id = 500")
      .head.getString(0) === "catN")
    // INSERT INTO ... SELECT (the source query itself reads a txtable)
    spark.sql(
      """INSERT INTO graft_wtest.w1
         SELECT id + 1000, cat, price, version FROM graft_wtest.w1 WHERE id < 3""")
    assert(TxTable.read(spark, t).count() === 24L)
    // DataFrameWriter append
    Seq((600L, "catW", 6.0, 9L)).toDF("id", "cat", "price", "version")
      .write.format("txtable").mode("append").save(t)
    assert(TxTable.read(spark, t).count() === 25L)
    val beforeOverwrite = TxTable.committedIds(t).max
    // INSERT OVERWRITE: atomic full replace, history INTACT
    spark.sql(
      "INSERT OVERWRITE graft_wtest.w1 VALUES (1, 'only', 1.0, 0)")
    assert(rows(TxTable.read(spark, t)) === Set((1L, "only", 1.0)))
    assert(TxTable.readAt(spark, t, beforeOverwrite).count() === 25L,
      "time travel below the overwrite still serves the old table")
    // DataFrameWriter overwrite takes the same truncate path
    base(5).write.format("txtable").mode("overwrite").save(t)
    assert(TxTable.read(spark, t).count() === 5L)
    // a fresh root is CREATED by the writer (commit 0)
    val t2 = s"$wh/w2"
    base(7).write.format("txtable").mode("append").save(t2)
    assert(TxTable.read(spark, t2).count() === 7L)
    intercept[IllegalStateException] {
      base(1).write.format("txtable").mode("errorifexists").save(t2)
    }
    // a time-travel relation refuses writes
    val ex = intercept[Exception] {
      base(1).write.format("txtable").option("asOf", "0")
        .mode("append").save(t)
    }
    assert(ex.getMessage.contains("time-travel"))
  }

  test("MERGE clause conditions, assignment lists, conditional INSERT (round 20)") {
    import spark.implicits._
    val t = tmp() + "/t"
    TxTable.create(spark, t, base(20))
    // one CDC batch, op-coded: U reprices id 3, D kills id 5, I inserts
    // id 200, X matches id 7 but fires no clause (untouched)
    Seq((3L, "srccat", 1000.0, 9L, "U"), (5L, "srccat", 0.0, 9L, "D"),
        (200L, "newcat", 50.0, 9L, "I"), (7L, "srccat", 0.0, 9L, "X"))
      .toDF("id", "cat", "price", "version", "op")
      .createOrReplaceTempView("txsql_cond_src")
    TxSql.exec(spark,
      """MERGE INTO tbl USING txsql_cond_src u ON tbl.id = u.id
         WHEN MATCHED AND u.op = 'D' THEN DELETE
         WHEN MATCHED AND u.op = 'U' THEN UPDATE SET price = u.price + 1, cat = 'upd'
         WHEN NOT MATCHED AND u.op <> 'D' THEN
           INSERT (id, cat, price) VALUES (u.id, u.cat, u.price * 2)""",
      Map("tbl" -> t))
    val got = TxTable.read(spark, t)
    assert(got.count() === 20L, "one delete (id 5) + one insert (id 200)")
    assert(got.filter(col("id") === 5L).isEmpty, "matched D clause deletes")
    val r3 = got.filter(col("id") === 3L).head
    assert(r3.getAs[Double]("price") === 1001.0 &&
      r3.getAs[String]("cat") === "upd" && r3.getAs[Long]("version") === 0L,
      s"assignment list updates named columns, keeps the rest: $r3")
    val r7 = got.filter(col("id") === 7L).head
    assert(r7.getAs[String]("cat") === "cat3" &&
      r7.getAs[Double]("price") === 107.0,
      s"a matched row no clause fires for is untouched: $r7")
    val r200 = got.filter(col("id") === 200L).head
    assert(r200.getAs[String]("cat") === "newcat" &&
      r200.getAs[Double]("price") === 100.0,
      s"conditional INSERT with a VALUES list: $r200")
    assert(r200.isNullAt(r200.fieldIndex("version")),
      "table columns absent from the INSERT list are NULL — the SQL contract")
  }

  test("MERGE clause ORDER: the first clause whose condition holds fires") {
    import spark.implicits._
    val t = tmp() + "/t"
    TxTable.create(spark, t, base(10))
    Seq((2L, "x", 1.0, 9L), (4L, "x", -1.0, 9L))
      .toDF("id", "cat", "price", "version")
      .createOrReplaceTempView("txsql_order_src")
    // both clauses match id 2 (price 1.0 > 0); only the FIRST fires
    TxSql.exec(spark,
      """MERGE INTO tbl USING txsql_order_src u ON tbl.id = u.id
         WHEN MATCHED AND u.price > 0 THEN UPDATE SET cat = 'first'
         WHEN MATCHED THEN UPDATE SET cat = 'second'""",
      Map("tbl" -> t))
    val got = TxTable.read(spark, t)
    assert(got.filter(col("id") === 2L).head.getAs[String]("cat") === "first")
    assert(got.filter(col("id") === 4L).head.getAs[String]("cat") === "second",
      "a row the first clause skips falls through to the next")
  }

  test("NOT MATCHED BY SOURCE: conditional UPDATE and DELETE (round 20)") {
    import spark.implicits._
    val t = tmp() + "/t"
    TxTable.create(spark, t, base(10))   // ids 0..9
    Seq((3L, "cat3", 3.0, 9L)).toDF("id", "cat", "price", "version")
      .createOrReplaceTempView("txsql_nbs_src")
    TxSql.exec(spark,
      """MERGE INTO tbl USING txsql_nbs_src u ON tbl.id = u.id
         WHEN MATCHED THEN UPDATE SET price = u.price
         WHEN NOT MATCHED BY SOURCE AND tbl.id % 2 = 0 THEN DELETE
         WHEN NOT MATCHED BY SOURCE AND tbl.id % 2 = 1 THEN UPDATE SET cat = 'stale'""",
      Map("tbl" -> t))
    val got = TxTable.read(spark, t)
    // evens without a source match (0,2,4,6,8) die; id 3 repriced; odd
    // unmatched rows (1,5,7,9) flagged stale
    assert(got.count() === 5L)
    assert(got.filter(col("id") === 3L).head.getAs[Double]("price") === 3.0)
    assert(got.filter(col("cat") === "stale").select("id").collect()
      .map(_.getLong(0)).toSet === Set(1L, 5L, 7L, 9L))
  }

  test("mergeClauses Scala API: t/s scoping, shuffled fallback parity") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr => sqlExpr}
    val t = tmp() + "/t"
    val t2 = tmp() + "/t"
    TxTable.create(spark, t, base(30))
    TxTable.create(spark, t2, base(30))
    val source = Seq((3L, "m", 1000.0, 9L, "U"), (5L, "m", 0.0, 9L, "D"),
        (300L, "m", 10.0, 9L, "I"))
      .toDF("id", "cat", "price", "version", "op")
    def run(root: String, limit: Long): Unit = {
      TxTable.mergeClauses(spark, root, source, Seq("id"),
        matched = Seq(
          TxTable.MatchedDelete(Some(sqlExpr("s.op = 'D'"))),
          TxTable.MatchedUpdate(
            Map("price" -> sqlExpr("t.price + s.price")),
            Some(sqlExpr("s.op = 'U'")))),
        notMatched = Seq(
          TxTable.InsertValues(
            Map("id" -> sqlExpr("s.id"), "cat" -> sqlExpr("s.cat"),
              "price" -> sqlExpr("s.price"), "version" -> sqlExpr("s.version")),
            Some(sqlExpr("s.op <> 'D'")))),
        broadcastKeyLimit = limit)
      ()
    }
    run(t, 4L * 1000 * 1000)   // broadcast plan
    run(t2, 0L)                // shuffled fallback
    val got = rows(TxTable.read(spark, t))
    assert(got === rows(TxTable.read(spark, t2)),
      "broadcast and shuffled clause plans must agree")
    val r3 = TxTable.read(spark, t).filter(col("id") === 3L).head
    assert(r3.getAs[Double]("price") === 1103.0,
      s"t.price + s.price must see BOTH scopes: $r3")
    assert(TxTable.read(spark, t).filter(col("id") === 5L).isEmpty)
    assert(TxTable.read(spark, t).filter(col("id") === 300L).count() === 1L)
  }

  test("mergeInto shuffled fallback (broadcastKeyLimit = 0) == broadcast plan") {
    import spark.implicits._
    val t = tmp() + "/t"
    val t2 = tmp() + "/t"
    TxTable.create(spark, t, base(50))
    TxTable.create(spark, t2, base(50))
    val source = Seq((3L, "catX", 3333.0, 9L), (500L, "catN", 5.0, 9L))
      .toDF("id", "cat", "price", "version")
    TxTable.mergeInto(spark, t, source, Seq("id"))
    TxTable.mergeInto(spark, t2, source, Seq("id"), broadcastKeyLimit = 0L)
    assert(rows(TxTable.read(spark, t)) === rows(TxTable.read(spark, t2)),
      "a backfill-sized MERGE (shuffled joins everywhere) must agree")
  }

  test("MERGE enforces the SQL cardinality contract and honest clause scope") {
    import spark.implicits._
    val t = tmp() + "/t"
    TxTable.create(spark, t, base(20))
    Seq((3L, "dupA", 1.0, 9L), (3L, "dupB", 2.0, 9L))
      .toDF("id", "cat", "price", "version")
      .createOrReplaceTempView("txsql_dups")
    val dup = intercept[IllegalArgumentException] {
      TxSql.exec(spark,
        "MERGE INTO tbl USING txsql_dups d ON tbl.id = d.id WHEN MATCHED THEN UPDATE SET *",
        Map("tbl" -> t))
    }
    assert(dup.getMessage.contains("duplicate keys"))
    // the cardinality contract holds on the clause path too (round 20)
    val dupCond = intercept[IllegalArgumentException] {
      TxSql.exec(spark,
        """MERGE INTO tbl USING txsql_dups d ON tbl.id = d.id
           WHEN MATCHED AND d.price > 1 THEN UPDATE SET *""",
        Map("tbl" -> t))
    }
    assert(dupCond.getMessage.contains("duplicate keys"))
    val on = intercept[UnsupportedOperationException] {
      TxSql.exec(spark,
        "MERGE INTO tbl USING txsql_dups d ON tbl.id > d.id WHEN MATCHED THEN DELETE",
        Map("tbl" -> t))
    }
    assert(on.getMessage.contains("key equalities"))
  }
}
