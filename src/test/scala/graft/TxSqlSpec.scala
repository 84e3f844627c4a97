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
    assert(spark.sql("DROP TABLE graft_test.orders_t").collect().isEmpty)
    assert(spark.sql("SHOW TABLES IN graft_test").count() === 0L)
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
    val cond = intercept[UnsupportedOperationException] {
      TxSql.exec(spark,
        """MERGE INTO tbl USING txsql_dups d ON tbl.id = d.id
           WHEN MATCHED AND d.price > 1 THEN UPDATE SET *""",
        Map("tbl" -> t))
    }
    assert(cond.getMessage.contains("unconditional"))
    val on = intercept[UnsupportedOperationException] {
      TxSql.exec(spark,
        "MERGE INTO tbl USING txsql_dups d ON tbl.id > d.id WHEN MATCHED THEN DELETE",
        Map("tbl" -> t))
    }
    assert(on.getMessage.contains("key equalities"))
  }
}
