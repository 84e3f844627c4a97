package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/**
 * Relational operator inventory (SURVEY.md §2.2–2.9) — one named query per
 * operator, each with a DuckDB oracle in [[oracle]].
 *
 * Determinism rules (SURVEY.md §7 traps), applied uniformly:
 *  - double SUMs go through DECIMAL(18,2) (exact, order-independent),
 *    final cast to DOUBLE — bit-identical to the oracle regardless of
 *    Spark's partial-aggregation order;
 *  - AVG = CAST(decimal-SUM AS DOUBLE)/COUNT — one deterministic division;
 *  - every query ends in a total ORDER BY;
 *  - `events.ts` arrives in whatever precision the fixture was written
 *    with (µs as of the Aug-13 regeneration; ns before); the reader
 *    normalizes to session-TZ TIMESTAMP (µs) and the oracle compares at
 *    µs via CAST(ts AS TIMESTAMP);
 *  - narrow ints (size/year/rank/…) cast to the same width on both sides.
 */
object RelationalQueries {

  private[graft] def rd(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(s, dir)
    else {
      // schema-cached fixture read (round 21): every query invocation
      // re-inferred the same table's schema (a listing + footer pass per
      // read — the cost a production catalog/metastore exists to
      // amortize). Cache the inferred schema per (path, mtime): an
      // mtime change — fixture regeneration — invalidates, and the read
      // itself is unchanged (pushdown/pruning intact; an asserted
      // schema skips only the inference step).
      val path = s"$dir/$name.parquet"
      val key = (path, new java.io.File(path).lastModified())
      val schema = rdSchemaCache.computeIfAbsent(key,
        _ => s.read.parquet(path).schema)
      s.read.schema(schema).parquet(path)
    }

  private val rdSchemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long),
      org.apache.spark.sql.types.StructType]()

  /**
   * Normalize an events-shaped `ts` column to session-TZ TIMESTAMP (µs),
   * whatever the on-disk encoding. Real corpora arrive with mixed
   * timestamp precisions, so the reader adapts to the LOADED schema
   * instead of assuming one encoding:
   *  - `LongType` — raw epoch-nanos, i.e. parquet TIMESTAMP(NANOS) read
   *    under `spark.sql.legacy.parquet.nanosAsLong` (Spark 4 rejects
   *    nanos outright otherwise, [PARQUET_TYPE_ILLEGAL]). Integer `DIV`
   *    is mandatory: epoch-nanos (~1.7e18) overflow double's 2^53
   *    mantissa, so `/ 1000` would corrupt timestamps.
   *  - `TimestampNTZType` — parquet TIMESTAMP(MICROS/MILLIS) with
   *    isAdjustedToUTC=false (what pyarrow writes by default). Cast to
   *    TIMESTAMP reinterprets the wall-clock in the session TZ; under the
   *    UTC sessions Verify/Bench/tests use this is value-preserving and
   *    matches DuckDB's CAST(ts AS TIMESTAMP).
   *  - `TimestampType` — already session-TZ µs: pass through.
   * Shared by the batch reader below and `Streams.eventsStream` so the
   * two paths cannot drift.
   */
  private[graft] def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case org.apache.spark.sql.types.TimestampType => df
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other (expected int64-nanos, TIMESTAMP_NTZ, or TIMESTAMP)")
    }

  private[graft] def events(s: SparkSession, dir: String): DataFrame = {
    // The nanos conf is session-global (Spark exposes no per-read option),
    // so this is a set-once latch, not a toggle: it is only ever written
    // when absent/false, and nothing in this library sets it back —
    // concurrent callers can therefore only race towards the same value
    // (round-3 advisory). It is inert for µs-encoded files (it only
    // affects TIMESTAMP(NANOS) columns), so setting it unconditionally is
    // safe across fixture regenerations. Sessions that want full control
    // should set it in their builder; Verify/Bench do.
    if (!s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false").toBoolean)
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // same (path, mtime)-keyed schema cache as rd — the ts-encoding
    // adaptivity is untouched (normalizeEventsTs keys off the LOADED
    // schema, which the cache returns verbatim)
    val path = s"$dir/events.parquet"
    val key = (path, new java.io.File(path).lastModified())
    val schema = rdSchemaCache.computeIfAbsent(key,
      _ => s.read.parquet(path).schema)
    normalizeEventsTs(s.read.schema(schema).parquet(path))
  }

  /** exact order-independent sum of a 2-decimal double column */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(

    // ── scans / projection / filters (P1–P5, S7) ────────────────────────
    "q_scan_project" -> ((s, dir) => {
      rd(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "q_filter" -> ((s, dir) => {
      rd(s, dir, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_returnflag") === "A")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "q_filter_date" -> ((s, dir) => {
      rd(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1999-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1999-07-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ── aggregations (A1–A5) ────────────────────────────────────────────
    "q1_agg" -> ((s, dir) => {
      rd(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
          (sum(dec(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q_agg_stats" -> ((s, dir) => {
      rd(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          min(dec(col("c_acctbal"))).cast("double").as("min_bal"),
          max(dec(col("c_acctbal"))).cast("double").as("max_bal"),
          dsum(col("c_acctbal")).as("sum_bal"))
        .orderBy(col("c_nationkey"))
    }),

    "q_count_distinct" -> ((s, dir) => {
      rd(s, dir, "orders")
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          countDistinct(col("o_orderpriority")).as("n_prio"),
          count(lit(1)).as("n_orders"))
    }),

    "q_corr_exact" -> ((s, dir) => {
      // Pearson correlation from EXACT decimal sums (round 12): the
      // built-in corr() aggregate is not reproducible across engines (its
      // running-update order differs per partitioning), but the five-sum
      // form is — decimal Σx/Σy/Σxy/Σx²/Σy² are order-independent, and
      // the final double expression is the identical IEEE tree on both
      // sides. Still ONE partial+final hash aggregate.
      val x = col("l_quantity").cast("decimal(18,2)")
      val y = col("l_extendedprice").cast("decimal(18,2)")
      val d = (c: String) => col(c).cast("double")
      rd(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(x).as("sx"), sum(y).as("sy"),
          sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
        .select(col("l_returnflag"), col("n"),
          // rounded to 9 dp: the numerator is a catastrophic cancellation
          // of ~1e15-scale terms, so the raw ratio can differ by 1 ulp
          // across engines (DuckDB may fuse the multiply-subtract);
          // measured at the 10x corpus — sf0.01 agreed bit-for-bit by luck
          round((d("n") * d("sxy") - d("sx") * d("sy")) /
            sqrt((d("n") * d("sxx") - d("sx") * d("sx")) *
              (d("n") * d("syy") - d("sy") * d("sy"))), 9).as("corr_qty_price"))
        .orderBy(col("l_returnflag"))
    }),

    "q_profile" -> ((s, dir) => {
      // ANALYZE-style ONE-PASS table profiling (round 12): row count,
      // per-column non-null counts, exact NDVs, numeric and temporal
      // min/max — the per-batch stats a 100 TB ingest pipeline logs and
      // alerts on. Spark plans the mixed exact count-distincts as one
      // Expand feeding a partial+final aggregate pair: a single scan,
      // however many columns are profiled.
      rd(s, dir, "orders").agg(
        count(lit(1)).as("n_rows"),
        count(col("o_custkey")).as("nn_custkey"),
        countDistinct(col("o_custkey")).as("ndv_custkey"),
        countDistinct(col("o_orderstatus")).as("ndv_status"),
        countDistinct(col("o_orderpriority")).as("ndv_priority"),
        min(dec(col("o_totalprice"))).cast("double").as("min_price"),
        max(dec(col("o_totalprice"))).cast("double").as("max_price"),
        min(col("o_orderdate")).as("first_date"),
        max(col("o_orderdate")).as("last_date"))
    }),

    "q_percentile" -> ((s, dir) => {
      // exact interpolated percentiles (values are integral doubles, so
      // interpolation arithmetic is exact in both engines)
      rd(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.75)").as("p75"))
        .orderBy(col("l_returnflag"))
    }),

    "q_distinct" -> ((s, dir) => {
      rd(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q_having" -> ((s, dir) => {
      rd(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
        .filter(col("n_cust") > 5)                      // HAVING
        .orderBy(col("c_nationkey"))
    }),

    "q_in_subquery" -> ((s, dir) => {
      rd(s, dir, "orders").createOrReplaceTempView("orders_sq")
      rd(s, dir, "customer").createOrReplaceTempView("customer_sq")
      s.sql("""SELECT o_orderkey, o_custkey FROM orders_sq
               WHERE o_custkey IN (SELECT c_custkey FROM customer_sq WHERE c_mktsegment = 'BUILDING')
               ORDER BY o_orderkey""")
    }),

    "q_scalar_subquery" -> ((s, dir) => {
      rd(s, dir, "orders").createOrReplaceTempView("orders_ssq")
      // deterministic scalar: exact decimal average
      s.sql("""SELECT o_orderkey, o_totalprice FROM orders_ssq
               WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                                     FROM orders_ssq) * 1.5
               ORDER BY o_orderkey""")
    }),

    "q_rollup" -> ((s, dir) => {
      val c = rd(s, dir, "customer"); val n = rd(s, dir, "nation"); val r = rd(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    }),

    "q_cube" -> ((s, dir) => {
      rd(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),

    "q_grouping_sets" -> ((s, dir) => {
      rd(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
               FROM orders_v
               GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
               ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")
    }),

    // ── joins (§2.3) ────────────────────────────────────────────────────
    "q_join_bcast" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem"); val sup = rd(s, dir, "supplier"); val n = rd(s, dir, "nation")
      li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }),

    "q_join_multi" -> ((s, dir) => {
      val c = rd(s, dir, "customer"); val o = rd(s, dir, "orders"); val li = rd(s, dir, "lineitem")
      c.filter(col("c_mktsegment") === "BUILDING")
        .join(o, col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < lit("1999-06-30").cast("timestamp"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > lit("1999-06-30").cast("timestamp"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(20)
    }),

    "q_join_left" -> ((s, dir) => {
      val c = rd(s, dir, "customer"); val o = rd(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(dec(col("o_totalprice"))), lit(0)).cast("double").as("total_spent"))
        .orderBy(col("c_custkey"))
    }),

    "q_join_right" -> ((s, dir) => {
      // right-outer mirror of q_join_left: orders RIGHT JOIN customer, so
      // every customer survives (null order side aggregated away)
      val c = rd(s, dir, "customer"); val o = rd(s, dir, "orders")
      o.join(c, col("o_custkey") === col("c_custkey"), "right")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(dec(col("o_totalprice"))), lit(0)).cast("double").as("total_spent"))
        .orderBy(col("c_custkey"))
    }),

    "q_join_semi" -> ((s, dir) => {
      val c = rd(s, dir, "customer")
      val o = rd(s, dir, "orders").filter(col("o_orderstatus") === "F")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    "q_join_anti" -> ((s, dir) => {
      val o = rd(s, dir, "orders"); val li = rd(s, dir, "lineitem")
      o.join(li, col("o_orderkey") === col("l_orderkey"), "left_anti")
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }),

    "q_join_full" -> ((s, dir) => {
      val a = rd(s, dir, "customer").groupBy(col("c_nationkey").as("k")).agg(count(lit(1)).as("n_cust"))
      val b = rd(s, dir, "supplier").groupBy(col("s_nationkey").as("k")).agg(count(lit(1)).as("n_supp"))
      a.join(b, Seq("k"), "full_outer")
        .select(col("k").as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nationkey"))
    }),

    "q_cross" -> ((s, dir) => {
      val r = rd(s, dir, "region")
      r.select(col("r_name").as("region_a"))
        .crossJoin(r.select(col("r_name").as("region_b")))
        .orderBy(col("region_a"), col("region_b"))
    }),

    "q_join_salted" -> ((s, dir) => {
      // explicit skew tool on the power-law key (events.user_id,
      // FIXTURES.md): a fact-fact join where the probe side scatters
      // across 8 salted sub-keys and the build side replicates to all
      // salts — no single reducer owns a hot key. Result is provably the
      // plain equi-join (SkewSpec), which is exactly what the oracle runs.
      val ev = rd(s, dir, "events").select(col("event_id"), col("user_id"))
      val perUser = rd(s, dir, "events").groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      graft.operators.Skew.saltedJoin(ev, perUser, "user_id",
          salts = 8, spreadCol = "event_id")
        .select(col("event_id"), col("user_id"), col("n_events"))
        .orderBy(col("event_id"))
    }),

    "q_join_bucketed" -> ((s, dir) => {
      // co-located join through the bucketed-table layout: both sides are
      // hash-clustered on the join key at WRITE time (ParquetIO.
      // writeBucketed — one repartition each, paid once), after which the
      // join AND the per-key aggregate run with zero shuffle exchanges
      // (plan asserted in ParquetIOSpec/BucketingSpec; the scan's bucket
      // hash-partitioning satisfies every downstream distribution
      // requirement). At 100 TB this is the nightly-join layout: the
      // recurring Exchange moves to disk, once. The oracle checks the
      // values equal the plain equi-join. Doubles sum through
      // DECIMAL(18,2) on both sides so the hash is order-independent.
      val base = s"${System.getProperty("java.io.tmpdir")}/graft-bucketed-q"
      val li = rd(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      val ord = rd(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      graft.sources.ParquetIO.writeBucketed(
        li.repartition(16, col("l_orderkey")),
        "graft_bkt_lineitem", s"$base/li", 16, Seq("l_orderkey"))
      graft.sources.ParquetIO.writeBucketed(
        ord.repartition(16, col("o_orderkey")),
        "graft_bkt_orders", s"$base/ord", 16, Seq("o_orderkey"))
      s.table("graft_bkt_lineitem")
        .join(s.table("graft_bkt_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_custkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy(col("o_orderkey"))
    }),

    "q_range_join" -> ((s, dir) => {
      val e = rd(s, dir, "events")
      val sg = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("signup_id"), col("ts").as("s_ts"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      sg.join(p, Seq("user_id"))
        .filter(col("p_ts") > col("s_ts") && col("p_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"))
        .groupBy(col("user_id"), col("signup_id"))
        .agg(count(lit(1)).as("n_purchases_1h"))
        .orderBy(col("user_id"), col("signup_id"))
    }),

    "q_asof_join" -> ((s, dir) => {
      val e = rd(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = e.filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.operators.AsOfJoin.asof(purchases, signups,
          on = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          rightId = "event_id", rightCols = Nil)
        .select(col("event_id"), col("user_id"), col("asof_event_id").as("signup_id"))
        .orderBy(col("event_id"))
    }),

    "q_asof_forward" -> ((s, dir) => {
      // forward as-of: each purchase matched to the EARLIEST signup at or
      // after it — the same single-shuffle union-sort as q_asof_join read
      // through the mirrored window frame (AsOfJoin direction="forward")
      val e = rd(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = e.filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.operators.AsOfJoin.asof(purchases, signups,
          on = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          rightId = "event_id", rightCols = Nil, direction = "forward")
        .select(col("event_id"), col("user_id"), col("asof_event_id").as("next_signup_id"))
        .orderBy(col("event_id"))
    }),

    "q_asof_nearest" -> ((s, dir) => {
      // nearest as-of: each purchase matched to the closest signup in
      // EITHER direction, exact ties preferring backward (pandas
      // merge_asof convention) — both frames read over the ONE union-sort
      // shuffle (AsOfJoin direction="nearest")
      val e = rd(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = e.filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.operators.AsOfJoin.asof(purchases, signups,
          on = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          rightId = "event_id", rightCols = Nil, direction = "nearest")
        .select(col("event_id"), col("user_id"),
          col("asof_event_id").as("nearest_signup_id"))
        .orderBy(col("event_id"))
    }),

    // ── windows (§2.5) ──────────────────────────────────────────────────
    "q_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
      rd(s, dir, "events")
        .withColumn("rn", row_number().over(w).cast("int"))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("rn"), col("event_id"), col("value"))
        .orderBy(col("user_id"), col("rn"))
    }),

    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rd(s, dir, "events")
        .withColumn("running_value", sum(dec(col("value"))).over(w).cast("double"))
        .select(col("event_id"), col("user_id"), col("running_value"))
        .orderBy(col("event_id"))
    }),

    "q_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      rd(s, dir, "events")
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("next_value", lead(col("value"), 1).over(w))
        .select(col("event_id"), col("user_id"), col("value"), col("prev_value"), col("next_value"))
        .orderBy(col("event_id"))
    }),

    "q_window_rank" -> ((s, dir) => {
      val byBal = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc)
      val stable = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc, col("c_custkey"))
      rd(s, dir, "customer")
        .withColumn("rnk", rank().over(byBal).cast("int"))
        .withColumn("drnk", dense_rank().over(byBal).cast("int"))
        .withColumn("quartile", ntile(4).over(stable).cast("int"))
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          col("rnk"), col("drnk"), col("quartile"))
        .orderBy(col("c_mktsegment"), col("rnk"), col("c_custkey"))
    }),

    "q_window_dist" -> ((s, dir) => {
      // distribution windows (round 12): percent_rank and cume_dist over a
      // TIE-FREE total order (custkey breaks acctbal ties), so both are
      // exact rational arithmetic — (rank−1)/(n−1) and rank/n of integer
      // positions — and the doubles are bit-identical across engines. The
      // curriculum-bucketing primitive (train on the top X% by score).
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      rd(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy(col("c_mktsegment"), col("c_custkey"))
    }),

    // ── sort / top-k (§2.6) ─────────────────────────────────────────────
    "q_topk" -> ((s, dir) => {
      rd(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    }),

    // ── set ops (§2.7; S13 merge = UNION ALL at file level) ─────────────
    "q_merge_union" -> ((s, dir) => {
      // file-merge semantics: N inputs → one dataset (S13), here verified
      // by aggregating the doubled data
      val li = rd(s, dir, "lineitem")
      li.unionByName(li)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    "q_union_byname" -> ((s, dir) => {
      // schema-drift union: the S13 merge reconciliation semantic
      // (`mergeSchema`) expressed at the operator level
      val a = rd(s, dir, "customer")
        .select(col("c_custkey").as("id"), col("c_acctbal").as("bal"), col("c_mktsegment").as("seg"))
      val b = rd(s, dir, "supplier")
        .select((-col("s_suppkey") - 1L).as("id"), col("s_acctbal").as("bal")) // strictly negative: collision-proof in any non-negative key space
      a.unionByName(b, allowMissingColumns = true)
        .orderBy(col("id"))
    }),

    "q_union_distinct" -> ((s, dir) => {
      rd(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .union(rd(s, dir, "supplier").select(col("s_nationkey").as("nk")))
        .distinct().orderBy(col("nk"))
    }),

    "q_intersect" -> ((s, dir) => {
      rd(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .intersect(rd(s, dir, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy(col("nk"))
    }),

    "q_except" -> ((s, dir) => {
      rd(s, dir, "orders").select(col("o_orderkey").as("k"))
        .except(rd(s, dir, "lineitem").select(col("l_orderkey").as("k")))
        .orderBy(col("k"))
    }),

    // ── scalar functions (§2.8) ─────────────────────────────────────────
    "q_string_funcs" -> ((s, dir) => {
      rd(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        length(col("p_name")).cast("int").as("name_len"),
        substring(col("p_brand"), 7, 10).as("brand_num"),
        concat(col("p_type"), lit("-"), col("p_brand")).as("type_brand"),
        regexp_replace(col("p_brand"), "[0-9]+", "#").as("brand_mask"))
        .orderBy(col("p_partkey"))
    }),

    "q_date_funcs" -> ((s, dir) => {
      rd(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("yr"),
        month(col("o_orderdate")).cast("int").as("mo"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        col("o_orderdate").cast("date").as("odate"))
        .orderBy(col("o_orderkey"))
    }),

    "q_json" -> ((s, dir) => {
      rd(s, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"))
        .orderBy(col("event_id"))
    }),

    "q_map_funcs" -> ((s, dir) => {
      // MapType surface (§2.8): from_json → map<string,int>, map_keys /
      // map_values / map_from_entries / map_concat / element_at. The
      // rebuilt map (entries → zip → map_from_entries) must behave
      // identically to the parsed one.
      // parse ONCE into its own projection: JsonToStructs is a
      // CodegenFallback expression, and the six downstream references
      // would each re-parse the JSON if written inline (measured ~1.6 s
      // → ~1.0 s at sf0.1; CollapseProject keeps the split because the
      // alias is expensive and multiply-referenced)
      val m = col("__m")
      val rebuilt = map_from_entries(arrays_zip(map_keys(m), map_values(m)))
      rd(s, dir, "events")
        .withColumn("__m", from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.IntegerType)))
        .select(
          col("event_id"),
          size(map_keys(m)).cast("int").as("n_keys"),
          concat_ws(",", array_sort(map_keys(m))).as("keys"),
          element_at(m, "k").as("k_val"),
          element_at(map_concat(rebuilt, map(lit("extra"), lit(1))), "extra").as("extra_val"))
        .orderBy(col("event_id"))
    }),

    "q_struct_nested" -> ((s, dir) => {
      // nested-struct parquet round-trip (§1: GroupNode tree → StructType):
      // build a two-level struct, write it to parquet, read it back and
      // project leaf field paths — exercising nested schema pruning on the
      // scan (ReadSchema keeps only the touched leaves)
      // round-trip through an app-scoped fresh dir (round-2 advisory: a
      // fixed /tmp path keyed on abs(hashCode) could collide across
      // datasets and races, and abs(Int.MinValue) is negative)
      val nested = rd(s, dir, "orders").select(
        col("o_orderkey"),
        struct(col("o_orderstatus").as("st"),
          struct(year(col("o_orderdate")).cast("int").as("yr"),
            col("o_totalprice").as("price")).as("dt")).as("info"))
      graft.operators.Materialize.viaParquet(nested, "nested_roundtrip")
        .select(col("o_orderkey"), col("info.st").as("st"), col("info.dt.yr").as("yr"))
        .orderBy(col("o_orderkey"))
    }),

    "q_nested_types" -> ((s, dir) => {
      // DEEP nested types (round 13, survey §1 residue): array-of-struct
      // and map-of-struct as first-class columns. Per order, the lineitem
      // rows collapse into a SORTED array<struct<ln,qty,price>> (the
      // "document" shape a denormalized lake table carries), round-trip
      // through parquet (3-level repeated-group encoding), then every
      // answer is computed FROM the nested value with codegen'd
      // higher-order functions — aggregate() over struct fields, filter()
      // on a struct predicate, element_at on both the array and a
      // map<string,struct> rebuilt from it. The oracle computes the same
      // numbers straight off the flat rows, so equality proves the
      // collect → nest → write → read → HOF pipeline is lossless.
      // sort_array on array<struct> orders by fields left-to-right; ln
      // (the line number) leads, making the array order deterministic.
      val nested = rd(s, dir, "lineitem")
        .select(col("l_orderkey"),
          struct(col("l_linenumber").as("ln"),
            col("l_quantity").as("qty"),
            col("l_extendedprice").as("price")).as("line"))
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("line"))).as("lines"))
      val arr = col("lines")
      graft.operators.Materialize.viaParquet(nested, "nested_types")
        .select(
          col("l_orderkey"),
          size(arr).cast("int").as("n_lines"),
          aggregate(arr, lit(0).cast("decimal(18,2)"),
            (acc, x) => (acc + x.getField("qty").cast("decimal(18,2)"))
              .cast("decimal(18,2)")) // fold type must stay = acc type
            .cast("double").as("total_qty"),
          element_at(arr, 1).getField("ln").cast("int").as("first_ln"),
          size(filter(arr, x => x.getField("price") > 30000.0)).cast("int").as("big_lines"),
          // map<string,struct> keyed by 1-based array POSITION — the
          // fixture has duplicate line numbers within an order, so the
          // position is the unique key (duplicate map keys are an error)
          element_at(
            map_from_entries(transform(arr,
              (x, i) => struct((i + 1).cast("string").as("k"),
                struct(x.getField("qty").as("qty"), x.getField("price").as("price")).as("v")))),
            "1").getField("qty").as("first_qty"))
        .orderBy(col("l_orderkey"))
    }),

    "q_math_funcs" -> ((s, dir) => {
      rd(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        ceil(col("l_quantity") / 7.0).cast("bigint").as("q7"),
        floor(col("l_extendedprice") / 1000.0).cast("bigint").as("price_k"),
        sqrt(col("l_quantity")).as("sq"),
        abs(col("l_discount") - 0.05).as("dd"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "q_pivot" -> ((s, dir) => {
      val srcs = (0 to 9).map(i => s"src$i")
      rd(s, dir, "documents")
        .groupBy(col("lang"))
        .pivot("source", srcs)
        .agg(count(lit(1)))
        .na.fill(0L, srcs)
        .orderBy(col("lang"))
    }),

    "q_unpivot" -> ((s, dir) => {
      // wide→long melt (round 12) — the inverse of q_pivot, via
      // Dataset.unpivot (ANSI UNPIVOT). The melt itself is a per-row
      // Expand (no shuffle, no UDF); the only exchange is the aggregate
      // after it, so the operator costs one extra projection at 100 TB.
      rd(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "val")
        .groupBy(col("l_returnflag"), col("measure"))
        .agg(count(lit(1)).as("n"),
          sum(col("val").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy(col("l_returnflag"), col("measure"))
    }),

    "q_array_funcs" -> ((s, dir) => {
      // array surface (§2.8): split/size/contains/slice/sort + exact fold
      val t = split(col("text"), " +")
      rd(s, dir, "documents").select(
        col("doc_id"),
        size(t).cast("int").as("n"),
        array_contains(t, "spark").cast("int").as("has_spark"),
        concat_ws("_", slice(t, 1, 3)).as("first3"),
        element_at(t, -1).as("last_tok"),
        aggregate(t, lit(0L), (acc, x) => acc + length(x)).as("total_len"),
        concat_ws(" ", array_sort(array_distinct(t))).as("sorted_vocab"))
        .orderBy(col("doc_id"))
    }),

    "q_window_range" -> ((s, dir) => {
      // RANGE frame (value-based, not row-based): sum of values over the
      // trailing 100 event-ids per user
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rangeBetween(-100L, Window.currentRow)
      rd(s, dir, "events")
        .withColumn("trailing_value", sum(dec(col("value"))).over(w).cast("double"))
        .select(col("event_id"), col("user_id"), col("trailing_value"))
        .orderBy(col("event_id"))
    }),

    // ── batch mirror of the streaming tumbling-window agg (§2.10) ───────
    "q_events_hourly" -> ((s, dir) => {
      rd(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .orderBy(col("hour_start"), col("event_type"))
    }),

    "q_stream_windowed" -> ((s, dir) => {
      // §2.10 driver-gate presence for the streaming surface: this runs
      // the EXACT transform Streams.windowedCounts builds for readStream
      // (watermark + tumbling window + order-independent decimal sum) —
      // the same unbounded-DataFrame code executes here in batch mode
      // (EliminateEventTimeWatermark drops the no-op watermark node).
      // StreamsSpec pins readStream==batch equality of the transform;
      // this entry pins its SEMANTICS to the DuckDB oracle, so the
      // streaming row is gated end-to-end instead of spec-only.
      graft.streaming.Streams.windowedCounts(rd(s, dir, "events"))
        .orderBy(col("window_start"), col("event_type"))
    }),

    "q_stream_sliding" -> ((s, dir) => {
      // §2.10 round 11: the SLIDING variant of the same batch==stream
      // transform — each event lands in windowDur/slide = 4 overlapping
      // windows; the oracle enumerates exactly those four aligned starts
      // per event, so the window-assignment arithmetic is gated, not just
      // the tumbling special case.
      graft.streaming.Streams.windowedCounts(rd(s, dir, "events"),
          windowDur = "1 hour", slide = Some("15 minutes"))
        .orderBy(col("window_start"), col("event_type"))
    }),

    "q_stream_sessions" -> ((s, dir) => {
      // §2.10 round 11: session_window(gap) through the SAME streaming
      // transform (Streams.sessionCounts) in batch mode. The oracle
      // rebuilds sessions with the lag/islands technique — new session at
      // gap ≥ 30 min (session_window's end bound is exclusive) — and
      // reproduces Spark's session_end = last event + gap.
      graft.streaming.Streams.sessionCounts(rd(s, dir, "events"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    "q_stream_join" -> ((s, dir) => {
      // §2.10 round 12: STREAM-STREAM interval join through the same
      // batch==stream transform (Streams.attributionJoin) — each purchase
      // attributed to the views by the same user within the prior 6 h.
      // In streaming both sides are watermarked and the event-time range
      // condition bounds join state on BOTH sides (state ∝ rate × horizon,
      // not stream length); in batch the watermarks erase and Catalyst
      // runs the plain range join this oracle reproduces. StreamJoinSpec
      // pins readStream==batch equality of the transform.
      val ev = rd(s, dir, "events")
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"), col("value"))
      graft.streaming.Streams.attributionJoin(views, purchases)
        .orderBy(col("user_id"), col("view_id"), col("purchase_id"))
    }),

    "q_stream_join_outer" -> ((s, dir) => {
      // §2.10 round 12: the LEFT OUTER form of the interval join —
      // unattributed views survive with null purchase columns. In
      // streaming the null rows are held until the watermark proves no
      // match can arrive (state-bounded, emitted late); in batch the
      // watermarks erase and this is the plain left range join the oracle
      // writes. Null sort position pinned explicitly on both engines
      // (asc_nulls_first ≡ NULLS FIRST) because the driver compares rows
      // in file order.
      val ev = rd(s, dir, "events")
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"), col("value"))
      graft.streaming.Streams.attributionJoin(views, purchases,
          joinType = "left_outer")
        .orderBy(col("user_id"), col("view_id"),
          col("purchase_id").asc_nulls_first)
    }),

    // ── batch mirror of streaming/StatefulSessions (§2.10) ──────────────
    "q_events_sessionize" -> ((s, dir) => {
      // batch sessionization with a 30-min inactivity gap: lag marks
      // session starts, a running sum numbers them, one rollup per
      // session. All three window steps share ONE (user_id) partitioning
      // and ordering, so the plan carries a single Exchange + sort; the
      // rollup aggregates on the same keys. Seconds are floor-truncated
      // (unix_timestamp ≡ DuckDB date_diff from epoch) so gap decisions
      // are engine-identical.
      val ev = rd(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("value"),
          unix_timestamp(col("ts")).as("sec"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
      val flagged = ev.withColumn("is_new",
        when(lag(col("sec"), 1).over(w).isNull ||
          col("sec") - lag(col("sec"), 1).over(w) > 1800L, 1L).otherwise(0L))
      flagged.withColumn("session_idx", sum(col("is_new")).over(w))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).cast("int").as("n_events"),
          min(col("sec")).as("start_sec"),
          (max(col("sec")) - min(col("sec"))).as("duration_sec"),
          dsum(col("value")).as("total_value"))
        .orderBy(col("user_id"), col("session_idx"))
    }),

    "q_events_funnel" -> ((s, dir) => {
      // ordered funnel signup → view → purchase: per user, the earliest
      // signup, the earliest view STRICTLY AFTER it, the earliest purchase
      // after that. Three per-user hash aggregates chained by equi-joins on
      // user_id — every stage shrinks the key set, nothing is quadratic,
      // and the whole chain shuffles on the one natural key (AQE can
      // co-locate the later stages). Timestamps compare at exact
      // epoch-micros (long), never float.
      val ev = rd(s, dir, "events")
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("t")).as("t_signup"))
      val s2 = ev.filter(col("event_type") === "view").join(s1, "user_id")
        .filter(col("t") > col("t_signup"))
        .groupBy(col("user_id"), col("t_signup")).agg(min(col("t")).as("t_view"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(s2.select(col("user_id"), col("t_view")), "user_id")
        .filter(col("t") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("t")).as("t_purchase"))
      s1.join(s2.select(col("user_id"), col("t_view")), Seq("user_id"), "left")
        .join(s3, Seq("user_id"), "left")
        .select(col("user_id"), col("t_signup"), col("t_view"), col("t_purchase"),
          (lit(1) + col("t_view").isNotNull.cast("int") +
            col("t_purchase").isNotNull.cast("int")).as("stage"))
        .orderBy(col("user_id"))
    }),

    "q_events_retention" -> ((s, dir) => {
      // cohort retention: users grouped by the week of their first event,
      // counted distinct in each later activity week. Two hash aggregates
      // (first-seen per user, distinct user-weeks) joined on user_id, then
      // a tiny-keyed rollup — no window, no quadratic step; at scale the
      // user_id aggregates shuffle once each and the final rollup's key
      // space is |cohorts|·|offsets|. Week offsets divide exactly: both
      // stamps are week-truncated, so the difference is a whole number of
      // 604800-second weeks.
      val ev = rd(s, dir, "events").select(col("user_id"), col("ts"))
      val firsts = ev.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
      val act = ev.select(col("user_id"), date_trunc("week", col("ts")).as("w")).distinct()
      act.join(firsts, "user_id")
        .withColumn("week_offset",
          ((unix_timestamp(col("w")) - unix_timestamp(col("cohort_week"))) / 604800L)
            .cast("int"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    "q_events_transitions" -> ((s, dir) => {
      // event-sequence transition matrix: (event_type → next event_type)
      // counts per user timeline — one window on the same (user_id)
      // partitioning as the sessionizer, one hash aggregate over at most
      // |types|² keys. The aggregate's tiny key space makes the shuffle
      // after the window negligible at any scale.
      val ev = rd(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("t"), col("event_id"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
      ev.withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("next_type"))
    }),

    "q_events_gapfill" -> ((s, dir) => {
      // telemetry resample + gap-fill: 15-min buckets per event_type over
      // the corpus-wide span; missing slots appear with n=0/is_gap=1 and
      // the gauge carried forward from the last observed bucket (LOCF).
      // The slot grid is generated DISTRIBUTIVELY — each series row
      // explodes its own slot sequence against a 1-row broadcast span —
      // no driver loop, no single-task generate. Wide ops are the bucket
      // aggregate and one per-series window, both on (series, slot) keys
      // whose cardinality is span-bound, not data-bound. The gauge sum
      // rides as exact decimal so LOCF output is order-independent.
      val ev = rd(s, dir, "events")
      val b = ev
        .withColumn("slot_s", expr("unix_timestamp(ts) DIV 900 * 900"))
        .groupBy(col("event_type"), col("slot_s"))
        .agg(count(lit(1)).as("nn"), sum(col("value").cast("decimal(18,2)")).as("sv"))
      val span = b.agg(min(col("slot_s")).as("lo"), max(col("slot_s")).as("hi"))
      val grid = ev.select(col("event_type")).distinct()
        .crossJoin(broadcast(span))
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"), lit(900L))).as("slot_s"))
      grid.join(b, Seq("event_type", "slot_s"), "left")
        .select(col("event_type"), col("slot_s"),
          coalesce(col("nn"), lit(0L)).as("n"), col("sv").cast("double").as("v"))
        .withColumn("is_gap", col("v").isNull.cast("int"))
        .withColumn("filled_value", last(col("v"), ignoreNulls = true).over(
          Window.partitionBy(col("event_type")).orderBy(col("slot_s"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("event_type"), timestamp_seconds(col("slot_s")).as("slot_start"),
          col("n"), col("is_gap"), col("filled_value"))
        .orderBy(col("event_type"), col("slot_start"))
    }))

  /** exact decimal revenue term used by several oracles */
  private val RevSql =
    "SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))"

  val oracle: ListMap[String, String] = ListMap(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
         WHERE l_quantity > 45 AND l_returnflag = 'A' ORDER BY l_orderkey, l_linenumber""",
    "q_filter_date" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_shipdate < TIMESTAMP '1999-07-01'
         ORDER BY l_orderkey, l_linenumber""",
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
            CAST($RevSql AS DOUBLE) AS sum_disc_price,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
            CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
            COUNT(*) AS count_order
          FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q_agg_stats" ->
      """SELECT c_nationkey, COUNT(*) AS n_cust,
           CAST(MIN(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS min_bal,
           CAST(MAX(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS max_bal,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
         FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q_count_distinct" ->
      """SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_prio,
           COUNT(*) AS n_orders FROM orders""",
    // five exact decimal sums, identical final double tree on both engines
    "q_corr_exact" ->
      """WITH s AS (
           SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, n,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                  * (CAST(n AS DOUBLE) * syy - sy * sy)), 9) AS corr_qty_price
         FROM s ORDER BY l_returnflag""",
    // one-pass profile; timestamps CAST for the µs fixture parity
    "q_profile" ->
      """SELECT COUNT(*) AS n_rows,
           COUNT(o_custkey) AS nn_custkey,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS ndv_custkey,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS ndv_status,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS ndv_priority,
           CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price,
           MIN(CAST(o_orderdate AS TIMESTAMP)) AS first_date,
           MAX(CAST(o_orderdate AS TIMESTAMP)) AS last_date
         FROM orders""",
    "q_percentile" ->
      """SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.5) AS p50,
           quantile_cont(l_quantity, 0.75) AS p75
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",
    "q_having" ->
      """SELECT c_nationkey, COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
         FROM customer GROUP BY c_nationkey HAVING COUNT(*) > 5
         ORDER BY c_nationkey""",
    "q_in_subquery" ->
      """SELECT o_orderkey, o_custkey FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
         ORDER BY o_orderkey""",
    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                               FROM orders) * 1.5
         ORDER BY o_orderkey""",
    "q_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)
         ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""",
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
         FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q_join_bcast" ->
      s"""SELECT n_name, CAST($RevSql AS DOUBLE) AS revenue, COUNT(*) AS n_items
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
          GROUP BY n_name ORDER BY n_name""",
    "q_join_multi" ->
      s"""SELECT o_orderkey, o_orderdate, CAST($RevSql AS DOUBLE) AS revenue
          FROM customer JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < TIMESTAMP '1999-06-30'
            AND l_shipdate > TIMESTAMP '1999-06-30'
          GROUP BY o_orderkey, o_orderdate
          ORDER BY revenue DESC, o_orderkey LIMIT 20""",
    "q_join_left" ->
      """SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
         FROM customer LEFT JOIN orders ON o_custkey = c_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "q_join_right" ->
      """SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
         FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
         ORDER BY c_custkey""",
    "q_join_anti" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
         WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
         ORDER BY o_orderkey""",
    "q_join_full" ->
      """SELECT COALESCE(a.k, b.k) AS nationkey,
           CAST(COALESCE(n_cust, 0) AS BIGINT) AS n_cust,
           CAST(COALESCE(n_supp, 0) AS BIGINT) AS n_supp
         FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1) a
         FULL OUTER JOIN (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1) b
           ON a.k = b.k
         ORDER BY nationkey""",
    "q_cross" ->
      """SELECT r1.r_name AS region_a, r2.r_name AS region_b
         FROM region r1 CROSS JOIN region r2 ORDER BY region_a, region_b""",
    "q_join_salted" ->
      """SELECT e.event_id, e.user_id, c.n_events
         FROM events e
         JOIN (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id) c
           USING (user_id)
         ORDER BY e.event_id""",
    "q_join_bucketed" ->
      """SELECT o_orderkey, o_custkey, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         GROUP BY o_orderkey, o_custkey ORDER BY o_orderkey""",
    "q_range_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS uts FROM events)
         SELECT s.user_id, s.event_id AS signup_id, COUNT(*) AS n_purchases_1h
         FROM e s JOIN e p ON p.user_id = s.user_id
           AND p.event_type = 'purchase'
           AND p.uts > s.uts AND p.uts <= s.uts + INTERVAL 1 HOUR
         WHERE s.event_type = 'signup'
         GROUP BY s.user_id, s.event_id ORDER BY s.user_id, signup_id""",
    "q_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS uts FROM events),
         u AS (
           SELECT event_id, user_id, uts, 1 AS side, NULL AS sid FROM e WHERE event_type = 'purchase'
           UNION ALL
           SELECT event_id, user_id, uts, 0 AS side, event_id AS sid FROM e WHERE event_type = 'signup'),
         m AS (
           SELECT event_id, user_id, side,
             LAST_VALUE(sid IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY uts, side, sid NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS signup_id
           FROM u)
         SELECT event_id, user_id, signup_id FROM m WHERE side = 1 ORDER BY event_id""",
    "q_asof_forward" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS uts FROM events),
         u AS (
           SELECT event_id, user_id, uts, 1 AS side, NULL AS sid FROM e WHERE event_type = 'purchase'
           UNION ALL
           SELECT event_id, user_id, uts, 0 AS side, event_id AS sid FROM e WHERE event_type = 'signup'),
         m AS (
           SELECT event_id, user_id, side,
             FIRST_VALUE(sid IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY uts, side DESC, sid NULLS FIRST
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_signup_id
           FROM u)
         SELECT event_id, user_id, next_signup_id FROM m WHERE side = 1 ORDER BY event_id""",
    // both window picks share one ordering per direction, so b_id/b_ts
    // (resp. f_id/f_ts) come from the SAME matched row — no tearing;
    // the CASE mirrors AsOfJoin's backward-wins-ties distance rule
    "q_asof_nearest" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS uts FROM events),
         u AS (
           SELECT event_id, user_id, uts, 1 AS side, NULL AS sid, NULL AS sts FROM e WHERE event_type = 'purchase'
           UNION ALL
           SELECT event_id, user_id, uts, 0 AS side, event_id AS sid, uts AS sts FROM e WHERE event_type = 'signup'),
         m AS (
           SELECT event_id, user_id, side, uts,
             LAST_VALUE(sid IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY uts, side, sid NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b_id,
             LAST_VALUE(sts IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY uts, side, sid NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b_ts,
             FIRST_VALUE(sid IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY uts, side DESC, sid NULLS FIRST
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f_id,
             FIRST_VALUE(sts IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY uts, side DESC, sid NULLS FIRST
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f_ts
           FROM u)
         SELECT event_id, user_id,
           CASE WHEN f_ts IS NULL THEN b_id
                WHEN b_ts IS NOT NULL AND (uts - b_ts) <= (f_ts - uts) THEN b_id
                ELSE f_id END AS nearest_signup_id
         FROM m WHERE side = 1 ORDER BY event_id""",
    "q_window_topk" ->
      """SELECT user_id, rn, event_id, value FROM (
           SELECT user_id, event_id, value,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS INT) AS rn
           FROM events) t
         WHERE rn <= 3 ORDER BY user_id, rn""",
    "q_window_running" ->
      """SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
         FROM events ORDER BY event_id""",
    "q_window_lag" ->
      """SELECT event_id, user_id, value,
           LAG(value, 1) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_value,
           LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_value
         FROM events ORDER BY event_id""",
    "q_window_rank" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
           CAST(RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS INT) AS rnk,
           CAST(DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS INT) AS drnk,
           CAST(NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS INT) AS quartile
         FROM customer ORDER BY c_mktsegment, rnk, c_custkey""",
    // tie-free order ⇒ (rank−1)/(n−1) and rank/n are exact in both engines
    "q_window_dist" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
           PERCENT_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS pr,
           CUME_DIST() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS cd
         FROM customer ORDER BY c_mktsegment, c_custkey""",
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q_merge_union" ->
      """SELECT l_returnflag, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM (SELECT * FROM lineitem UNION ALL SELECT * FROM lineitem) t
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_union_byname" ->
      """SELECT c_custkey AS id, c_acctbal AS bal, c_mktsegment AS seg FROM customer
         UNION ALL
         SELECT -s_suppkey - 1 AS id, s_acctbal AS bal, CAST(NULL AS VARCHAR) AS seg FROM supplier
         ORDER BY id""",
    "q_union_distinct" ->
      """SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey FROM supplier ORDER BY nk""",
    "q_intersect" ->
      """SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk""",
    "q_except" ->
      """SELECT o_orderkey AS k FROM orders EXCEPT SELECT l_orderkey FROM lineitem ORDER BY k""",
    "q_string_funcs" ->
      """SELECT p_partkey, UPPER(p_name) AS up_name,
           CAST(LENGTH(p_name) AS INT) AS name_len,
           SUBSTRING(p_brand, 7, 10) AS brand_num,
           CONCAT(p_type, '-', p_brand) AS type_brand,
           REGEXP_REPLACE(p_brand, '[0-9]+', '#', 'g') AS brand_mask
         FROM part ORDER BY p_partkey""",
    "q_date_funcs" ->
      """SELECT o_orderkey, CAST(YEAR(o_orderdate) AS INT) AS yr,
           CAST(MONTH(o_orderdate) AS INT) AS mo,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate AS DATE) AS odate
         FROM orders ORDER BY o_orderkey""",
    "q_json" ->
      """SELECT event_id, CAST(REGEXP_EXTRACT(props, '[0-9]+') AS INT) AS k_val
         FROM events ORDER BY event_id""",
    "q_map_funcs" ->
      """SELECT event_id,
           CAST(len(json_keys(props)) AS INT) AS n_keys,
           array_to_string(list_sort(json_keys(props)), ',') AS keys,
           CAST(REGEXP_EXTRACT(props, '[0-9]+') AS INT) AS k_val,
           CAST(1 AS INT) AS extra_val
         FROM events ORDER BY event_id""",
    "q_struct_nested" ->
      """SELECT o_orderkey, o_orderstatus AS st, CAST(YEAR(o_orderdate) AS INT) AS yr
         FROM orders ORDER BY o_orderkey""",
    // the nested array/map pipeline must equal the flat-row aggregate
    "q_nested_types" ->
      """SELECT l_orderkey,
           CAST(COUNT(*) AS INT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
           CAST(MIN(l_linenumber) AS INT) AS first_ln,
           CAST(COUNT(CASE WHEN l_extendedprice > 30000.0 THEN 1 END) AS INT) AS big_lines,
           FIRST(l_quantity ORDER BY l_linenumber, l_quantity, l_extendedprice) AS first_qty
         FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""",
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
           CAST(CEIL(l_quantity / 7.0) AS BIGINT) AS q7,
           CAST(FLOOR(l_extendedprice / 1000.0) AS BIGINT) AS price_k,
           SQRT(l_quantity) AS sq,
           ABS(l_discount - 0.05) AS dd
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q_pivot" ->
      ("SELECT lang, " + (0 to 9).map(i =>
        s"CAST(COUNT(CASE WHEN source = 'src$i' THEN 1 END) AS BIGINT) AS src$i").mkString(", ") +
        " FROM documents GROUP BY lang ORDER BY lang"),
    // wide→long melt: the three measure columns stacked, then aggregated
    "q_unpivot" ->
      """WITH m AS (
           SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
           UNION ALL
           SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
           UNION ALL
           SELECT l_returnflag, 'l_discount', l_discount FROM lineitem)
         SELECT l_returnflag, measure, COUNT(*) AS n,
           CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM m GROUP BY 1, 2 ORDER BY l_returnflag, measure""",
    "q_array_funcs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
         SELECT doc_id, CAST(len(l) AS INT) AS n,
           CAST(CASE WHEN list_contains(l, 'spark') THEN 1 ELSE 0 END AS INT) AS has_spark,
           array_to_string(l[1:3], '_') AS first3,
           l[-1] AS last_tok,
           CAST(list_sum(list_transform(l, x -> length(x))) AS BIGINT) AS total_len,
           array_to_string(list_sort(list_distinct(l)), ' ') AS sorted_vocab
         FROM t ORDER BY doc_id""",
    "q_window_range" ->
      """SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY event_id
             RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_value
         FROM events ORDER BY event_id""",
    "q_events_hourly" ->
      """SELECT DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS hour_start, event_type,
           COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""",
    "q_stream_windowed" ->
      """SELECT DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
           COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",
    // each event belongs to exactly 4 sliding windows: starts k*15min back
    // from its 15-min-aligned slot, k = 0..3 (window 1h, slide 15min)
    "q_stream_sliding" ->
      """WITH e AS (
           SELECT event_type, value, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         w AS (
           SELECT event_type, value,
             (us // 900000000 - k) * 900000000 AS ws
           FROM e CROSS JOIN (SELECT UNNEST(range(0, 4)) AS k) ks)
         SELECT make_timestamp(ws) AS window_start, event_type,
           COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""",
    // islands technique: new session when the gap to the previous event is
    // >= 30 min (session_window's end bound is exclusive); session_end =
    // last event + gap, exactly Spark's session_window end
    "q_stream_sessions" ->
      """WITH e AS (
           SELECT user_id, event_id, value,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         f AS (
           SELECT *, CASE WHEN lag(us) OVER w IS NULL
               OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS is_new
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         s AS (
           SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id) AS sid
           FROM f)
         SELECT make_timestamp(MIN(us)) AS session_start,
           make_timestamp(MAX(us) + 1800000000) AS session_end,
           user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""",
    // stream-stream interval join: purchase within (view_ts, view_ts+6h]
    // per user; gap reported in µs (epoch_us on both engines, exact)
    "q_stream_join" ->
      """SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
           epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(v.ts AS TIMESTAMP)) AS gap_us,
           p.value
         FROM events v JOIN events p
           ON v.user_id = p.user_id
           AND v.event_type = 'view' AND p.event_type = 'purchase'
           AND CAST(p.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
           AND CAST(p.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP) + INTERVAL 6 HOUR
         ORDER BY v.user_id, view_id, purchase_id""",
    // left-outer form: unattributed views survive with null purchase
    // columns; NULLS FIRST matches Spark's asc_nulls_first
    "q_stream_join_outer" ->
      """SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
           epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(v.ts AS TIMESTAMP)) AS gap_us,
           p.value
         FROM (SELECT * FROM events WHERE event_type = 'view') v
         LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
           ON v.user_id = p.user_id
           AND CAST(p.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
           AND CAST(p.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP) + INTERVAL 6 HOUR
         ORDER BY v.user_id, view_id, purchase_id NULLS FIRST""",
    "q_events_sessionize" ->
      """WITH e AS (
           SELECT user_id, event_id, value,
             date_diff('second', TIMESTAMP '1970-01-01', CAST(ts AS TIMESTAMP)) AS sec
           FROM events),
         f AS (
           SELECT *, CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
               THEN 1 ELSE 0 END AS is_new
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
         s AS (
           SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY sec, event_id)
             AS session_idx
           FROM f)
         SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           CAST(COUNT(*) AS INT) AS n_events,
           MIN(sec) AS start_sec, MAX(sec) - MIN(sec) AS duration_sec,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_idx""",
    "q_events_funnel" ->
      """WITH e AS (
           SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
         s1 AS (
           SELECT user_id, MIN(t) AS t_signup FROM e
           WHERE event_type = 'signup' GROUP BY user_id),
         s2 AS (
           SELECT e.user_id, MIN(e.t) AS t_view FROM e JOIN s1 USING (user_id)
           WHERE e.event_type = 'view' AND e.t > s1.t_signup GROUP BY e.user_id),
         s3 AS (
           SELECT e.user_id, MIN(e.t) AS t_purchase FROM e JOIN s2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.t > s2.t_view GROUP BY e.user_id)
         SELECT s1.user_id, s1.t_signup, s2.t_view, s3.t_purchase,
           1 + CASE WHEN s2.t_view IS NULL THEN 0 ELSE 1 END
             + CASE WHEN s3.t_purchase IS NULL THEN 0 ELSE 1 END AS stage
         FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
           LEFT JOIN s3 ON s1.user_id = s3.user_id
         ORDER BY s1.user_id""",
    "q_events_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS uts FROM events),
         f AS (SELECT user_id, date_trunc('week', MIN(uts)) AS cohort_week
               FROM e GROUP BY user_id),
         a AS (SELECT DISTINCT user_id, date_trunc('week', uts) AS w FROM e)
         SELECT CAST(f.cohort_week AS TIMESTAMP) AS cohort_week,
           CAST(date_diff('week', f.cohort_week, a.w) AS INT) AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_users
         FROM a JOIN f USING (user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_events_transitions" ->
      """WITH e AS (
           SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t, event_id
           FROM events),
         n AS (
           SELECT event_type, lead(event_type) OVER (
             PARTITION BY user_id ORDER BY t, event_id) AS next_type
           FROM e)
         SELECT event_type, next_type, COUNT(*) AS n FROM n
         WHERE next_type IS NOT NULL
         GROUP BY event_type, next_type ORDER BY event_type, next_type""",
    "q_events_gapfill" ->
      """WITH b AS (
           SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 900 * 900 AS slot_s,
             COUNT(*) AS nn, SUM(CAST(value AS DECIMAL(18,2))) AS sv
           FROM events GROUP BY 1, 2),
         span AS (SELECT MIN(slot_s) AS lo, MAX(slot_s) AS hi FROM b),
         grid AS (
           SELECT e.event_type, g.slot_s
           FROM (SELECT DISTINCT event_type FROM events) e,
             (SELECT UNNEST(range(lo, hi + 900, 900)) AS slot_s FROM span) g),
         j AS (
           SELECT g.event_type, g.slot_s, COALESCE(b.nn, 0) AS n,
             CAST(b.sv AS DOUBLE) AS v
           FROM grid g LEFT JOIN b ON g.event_type = b.event_type AND g.slot_s = b.slot_s)
         SELECT event_type, make_timestamp(slot_s * 1000000) AS slot_start,
           CAST(n AS BIGINT) AS n,
           CASE WHEN v IS NULL THEN 1 ELSE 0 END AS is_gap,
           last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY slot_s
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
         FROM j ORDER BY event_type, slot_start""")
}
