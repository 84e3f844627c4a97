package graft.sources.txtable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.TxTable

/**
 * SQL-callable table maintenance (round 20) — the DSv2 procedure
 * surface on [[GraftCatalog]], closing the last Scala-only detour in
 * the SQL journey: a table could be created (CTAS), written (INSERT /
 * MERGE), read (time travel, `t$history`) and dropped (PURGE-guarded)
 * entirely from SQL, but checkpoint / expire / compact still required
 * the library. Now:
 *
 * {{{
 *   CALL graft.system.checkpoint(table => 'orders')
 *   CALL graft.system.expire('orders')
 *   CALL graft.system.compact('orders', min_dead_fraction => 0.2)
 *   CALL graft.system.maintain('orders', max_tail => 16)
 *   CALL graft.system.vacuum('orders', grace_ms => 0)
 *   CALL graft.system.register_cursor('orders', 'nightly_sync', 7)
 * }}}
 *
 * Thin-by-design: every procedure resolves the table root through the
 * owning catalog and routes to the SAME library entry points the Scala
 * surface uses ([[TxTable.checkpoint]]/[[TxTable.expire]]/
 * [[TxTable.compactFiles]]/[[TxTable.maintain]]/[[TxTable.vacuum]]/
 * [[TxTable.registerCursor]]) — there is no second maintenance engine
 * to drift, exactly the rewrite-don't-reimplement rule the read/write
 * surfaces follow. Layout-shaping calls (checkpoint / compact /
 * maintain) honor the table's persisted layout (`_txn/props` bloom +
 * partition columns) so SQL-triggered maintenance lays data out
 * identically to library-triggered maintenance. Each call returns its
 * receipt as rows (the folded commit id, the expired ids, the actions
 * taken) — a maintenance job's audit record, queryable like any result.
 *
 * Namespace: `system`, the convention SQL users already know from the
 * open table formats. `SHOW PROCEDURES IN graft.system` and
 * `DESCRIBE PROCEDURE graft.system.checkpoint` work (the catalog
 * implements `listProcedures`).
 */
private[txtable] object GraftProcedures {

  /** One procedure: declaration + body. `bind` is identity — the
    * parameter list IS the contract and Spark's analyzer coerces
    * arguments to it (`ProcedureArgumentCoercion`), so there is nothing
    * input-shape-specific to re-plan per call. */
  private final case class Proc(
      procName: String,
      descr: String,
      params: Array[ProcedureParameter],
      resultSchema: StructType,
      body: (SparkSession, String, InternalRow) => Array[InternalRow],
      resolveRoot: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = descr
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    // maintenance mutates the log — never allow the optimizer to
    // dedup/reorder invocations as if they were pure
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      // EVERY declared parameter is NULL-guarded, not just the table
      // (round 21, r20 advice): an explicit NULL for e.g.
      // min_dead_fraction would otherwise read through
      // GenericInternalRow as 0.0/0L — compact would silently rewrite
      // every file, checkpoint would size files at 0 bytes. Defaults
      // are filled by the analyzer for OMITTED args; an explicit NULL
      // is a caller error and fails loudly with the parameter's name.
      params.zipWithIndex.foreach { case (p, i) =>
        require(!input.isNullAt(i),
          s"$procName: argument '${p.name}' must not be NULL " +
            "(omit it to take the declared default)")
      }
      val root = resolveRoot(input.getUTF8String(0).toString)
      val out: Scan = Result(resultSchema,
        body(SparkSession.active, root, input))
      java.util.List.of(out).iterator()
    }
  }

  /** The procedure's receipt rows, handed back through the one scan
    * shape Spark's `InvokeProcedures` materializes driver-side. Receipts
    * are bounded by log length (ids, action strings) — never data-sized. */
  private final case class Result(schema: StructType, out: Array[InternalRow])
      extends LocalScan {
    override def rows(): Array[InternalRow] = out
    override def readSchema(): StructType = schema
  }

  private def row(vs: Any*): InternalRow =
    new GenericInternalRow(vs.toArray.map {
      case s: String => UTF8String.fromString(s)
      case v => v
    })

  private def tableParam: ProcedureParameter =
    ProcedureParameter.in("table", StringType)
      .comment("table name within this catalog, e.g. 'orders' or 'ns.orders'")
      .build()

  private def in(name: String, dt: DataType, default: String,
      comment: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).comment(comment).build()

  /** Comma-list option param → Seq (empty string = none). */
  private def cols(input: InternalRow, i: Int): Seq[String] =
    if (input.isNullAt(i)) Seq.empty
    else input.getUTF8String(i).toString.split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq

  private val targetBytesDefault = (512L * 1024 * 1024).toString
  private val graceDefault = (24L * 3600 * 1000).toString

  private def all(resolveRoot: String => String): Map[String, Proc] = Seq(
    Proc("checkpoint",
      "fold the resolved snapshot into base files at a new commit; " +
        "honors the table's persisted bloom/partition layout",
      Array(tableParam,
        in("target_file_bytes", LongType, targetBytesDefault, "output file sizing"),
        in("sort_cols", StringType, "''", "comma list: sort the fold by these"),
        in("z_cols", StringType, "''", "comma list: z-order the fold by these")),
      StructType(Seq(StructField("commit", LongType, nullable = false))),
      (spark, root, input) => {
        val (blooms, parts) = TxTableSource.persistedLayout(root)
        val k = TxTable.checkpoint(spark, root, input.getLong(1), blooms,
          cols(input, 2), parts, cols(input, 3))
        Array(row(k))
      }, resolveRoot),
    Proc("expire",
      "delete history below the newest checkpoint, floored at the " +
        "minimum registered cursor; returns the expired commit ids",
      Array(tableParam),
      StructType(Seq(
        StructField("n_expired", LongType, nullable = false),
        StructField("expired", StringType, nullable = true))),
      (spark, root, input) => {
        val gone = TxTable.expire(spark, root)
        // the cached (root, tip) plan may reference just-deleted dirs
        // below the old floor — drop it; the next read re-derives
        TxTableSource.invalidateRoot(root)
        Array(row(gone.size.toLong,
          if (gone.isEmpty) null else gone.mkString(",")))
      }, resolveRoot),
    Proc("compact",
      "rewrite base files whose deletion-vector dead fraction exceeds " +
        "the threshold; no-op (null commit) when nothing qualifies",
      Array(tableParam,
        in("min_dead_fraction", DoubleType, "0.3", "rewrite threshold"),
        in("target_file_bytes", LongType, targetBytesDefault, "output file sizing")),
      StructType(Seq(StructField("commit", LongType, nullable = true))),
      (spark, root, input) => {
        val (blooms, parts) = TxTableSource.persistedLayout(root)
        val k = TxTable.compactFiles(spark, root, input.getDouble(1),
          input.getLong(2), blooms, parts)
        // uniform with expire/maintain (round 22, the r20 ADVICE #6
        // one-liner): a fold moved file identities, so drop the cached
        // (root, tip) plan — correct either way (the cache is keyed by
        // tip, and a fold commit advances it), invalidating is simply
        // the uniform posture every mutating procedure takes
        TxTableSource.invalidateRoot(root)
        Array(row(k.map(Long.box).orNull))
      }, resolveRoot),
    Proc("maintain",
      "one self-deciding maintenance tick: checkpoint+expire when the " +
        "tail exceeds max_tail, else dead-fraction compaction; always a " +
        "grace-window vacuum — returns the actions taken",
      Array(tableParam,
        in("max_tail", IntegerType, "32", "checkpoint when resolved tail exceeds this"),
        in("min_dead_fraction", DoubleType, "0.3", "compaction threshold"),
        in("target_file_bytes", LongType, targetBytesDefault, "output file sizing"),
        in("grace_ms", LongType, graceDefault,
          "vacuum grace window; 0 only with all writers quiesced")),
      StructType(Seq(StructField("action", StringType, nullable = false))),
      (spark, root, input) => {
        val (blooms, parts) = TxTableSource.persistedLayout(root)
        val actions = TxTable.maintain(spark, root, input.getInt(1),
          input.getDouble(2), input.getLong(3), blooms,
          partitionCols = parts, graceMs = input.getLong(4))
        TxTableSource.invalidateRoot(root)
        if (actions.isEmpty) Array(row("no action needed"))
        else actions.map(row(_)).toArray
      }, resolveRoot),
    Proc("vacuum",
      "sweep crashed-writer leftovers older than the grace window; " +
        "never touches committed or in-flight ids",
      Array(tableParam,
        in("grace_ms", LongType, graceDefault,
          "age an unredeemed claim must exceed; 0 only with all writers quiesced")),
      StructType(Seq(StructField("n_swept", LongType, nullable = false))),
      (spark, root, input) =>
        Array(row(TxTable.vacuum(spark, root, input.getLong(1)).size.toLong)),
      resolveRoot),
    Proc("register_cursor",
      "record a standing consumer's applied commit position — the " +
        "expire floor honors the minimum live cursor",
      Array(tableParam,
        ProcedureParameter.in("name", StringType)
          .comment("consumer name (plain identifier)").build(),
        ProcedureParameter.in("cursor", LongType)
          .comment("last fully-applied commit id").build()),
      StructType(Seq(
        StructField("consumer", StringType, nullable = false),
        StructField("cursor", LongType, nullable = false))),
      (spark, root, input) => {
        val name = input.getUTF8String(1).toString
        val cursor = input.getLong(2)
        TxTable.registerCursor(root, name, cursor)
        Array(row(name, cursor))
      }, resolveRoot)
  ).map(p => p.procName -> p).toMap

  private[txtable] def names: Seq[String] = Seq(
    "checkpoint", "expire", "compact", "maintain", "vacuum", "register_cursor")

  private[txtable] def load(name: String,
      resolveRoot: String => String): Option[UnboundProcedure] =
    all(resolveRoot).get(name.toLowerCase(java.util.Locale.ROOT))
}
