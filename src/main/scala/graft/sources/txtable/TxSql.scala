package graft.sources.txtable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions.expr

import graft.sources.TxTable

/**
 * SQL-callable DML for [[graft.sources.TxTable]] (round 19, the r18
 * verdict's pragmatic route: parse with Spark's own parser, route to the
 * library): `MERGE INTO` / `DELETE FROM` / `UPDATE` statements execute
 * against txtable roots —
 *
 * {{{
 *   TxSql.exec(spark, "DELETE FROM t WHERE price > 100", Map("t" -> root))
 *   TxSql.exec(spark, "UPDATE t SET price = price + 1 WHERE urgent", Map("t" -> root))
 *   TxSql.exec(spark,
 *     """MERGE INTO t USING updates AS u ON t.id = u.id
 *        WHEN MATCHED THEN UPDATE SET *
 *        WHEN NOT MATCHED THEN INSERT *""", Map("t" -> root))
 * }}}
 *
 * The statement is parsed by `spark.sessionState.sqlParser` — real SQL,
 * not a home-grown grammar — and the parsed plan routes to
 * [[TxTable.deleteWhere]] / [[TxTable.updateWhere]] / [[TxTable.mergeInto]];
 * predicates and SET expressions round-trip through their canonical SQL
 * form into Columns, so anything those APIs evaluate works here.
 * `tables` maps statement-level table names to txtable roots; a MERGE
 * source not named there resolves as a temp view / catalog table
 * (`spark.table`), or as another txtable root when it is.
 *
 * Honest scope (loud errors, never silent drift from SQL semantics):
 * MERGE supports `UPDATE SET *` / `DELETE` matched clauses,
 * `INSERT *` not-matched, and `NOT MATCHED BY SOURCE THEN DELETE` —
 * all UNCONDITIONAL (clause-level AND conditions and per-column
 * assignment lists are rejected; route those through
 * [[TxTable.updateWhere]]'s expression map instead). The ON clause must
 * be a conjunction of same-name column equalities — the key-join shape
 * every CDC merge uses.
 */
object TxSql {

  /** Execute one DML statement; returns the commit id. */
  def exec(spark: SparkSession, statement: String,
      tables: Map[String, String],
      conflictDetect: Boolean = false,
      conflictWaitMs: Long = 60L * 1000): Long = {
    val parsed = spark.sessionState.sqlParser.parsePlan(statement)
    parsed match {
      case d: DeleteFromTable =>
        TxTable.deleteWhere(spark, rootOf(d.table, tables),
          expr(d.condition.sql), conflictDetect, conflictWaitMs)

      case u: UpdateTable =>
        val set = u.assignments.map { a =>
          val name = a.key match {
            // top-level columns only: collapsing a multipart target to
            // its last part would let `SET addr.city = …` silently
            // overwrite an unrelated top-level `city` column — reject
            // struct-field assignment loudly instead
            case attr: UnresolvedAttribute if attr.nameParts.size == 1 =>
              attr.nameParts.head
            case attr: UnresolvedAttribute => fail(
              s"SET target '${attr.nameParts.mkString(".")}' is multipart — " +
                "only top-level columns can be assigned (struct fields " +
                "update by assigning the whole struct)")
            case other => fail(s"unsupported SET target $other")
          }
          name -> expr(a.value.sql)
        }.toMap
        val cond = u.condition.map(c => expr(c.sql))
          .getOrElse(org.apache.spark.sql.functions.lit(true))
        TxTable.updateWhere(spark, rootOf(u.table, tables), cond, set,
          conflictDetect = conflictDetect, conflictWaitMs = conflictWaitMs)

      case m: MergeIntoTable =>
        val root = rootOf(m.targetTable, tables)
        val source = sourceOf(spark, m.sourceTable, tables)
        val keys = keysOf(m.mergeCondition)
        val matchedAction = m.matchedActions match {
          case Seq() => "none"
          case Seq(UpdateStarAction(None)) => "update"
          case Seq(DeleteAction(None)) => "delete"
          case other => fail("MERGE matched clauses support exactly one " +
            s"unconditional UPDATE SET * or DELETE, got $other")
        }
        val insertNotMatched = m.notMatchedActions match {
          case Seq() => false
          case Seq(InsertStarAction(None)) => true
          case other => fail("MERGE not-matched clauses support exactly " +
            s"one unconditional INSERT *, got $other")
        }
        val deleteUnmatched = m.notMatchedBySourceActions match {
          case Seq() => false
          case Seq(DeleteAction(None)) => true
          case other => fail("MERGE not-matched-by-source clauses support " +
            s"exactly one unconditional DELETE, got $other")
        }
        TxTable.mergeInto(spark, root, source, keys, matchedAction,
          insertNotMatched, deleteUnmatched,
          conflictDetect = conflictDetect, conflictWaitMs = conflictWaitMs)

      case other => fail(
        s"TxSql.exec routes MERGE/DELETE/UPDATE statements; got " +
          s"${other.getClass.getSimpleName} — run reads through " +
          "format(\"txtable\") / the graft catalog / spark.sql directly")
    }
  }

  private def fail(msg: String): Nothing =
    throw new UnsupportedOperationException(s"txtable sql: $msg")

  private def nameOf(p: LogicalPlan): Seq[String] = p match {
    case SubqueryAlias(_, child) => nameOf(child)
    case u: UnresolvedRelation => u.multipartIdentifier
    case other => fail(s"expected a table name, got ${other.getClass.getSimpleName}")
  }

  private def rootOf(p: LogicalPlan, tables: Map[String, String]): String = {
    val name = nameOf(p)
    tables.getOrElse(name.mkString("."),
      tables.getOrElse(name.last, fail(
        s"table '${name.mkString(".")}' is not mapped to a txtable root " +
          s"(known: ${tables.keys.toSeq.sorted.mkString(", ")})")))
  }

  /** MERGE source: a mapped txtable root, else any table/view the
    * session resolves (temp view, catalog table). */
  private def sourceOf(spark: SparkSession, p: LogicalPlan,
      tables: Map[String, String]): DataFrame = {
    val name = nameOf(p)
    tables.get(name.mkString(".")).orElse(tables.get(name.last)) match {
      case Some(root) => TxTable.read(spark, root)
      case None => spark.table(name.mkString("."))
    }
  }

  /** The ON clause as key columns: a conjunction of same-name column
    * equalities (`t.k = s.k [AND …]`). */
  private def keysOf(e: Expression): Seq[String] = e match {
    case And(l, r) => keysOf(l) ++ keysOf(r)
    case EqualTo(l: UnresolvedAttribute, r: UnresolvedAttribute)
        if l.nameParts.last.equalsIgnoreCase(r.nameParts.last) =>
      Seq(l.nameParts.last)
    case other => fail(
      s"MERGE ON must be a conjunction of same-name key equalities " +
        s"(t.k = s.k), got ${other.sql}")
  }
}
