package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality EXPECTATIONS (round 12) — the gate a 100 TB
 * pipeline runs before promoting a landed batch to the lake (the Delta
 * Live Tables "expectations" / Great Expectations contract, engine-side):
 * each rule is a row-level predicate, and ONE aggregate pass over the
 * batch returns per-rule violation counts. Scalar rules cost a single
 * scan regardless of rule count (they all fold into the same
 * partial+final aggregate); uniqueness and referential integrity have
 * irreducibly different plan shapes (a key-grouped count and an
 * anti-join) and are separate checks with the same report schema, so a
 * pipeline unions the three reports into one gate decision.
 */
object Expectations {

  /** A named row-level expectation: rows where `pred` is false (or null —
    * a null predicate is a violation, not a pass) count as violations. */
  final case class Rule(name: String, pred: Column)

  /** All scalar rules in ONE aggregate pass: each rule becomes a
    * conditional count inside the same partial+final HashAggregate, so
    * checking 50 rules costs the same scan as checking one. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "Expectations.check needs at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names: ${rules.map(_.name).diff(rules.map(_.name).distinct).mkString(", ")}")
    // violation columns are referenced POSITIONALLY (not by interpolated
    // name), so rule names are free text — dots, spaces, anything
    // (round-12 review); coalesce makes an EMPTY batch a vacuous PASS
    // (sum over zero rows is null, and null pass would fail a valid
    // empty batch's gate)
    val aggs = Seq(count(lit(1)).as("__n")) ++ rules.zipWithIndex.map { case (r, i) =>
      coalesce(sum(when(coalesce(r.pred, lit(false)), 0L).otherwise(1L)), lit(0L))
        .as(s"__v_$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // melt to the report shape: (rule, n_rows, n_violations, pass)
    val stacked = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col("__n").as("n_rows"),
        col(s"__v_$i").as("n_violations"))
    }
    wide.select(explode(array(stacked: _*)).as("r"))
      .select(col("r.rule"), col("r.n_rows"), col("r.n_violations"),
        (col("r.n_violations") === 0L).as("pass"))
  }

  /** Row-level QUARANTINE split on the same rules as [[check]]: (good,
    * bad) — good rows satisfy EVERY rule, bad rows violate at least one
    * (a null predicate is a violation). The enforcement half of the
    * expectations gate: promote `good` to the lake, land `bad` in the
    * quarantine table with the report from [[check]] as its context.
    * Both frames are plain filters over the batch — no extra pass, no
    * shuffle. */
  def quarantine(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "Expectations.quarantine needs at least one rule")
    val allPass = rules.map(r => coalesce(r.pred, lit(false))).reduce(_ && _)
    (df.filter(allPass), df.filter(!allPass))
  }

  /** Key-uniqueness expectation: violations = rows beyond the first per
    * key (so a key seen k times contributes k−1). One key-hash aggregate. */
  def checkUnique(df: DataFrame, keyCols: Seq[String],
      name: String = "unique_key"): DataFrame = {
    require(keyCols.nonEmpty, "checkUnique needs at least one key column")
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__k"))
      .agg(coalesce(sum(col("__k")), lit(0L)).as("n_rows"),
        coalesce(sum(col("__k") - 1L), lit(0L)).as("n_violations"))
      .select(lit(name).as("rule"), col("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
  }

  /** Referential-integrity expectation: violations = rows whose key has
    * no match in `dim`. An anti-join (broadcast when dim is small — the
    * usual case: checking a fact against a dimension). */
  def checkReferential(df: DataFrame, keyCol: String, dim: DataFrame,
      dimKeyCol: String, name: String = "referential"): DataFrame = {
    // fully declarative — no driver-side counts; the two single-row
    // aggregates meet in a 1×1 cross join (plan-time trivial)
    val total = df.agg(count(lit(1)).as("n_rows"))
    val orphans = df.join(dim.select(col(dimKeyCol)).distinct(),
        col(keyCol) === col(dimKeyCol), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    total.crossJoin(orphans)
      .select(lit(name).as("rule"), col("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
  }
}
