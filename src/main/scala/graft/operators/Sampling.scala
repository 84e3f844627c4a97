package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Stratified sampling for training-data mixing (SURVEY.md §2.11 extension
 * tier): keep a per-stratum fraction of rows, the relational form of the
 * "mixture weights" step every LLM data pipeline runs before training.
 *
 * The keep decision is a deterministic arithmetic slot — `id mod den <
 * num` — not an RNG: reproducible across engines, runs, and partitionings
 * (a sample that changes under retry is a training-data bug), and
 * oracle-checkable exactly. When ids are not uniformly distributed,
 * substitute a hash slot (`xxhash64(id) mod den`) — same plan shape, same
 * determinism, engine-specific values.
 *
 * Scale posture: one narrow codegen'd filter — no shuffle, no state;
 * sampling is embarrassingly parallel at any corpus size.
 */
object Sampling {

  /** Keep rows of stratum s with probability num/den (exact arithmetic
    * slots), `default` applying to strata not listed. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      quotas: Map[String, (Int, Int)], default: (Int, Int) = (1, 1)): DataFrame = {
    require(quotas.values.forall { case (n, d) => d > 0 && n >= 0 && n <= d },
      "quota fractions must satisfy 0 <= num <= den, den > 0")
    val (dn, dd) = default
    val keep = quotas.foldLeft(pmod(col(idCol), lit(dd)) < lit(dn): Column) {
      case (acc, (stratum, (n, d))) =>
        when(col(stratumCol) === stratum, pmod(col(idCol), lit(d)) < lit(n)).otherwise(acc)
    }
    df.filter(keep)
  }

  /** Mixture report: per-stratum total vs kept counts and the realized
    * ratio — the summary a pipeline logs after the mixing step. */
  def mixtureReport(df: DataFrame, sampled: DataFrame, stratumCol: String): DataFrame = {
    val total = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_total"))
    val kept = sampled.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_kept"))
    total.join(kept, Seq(stratumCol), "left")
      .select(col(stratumCol),
        col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (coalesce(col("n_kept"), lit(0L)).cast("double") / col("n_total").cast("double"))
          .as("ratio"))
  }
}
