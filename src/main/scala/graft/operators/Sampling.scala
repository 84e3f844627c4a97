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

  /**
   * Token-budget sampling: keep a deterministic subset of each stratum
   * sized to a TOKEN budget rather than a row fraction — the form real
   * LLM data mixing takes (mixture weights are token shares of the
   * training run, not document counts). Per stratum s:
   *
   *   frac_s  = min(1, budget_s / total_tokens_s)
   *   keep(d) = (id_d · 2654435761) mod 2²⁰  <  ⌊frac_s · 2²⁰⌋
   *
   * The multiplicative-hash slot makes the decision reproducible across
   * engines, runs, and partitionings (same rationale as
   * [[stratifiedSample]]), and the realized token share converges to
   * frac_s as documents per stratum grow. Strata without a budget are
   * kept whole.
   *
   * Scale posture: one per-stratum aggregate (a handful of rows),
   * broadcast back, one codegen'd filter — no corpus shuffle.
   */
  def tokenBudgetSample(df: DataFrame, idCol: String, stratumCol: String,
      tokenCountCol: Column, budgets: Map[String, Long]): DataFrame = {
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    val slots = 1048576L // 2^20 slot granularity
    val withTok = df.withColumn("__tok", tokenCountCol.cast("long"))
    val totals = withTok.groupBy(col(stratumCol))
      .agg(sum(col("__tok")).as("__total"))
    val budgetCol = budgets.foldLeft(lit(null).cast("long")) {
      case (acc, (stratum, b)) =>
        when(col(stratumCol) === stratum, lit(b)).otherwise(acc)
    }
    val thresholds = totals.withColumn("__slot_max",
      when(budgetCol.isNull, lit(slots))
        .otherwise(floor(least(lit(1.0),
          budgetCol.cast("double") / col("__total").cast("double")) * lit(slots.toDouble))))
      .select(col(stratumCol), col("__slot_max"))
    withTok.join(broadcast(thresholds), Seq(stratumCol))
      .filter(pmod(col(idCol) * lit(2654435761L), lit(slots)) < col("__slot_max"))
      .drop("__tok", "__slot_max")
  }

  /**
   * Temperature-based mixture reweighting (the multilingual-LM sampling
   * scheme of Conneau et al. 2020, public): stratum sampling shares
   * p_s ∝ n_s^alpha flatten the corpus' natural size distribution —
   * alpha = 1 reproduces it, alpha → 0 approaches uniform — so
   * low-resource strata are upsampled relative to their raw share. A
   * global token budget B is split b_s = p_s·B and realized through the
   * same deterministic multiplicative-hash slot as [[tokenBudgetSample]]:
   *
   *   frac_s  = min(1, b_s / n_s)
   *   keep(d) = (id_d · 2654435761) mod 10⁶  <  round(frac_s · 10⁶)
   *
   * The threshold is an INTEGER parts-per-million value: the one
   * `pow`-derived double crosses engines only through a half-up round at
   * ppm granularity, so an ulp of libm difference cannot move the keep
   * set (the boundary would have to land within 1e-10 of a .5 ppm).
   *
   * Scale posture: two aggregates over the stratum table (a handful of
   * rows) + a 1-row normalization cross join, thresholds broadcast back,
   * one codegen'd filter — the corpus itself never shuffles.
   */
  def temperatureSample(df: DataFrame, idCol: String, stratumCol: String,
      tokenCountCol: Column, alpha: Double, budgetTokens: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    require(budgetTokens >= 0, "budgetTokens must be non-negative")
    val ppmScale = 1000000L
    val withTok = df.withColumn("__tok", tokenCountCol.cast("long"))
    val totals = withTok.groupBy(col(stratumCol))
      .agg(sum(col("__tok")).as("__total"))
    val z = totals.agg(
      sum(pow(col("__total").cast("double"), lit(alpha))).as("__z"))
    val thresholds = totals.crossJoin(broadcast(z))
      .withColumn("__frac", least(lit(1.0),
        pow(col("__total").cast("double"), lit(alpha)) / col("__z")
          * lit(budgetTokens.toDouble) / col("__total").cast("double")))
      .select(col(stratumCol),
        round(col("__frac") * lit(ppmScale.toDouble), 0).cast("long").as("__ppm"))
    withTok.join(broadcast(thresholds), Seq(stratumCol))
      .filter(pmod(col(idCol).cast("long") * lit(2654435761L), lit(ppmScale)) < col("__ppm"))
      .drop("__tok", "__ppm")
  }

  /** Per-stratum token accounting after [[tokenBudgetSample]]: total vs
    * kept tokens and documents, and the realized token fraction. */
  def tokenMixtureReport(df: DataFrame, sampled: DataFrame, stratumCol: String,
      tokenCountCol: Column): DataFrame = {
    val total = df.groupBy(col(stratumCol)).agg(
      sum(tokenCountCol.cast("long")).as("total_tokens"))
    val kept = sampled.groupBy(col(stratumCol)).agg(
      sum(tokenCountCol.cast("long")).as("kept_tokens"),
      count(lit(1)).as("kept_docs"))
    total.join(kept, Seq(stratumCol), "left")
      .select(col(stratumCol),
        col("total_tokens"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("kept_docs"), lit(0L)).as("kept_docs"),
        round(coalesce(col("kept_tokens"), lit(0L)).cast("double")
          / col("total_tokens").cast("double"), 4).as("token_frac"))
  }

  /**
   * Deterministic global corpus shuffle + shard layout — the step between
   * "dataset is clean" and "training reads it": order must be
   * pseudo-random (no source/topic runs), reproducible (a re-run after a
   * failed job must yield byte-identical shards), and the layout must be
   * N independent shards a data loader can stream.
   *
   * h = (id·2654435761) mod 1e9+7 is the shuffle key, shard = h mod
   * numShards, pos = rank of h within the shard. The window partitions BY
   * SHARD — there is no global sort; each shard sorts independently, so
   * the plan is one hash shuffle + numShards parallel sorts. At 100 TB,
   * size numShards so a shard fits a task (thousands of shards), exactly
   * how training shards are laid out anyway; the write form of this plan
   * is `repartition(col("shard"))` + `sortWithinPartitions("h")` +
   * a partitioned write, which streams each shard file in shuffled order
   * without materializing positions at all.
   */
  def shuffleShard(df: DataFrame, idCol: String, numShards: Int): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    import org.apache.spark.sql.expressions.Window
    val h = pmod(col(idCol).cast("long") * lit(2654435761L), lit(1000000007L))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(numShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .drop("__h")
  }

  /**
   * Hash-based train/validation/test assignment: bucket = (id·2246822519)
   * mod 100, split by cumulative percent thresholds. The decision is a
   * pure function of the id — adding documents never moves an existing
   * document across splits (the property that keeps eval sets stable as a
   * corpus grows), and a different multiplier than [[shuffleShard]]'s
   * decorrelates split membership from shard placement. One codegen'd
   * projection; no shuffle.
   */
  def splitAssign(df: DataFrame, idCol: String,
      trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      "split percents must be non-negative and sum to at most 100")
    val bucket = pmod(col(idCol).cast("long") * lit(2246822519L), lit(100L))
    df.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
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
