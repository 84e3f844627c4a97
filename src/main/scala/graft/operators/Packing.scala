package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Sequence packing for LLM training (SURVEY.md §2.11 extension tier): the
 * step that concatenates a deterministically-shuffled corpus and slices it
 * into fixed-length training sequences. Each document needs its global
 * token offset — a prefix sum over the whole corpus.
 *
 * A naive `sum(n) over (order by key)` is a single-partition window: one
 * task sorts and scans 100 TB. The scale-safe shape here is the textbook
 * two-level scan:
 *
 *   1. bucket  = key's high bits — contiguous, deterministic, no sampling
 *      (unlike `repartitionByRange`, whose boundaries come from a
 *      nondeterministic sample job);
 *   2. local   = `sum over (partition by bucket order by key)` — one
 *      hash-partitioned exchange, each bucket cumsum'd in parallel;
 *   3. offsets = per-bucket totals (one row per bucket), cumsum'd with a
 *      tiny single-partition window over O(buckets) rows, broadcast-joined
 *      back.
 *
 * At 100 TB with 2^12 buckets the "global" window touches 4096 rows; every
 * O(n) stage is parallel. The result is independent of physical
 * partitioning — only of the (key, tiebreak) total order — so it is
 * oracle-exact.
 *
 * The shuffle key is a multiplicative (Knuth) hash of the id:
 * `(id * 2654435761) mod 2^32` — deterministic, engine-portable (plain
 * BIGINT arithmetic DuckDB evaluates identically), and a real corpus
 * shuffle: consecutive ids scatter uniformly. A keyed RNG would not be
 * reproducible across engines or retries — a training-data bug.
 */
object Packing {

  /** Knuth multiplicative shuffle key: `(id * 2654435761) mod 2^32`. */
  def shuffleKey(id: Column): Column =
    pmod(id.cast("long") * lit(2654435761L), lit(4294967296L))

  /**
   * Global running total of `valueCol` in (`keyCol`, `tiebreakCol`) order,
   * computed with the two-level bucketed scan above. `bucketBits` = number
   * of key high bits that form the bucket (key must be < 2^32).
   */
  def prefixSum(df: DataFrame, keyCol: Column, tiebreakCol: Column,
      valueCol: Column, bucketBits: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucket = floor(keyCol / lit(4294967296L / (1L << bucketBits)))
    val local = df
      .withColumn("_bucket", bucket)
      .withColumn("_local_cum",
        sum(valueCol).over(Window.partitionBy(col("_bucket"))
          .orderBy(keyCol, tiebreakCol)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // one row per bucket; the running offset each bucket starts from is
    // the sum of every earlier bucket's total
    val offsets = local.groupBy(col("_bucket"))
      .agg(sum(valueCol).as("_bucket_total"))
      .withColumn("_offset",
        coalesce(
          sum(col("_bucket_total")).over(Window.orderBy(col("_bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("_bucket_total")
    local.join(broadcast(offsets), Seq("_bucket"))
      .withColumn("cum", col("_local_cum") + col("_offset"))
      .drop("_bucket", "_local_cum", "_offset")
  }

  /**
   * Pack documents into fixed-length training sequences: shuffle the corpus
   * by [[shuffleKey]], concatenate in key order, slice every `seqLen`
   * tokens. Emits, per document: its shuffle key, token count, global token
   * offset (`cum` = exclusive prefix + n), the sequence its first token
   * lands in, its offset inside that sequence, and how many sequences it
   * spans (documents crossing a boundary are split across them — standard
   * packed-batch semantics).
   */
  def packSequences(df: DataFrame, idCol: String, tokenCountCol: Column,
      seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val keyed = df.select(col(idCol), shuffleKey(col(idCol)).as("shuffle_key"),
      tokenCountCol.cast("long").as("n_tokens"))
    prefixSum(keyed, col("shuffle_key"), col(idCol), col("n_tokens"))
      .withColumn("start_tok", col("cum") - col("n_tokens"))
      .select(col(idCol), col("shuffle_key"), col("n_tokens").cast("int").as("n_tokens"),
        col("cum").as("cum_tokens"),
        expr(s"start_tok div $seqLen").as("seq_id"),
        pmod(col("start_tok"), lit(seqLen.toLong)).as("seq_offset"),
        (expr(s"(cum - 1) div $seqLen") - expr(s"start_tok div $seqLen") + lit(1L))
          .as("n_seqs"))
  }

  /**
   * Context-length chunking — the inverse of packing: split each document
   * into fixed `size`-token windows advancing by `stride` (overlap =
   * size − stride), the preprocessing step that feeds an embedding model
   * or fixed-context trainer. Emits (id, chunk_id, t_start, t_end) with
   * t_end exclusive.
   *
   * Chunk count is `1 + max(0, ceil((n − size) / stride))`: every chunk
   * past the first must ADD tokens — the naive `ceil(n / stride)` emits a
   * final chunk that is pure overlap whenever n mod stride lands in
   * (0, size − stride]. Boundaries are per-row arithmetic (sequence +
   * explode, a map-side Generate): no shuffle, so at 100 TB this
   * parallelizes with the scan it reads from.
   */
  def chunkSpans(df: DataFrame, idCol: String, nTokensCol: Column,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    df.select(col(idCol), nTokensCol.cast("long").as("n_tokens"))
      .withColumn("chunk_id",
        explode(sequence(lit(0L),
          greatest(lit(0L),
            ceil((col("n_tokens") - size).cast("double") / stride).cast("long")))))
      .select(col(idCol), col("chunk_id").cast("int").as("chunk_id"),
        (col("chunk_id") * stride).cast("int").as("t_start"),
        least(col("chunk_id") * stride + size, col("n_tokens")).cast("int").as("t_end"))
  }
}
