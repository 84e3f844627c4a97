package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Embedding/vector column functions over `ArrayType(FloatType/DoubleType)`
 * (SURVEY.md §2.11 — similarity search surface).
 *
 * All built from higher-order `functions._` (`zip_with`, `aggregate`,
 * `transform`) so they stay inside Catalyst — no Scala UDF round trips, no
 * driver involvement; they run per-row on executors and scale linearly.
 * Per-row folds are sequential left-to-right, so double math here is
 * bit-deterministic (SURVEY.md §7 determinism trap).
 */
object VectorFunctions {

  /** Elementwise cast to double — float inputs promote once, up front. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** dot(a, b) = Σ a_i * b_i (sequential fold → deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y), lit(0.0), (s, x) => s + x)

  /** ‖v‖₂ */
  def l2Norm(v: Column): Column =
    sqrt(aggregate(transform(asDouble(v), x => x * x), lit(0.0), (s, x) => s + x))

  /** cosine(a, b) = dot / (‖a‖‖b‖); 0-norm guarded to NULL. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n =!= 0.0, d / n)
  }

  /** Squared euclidean distance. */
  def l2DistanceSq(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)), lit(0.0), (s, x) => s + x)

  /**
   * Symmetric int8 quantization scale: max |x| / 127 — the per-vector
   * scalar that maps the embedding onto [-127, 127]. Quantization is the
   * standard storage/serving compression for embedding corpora (4× smaller
   * than float32, 8× than float64); at 100 TB it is usually the difference
   * between an index that fits executor memory and one that doesn't.
   */
  def quantScale(v: Column): Column =
    array_max(transform(asDouble(v), x => abs(x))) / lit(127.0)

  /** int8-quantized values: round(x / scale) per element (0 for the
    * all-zero vector, whose scale is 0). */
  def quantizeInt8(v: Column, scale: Column): Column =
    when(scale === 0.0, transform(v, _ => lit(0)))
      .otherwise(transform(asDouble(v), x => round(x / scale, 0).cast("int")))

  /** Root-mean-square reconstruction error of a quantized vector —
    * the quality metric logged alongside the compression step. */
  def dequantRmse(v: Column, q: Column, scale: Column): Column = {
    val errSq = zip_with(asDouble(v), q, (x, qi) =>
      (x - qi.cast("double") * scale) * (x - qi.cast("double") * scale))
    sqrt(aggregate(errSq, lit(0.0), (s, x) => s + x) / size(v))
  }

  /**
   * Random-hyperplane LSH signature: `bits` sign-bits of projections onto
   * deterministic pseudo-random ±1 planes. Plane j's component for
   * dimension d is sign(xxhash64(j * 65537 + d)) — seedable, identical on
   * every executor, no broadcast of plane matrices needed.
   * Returns a long bit-signature usable for bucketed ANN joins.
   */
  def lshSignature(v: Column, bits: Int = 16, seed: Int = 42): Column = {
    val vd = asDouble(v)
    val bitCols = (0 until bits).map { j =>
      // projection_j = Σ_d v[d] * (hash(j,d) even ? 1 : -1)
      val proj = aggregate(
        zip_with(vd, sequence(lit(0), size(vd) - 1), (x, d) =>
          when(pmod(xxhash64(lit(seed), lit(j) * 65537 + d), lit(2)) === 0, x).otherwise(-x)),
        lit(0.0), (s, x) => s + x)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ bitwiseOR _)
  }
}
