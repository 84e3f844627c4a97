package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Typed custom aggregate (SURVEY.md §2.4 A6): element-wise mean of
 * `array<float>` columns as an `Aggregator` — the Spark-native form for
 * aggregation semantics built-ins can't express as one function.
 * Buffers are (running sums, count); merge is associative+commutative so
 * Spark applies it map-side (partial aggregation) before the shuffle.
 *
 * `Similarity.centroids` (posexplode + groupBy) expresses the same result
 * relationally; this form keeps the vector intact per row — preferable
 * when downstream wants vectors, not (pos, value) pairs.
 */
object VectorAvgAggregator extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    if (v == null) return b
    val sums = if (b._1.isEmpty) new Array[Double](v.length) else b._1
    var i = 0
    while (i < v.length && i < sums.length) { sums(i) += v(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) return b
    if (b._1.isEmpty) return a
    val out = a._1.clone()
    var i = 0
    while (i < out.length && i < b._1.length) { out(i) += b._1(i); i += 1 }
    (out, a._2 + b._2)
  }

  override def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0) Array.empty[Double] else r._1.map(_ / r._2)

  private val arrayEnc: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(arrayEnc, Encoders.scalaLong)

  override def outputEncoder: Encoder[Array[Double]] = arrayEnc
}
