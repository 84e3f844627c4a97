package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/**
 * Mergeable count-min-sketch support — the FREQUENCY analogue of the
 * HLL distinct-count rollup (`hll_union_agg`): Spark ships the builder
 * aggregate (`count_min_sketch`) but no union aggregate, so pre-aggregated
 * per-stratum frequency sketches could not be rolled up without rescanning
 * raw data. `graft_cms_merge` closes that gap; `graft_cms_estimate` probes
 * a serialized sketch for an item's estimated count.
 *
 * Scale shape: per-stratum sketches are built by the codegen'd built-in
 * over the raw table (map-side partial merge); any rollup then consumes
 * |strata| fixed-size binaries. The merge is exact counter-wise addition —
 * a merged sketch is bit-identical to one built over the concatenated
 * input (SketchFreqSpec pins that invariant), so CMS's one-sided error
 * guarantee (estimate ≥ true count) survives arbitrary rollup trees.
 */

/** Buffer holder: the sketch stays null until the first input, because
  * CMS dimensions (depth/width/seed) travel with the serialized input
  * sketches — there is nothing valid to pre-allocate. */
final class CmsBuffer(var sk: CountMinSketch)

/** Union-aggregate over serialized count-min sketches (BinaryType →
  * BinaryType). Input sketches must share depth/width/seed; Spark's
  * `mergeInPlace` raises IncompatibleMergeException otherwise, which is
  * the correct loud failure for a mis-parameterized sketch table. */
case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_cms_merge"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary (serialized count-min sketch) argument, got $t")
  }

  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(null)

  override def update(buf: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val sk = CountMinSketch.readFrom(new ByteArrayInputStream(v.asInstanceOf[Array[Byte]]))
      if (buf.sk == null) buf.sk = sk else buf.sk.mergeInPlace(sk)
    }
    buf
  }

  override def merge(b1: CmsBuffer, b2: CmsBuffer): CmsBuffer = {
    if (b2.sk != null) {
      if (b1.sk == null) b1.sk = b2.sk else b1.sk.mergeInPlace(b2.sk)
    }
    b1
  }

  override def eval(buf: CmsBuffer): Any =
    if (buf.sk == null) null else sketchBytes(buf.sk)

  override def serialize(buf: CmsBuffer): Array[Byte] =
    if (buf.sk == null) Array.emptyByteArray else sketchBytes(buf.sk)

  override def deserialize(bytes: Array[Byte]): CmsBuffer =
    if (bytes.isEmpty) new CmsBuffer(null)
    else new CmsBuffer(CountMinSketch.readFrom(new ByteArrayInputStream(bytes)))

  private def sketchBytes(sk: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    sk.writeTo(out)
    out.toByteArray
  }

  override def withNewMutableAggBufferOffset(o: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): CmsMergeAgg = copy(child = c(0))
}

/** estimateCount probe of a serialized sketch: `graft_cms_estimate(sk,
  * item)` → long. Deserializes the sketch per ROW — this is a rollup-table
  * probe (|strata| or |top-k| rows), never a per-document hot path; the
  * item-type handling mirrors the built-in builder aggregate so probes hash
  * identically to how values were added (integral → long path, string →
  * UTF-8 bytes). */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType | IntegerType | StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, long|int|string), got ($l, $r)")
    }

  override def nullSafeEval(skBytes: Any, item: Any): Any = {
    val sk = CountMinSketch.readFrom(
      new ByteArrayInputStream(skBytes.asInstanceOf[Array[Byte]]))
    val probe: Any = item match {
      case s: UTF8String => s.getBytes // builder adds strings as UTF-8 bytes
      case other => other
    }
    sk.estimateCount(probe)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CmsEstimate = copy(left = l, right = r)
}

// ── mergeable quantile sketches ──────────────────────────────────────────
//
// Same gap as CMS: `percentile_approx` computes quantiles from raw data,
// but its Greenwald-Khanna summary is never exposed, so per-stratum
// quantile state could not be stored and rolled up. `graft_quant_agg`
// emits the GK summary as a binary; `graft_quant_merge` unions binaries;
// `graft_quant_q` probes one. Completes the sketch-table triad:
// distinct (hll_union_agg), frequency (graft_cms_merge), quantiles (here).

private[plans] object QuantCodec {
  import org.apache.spark.sql.catalyst.util.QuantileSummaries
  import QuantileSummaries.Stats

  def write(qs: QuantileSummaries): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeDouble(qs.relativeError)
    out.writeInt(qs.compressThreshold)
    out.writeLong(qs.count)
    out.writeInt(qs.sampled.length)
    qs.sampled.foreach { s =>
      out.writeDouble(s.value); out.writeLong(s.g); out.writeLong(s.delta)
    }
    out.flush(); bos.toByteArray
  }

  def read(bytes: Array[Byte]): QuantileSummaries = {
    val in = new java.io.DataInputStream(new ByteArrayInputStream(bytes))
    val eps = in.readDouble()
    val thr = in.readInt()
    val count = in.readLong()
    val sampled = Array.fill(in.readInt())(
      Stats(in.readDouble(), in.readLong(), in.readLong()))
    // serialized summaries are always compressed (see callers)
    new QuantileSummaries(thr, eps, sampled, count, true)
  }
}

/** Builder: double column → serialized compressed GK summary. `eps` is the
  * target relative RANK error; it parameterizes the summary so it must be
  * a literal. */
case class QuantSketchAgg(
    child: Expression,
    eps: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.spark.sql.catalyst.util.QuantileSummaries] {
  import org.apache.spark.sql.catalyst.util.QuantileSummaries

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_quant_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double argument, got $t")
  }

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, eps,
      Array.empty, 0L, false)

  override def update(buf: QuantileSummaries, input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buf else buf.insert(v.asInstanceOf[Double])
  }

  override def merge(b1: QuantileSummaries, b2: QuantileSummaries): QuantileSummaries =
    if (b2.count == 0) b1 else if (b1.count == 0) b2
    else b1.compress().merge(b2.compress())

  override def eval(buf: QuantileSummaries): Any =
    if (buf.count == 0) null else QuantCodec.write(buf.compress())

  override def serialize(buf: QuantileSummaries): Array[Byte] =
    QuantCodec.write(buf.compress())

  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantCodec.read(bytes)

  override def withNewMutableAggBufferOffset(o: Int): QuantSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): QuantSketchAgg = copy(child = c(0))
}

/** Union-aggregate over serialized GK summaries. GK merge keeps the rank
  * error bounded by the larger of the two inputs' errors (Greenwald &
  * Khanna 2001; Spark's own approxQuantile merges partials the same way),
  * so a rollup tree stays a valid summary of the concatenated input. */
case class QuantMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.spark.sql.catalyst.util.QuantileSummaries] {
  import org.apache.spark.sql.catalyst.util.QuantileSummaries

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_quant_merge"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary (serialized quantile summary) argument, got $t")
  }

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      QuantileSummaries.defaultRelativeError, Array.empty, 0L, false)

  override def update(buf: QuantileSummaries, input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val other = QuantCodec.read(v.asInstanceOf[Array[Byte]])
      if (buf.count == 0) other else buf.compress().merge(other)
    }
  }

  override def merge(b1: QuantileSummaries, b2: QuantileSummaries): QuantileSummaries =
    if (b2.count == 0) b1 else if (b1.count == 0) b2
    else b1.compress().merge(b2.compress())

  override def eval(buf: QuantileSummaries): Any =
    if (buf.count == 0) null else QuantCodec.write(buf.compress())

  override def serialize(buf: QuantileSummaries): Array[Byte] =
    if (buf.count == 0) Array.emptyByteArray else QuantCodec.write(buf.compress())

  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    if (bytes.isEmpty) createAggregationBuffer() else QuantCodec.read(bytes)

  override def withNewMutableAggBufferOffset(o: Int): QuantMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): QuantMergeAgg = copy(child = c(0))
}

/** Probe: `graft_quant_q(summary, p)` → approximate p-quantile (double). */
case class QuantQuery(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_quant_q"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, org.apache.spark.sql.types.DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, double), got ($l, $r)")
    }

  override def nullSafeEval(skBytes: Any, p: Any): Any =
    QuantCodec.read(skBytes.asInstanceOf[Array[Byte]])
      .query(p.asInstanceOf[Double]).getOrElse(null)

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): QuantQuery = copy(left = l, right = r)
}
