package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

private[plans] trait FloatArrayPair { self: BinaryExpression =>
  // AbstractDataType/ExpectsInputTypes are private[sql] in Spark 4 — check by hand
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got $l and $r")
    }
}

/**
 * Native Catalyst expressions for the embedding hot path (SURVEY.md §2.11,
 * preference order (b): custom `Expression` over any UDF).
 *
 * The `functions._` higher-order formulation (`aggregate(zip_with(...))`)
 * is semantically fine but runs interpreted per element, with lambda-variable
 * boxing. These expressions compile to a tight primitive loop inside
 * whole-stage codegen — one pass over the two float arrays, no allocation —
 * which is what a 100 TB re-rank stage needs.
 */

/** dot(a, b) over ArrayType(FloatType), accumulated in double. */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with FloatArrayPair {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * `bits`-bit random-hyperplane sign sketch of an `array<float>` vector,
 * packed little-endian into ⌈bits/64⌉ longs. Bit j is set iff the
 * projection onto pseudo-random hyperplane j is > 0; hyperplane components
 * are Rademacher ±1 signs derived from a splitmix64 mix of (seed, j, dim),
 * so the sketch needs no stored projection matrix — any executor
 * regenerates the same hyperplanes from (seed, bits) alone, which is what
 * lets this run as a stateless one-pass codegen'd map at 100 TB.
 *
 * E[popcount(xor(sig_a, sig_b))] = bits·θ/π for angle θ between a and b
 * (Goemans–Williamson), so cos(π·hamming/bits) estimates cosine similarity
 * with binomial error √(p(1−p)/bits) — at 256 bits, σ_cos ≈ 0.09. That is
 * the basis of the sketch-and-verify similarity join in
 * [[graft.operators.Similarity.annPairs]].
 */
case class FloatVecSimSig(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression {

  require(bits > 0 && bits % 64 == 0, s"bits must be a positive multiple of 64, got $bits")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_simsig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> argument, got $t")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val words = new Array[Long](bits / 64)
    var j = 0
    while (j < bits) {
      var s = 0.0
      var d = 0
      while (d < n) {
        // splitmix64 finalizer over (seed, j, d) — keep in sync with doGenCode
        var z = seed + j * 0x9E3779B97F4A7C15L + d * 0xBF58476D1CE4E5B9L
        z ^= z >>> 30; z *= 0xBF58476D1CE4E5B9L
        z ^= z >>> 27; z *= 0x94D049BB133111EBL
        z ^= z >>> 31
        val v = x.getFloat(d).toDouble
        s += (if ((z & 1L) == 0L) v else -v)
        d += 1
      }
      if (s > 0) words(j >>> 6) |= (1L << (j & 63))
      j += 1
    }
    new GenericArrayData(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val w = ctx.freshName("w")
      val j = ctx.freshName("j"); val d = ctx.freshName("d")
      val s = ctx.freshName("s"); val z = ctx.freshName("z"); val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |long[] $w = new long[${bits / 64}];
         |for (int $j = 0; $j < $bits; $j++) {
         |  double $s = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    long $z = ${seed}L + $j * 0x9E3779B97F4A7C15L + $d * 0xBF58476D1CE4E5B9L;
         |    $z ^= $z >>> 30; $z *= 0xBF58476D1CE4E5B9L;
         |    $z ^= $z >>> 27; $z *= 0x94D049BB133111EBL;
         |    $z ^= $z >>> 31;
         |    double $v = (double) $a.getFloat($d);
         |    $s += (($z & 1L) == 0L) ? $v : -$v;
         |  }
         |  if ($s > 0) $w[$j >>> 6] |= (1L << ($j & 63));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($w);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** cosine(a, b) over ArrayType(FloatType): dot / (‖a‖·‖b‖) in ONE pass;
  * NULL when either norm is zero. */
case class FloatVecCosine(left: Expression, right: Expression)
    extends BinaryExpression with FloatArrayPair {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble; val yv = y.getFloat(i).toDouble
      d += xv * yv; na += xv * xv; nb += yv * yv; i += 1
    }
    val prod = math.sqrt(na) * math.sqrt(nb)
    if (prod == 0.0) null else d / prod
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val d = ctx.freshName("d"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv"); val p = ctx.freshName("p")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $d = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $d += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |double $p = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($p == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $d / $p; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
