package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode NFC normalization as a native codegen'd Catalyst expression
 * (SURVEY.md §2.11 preference order (b): custom `Expression` over any
 * UDF). Multilingual crawl text arrives in mixed composition forms —
 * "é" as U+00E9 vs "e"+U+0301 — and EVERY downstream content operation
 * (exact dedup by sha, shingle Jaccard, vocabulary, BPE training) treats
 * those as different bytes unless the corpus is canonicalized first; NFC
 * at ingest is the standard fix (and what the oracle's DuckDB
 * `nfc_normalize` computes, so `q_text_normalize` pins engine parity on
 * the actual Unicode tables).
 *
 * Fast path: `Normalizer.isNormalized` is a cheap scan (the ICU
 * "quick check"), and real-world text is overwhelmingly already NFC —
 * the common case allocates NOTHING and returns the input UTF8String
 * as-is; only denormalized strings pay the String round-trip.
 */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $t")
  }

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.doNormalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NfcNormalize$$.MODULE$$.doNormalize($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted and generated paths — one implementation, no
    * drift between eval modes. */
  def doNormalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
