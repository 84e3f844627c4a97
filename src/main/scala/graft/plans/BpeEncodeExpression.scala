package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * BPE ENCODING as a native Catalyst expression (round 13) — the
 * production path for applying a LEARNED merge table
 * ([[graft.operators.Bpe.learnMerges]]) at tokenizer scale.
 *
 * The Column-folding encoder (`Bpe.encode` / `Bpe.encodeTable`) plans one
 * codegen'd array fold PER MERGE RULE: correct, and fine to a few
 * hundred rules, but a real tokenizer carries 10k-50k rules and that
 * expression tree either exceeds codegen limits or (staged through
 * `encodeTable`) pays numMerges sequential array passes per row. This
 * expression carries the merge table as a bound constant and encodes a
 * row in ONE JVM pass: per word, repeatedly apply the LOWEST-RANKED
 * merge present among adjacent token pairs (one hash probe per
 * adjacency), so cost is O(tokens^2) per word worst case — independent
 * of table size — inside whole-stage codegen (the generated code calls
 * one virtual method on the bound table; no interpreter fallback, same
 * pattern as `graft_nfc`).
 *
 * EXACT fold parity, not approximate: the min-rank iteration performs
 * the same left-to-right non-overlapping passes as the fold encoder, in
 * the same rank order (rules whose pair is absent are no-op passes in
 * the fold, and a pass always eliminates its own pair, so the min rank
 * strictly increases). The one divergence risk is the merge-symbol
 * COLLISION case (two merge paths spelling the same string, e.g.
 * "ab"+"c" after "a"+"bc"): a later pass can then resurrect an earlier
 * rule's pair, which the fold (one pass per rule, rank order) would NOT
 * re-merge but a naive priority loop would. Detected exactly — the next
 * min rank failing to increase — and that word falls back to the
 * literal rank-order pass loop, so output equals `Bpe.encode`
 * bit-for-bit on every input (BpeSpec pins it, collision corpora
 * included).
 *
 * SQL surface: `graft_bpe_encode(text, merges)` where `merges` is a
 * FOLDABLE array<struct<rank,left,right>> (the learned table as a typed
 * literal); output array<array<string>> — per word, its token sequence,
 * same shape as `Bpe.encode`.
 */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(ArrayType(StringType))
  override def prettyName: String = "graft_bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, ArrayType(s: StructType, _))
        if s.length == 3 && s(0).dataType == IntegerType &&
          s(1).dataType == StringType && s(2).dataType == StringType =>
      if (right.foldable) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable merge table (a literal)")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, array<struct<int,string,string>>), got ($l, $r)")
  }

  /** The merge table, decoded ONCE from the foldable literal: pair-rank
    * map for the fast path, rank-ordered rules for the fallback path. */
  @transient lazy val table: BpeEncode.Table = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val rules = (0 until arr.numElements()).map { i =>
      val row = arr.getStruct(i, 3)
      (row.getInt(0), row.getUTF8String(1).toString, row.getUTF8String(2).toString)
    }.sortBy(_._1).toArray
    val ranks = new java.util.HashMap[String, Integer](rules.length * 2)
    val byRank = new java.util.HashMap[Integer, Array[String]](rules.length * 2)
    rules.foreach { case (r, a, b) =>
      // tokens are letter/digit/EndOfWord strings, never containing a
      // space, so the joined key cannot collide across pairs
      ranks.putIfAbsent(a + " " + b, r)
      byRank.put(r, Array(a, b))
    }
    BpeEncode.Table(rules, ranks, byRank)
  }

  def encodeRow(s: UTF8String): ArrayData = BpeEncode.encodeRow(table, s)

  override def nullSafeEval(s: Any, m: Any): Any =
    encodeRow(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, (c, _) =>
      s"${ev.value} = $ref.encodeRow($c);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object BpeEncode {
  final case class Table(rules: Array[(Int, String, String)],
      ranks: java.util.HashMap[String, Integer],
      byRank: java.util.HashMap[Integer, Array[String]])

  private val SplitRegex = java.util.regex.Pattern.compile(
    graft.operators.Bpe.SplitPattern)

  def encodeRow(t: Table, s: UTF8String): ArrayData = {
    // UTF8String.toLowerCase == what Spark's lower() computes — the fold
    // encoder's first step, matched exactly
    val words = SplitRegex.split(s.toLowerCase.toString, -1)
    val out = new scala.collection.mutable.ArrayBuffer[GenericArrayData](words.length)
    words.foreach { w => if (w.nonEmpty) out += encodeWord(t, w) }
    new GenericArrayData(out.toArray[Any])
  }

  private def initialTokens(w: String): scala.collection.mutable.ArrayBuffer[String] = {
    val toks = new scala.collection.mutable.ArrayBuffer[String](w.length + 1)
    // code-POINT split — java-regex split("") keeps surrogate pairs
    // whole, and so does this
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      toks += w.substring(i, i + n)
      i += n
    }
    toks += graft.operators.Bpe.EndOfWord
    toks
  }

  private def rankOf(t: Table, a: String, b: String): Int = {
    val r = t.ranks.get(a + " " + b)
    if (r == null) Int.MaxValue else r.intValue()
  }

  /** One left-to-right non-overlapping merge pass — the EXACT semantics
    * of `Bpe.mergePair`'s fold (a merged token is never re-extended in
    * the same pass). */
  private def mergeOnePass(toks: scala.collection.mutable.ArrayBuffer[String],
      a: String, b: String): scala.collection.mutable.ArrayBuffer[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
    var i = 0
    while (i < toks.length) {
      val x = toks(i)
      if (out.nonEmpty && out(out.length - 1) == a && x == b)
        out(out.length - 1) = a + b
      else out += x
      i += 1
    }
    out
  }

  private def encodeWord(t: Table, w: String): GenericArrayData = {
    var toks = initialTokens(w)
    var lastRank = -1
    var anomaly = false
    var done = false
    while (!done && !anomaly && toks.length > 1) {
      var best = Int.MaxValue
      var i = 0
      while (i < toks.length - 1) {
        val r = rankOf(t, toks(i), toks(i + 1))
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else if (best <= lastRank) anomaly = true // collision resurrection
      else {
        val rule = t.byRank.get(best)
        toks = mergeOnePass(toks, rule(0), rule(1))
        lastRank = best
      }
    }
    if (anomaly) {
      // exact fallback: the literal fold — one pass per rule, rank order
      toks = initialTokens(w)
      t.rules.foreach { case (_, a, b) => toks = mergeOnePass(toks, a, b) }
    }
    new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
  }
}
