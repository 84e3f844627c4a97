package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE training against the hand-computed merge sequence of the paper's
  * own example corpus (Sennrich et al. 2016 §3.2 uses {low, lower,
  * newest, widest}); encode() must then reproduce the canonical
  * "lowest" → [low, est</w>] segmentation from merges learned WITHOUT
  * ever seeing "lowest". */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // corpus realizing word frequencies low×5 lower×2 newest×6 widest×3
  private def corpus = {
    val words =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    // spread across a few docs so the vocab aggregate actually reduces
    words.grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
  }

  test("learnMerges reproduces the hand-computed merge table") {
    // pair counts round by round (ties break lexicographically):
    //   r0: (e,s)=9 ties (s,t),(t,</w>) → es
    //   r1: (es,t)=9 ties (t,</w>)      → est
    //   r2: (est,</w>)=9                → est</w>
    //   r3: (l,o)=7 ties (o,w)          → lo
    //   r4: (lo,w)=7                    → low
    val merges = Bpe.learnMerges(corpus, "text", numMerges = 5)
    assert(merges == Seq(
      (0, "e", "s"), (1, "es", "t"), (2, "est", Bpe.EndOfWord),
      (3, "l", "o"), (4, "lo", "w")))
  }

  test("encode segments an unseen word with the learned table") {
    val merges = Bpe.learnMerges(corpus, "text", numMerges = 5)
    val got = Seq("lowest low newest").toDF("text")
      .select(Bpe.encode(col("text"), merges).as("toks"))
      .collect()(0).getSeq[scala.collection.Seq[String]](0)
      .toList.map(_.toList)
    assert(got == List(
      Seq("low", "est" + Bpe.EndOfWord),           // unseen word, correct split
      Seq("low", Bpe.EndOfWord),                   // "low" fully merged, eow separate
      Seq("n", "e", "w", "est" + Bpe.EndOfWord)))  // n-e-w never merged (max was 6 < cutoff reached)
  }

  test("learns from the real documents fixture, deterministically") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet").select("text")
    val merges = Bpe.learnMerges(docs, "text", numMerges = 8)
    assert(merges.map(_._1) == (0 until 8))
    // every learned merge's parts are non-empty and the result re-derives
    // bit-identically (distributed argmax is deterministic on real text)
    assert(merges.forall { case (_, a, b) => a.nonEmpty && b.nonEmpty })
    assert(merges == Bpe.learnMerges(docs, "text", numMerges = 8))
  }

  test("training exhausts gracefully when no pairs remain") {
    val tiny = Seq("a a a").toDF("text") // single char + </w>: one possible merge
    val merges = Bpe.learnMerges(tiny, "text", numMerges = 10)
    assert(merges == Seq((0, "a", Bpe.EndOfWord)))
  }

  test("greedy left-to-right merge handles overlapping runs") {
    val df = Seq(("x")).toDF("w")
      .select(split(lit("aaaa"), "").as("chars"))
      .select(graft.operators.Bpe.mergePair(col("chars"), "a", "a").as("m"))
    assert(df.collect()(0).getSeq[String](0) == Seq("aa", "aa"))
  }
}
