package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-based equivalence for the PPJoin prefix filter: on random
 * corpora (small vocab, so shared shingles and near-dups actually occur)
 * and random thresholds — including values whose t·|doc| products land
 * exactly on integers, the round-3 epsilon-bound hazard —
 * `jaccardPairsThresholded` must equal `jaccardPairs` filtered at the
 * same threshold, pair for pair and column for column.
 */
class DedupPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")

  private def genDoc(len: Int): Gen[String] =
    Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))

  // corpus = base docs + mutated near-copies (token substitutions), the
  // structure prefix filtering exists for
  private def genCorpus: Gen[List[String]] =
    for {
      nBase <- Gen.chooseNum(6, 12)
      lens <- Gen.listOfN(nBase, Gen.chooseNum(8, 20))
      base <- Gen.sequence[List[String], String](lens.map(genDoc))
      mutated = base.zipWithIndex.collect { case (doc, i) if i % 2 == 0 =>
        val toks = doc.split(" ")
        toks.updated(toks.length / 2, vocab((i + 3) % vocab.size)).mkString(" ")
      }
    } yield base ++ mutated

  test("prefix-thresholded == full-join-filtered on random corpora and thresholds") {
    // 0.5 and 0.75 produce exactly-integral t·sz for even/4-divisible doc
    // sizes — the ulp-rounding edge the epsilon bound guards
    val thresholds = Seq(0.5, 0.6, 0.75, 0.8)
    (1 to 4).foreach { trial =>
      val docs = genCorpus(Gen.Parameters.default, Seed(1000L + trial)).get
        .zipWithIndex.map { case (text, i) => (i.toLong, text) }
        .toDF("doc_id", "text")
      val t = thresholds((trial - 1) % thresholds.size)
      def key(df: org.apache.spark.sql.DataFrame) =
        df.select("id_a", "id_b", "inter", "size_a", "size_b", "jaccard")
          .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
      val full = key(Dedup.jaccardPairs(docs, "doc_id", "text").filter(col("jaccard") >= t))
      val pref = key(Dedup.jaccardPairsThresholded(docs, "doc_id", "text", minJaccard = t))
      assert(pref == full,
        s"trial $trial t=$t: only-prefix=${pref -- full} only-full=${full -- pref}")
    }
  }
}
