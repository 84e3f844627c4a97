package graft

import graft.operators.{Bpe, Multimodal}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-based checks for the round-13 additions: the three BPE
 * equalities (batched training == sequential; native encode == fold
 * encode) must hold on ARBITRARY corpora — random small-alphabet
 * strings maximize shared-symbol conflicts and merge-symbol collisions,
 * the two regimes where the acceptance proof and the collision fallback
 * actually fire — and the perceptual-hash banding must equal the
 * brute-force hamming cut for random hash populations (band-boundary
 * bit placement is where a blocking bug would hide).
 */
class Round13PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randomCorpus(seed: Long): String = {
    val gen = for {
      nWords <- Gen.chooseNum(8, 40)
      words <- Gen.listOfN(nWords, for {
        len <- Gen.chooseNum(1, 7)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
      } yield cs.mkString)
    } yield words.mkString(" ")
    gen(Gen.Parameters.default, Seed(seed)).get
  }

  test("batched learnMerges == sequential on random small-alphabet corpora") {
    (1 to 6).foreach { trial =>
      val corpus = randomCorpus(13000L + trial)
      val df = Seq(corpus).toDF("text")
      val single = Bpe.learnMerges(df, "text", numMerges = 12, batchSize = 1)
      val batched = Bpe.learnMerges(df, "text", numMerges = 12, batchSize = 8)
      assert(batched == single, s"trial $trial corpus '$corpus'")
    }
  }

  test("native graft_bpe_encode == fold encode on random corpora and probes") {
    (1 to 6).foreach { trial =>
      val corpus = randomCorpus(13100L + trial)
      val df = Seq(corpus).toDF("text")
      val merges = Bpe.learnMerges(df, "text", numMerges = 10)
      // probe with the training corpus AND an unseen shuffled variant
      val probe = Seq(corpus, corpus.split(" ").reverse.mkString(" "), "cab abc bca")
        .toDF("text")
      def toks(c: org.apache.spark.sql.Column) = probe.select(c.as("t"))
        .collect().map(_.getSeq[scala.collection.Seq[String]](0).map(_.toList).toList).toList
      val fold = toks(Bpe.encode(col("text"), merges))
      val native = toks(Bpe.encodeNative(spark, col("text"), merges))
      assert(native == fold, s"trial $trial corpus '$corpus' merges $merges")
    }
  }

  test("hash banding == brute-force hamming cut for random hash populations") {
    val gen = Gen.listOfN(120, Gen.chooseNum(Long.MinValue, Long.MaxValue))
    (1 to 3).foreach { trial =>
      // random 64-bit hashes plus planted near-pairs at controlled radii
      val base = gen(Gen.Parameters.default, Seed(13200L + trial)).get.distinct
      val planted = base.take(10).zipWithIndex.map { case (h, i) =>
        // flip exactly i%8 bits spread across band boundaries
        (0 until i % 8).foldLeft(h)((acc, b) => acc ^ (1L << (b * 9 % 64)))
      }
      val hashes = (base ++ planted).distinct.zipWithIndex
        .map { case (h, i) => (i.toLong, h) }.toDF("doc_id", "ahash")
      Seq(2, 6, 10).foreach { maxH =>
        val got = Multimodal.nearDupPairsByHash(hashes, maxHamming = maxH)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        val hs = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val brute = (for {
          a <- hs.keys; b <- hs.keys if a < b
          hm = java.lang.Long.bitCount(hs(a) ^ hs(b)) if hm <= maxH
        } yield (a, b, hm)).toSet
        assert(got == brute, s"trial $trial maxHamming=$maxH")
      }
    }
  }
}
