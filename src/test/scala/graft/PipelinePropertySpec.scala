package graft

import graft.operators.{Dedup, Packing}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-based checks for the round-7 pipeline operators: the
 * two-level prefix sum must equal the naive scan for ANY bucket
 * configuration (bucket boundaries are where the off-by-one bugs live),
 * and spanStats must equal a driver-side brute-force count on random
 * corpora whose small vocab makes span collisions actually occur.
 */
class PipelinePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("prefixSum == naive scan across bucket widths, sparse and dense keys") {
    val gen = for {
      n <- Gen.chooseNum(50, 300)
      vals <- Gen.listOfN(n, Gen.chooseNum(1L, 500L))
    } yield vals
    (1 to 3).foreach { trial =>
      val vals = gen(Gen.Parameters.default, Seed(7000L + trial)).get
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "n")
      val keyed = df.select(col("id"), Packing.shuffleKey(col("id")).as("key"),
        col("n").cast("long").as("n"))
      val naive = keyed.select("id", "key", "n").as[(Long, Long, Long)].collect()
        .sortBy { case (id, key, _) => (key, id) }
        .scanLeft((0L, 0L)) { case ((_, acc), (id, _, n)) => (id, acc + n) }.drop(1).toMap
      // 0 bits = ONE bucket (degenerate single window); 12 bits = 4096
      // buckets, nearly all singleton or empty — both boundary regimes
      Seq(0, 1, 4, 12).foreach { bits =>
        val got = Packing.prefixSum(keyed, col("key"), col("id"), col("n"), bucketBits = bits)
          .select("id", "cum").as[(Long, Long)].collect().toMap
        assert(got == naive, s"trial $trial bucketBits=$bits diverges from naive scan")
      }
    }
  }

  test("spanStats == brute-force window counting on random corpora") {
    val vocab = Vector("a", "b", "c", "d")   // tiny vocab: collisions abound
    val k = 4
    val gen = for {
      nDocs <- Gen.chooseNum(5, 15)
      lens <- Gen.listOfN(nDocs, Gen.chooseNum(2, 12))
      docs <- Gen.sequence[List[String], String](
        lens.map(l => Gen.listOfN(l, Gen.oneOf(vocab)).map(_.mkString(" "))))
    } yield docs
    (1 to 3).foreach { trial =>
      val corpus = gen(Gen.Parameters.default, Seed(9000L + trial)).get
        .zipWithIndex.map { case (text, i) => (i.toLong, text) }
      // brute force on the driver
      val windows = corpus.flatMap { case (id, text) =>
        text.split(" ").sliding(k).filter(_.length == k).map(w => (id, w.mkString(" ")))
      }
      val counts = windows.groupBy(_._2).view.mapValues(_.size).toMap
      val expect = windows.groupBy(_._1).map { case (id, ws) =>
        val dup = ws.count(w => counts(w._2) > 1)
        id -> ((ws.size, dup))
      }
      val got = Dedup.spanStats(corpus.toDF("doc_id", "text"), "doc_id", "text", k = k)
        .select("id", "n_windows", "n_dup_windows")
        .as[(Long, Int, Int)].collect()
        .map { case (id, a, b) => id -> ((a, b)) }.toMap
      assert(got == expect, s"trial $trial: spark=${got.toSeq.sorted} expected=${expect.toSeq.sorted}")
    }
  }

  test("chunkSpans == brute-force sliding window across size/stride regimes") {
    val gen = Gen.listOfN(150, Gen.chooseNum(1, 200))
    (1 to 3).foreach { trial =>
      val ns = gen(Gen.Parameters.default, Seed(11000L + trial)).get
      val df = ns.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "nt")
      // overlap, tiling (stride == size), and stride ≪ size regimes
      Seq((32, 24), (16, 16), (50, 7)).foreach { case (size, stride) =>
        val got = Packing.chunkSpans(df, "id", col("nt"), size, stride)
          .select("id", "chunk_id", "t_start", "t_end").as[(Long, Int, Int, Int)]
          .collect().groupBy(_._1).view.mapValues(_.toSeq.sortBy(_._2)).toMap
        ns.zipWithIndex.foreach { case (n, i) =>
          // brute force: chunk 0 always; another while the previous window
          // ends short of the document (i.e. the next chunk adds tokens)
          val starts = scala.collection.mutable.ArrayBuffer(0)
          while (starts.last + size < n) starts += starts.last + stride
          val expect = starts.toSeq.zipWithIndex.map { case (st, c) =>
            (i.toLong, c, st, math.min(st + size, n))
          }
          assert(got(i.toLong) == expect,
            s"trial $trial size=$size stride=$stride n=$n: ${got(i.toLong)} vs $expect")
        }
      }
    }
  }
}
