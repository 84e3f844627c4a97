package graft

import graft.sources.ParquetIO
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-based round-trip (SURVEY.md §5.1): arbitrary rows over the §1
 * type lattice survive write→read exactly — the generative version of the
 * reference's self-verifying asserts (`reader-writer.cc:219-399`).
 */
class RoundTripPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("b", BooleanType, nullable = false),
    StructField("i", IntegerType, nullable = false),
    StructField("arr", ArrayType(LongType, containsNull = true), nullable = true),
    StructField("f", FloatType, nullable = false),
    StructField("d", DoubleType, nullable = false),
    StructField("s", StringType, nullable = true),
    StructField("bin", BinaryType, nullable = true)))

  private val genRow: Gen[(Boolean, Int, Option[List[Long]], Float, Double, Option[String], Option[List[Byte]])] =
    for {
      b <- Gen.oneOf(true, false)
      i <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
      arr <- Gen.option(Gen.listOfN(3, Gen.chooseNum(Long.MinValue, Long.MaxValue)))
      f <- Gen.chooseNum(-1e30f, 1e30f)
      d <- Gen.chooseNum(-1e100, 1e100)
      s <- Gen.option(Gen.listOf(Gen.asciiPrintableChar).map(_.mkString))
      bin <- Gen.option(Gen.listOfN(8, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)))
    } yield (b, i, arr, f, d, s, bin)

  test("arbitrary typed rows round-trip through parquet exactly") {
    // no scalatestplus bridge in the offline cache — sample generators directly
    (1 to 5).foreach { trial =>
      val rows = Gen.listOfN(40, genRow)
        .apply(Gen.Parameters.default, Seed(42L + trial)).get
      val dir = java.nio.file.Files.createTempDirectory("graft-prop").toString + "/t"
      val data = rows.zipWithIndex.map { case ((b, i, arr, f, d, s, bin), idx) =>
        Row(idx.toLong, b, i, arr.orNull, f, d, s.orNull, bin.map(_.toArray).orNull)
      }
      val df = spark.createDataFrame(spark.sparkContext.parallelize(data, 2), schema)
      ParquetIO.write(df, dir)
      val back = spark.read.parquet(dir).orderBy("id").collect()
      assert(back.length == rows.length)
      (back zip data.sortBy(_.getLong(0))).foreach { case (g, w) =>
        assert(g.getBoolean(1) == w.getBoolean(1))
        assert(g.getInt(2) == w.getInt(2))
        assert(Option(g.getSeq[Long](3)).map(_.toList) ==
          Option(w.get(3)).map(_.asInstanceOf[List[Long]]))
        assert(g.getFloat(4) == w.getFloat(4) ||
          (g.getFloat(4).isNaN && w.getFloat(4).isNaN))
        assert(g.getDouble(5) == w.getDouble(5) ||
          (g.getDouble(5).isNaN && w.getDouble(5).isNaN))
        assert(Option(g.getString(6)) == Option(w.getString(6)))
        assert(Option(g.getAs[Array[Byte]](7)).map(_.toSeq) ==
          Option(w.getAs[Array[Byte]](7)).map(_.toSeq))
      }
    }
  }
}
