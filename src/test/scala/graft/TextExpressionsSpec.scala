package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_nfc: Unicode NFC canonicalization as a native expression —
  * composition correctness, the no-alloc fast path's identity on
  * already-normalized text, null propagation, and SQL registration. */
class TextExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("composes decomposed sequences and is identity on NFC text") {
    val rows = Seq(
      ("a", "é"),          // e + combining acute -> é
      ("b", "é"),           // already composed é
      ("c", "Å"),          // A + ring -> Å
      ("d", "ascii only"),
      ("e", "")).toDF("id", "s")
    val got = rows.select(col("id"), GraftExtensions.graftNfc(spark, col("s")).as("n"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("a") == "é" && got("a").length == 1)
    assert(got("b") == "é")
    assert(got("c") == "Å" && got("c").length == 1)
    assert(got("d") == "ascii only")
    assert(got("e") == "")
  }

  test("null propagates; SQL registration works; codegen == interpreted") {
    GraftExtensions.register(spark)
    val df = Seq(Some("é"), None).toDF("s")
    df.createOrReplaceTempView("nfc_in")
    val viaSql = spark.sql("SELECT graft_nfc(s) AS n FROM nfc_in").collect()
    assert(viaSql.map(r => Option(r.getString(0))).toSet ==
      Set(Some("é"), None))
    // interpreted path (eval without codegen): force via filter on a
    // literal expression evaluated at plan time
    val interp = graft.plans.NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("é")))
      .eval(null)
    assert(interp.toString == "é")
  }
}
