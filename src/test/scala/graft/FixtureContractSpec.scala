package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Schema drift-guard over EVERY fixture table (round 12, generalizing the
 * events.ts lesson): the driver REGENERATES /root/testdata between rounds
 * and encodings have changed before (events.ts went ns→µs before round 10
 * and silently killed 23 queries until EventsEncodingSpec pinned it). This
 * spec makes that failure mode structurally loud for ALL 10 tables: each
 * column must exist with a type from its ACCEPTED alternatives — the set a
 * schema-adaptive reader (RelationalQueries.rd / normalizeEventsTs) can
 * load — and an unknown extra column is surfaced too. A failure prints a
 * readable per-table diff naming exactly what moved, instead of 20 queries
 * dying downstream with unrelated-looking errors.
 *
 * The contract is deliberately LOOSE (type families, not exact types):
 * the guard should fire on drift the readers cannot absorb, not on
 * benign re-encodings they already normalize.
 */
class FixtureContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** A family of types the schema-adaptive readers accept for a column. */
  private sealed abstract class Accept(val show: String) {
    def ok(dt: DataType): Boolean
  }
  private case object Integral extends Accept("integral (int/long/short)") {
    def ok(dt: DataType): Boolean = dt match {
      case LongType | IntegerType | ShortType => true; case _ => false
    }
  }
  private case object Fractional extends Accept("fractional (double/float/decimal)") {
    def ok(dt: DataType): Boolean = dt match {
      case DoubleType | FloatType | _: DecimalType => true; case _ => false
    }
  }
  private case object Str extends Accept("string") {
    def ok(dt: DataType): Boolean = dt == StringType
  }
  /** Timestamp under any driver encoding: µs-native timestamp, NTZ, or the
    * long that spark.sql.legacy.parquet.nanosAsLong produces for ns —
    * exactly the set RelationalQueries.normalizeEventsTs adapts to. */
  private case object Tstamp extends Accept("timestamp (µs/ntz) or ns-as-long") {
    def ok(dt: DataType): Boolean = dt match {
      case TimestampType | TimestampNTZType | LongType => true; case _ => false
    }
  }
  private case object DateLike extends Accept("date or timestamp") {
    def ok(dt: DataType): Boolean = dt match {
      case DateType | TimestampType | TimestampNTZType => true; case _ => false
    }
  }
  private case object FloatVec extends Accept("array<float|double>") {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true; case _ => false
    }
  }

  private val contract: Map[String, Map[String, Accept]] = Map(
    "region" -> Map("r_regionkey" -> Integral, "r_name" -> Str),
    "nation" -> Map("n_nationkey" -> Integral, "n_name" -> Str,
      "n_regionkey" -> Integral),
    "customer" -> Map("c_custkey" -> Integral, "c_name" -> Str,
      "c_nationkey" -> Integral, "c_acctbal" -> Fractional,
      "c_mktsegment" -> Str),
    "supplier" -> Map("s_suppkey" -> Integral, "s_name" -> Str,
      "s_nationkey" -> Integral, "s_acctbal" -> Fractional),
    "part" -> Map("p_partkey" -> Integral, "p_name" -> Str, "p_brand" -> Str,
      "p_type" -> Str, "p_size" -> Integral, "p_retailprice" -> Fractional),
    "orders" -> Map("o_orderkey" -> Integral, "o_custkey" -> Integral,
      "o_orderstatus" -> Str, "o_totalprice" -> Fractional,
      "o_orderdate" -> DateLike, "o_orderpriority" -> Str),
    "lineitem" -> Map("l_orderkey" -> Integral, "l_partkey" -> Integral,
      "l_suppkey" -> Integral, "l_linenumber" -> Integral,
      "l_quantity" -> Fractional, "l_extendedprice" -> Fractional,
      "l_discount" -> Fractional, "l_tax" -> Fractional,
      "l_returnflag" -> Str, "l_linestatus" -> Str, "l_shipdate" -> DateLike),
    "events" -> Map("event_id" -> Integral, "ts" -> Tstamp,
      "user_id" -> Integral, "event_type" -> Str, "value" -> Fractional,
      "props" -> Str),
    "documents" -> Map("doc_id" -> Integral, "text" -> Str, "lang" -> Str,
      "source" -> Str, "n_chars" -> Integral),
    "embeddings" -> Map("vec_id" -> Integral, "embedding" -> FloatVec,
      "label" -> Integral))

  // every SF directory the driver exercises (gate runs at sf0.01, bench at
  // sf0.1, specs at sf0.001) — drift in any of them matters
  private val sfDirs: Seq[String] =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(d).isDirectory)

  test("at least the spec-gate fixture directory exists") {
    assert(sfDirs.contains(TestSpark.sf), s"missing ${TestSpark.sf}")
  }

  for ((table, cols) <- contract.toSeq.sortBy(_._1)) {
    test(s"fixture contract: $table (all SF dirs)") {
      val diffs = sfDirs.flatMap { dir =>
        val path = s"$dir/$table.parquet"
        if (!new java.io.File(path).exists()) Seq(s"$path: MISSING TABLE")
        else {
          val actual = spark.read.parquet(path).schema
            .fields.map(f => f.name -> f.dataType).toMap
          val missing = (cols.keySet -- actual.keySet).toSeq.sorted
            .map(c => s"$path: column '$c' MISSING (expected ${cols(c).show})")
          val extra = (actual.keySet -- cols.keySet).toSeq.sorted
            .map(c => s"$path: UNKNOWN column '$c': ${actual(c).simpleString} " +
              "(driver added a column — extend the contract + readers)")
          val badType = cols.toSeq.sortBy(_._1).collect {
            case (c, acc) if actual.contains(c) && !acc.ok(actual(c)) =>
              s"$path: column '$c' is ${actual(c).simpleString}, accepted: ${acc.show}"
          }
          missing ++ extra ++ badType
        }
      }
      assert(diffs.isEmpty,
        s"\nFIXTURE DRIFT on '$table' — the driver regenerated testdata " +
          s"with a shape the readers may not absorb:\n  ${diffs.mkString("\n  ")}\n")
    }
  }
}
