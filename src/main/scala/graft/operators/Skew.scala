package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew handling (SURVEY.md §7 "100 TB posture"): salted equi-join for the
 * case where one join key dominates (AQE's skew-join split handles sort-
 * merge skew automatically; salting is the explicit tool when the build
 * side must be replicated, e.g. hot keys in a fact-fact join).
 *
 * left rows scatter across `salts` sub-keys (deterministic hash of the
 * whole row's key + a spread column); right rows replicate to all salts.
 * Correct for inner/left joins on equality keys.
 */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int, spreadCol: String, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    val l = left.withColumn("__salt",
      pmod(xxhash64(col(key), col(spreadCol)), lit(salts)).cast("int"))
    val r = right.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
