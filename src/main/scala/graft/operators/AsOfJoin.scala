package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join (nearest earlier right-side row per key) — SURVEY.md §2.3's
 * one operator Spark lacks natively.
 *
 * Implementation: the union–sort trick, not a range join. Left and right
 * rows are unioned, sorted within each key by (ts, side) with right rows
 * first at ties (`<=` semantics), and each left row picks the last
 * non-null right payload seen. Cost: ONE shuffle on the key + a window
 * sort — the same cost class as a sort-merge join, with no O(|L|·|R|)
 * pair blow-up, so it survives 100 TB where a theta-join formulation
 * would not.
 */
object AsOfJoin {

  /**
   * For each left row: the payload of the right row with the greatest
   * `rightTs <= leftTs` and equal `on` keys (ties on ts broken by the
   * greatest `rightId`). Right payload columns come back null-filled when
   * no earlier right row exists.
   *
   * @param rightCols right columns to carry (must include none of left's)
   */
  def asof(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String, rightId: String,
      rightCols: Seq[String]): DataFrame = {
    val carried = (rightId +: rightCols).distinct
    val leftCols = left.columns.toSeq

    val l = carried.foldLeft(
      left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
    )((d, c) => d.withColumn(s"__r_$c", lit(null)))

    // keep the join keys on the right side — they drive the partitioning
    val r0 = right.select((on ++ (rightTs +: carried)).distinct.map(col): _*)
    val r = leftCols.foldLeft(
      carried.foldLeft(
        r0.withColumn("__ts", col(rightTs)).withColumn("__side", lit(0))
      )((d, c) => d.withColumnRenamed(c, s"__r_$c"))
        .drop(rightTs)
    )((d, c) => if (d.columns.contains(c)) d else d.withColumn(c, lit(null)))

    val u = l.unionByName(r.select(l.columns.map(col): _*))
    // right rows sort before left at equal ts (side 0 < 1) → `<=` as-of;
    // among right rows at equal ts the greatest rightId wins (last seen).
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col(s"__r_$rightId").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val picked = carried.foldLeft(u)((d, c) =>
      d.withColumn(s"__p_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w)))
    picked.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ carried.map(c => col(s"__p_$c").as(s"asof_$c")): _*)
  }
}
