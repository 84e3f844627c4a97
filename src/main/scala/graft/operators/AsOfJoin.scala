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
   * For each left row: the payload of the matching right row under the
   * chosen `direction` and equal `on` keys. Right payload columns come
   * back null-filled when no matching right row exists.
   *
   *  - `backward` (default): greatest `rightTs <= leftTs`; ties on ts
   *    broken by the greatest `rightId` (the last seen).
   *  - `forward`: smallest `rightTs >= leftTs`; ties by smallest id.
   *  - `nearest`: whichever of the two is closer in time; exact ties
   *    prefer backward (pandas `merge_asof` convention).
   *
   * All three directions cost the SAME single shuffle on the key: the
   * union–sort runs once, `forward` reads a mirrored window frame
   * ([current, unbounded following] with left-before-right tie order)
   * over the same partitioning, and `nearest` evaluates both frames and
   * selects per row — Catalyst plans one Exchange with (at most) two
   * sorts, never a second shuffle.
   *
   * @param rightCols right columns to carry (must include none of left's)
   */
  def asof(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String, rightId: String,
      rightCols: Seq[String], direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction),
      s"unknown as-of direction: $direction")
    // nearest needs the matched ts on both sides to compare distances
    val carriedOut = (rightId +: rightCols).distinct
    val carried = (carriedOut ++ (if (direction == "nearest") Seq(rightTs) else Nil)).distinct
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

    // the matched right ROW travels as one struct, picked once per left
    // row — per-column first/last(ignoreNulls) would fill a null right
    // payload column from a DIFFERENT right row than asof_<rightId>
    // (row tearing). The struct is null on left rows (so ignoreNulls
    // skips them) but NON-null on every right row even when payload
    // fields are null, which is exactly the atomic-pick semantics.
    val u = l.unionByName(r.select(l.columns.map(col): _*))
      .withColumn("__r_all", when(col("__side") === 0,
        struct(carried.map(c => col(s"__r_$c").as(c)): _*)).otherwise(lit(null)))
    // backward: right rows sort before left at equal ts (side 0 < 1) →
    // `<=` as-of; among right rows at equal ts the greatest rightId wins
    // (last seen under asc id order).
    val wB = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col(s"__r_$rightId").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: same asc ts order read FORWARD — left rows sort before
    // right at equal ts (side desc) so an equal-ts right row lands in the
    // following frame (`>=`); first non-null under asc id = smallest id.
    val wF = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").desc, col(s"__r_$rightId").asc_nulls_first)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val picked = direction match {
      case "backward" =>
        u.withColumn("__p_all", last(col("__r_all"), ignoreNulls = true).over(wB))
      case "forward" =>
        u.withColumn("__p_all", first(col("__r_all"), ignoreNulls = true).over(wF))
      case "nearest" =>
        val both = u
          .withColumn("__b_all", last(col("__r_all"), ignoreNulls = true).over(wB))
          .withColumn("__f_all", first(col("__r_all"), ignoreNulls = true).over(wF))
        val bts = col("__b_all").getField(rightTs)
        val fts = col("__f_all").getField(rightTs)
        // backward wins exact distance ties; a missing side loses
        val useB = fts.isNull ||
          (bts.isNotNull && (col("__ts") - bts) <= (fts - col("__ts")))
        both.withColumn("__p_all", when(useB, col("__b_all")).otherwise(col("__f_all")))
    }
    picked.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        carriedOut.map(c => col("__p_all").getField(c).as(s"asof_$c")): _*)
  }
}
