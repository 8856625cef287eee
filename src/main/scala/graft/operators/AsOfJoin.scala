package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, the single right row with the
  * greatest `rightTime <= leftTime` within the same key (ties broken by the
  * largest `rightTieBreak`).
  *
  * Spark has no native as-of join, and the naive rendering (θ-join on
  * `rightTime <= leftTime` + groupBy-max) explodes to O(|L|·|R|/|keys|)
  * intermediate rows then shuffles twice. This operator is the single-shuffle
  * sort-merge formulation: union both sides tagged, one window pass per key
  * ordered by (time, side, tiebreak), and `last(_, ignoreNulls)` carries the
  * most recent right row forward into each left row. Cost = one shuffle on
  * key + one in-partition sort — the plan you would hand-write at 100 TB.
  */
object AsOfJoin {

  /** @param rightCols columns of `right` to carry into the result
    * @return left rows (all columns) + carried right columns; left rows with
    *         no preceding right row are dropped (inner as-of semantics).
    */
  def backward(left: DataFrame, right: DataFrame,
               leftKey: Column, rightKey: Column,
               leftTime: Column, rightTime: Column,
               rightTieBreak: Column,
               rightCols: Seq[String]): DataFrame = {
    val leftOut = left.columns.toSeq
    // side 0 = right, 1 = left: a right row at time == left time sorts first,
    // giving `<=` semantics in one ordered pass.
    val l = left.select(
      (leftKey.as("_k") +: leftTime.as("_t") +: lit(1).as("_side") +:
        lit(null).cast("long").as("_tie") +:
        leftOut.map(c => left(c)) ++:
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))): _*)
    val r = right.select(
      (rightKey.as("_k") +: rightTime.as("_t") +: lit(0).as("_side") +:
        rightTieBreak.cast("long").as("_tie") +:
        leftOut.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++:
        rightCols.map(c => right(c))): _*)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").asc, col("_tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select((col("*") +: rightCols.map(c =>
        last(col(c), ignoreNulls = true).over(w).as(s"_carry_$c"))): _*)
    carried.filter(col("_side") === 1)
      .filter(rightCols.map(c => col(s"_carry_$c").isNotNull).reduce(_ && _))
      .select((leftOut.map(col) ++ rightCols.map(c => col(s"_carry_$c").as(c))): _*)
  }
}
