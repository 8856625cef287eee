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
    // The right payload travels as ONE struct with one last(ignoreNulls)
    // carry. Carrying each right column independently would stitch values
    // from different right rows whenever a carried column is legitimately
    // NULL (the null gets skipped and an older row's value survives).
    val payloadType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(right.schema.fieldIndex(c))))
    // side 0 = right, 1 = left: a right row at time == left time sorts first,
    // giving `<=` semantics in one ordered pass.
    val l = left.select(
      (leftKey.as("_k") +: leftTime.as("_t") +: lit(1).as("_side") +:
        lit(null).cast("long").as("_tie") +:
        lit(null).cast(payloadType).as("_payload") +:
        leftOut.map(c => left(c))): _*)
    val r = right.select(
      (rightKey.as("_k") +: rightTime.as("_t") +: lit(0).as("_side") +:
        rightTieBreak.cast("long").as("_tie") +:
        struct(rightCols.map(c => right(c).as(c)): _*).as("_payload") +:
        leftOut.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").asc, col("_tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("_carry", last(col("_payload"), ignoreNulls = true).over(w))
    carried.filter(col("_side") === 1)
      .filter(col("_carry").isNotNull)
      .select((leftOut.map(col) ++
        rightCols.map(c => col("_carry").getField(c).as(c))): _*)
  }
}
