package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator the reference lacks entirely
  * (SURVEY.md §2.4 "joins — all forms": ABSENT) and Spark has no built-in
  * for. Implemented by composition (preference order (a) of the brief):
  * union the two sides, then a single per-key time-ordered window carries
  * the latest right-side payload forward onto each left row.
  *
  * Scale design: ONE shuffle on the key columns (the window partition), no
  * range-explosion join, no driver-side state. At 100 TB this costs the
  * same as any windowed analytic (sort within key partitions) and is
  * AQE-safe. A range-join formulation (left ⋈ right on key AND rt <= lt,
  * then max) would shuffle both sides AND explode matches quadratically on
  * hot keys; the union+window form is linear.
  */
object AsOfJoin {

  /** For each left row, attach the latest right row with
    * rightTime <= leftTime (backward as-of, inclusive), matched on `keys`.
    *
    * @param right pre-projected to `keys ++ timeCol ++ payload` columns;
    *              payload names must not clash with left's columns.
    * @param rightTieBreak payload column ordering simultaneous right rows
    *                      (the larger value wins); makes results
    *                      deterministic when right has duplicate times.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      rightTieBreak: String): DataFrame = {
    val payload = right.columns.filterNot(c => keys.contains(c) || c == timeCol)
    val side = "__asof_side"
    val l = payload.foldLeft(left.withColumn(side, lit(1))) { (df, p) =>
      df.withColumn(p, lit(null).cast(right.schema(p).dataType))
    }
    val r = left.columns.filterNot(c => keys.contains(c) || c == timeCol)
      .foldLeft(right.withColumn(side, lit(0))) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    // Right rows sort before left rows at equal time => inclusive match;
    // among equal-time right rows the greatest tieBreak is carried last.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col(side).asc, col(rightTieBreak).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(l.unionByName(r.select(l.columns.map(col): _*))) {
      (df, p) => df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    carried.filter(col(side) === 1).drop(side)
  }
}
