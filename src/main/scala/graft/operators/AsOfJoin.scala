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
    val pack = "__asof_payload"
    // The payload travels as ONE struct (null on left rows), so a right row
    // with a legitimately-null payload field still matches atomically —
    // carrying columns independently would fuse fields of different rows.
    val l = left.withColumn(side, lit(1))
      .withColumn(pack, lit(null).cast(
        org.apache.spark.sql.types.StructType(payload.map(right.schema(_)))))
    val r = right.withColumn(side, lit(0))
      .withColumn(pack, struct(payload.map(col): _*))
      .withColumn("__asof_tb", col(rightTieBreak))
      .drop(payload: _*)
    val lAligned = l.withColumn("__asof_tb",
      lit(null).cast(right.schema(rightTieBreak).dataType))
      .select((keys :+ timeCol :+ side :+ pack :+ "__asof_tb").map(col) ++
        left.columns.filterNot(c => keys.contains(c) || c == timeCol).map(col): _*)
    val rAligned = left.columns.filterNot(c => keys.contains(c) || c == timeCol)
      .foldLeft(r) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }.select(lAligned.columns.map(col): _*)
    // Right rows sort before left rows at equal time => inclusive match;
    // among equal-time right rows the greatest tieBreak is carried last.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col(side).asc, col("__asof_tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lAligned.unionByName(rAligned)
      .withColumn(pack, last(col(pack), ignoreNulls = true).over(w))
    payload.foldLeft(carried.filter(col(side) === 1)) { (df, p) =>
      df.withColumn(p, col(s"$pack.$p"))
    }.drop(side, pack, "__asof_tb")
  }
}
