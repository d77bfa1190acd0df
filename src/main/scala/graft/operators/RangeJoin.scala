package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned (bucketed) range join — the scale path for point-in-interval
  * joins with NO equi key. The reference has no join operators at all
  * (SURVEY.md §2.4); Spark plans a bare `lo <= pt AND pt <= hi` predicate
  * as BroadcastNestedLoopJoin (small side) or a cartesian product — both
  * compare every point against every interval, O(|points|·|intervals|),
  * a wall at 100 TB.
  *
  * The classic fix (the technique behind Databricks' range-join hint and
  * Flink/KDB temporal bucketing): quantize the domain into fixed-width
  * bins. Each point lands in exactly ONE bin; each interval is exploded
  * to the bins it covers (ceil(len/width)+1 rows, a small constant when
  * the bin width is chosen near the typical interval length). The join
  * becomes a shuffled EQUI-join on the bin id, and the exact predicate is
  * re-applied as a residual filter. Cost: one shuffle of each side keyed
  * by bin — linear, AQE-skew-splittable, no per-row scan of the other
  * side. A point matches an interval in exactly one bin (its own), so no
  * post-join dedup is needed.
  */
object RangeJoin {

  /** Inner-join `points` to every row of `intervals` whose
    * `[lo, hi]` (inclusive both ends) contains `pt`.
    *
    * `pt`, `lo`, `hi` must be integral columns in the same unit (epoch
    * days, epoch seconds, …); callers convert timestamps up front.
    *
    * @param binWidth bin size in the same unit; pick it near the typical
    *                 interval length, so intervals explode to ~2 bins.
    *                 Too small => interval row amplification; too large =>
    *                 residual filter discards more candidates. Both are
    *                 gradual (performance-only) failure modes.
    */
  def binnedIntervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      pt: String,
      lo: String,
      hi: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val bin = "__rj_bin"
    require(!(points.columns ++ intervals.columns).contains(bin),
      s"column name $bin is reserved by binnedIntervalJoin")
    // Exact long floor-division: (a - pmod(a, w)) div w stays entirely in
    // integer arithmetic and is floor (not truncate) for negatives. The
    // obvious floor(a / w) — and even Column./ on longs — routes through
    // DOUBLE division, which silently loses precision above 2^53:
    // epoch-nanosecond domains (~1.7e18) would land in wrong bins and
    // drop matches.
    def floorDiv(name: String) = expr(
      s"(`$name` - pmod(`$name`, ${binWidth}L)) div ${binWidth}L")
    val p = points.withColumn(bin, floorDiv(pt).cast("long"))
    val i = intervals.withColumn(bin,
      explode(sequence(floorDiv(lo).cast("long"), floorDiv(hi).cast("long"))))
    p.join(i, Seq(bin))
      .filter(col(pt) >= col(lo) && col(pt) <= col(hi))
      .drop(bin)
  }
}
