package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.Aggregator

/** Mutable partial state for [[GeoMean]]: sum of logs + count. */
case class GeoMeanBuf(var sumLog: Double, var n: Long)

/** Geometric mean as a user-defined aggregate — the engine's SQL-surface
  * UDAF path (`spark.udf.register("geomean", functions.udaf(GeoMean))`),
  * the untyped complement of the typed `ReduceAggregator` plugin ABI.
  * Partial aggregation is free: `reduce` folds map-side, `merge` combines
  * partition buffers, so the shuffle carries one (sumLog, n) pair per
  * group per partition — the same partial/final split as built-in `avg`.
  * exp/ln in double: cross-engine drift is far below the 6dp rounding
  * every consuming query applies.
  */
object GeoMean extends Aggregator[Double, GeoMeanBuf, Double] {
  override def zero: GeoMeanBuf = GeoMeanBuf(0.0, 0L)
  override def reduce(b: GeoMeanBuf, x: Double): GeoMeanBuf = {
    b.sumLog += math.log(x); b.n += 1; b
  }
  override def merge(a: GeoMeanBuf, b: GeoMeanBuf): GeoMeanBuf = {
    a.sumLog += b.sumLog; a.n += b.n; a
  }
  override def finish(b: GeoMeanBuf): Double =
    if (b.n == 0) Double.NaN else math.exp(b.sumLog / b.n)
  override def bufferEncoder: Encoder[GeoMeanBuf] = Encoders.product[GeoMeanBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
