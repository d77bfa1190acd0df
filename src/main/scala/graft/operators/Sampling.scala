package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Deterministic per-stratum subsampling: exactly min(k, |stratum|) rows
  * per stratum, selected by salted-hash order — the eval-set / ablation
  * construction primitive. Hash order (FNV-1a of the id) makes the
  * sample a pure function of the data: stable across runs, partition
  * layouts, cluster sizes and engines — unlike `sample()`, whose RNG
  * stream is partition-dependent, and unlike "first k" which is
  * scan-order-dependent.
  *
  * Scale design: planned through the engine's custom TopKPerGroup
  * physical operator — map-side bounded heaps cap the exchange at k rows
  * per (stratum x input partition), so a 100 TB corpus shuffles KBs per
  * stratum instead of sorting whole strata under a window. Hash ties
  * break by id, so the result is total-order deterministic.
  */
object Sampling {

  def perStratum(df: DataFrame, stratumCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val h = "__samp_h"
    require(!df.columns.contains(h), s"column name $h is reserved by perStratum")
    graft.plans.TopKPerGroup
      .topK(df.withColumn(h, Fns.fnv1a32(col(idCol).cast("string"))),
        Seq(stratumCol), Seq(col(h).asc, col(idCol).asc), k)
      .drop(h)
  }

  /** Mixture sampling — the data-mixing primitive: per-stratum QUOTAS
    * (e.g. upweight curated sources, downweight crawl), selected in the
    * same deterministic hash order as [[perStratum]]. Strata absent from
    * `quotas` are dropped (quota 0).
    *
    * Scale design: one TopKPerGroup pass at k = max(quota) prunes the
    * corpus to ≤ k rows per (stratum × input partition) map-side; the
    * exact per-stratum cut (row_number ≤ quota) then runs on that pruned,
    * quota-bounded set — the full corpus never sees a window sort.
    */
  def mixture(df: DataFrame, stratumCol: String, idCol: String,
      quotas: Map[String, Int]): DataFrame = {
    require(quotas.nonEmpty, "quotas must be non-empty")
    require(quotas.values.forall(_ >= 1), s"quotas must be >= 1: $quotas")
    val h = "__samp_h"
    val rn = "__samp_rn"
    require(!df.columns.contains(h) && !df.columns.contains(rn),
      s"column names $h/$rn are reserved by mixture")
    val kmax = quotas.values.max
    val quotaCol = quotas.foldLeft(lit(0)) { case (acc, (s, k)) =>
      when(col(stratumCol) === s, lit(k)).otherwise(acc)
    }
    val order = Seq(col(h).asc, col(idCol).asc)
    val pruned = graft.plans.TopKPerGroup.topK(
      df.withColumn(h, Fns.fnv1a32(col(idCol).cast("string"))),
      Seq(stratumCol), order, kmax)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol).orderBy(order: _*)
    pruned.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= quotaCol)
      .drop(h, rn)
  }
}
