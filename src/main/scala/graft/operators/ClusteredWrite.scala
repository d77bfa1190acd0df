package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Layout-aware parquet writing: the step between "the query is right"
  * and "the next thousand queries are cheap". Two levers, composable:
  *
  *   1. File sizing — repartition to ceil(inputBytes / targetBytes)
  *      before the write, so the output is neither a small-files swarm
  *      (metadata pressure, per-file open cost at 100 TB: a million
  *      1 MB files is an outage) nor a handful of unsplittable giants.
  *   2. Clustering — range-partition + sort by a key (typically
  *      [[graft.functions.ZOrderKey]] over the two hottest predicate
  *      columns) so every file carries tight min/max stats and
  *      stats-based row-group pruning actually fires.
  *
  * Input size comes from the relation's own statistics (file sizes for
  * scans, estimated otherwise) — no extra pass over the data.
  */
object ClusteredWrite {

  /** Partition count that lands output files near `targetBytes`. */
  def sizedPartitions(df: DataFrame, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    ((bytes + targetBytes - 1) / targetBytes).max(1).min(1 << 20).toInt
  }

  /** Write `df` as parquet clustered by `clusterKeys`: range-partitioned
    * into size-targeted files, sorted within each file so min/max stats
    * are tight on the cluster key (and, for a Z-order key, on both of
    * its source dimensions).
    */
  def writeClustered(df: DataFrame, out: String, clusterKeys: Seq[Column],
      targetBytes: Long = 128L << 20): Unit = {
    val n = sizedPartitions(df, targetBytes)
    df.repartitionByRange(n, clusterKeys: _*)
      .sortWithinPartitions(clusterKeys: _*)
      .write.mode("overwrite").parquet(out)
  }
}
