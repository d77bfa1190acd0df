package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing (CDC extraction): compare two snapshots of the
  * same table and emit only the changed rows, tagged I / U / D. The
  * inverse of MergeUpsert — where merge APPLIES a changeset, diff
  * RECOVERS one — and the standard way to turn daily full dumps into an
  * incremental training-data feed (only re-process documents that
  * actually changed).
  *
  * Scale design: ONE full-outer shuffle join on the key columns; the
  * payload travels as a single packed struct per side so change detection
  * is one null-safe struct comparison, not N column comparisons with
  * separate null logic. Unchanged rows — the overwhelming majority
  * between consecutive 100 TB snapshots — are dropped before anything
  * downstream sees them. Snapshots bucketed by key on write make the join
  * shuffle-free entirely.
  */
object SnapshotDiff {

  /** Change rows between `oldSnap` and `newSnap` (same schema), matched on
    * `keys`: 'I' = key only in new, 'D' = only in old, 'U' = in both with
    * any non-key difference (null-safe). Unchanged rows are dropped.
    * Output: keys, change_type, then old_<c> / new_<c> for every non-key
    * column.
    *
    * `keys` MUST uniquely identify rows within each snapshot — duplicate
    * keys turn the full-outer join many-to-many and the changeset
    * meaningless. (Discovered the hard way: the synthetic lineitem's
    * (l_orderkey, l_linenumber) is NOT unique, 45832 distinct of 60000
    * at sf0.01.)
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String]): DataFrame = {
    require(oldSnap.columns.toSeq == newSnap.columns.toSeq,
      s"snapshot schemas differ: ${oldSnap.columns.toSeq} vs ${newSnap.columns.toSeq}")
    val payload = oldSnap.columns.filterNot(keys.contains).toSeq
    require(payload.nonEmpty, "snapshots need at least one non-key column")
    val o = oldSnap.select(keys.map(col) :+
      struct(payload.map(col): _*).as("__old"): _*)
    val n = newSnap.select(keys.map(col) :+
      struct(payload.map(col): _*).as("__new"): _*)
    o.join(n, keys, "full_outer")
      .filter(col("__old").isNull || col("__new").isNull ||
        !(col("__old") <=> col("__new")))
      .select(keys.map(col) ++
        Seq(when(col("__old").isNull, "I")
          .when(col("__new").isNull, "D")
          .otherwise("U").as("change_type")) ++
        payload.flatMap(c => Seq(
          col("__old").getField(c).as(s"old_$c"),
          col("__new").getField(c).as(s"new_$c"))): _*)
  }
}
