package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQL MERGE (upsert) for immutable columnar tables, as one full-outer
  * equi-join: a matched source row REPLACES the whole target row
  * (UPDATE), an unmatched source row is an INSERT, an unmatched target
  * row carries forward. Whole-row semantics — a NULL in a source data
  * column overwrites (it does not fall back to the target value), which
  * is what `MERGE ... WHEN MATCHED THEN UPDATE SET *` means.
  *
  * Scale: one shuffle of each side on the key (Catalyst plans SMJ/SHJ;
  * AQE broadcasts a small source, the usual case for incremental
  * upserts into a 100 TB table). Nothing driver-side.
  */
object MergeUpsert {

  def merge(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "merge keys must be non-empty")
    require(source.columns.toSeq == target.columns.toSeq,
      s"schemas must align: target ${target.columns.mkString(",")} vs " +
        s"source ${source.columns.mkString(",")}")
    val dataCols = target.columns.filterNot(keys.contains).toSeq
    val t = target.alias("t")
    val s = source.alias("s")
    val cond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    // key columns are non-null on whichever side matched, so key
    // presence (not data-column nullness) decides which row wins
    val sPresent = keys.map(k => col(s"s.$k").isNotNull).reduce(_ && _)
    t.join(s, cond, "full_outer").select(
      (keys.map(k => coalesce(col(s"s.$k"), col(s"t.$k")).as(k)) ++
        dataCols.map(c =>
          when(sPresent, col(s"s.$c")).otherwise(col(s"t.$c")).as(c))): _*)
  }
}
