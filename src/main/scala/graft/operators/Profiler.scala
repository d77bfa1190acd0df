package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-scan column profiler — the "what is in this table" report every
  * ingest pipeline runs before trusting a new source, composed from the
  * repo's own mergeable sketches: null counts (plain aggregate),
  * distinct cardinality ([[graft.functions.KmvDistinct]] — exact below
  * capacity, layout-invariant), and the modal value
  * ([[graft.functions.TopKFreq]] k=1 — exact in the bounded-domain
  * regime). ALL columns profile in ONE pass: the aggregate computes
  * every column's three summaries side by side, so the table is
  * scanned once regardless of how many columns are profiled, and every
  * summary is a mergeable partial (map-side combined, bounded state —
  * the same contract as the sketches it reuses).
  *
  * Exactness contract (q50's, inherited twice): n_distinct is exact
  * while a column's cardinality stays below `kmvCapacity`; top_value /
  * top_count are exact while it stays below `mgCapacity`. Values are
  * profiled as strings (the sketch ABI's key type); ties on the modal
  * value break to the lexicographically smallest, engine-invariant.
  */
object Profiler {

  /** One row per profiled column: (column_name, n_rows, n_nulls,
    * n_distinct, top_value, top_count).
    */
  def profile(df: DataFrame, columns: Seq[String],
      kmvCapacity: Int = 4096, mgCapacity: Int = 4096): DataFrame = {
    require(columns.nonEmpty, "profile at least one column")
    columns.foreach(c => require(df.columns.contains(c),
      s"column $c not in ${df.columns.mkString(", ")}"))
    val kmv = udaf(new graft.functions.KmvDistinct(kmvCapacity),
      org.apache.spark.sql.Encoders.STRING)
    val tf = udaf(new graft.functions.TopKFreq(1, mgCapacity),
      org.apache.spark.sql.Encoders.STRING)
    val exprs = columns.flatMap { c =>
      val sc = col(c).cast("string")
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        kmv(sc).as(s"${c}__distinct"),
        tf(sc).as(s"${c}__top"))
    } :+ count(lit(1)).as("__rows")
    val one = df.agg(exprs.head, exprs.tail: _*)
    val rows = array(columns.map { c =>
      struct(
        lit(c).as("column_name"),
        col("__rows").as("n_rows"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        try_element_at(col(s"${c}__top.items"), lit(1))
          .getField("key").as("top_value"),
        try_element_at(col(s"${c}__top.items"), lit(1))
          .getField("cnt").as("top_count"))
    }: _*)
    one.select(explode(rows).as("p")).select("p.*")
  }
}
