package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series densification: fill calendar gaps in a per-key daily
  * series, carrying the last observation forward (LOCF) — the standard
  * prep step before any fixed-stride temporal model or day-over-day
  * comparison.
  *
  * Shape: each observed row generates itself plus one row per missing
  * day up to (exclusive) the key's next observation, so the filled value
  * is carried BY CONSTRUCTION — no second pass, no spine join. This is
  * one window (lead over key) + one generator explode:
  *
  * Scale design (100 TB): a spine-join formulation (per-key min/max →
  * sequence → left join → `last(ignoreNulls)` window) costs a groupBy
  * shuffle, a join shuffle and a window shuffle; this one costs the
  * single per-key window shuffle, and the explode is output-sized (one
  * row per emitted day). Long dormancies amplify a single source row by
  * the gap length — bounded by the calendar range, and AQE splits any
  * post-explode skew before downstream exchanges.
  */
object GapFill {

  /** Densify `df` (one row per (key, day) — day a DATE column) to every
    * day in [min(day), max(day)] per key. Output: key, day, the LOCF'd
    * value column, and `is_gap` marking generated rows.
    */
  def dailyLocf(df: DataFrame, keyCol: String, dayCol: String,
      valueCol: String): DataFrame = {
    val nxt = "__gf_next"
    require(!df.columns.contains(nxt), s"column name $nxt is reserved")
    val w = Window.partitionBy(keyCol).orderBy(dayCol)
    df.withColumn(nxt, lead(col(dayCol), 1).over(w))
      .select(col(keyCol), col(dayCol).as("__gf_src"), col(valueCol),
        explode(sequence(col(dayCol),
          when(col(nxt).isNotNull, date_sub(col(nxt), 1))
            .otherwise(col(dayCol)),
          expr("interval 1 day"))).as(dayCol))
      .select(col(keyCol), col(dayCol), col(valueCol),
        (col(dayCol) =!= col("__gf_src")).as("is_gap"))
  }
}
