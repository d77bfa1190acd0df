package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Corpus drift detection: KL divergence between the token distributions
  * of two corpus slices (last crawl vs new crawl, train vs eval, vendor
  * A vs vendor B) — the data-quality monitor that catches a scraper
  * change, a language-mix shift, or boilerplate injection BEFORE the
  * tokens reach training. Laplace (add-one) smoothing over the UNION
  * vocabulary keeps both directions finite, so the output is a pair of
  * proper KL values plus the vocabulary size.
  *
  * Scale design: two vocabulary-sized count aggregates (map-side
  * combined), one full-outer join on the word (vocabulary-scale, AQE
  * skew-handled), totals as 1-row broadcast aggregates, and a final
  * single-row sum — the corpus itself is scanned once per slice and
  * never reshuffled.
  */
object Drift {

  /** Per-token counts of a slice: (w, `as`) with the count as double —
    * the sufficient statistic every KL variant consumes. Exposed so the
    * streaming monitor ([[graft.streaming.DriftMonitor]]) can persist
    * and accumulate exactly this frame.
    */
  def tokenCounts(df: DataFrame, textCol: String, as: String): DataFrame =
    df.select(explode(Fns.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).cast("double").as(as))

  /** One row: (n_vocab, kl_ref_cand, kl_cand_ref), 6dp. */
  def tokenKl(ref: DataFrame, cand: DataFrame, textCol: String): DataFrame =
    tokenKlFromCounts(tokenCounts(ref, textCol, "cr"),
      tokenCounts(cand, textCol, "cc"))

  /** The KL computation over PRE-AGGREGATED counts — (w, cr) and (w, cc)
    * frames. [[tokenKl]] delegates here, and the streaming monitor calls
    * this directly on its accumulated counts table: batch and streaming
    * share one formula code path by construction, so their agreement is
    * structural, not numerical luck.
    */
  def tokenKlFromCounts(refCounts: DataFrame,
      candCounts: DataFrame): DataFrame = {
    val u = refCounts.join(candCounts, Seq("w"), "full_outer")
      .select(col("w"), coalesce(col("cr"), lit(0.0)).as("cr"),
        coalesce(col("cc"), lit(0.0)).as("cc"))
    val tot = u.agg(sum("cr").as("nr"), sum("cc").as("nc"),
      count(lit(1)).cast("double").as("v"))
    val p = (col("cr") + 1) / (col("nr") + col("v"))
    val q = (col("cc") + 1) / (col("nc") + col("v"))
    u.crossJoin(broadcast(tot))
      .agg(max(col("v")).cast("long").as("n_vocab"),
        round(sum(p * log(p / q)), 6).as("kl_ref_cand"),
        round(sum(q * log(q / p)), 6).as("kl_cand_ref"))
  }
}
