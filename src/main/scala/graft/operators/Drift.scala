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

  /** One row: (n_vocab, kl_ref_cand, kl_cand_ref), 6dp. */
  def tokenKl(ref: DataFrame, cand: DataFrame, textCol: String): DataFrame = {
    def counts(df: DataFrame, as: String) =
      df.select(explode(Fns.tokens(col(textCol))).as("w"))
        .groupBy("w").agg(count(lit(1)).cast("double").as(as))
    val u = counts(ref, "cr").join(counts(cand, "cc"), Seq("w"), "full_outer")
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
