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

  /** EMBEDDING-space drift between two corpus slices — the vector-
    * modality member of the drift family (token KL covers text,
    * [[Burst]] covers time): per-dimension reference-vs-candidate
    * means and variances plus the standardized mean difference
    * smd = (mean_cand − mean_ref) / sqrt((var_ref + var_cand) / 2)
    * (Cohen's d with pooled variance — the classic per-feature
    * shift score), 6dp-rounded. A retrained embedder, a corrupted
    * encoder shard, or a modality mix-shift moves these before any
    * downstream ANN/cluster quality metric notices.
    *
    * Scale: one pass per slice through [[Embeddings.covarianceStats]]'
    * per-partition accumulators (O(dims²) partials — the diagonal is
    * what this consumes; the full matrix costs nothing extra at the
    * accumulator sizes dims permits), zero shuffles, output dims rows.
    * Zero-variance dimensions yield null smd (no division by zero).
    */
  def embeddingDrift(ref: DataFrame, cand: DataFrame, embCol: String,
      dims: Int): DataFrame = {
    val spark = ref.sparkSession
    import spark.implicits._
    def stats(df: DataFrame) = {
      val (_, mean, cov) = Embeddings.covarianceStats(df, embCol, dims)
      (mean, (0 until dims).map(i => cov(i)(i)))
    }
    val (mr, vr) = stats(ref)
    val (mc, vc) = stats(cand)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (0 until dims).map { i =>
      val pooled = (vr(i) + vc(i)) / 2.0
      val smd = if (pooled > 0) Some(r6((mc(i) - mr(i)) / math.sqrt(pooled)))
        else None
      (i.toLong, r6(mr(i)), r6(mc(i)), r6(vr(i)), r6(vc(i)), smd)
    }.toDF("dim", "mean_ref", "mean_cand", "var_ref", "var_cand", "smd")
  }

}
