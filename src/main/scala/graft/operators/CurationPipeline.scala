package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** End-to-end corpus-curation funnel — the composition a pre-training
  * data team actually ships, as ONE first-class operator: quality gate
  * (TextAnalysis.qualityGate's rule chain) → exact dedup with canonical
  * keep (p01's min-id-per-content-hash) → per-source funnel report
  * (how many documents and tokens survive each stage, attributed to the
  * source that contributed them).
  *
  * Output: one row per source —
  * (source, n_in, n_quality, n_canonical, tokens_kept).
  *
  * Scale design: one narrow projection per document (id, source, hash,
  * token count, keep flag — all per-row expressions fused into the scan;
  * text itself is dropped immediately and never shuffled). The dedup
  * pick is a partial-agg min on the content hash; the report side is two
  * dimension-sized aggregates joined on source. `persistBase = true`
  * caches the projection for its two consumers (funnel counts + dedup
  * branch) — the TfIdf.persistTf convention: off by default for session
  * hygiene, on at scale where the rescan is the cost.
  */
object CurationPipeline {
  private def baseProjection(docs: DataFrame, idCol: String,
      textCol: String, srcCol: String, minTokens: Int, maxTokens: Int,
      maxDupFrac: Double): DataFrame =
    docs.select(
      col(idCol).cast("long").as("id"),
      col(srcCol).as("source"),
      md5(col(textCol)).as("content_md5"),
      size(Fns.tokens(col(textCol))).cast("long").as("n_tokens"),
      TextAnalysis.qualityFailReason(col(textCol), minTokens, maxTokens,
        maxDupFrac).isNull.as("keep"))

  private def canonicalOf(base: DataFrame): DataFrame =
    base.join(
      base.filter(col("keep")).groupBy("content_md5")
        .agg(min("id").as("id"))
        .select("id"),
      "id")

  /** The curated corpus itself — one row per surviving canonical doc
    * (id, source, n_tokens): what a pipeline WRITES downstream (see the
    * p59 composition: curatedDocs → ManifestTable → skipped read).
    */
  def curatedDocs(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, minTokens: Int = 5, maxTokens: Int = 5000,
      maxDupFrac: Double = 0.3): DataFrame =
    canonicalOf(baseProjection(docs, idCol, textCol, srcCol, minTokens,
      maxTokens, maxDupFrac))
      .select("id", "source", "n_tokens")

  def funnelReport(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, minTokens: Int = 5, maxTokens: Int = 5000,
      maxDupFrac: Double = 0.3, persistBase: Boolean = false): DataFrame = {
    val base0 = baseProjection(docs, idCol, textCol, srcCol, minTokens,
      maxTokens, maxDupFrac)
    val base = if (persistBase) base0.persist() else base0
    val canon = canonicalOf(base)
    val perSource = base.groupBy("source").agg(
      count(lit(1)).as("n_in"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_quality"))
    val canonAgg = canon.groupBy("source").agg(
      count(lit(1)).as("n_canonical"),
      sum("n_tokens").as("tokens_kept"))
    perSource.join(canonAgg, Seq("source"), "left")
      .select(col("source"), col("n_in"), col("n_quality"),
        coalesce(col("n_canonical"), lit(0L)).as("n_canonical"),
        coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"))
  }
}
