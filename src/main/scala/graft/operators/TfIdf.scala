package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** TF-IDF term weighting over a tokenized corpus, with top-k salient
  * terms per document — the classic keyword-extraction / relevance
  * primitive a training-data pipeline uses for topic balancing and
  * per-document metadata.
  *
  * Weighting is sklearn's smooth variant: `idf = ln((N+1)/(df+1)) + 1`,
  * `score = tf * idf` (N = corpus size, df = documents containing the
  * term). Both factors are computed identically by DuckDB (`ln` on the
  * same IEEE ratio), so the oracle reproduces every score bit-for-bit
  * before rounding.
  *
  * Scale design (100 TB): one explode + one (doc, term) partial-agg
  * shuffle — linear in token count with map-side combine; the document
  * frequency table is a second vocabulary-sized aggregate REUSING the
  * same-keyed (term) shuffle; N joins in as a broadcast 1-row aggregate
  * (never a driver-side collect); the tf-df join shuffles by term
  * (vocabulary scale, AQE-handled skew for stopwords); top-k per doc is
  * the engine's TopKPerGroup physical operator, so the final exchange
  * carries at most k rows per (doc, input partition) instead of sorting
  * whole documents under a window.
  */
object TfIdf {

  /** (id, term, tf) — per-document term frequencies. */
  def termFreq(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(Fns.tokens(col(textCol))).as("term"))
      .groupBy("id", "term")
      .agg(count(lit(1)).as("tf"))

  /** (id, term, tf, score) — the full scored posting list.
    *
    * Catalyst has no automatic common-subplan reuse, so the df branch
    * re-scans the corpus by default. `persistTf = true` caches the tf
    * posting list (MEMORY_AND_DISK) so both the df aggregate and the
    * tf-df join read the single materialized pass — the fix for the
    * double scan when the corpus is an expensive subquery or at 100 TB.
    * The cache is LRU-evicted by Spark; callers wanting deterministic
    * release can unpersist via the returned frame's lineage.
    */
  def scored(docs: DataFrame, idCol: String, textCol: String,
      persistTf: Boolean = false): DataFrame = {
    val tf0 = termFreq(docs, idCol, textCol)
    val tf = if (persistTf)
      tf0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else tf0
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf") * (log((col("n_docs") + 1).cast("double") /
          (col("df") + 1).cast("double")) + 1.0))
      .select("id", "term", "tf", "score")
  }

  /** Top-k terms per document by (score desc, term asc) — deterministic
    * under exact score ties (same (tf, df) pair → bit-equal scores).
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int,
      persistTf: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    graft.plans.TopKPerGroup.topK(scored(docs, idCol, textCol, persistTf),
      Seq("id"), Seq(col("score").desc, col("term").asc), k)
  }
}
