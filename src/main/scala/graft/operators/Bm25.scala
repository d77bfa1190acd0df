package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval (Robertson-Spärck Jones Okapi BM25) — the
  * lexical-retrieval standard that TF-IDF (operators/TfIdf.scala, p23)
  * approximates without length normalization or term saturation:
  * score(q,d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
  * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
  * The retrieval half of a RAG / hard-negative-mining stack: MMR (p78)
  * diversifies what this ranks; Decontaminate (p17/p64) uses overlap
  * where this uses ranking.
  *
  * Reference scope note: the reference's only text operator is the
  * word-count tokenizer (/root/reference/mrapps/wc.go:21-31); this is
  * north-star LLM-pipeline surface.
  *
  * Scale design — the corpus pays exactly ONE shuffle: the (id, dl,
  * term) frequency partial-agg (map-side combined; dl rides in the
  * group key, functionally dependent on id, so no second doc join).
  * Everything after is filtered DOWN to query vocabulary before it
  * moves: the distinct query-term set broadcasts as a semi-filter, df
  * is computed over that candidate slice only (still exact — the slice
  * retains every (doc, term) row for query terms), and df/totals come
  * back as parameter-sized broadcasts (totals is the 1-row aggregate
  * cross-join, the p23/p30/p70 pattern). Ranking is TopKPerGroup —
  * per-query map-side state bounded at k rows, no WindowExec. Scores
  * are rounded to 6dp BEFORE selection (the engine-invariance rule:
  * sums of doubles are association-ordered differently across engines;
  * p55's precedent) and ties break on doc id.
  */
object Bm25 {

  /** Per-(query, doc) BM25 scores over matched terms, rounded 6dp.
    * `queries` must carry (qidCol: numeric, qtermsCol: array<string>);
    * duplicate query terms are deduplicated (binary term weighting on
    * the query side — the common implementation choice, mirrored by the
    * oracle). Docs sharing no term with a query simply do not appear.
    */
  def scores(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtermsCol: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("id"),
      split(col(textCol), " ").as("tk"))
    val tf = toks
      .select(col("id"), size(col("tk")).as("dl"), explode(col("tk")).as("term"))
      .groupBy("id", "dl", "term").agg(count(lit(1)).as("tf"))
    val qterms = queries.select(col(qidCol).cast("long").as("qid"),
      explode(array_distinct(col(qtermsCol))).as("term"))
    // exact candidate cut: every (doc, term) row for query terms survives
    val cand = tf.join(broadcast(qterms.select("term").distinct()), "term")
    // round-19: df as a COUNT WINDOW over the candidate stream instead
    // of a separate groupBy branch joined back — the two branches pruned
    // different columns, so exchange reuse could not dedupe them and the
    // corpus explode + partial agg ran TWICE (a candidate-slice
    // localCheckpoint was A/B-rejected in r18: the barrier serialized
    // what AQE overlapped). The window costs one exchange of the
    // CANDIDATE SLICE keyed by term and keeps the whole query a single
    // job with ONE corpus pass. Same value per row: cand has exactly
    // one row per (doc, term), so count(*) over (partition by term) IS
    // the document frequency.
    //
    // Skew honesty (the trade, stated): the slice is one row per
    // matching doc per query term, so a very-high-df query term (a
    // stop-word) lands its whole posting list in ONE window partition —
    // WindowExec buffers the group with disk spill, degrading to a
    // straggler (not an OOM) where the old shape's map-side-aggregated
    // df branch spread it (at the price of the second corpus pass).
    // BM25's own math makes such terms near-worthless (idf -> ln(1+eps))
    // and retrieval callers filter stop-words from queries; for a
    // workload that can't, compute df for the few hottest terms
    // separately (the guide §2.5 hot-key split) or revert to the
    // two-pass shape.
    val withDf = cand.withColumn("df",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy("term")))
    // avgdl as exact-long-sum / count, not avg(): both engines then
    // divide the SAME two exact integers — avg()'s streaming double
    // accumulation could differ in the last ulp across engines
    val totals = toks.agg(count(lit(1)).as("n_docs"),
      (sum(size(col("tk"))).cast("double") / count(lit(1))).as("avgdl"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val denom = col("tf") + lit(k1) *
      (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))
    withDf.join(broadcast(qterms), "term")
      .crossJoin(broadcast(totals))
      .select(col("qid"), col("id"),
        (idf * col("tf") * lit(k1 + 1.0) / denom).as("contrib"))
      .groupBy("qid", "id")
      .agg(round(sum(col("contrib")), 6).as("score"))
  }

  /** Top-k docs per query by (rounded score desc, id asc). */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtermsCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    graft.plans.TopKPerGroup.topK(
      scores(docs, idCol, textCol, queries, qidCol, qtermsCol, k1, b),
      Seq("qid"), Seq(col("score").desc, col("id").asc), k)
  }
}
