package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact duplicated-SUBSTRING dedup — Lee et al. 2022 ("Deduplicating
  * Training Data Makes Language Models Better") ExactSubstr semantics,
  * re-expressed as Spark dataflow: any token run of width >= `w` that
  * occurs more than once in the corpus (across documents OR repeated
  * within one) is a duplicated region; per document, the matched
  * fixed-width windows are merged into maximal spans and REMOVED,
  * yielding a cleaned corpus plus span telemetry. This is the
  * transform-side twin of the mining-side `repeatedSpansLadder` (p56):
  * p56 reports what repeats, this operator rewrites the corpus.
  *
  * The reference's engine has no text operators beyond the word-count
  * tokenizer (/root/reference/mrapps/wc.go:21-31); this lives in the
  * north-star LLM-pipeline scope.
  *
  * Algorithm (all stride-1 windows of width `w`):
  *   1. windows: per doc, posexplode over slice-joins of the token
  *      array — per-row expression work, no UDF, index = window start.
  *   2. HASH PRE-FILTER: group window COUNTS by `xxhash64(span)` — the
  *      shuffle carries 16-byte (hash, count) partials, never the W-token
  *      span text, and map-side combine collapses repeats. Hashes with
  *      count >= minCount become the candidate set.
  *   3. EXACT CONFIRM: candidate hashes join back to the windows (the
  *      candidate set broadcasts when small — the common, boilerplate-
  *      light case; set `broadcastCandidates=false` to force the shuffle
  *      join on boilerplate-heavy corpora where it is large), and only
  *      the surviving windows group by the REAL span string, re-applying
  *      `count >= minCount`. A 64-bit collision can only ever ADD a
  *      candidate that this string-keyed pass then rejects, so the
  *      result is exact — the acceleration is invisible (BloomPrune's
  *      contract), and the span text crosses the wire only for the
  *      candidate slice.
  *   4. Per doc: sorted matched starts fold into maximal merged
  *      intervals with one `aggregate` higher-order expression (touching
  *      windows merge: fixed width + sorted starts make the island check
  *      `s <= last.e`); cleaned text drops every token inside an
  *      interval via an indexed `filter` HOF. No WindowExec anywhere.
  *
  * 100 TB design: the only corpus-sized shuffle is step 2's partial-agg
  * on a fixed-width hash — window text never moves unless it is a
  * candidate. Per-doc state is bounded by document length (monster docs
  * are chunked upstream, operators/Chunking.scala). Lee et al. build a
  * single-node suffix array; the windowed-hash formulation trades the
  * suffix array's arbitrary-length maximality for fixed-width-merged
  * maximality (equal coverage for every duplicated run >= w tokens,
  * the published threshold regime) and in exchange distributes as
  * ordinary partial aggregation.
  */
object ExactSubstrDedup {

  /** Per-document duplicated spans + cleaned text. Output:
    * (id, n_spans, dup_tokens, n_tokens, cleaned_text) — one row per
    * input document, including untouched ones (n_spans = 0).
    */
  def cleanedCorpus(df: DataFrame, idCol: String, textCol: String,
      w: Int = 8, minCount: Long = 2,
      broadcastCandidates: Boolean = true): DataFrame = {
    require(w >= 1, s"window width must be >= 1, got $w")
    require(minCount >= 2, s"minCount < 2 marks every window, got $minCount")
    val docs = df.select(col(idCol).cast("long").as("id"),
      split(col(textCol), " ").as("tk"))

    // 1. stride-1 windows; docs shorter than w emit none (sequence with
    // a negative end would DESCEND, so the guard is load-bearing)
    val winArr = transform(
      sequence(lit(0), size(col("tk")) - lit(w)),
      i => array_join(slice(col("tk"), i + lit(1), lit(w)), " "))
    val wins = docs
      .select(col("id"),
        when(size(col("tk")) >= w, winArr)
          .otherwise(array().cast("array<string>")).as("wa"))
      .select(col("id"), posexplode(col("wa")))
      .select(col("id"), col("pos").as("s"), col("col").as("span"),
        xxhash64(col("col")).as("h"))

    // 2. hash pre-filter: 16-byte partials, map-side combined
    val candH = wins.groupBy("h").agg(count(lit(1)).as("hc"))
      .filter(col("hc") >= minCount).select("h")

    // 3. exact string-keyed confirm over the candidate slice only
    val cand = wins.join(
      if (broadcastCandidates) broadcast(candH) else candH, "h")
    val dupSpans = cand.groupBy("span").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount).select("span")
    val matched = cand.join(dupSpans, "span").select("id", "s")

    // 4. per-doc island merge + token removal, all HOF expression work
    val starts = matched.groupBy("id")
      .agg(sort_array(collect_list(col("s"))).as("ss"))
    val emptyIslands = array().cast("array<struct<b:int,e:int>>")
    val islands = aggregate(col("ss"), emptyIslands, (acc, s) => {
      val last = element_at(acc, -1)
      when(size(acc) > 0 && s <= last.getField("e"),
        concat(slice(acc, lit(1), size(acc) - lit(1)),
          array(struct(last.getField("b").as("b"),
            greatest(last.getField("e"), s + lit(w)).as("e")))))
        .otherwise(concat(acc,
          array(struct(s.as("b"), (s + lit(w)).as("e")))))
    })
    val isl = col("isl")
    val inSpan = (i: Column) => exists(isl,
      x => i >= x.getField("b") && i < x.getField("e"))
    docs.join(starts, Seq("id"), "left")
      .select(col("id"), col("tk"),
        coalesce(islands, emptyIslands).as("isl"))
      .select(col("id").as(idCol),
        size(isl).cast("long").as("n_spans"),
        aggregate(isl, lit(0),
          (a, x) => a + (x.getField("e") - x.getField("b")))
          .cast("long").as("dup_tokens"),
        size(col("tk")).as("n_tokens"),
        array_join(filter(col("tk"), (t, i) => !inSpan(i)), " ")
          .as("cleaned_text"))
  }
}
