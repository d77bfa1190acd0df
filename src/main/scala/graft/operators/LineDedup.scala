package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level (paragraph-level) exact dedup — the CCNet / RefinedWeb
  * boilerplate filter that document-granular dedup cannot express: nav
  * bars, cookie banners, licence footers repeat across MILLIONS of
  * otherwise-distinct pages, so the repeated unit is the LINE, and the
  * cure is to rewrite each document with its shared lines removed
  * (north-star scope; the reference's nearest semantics is key-grouping,
  * /root/reference/mr/worker.go:139-155 — here the key is the line text).
  *
  * Two policies, both doc-distinct-frequency driven:
  *   - drop-all (`keepFirst = false`): every occurrence of a line found
  *     in >= `minDocs` DISTINCT docs is removed — RefinedWeb's
  *     boilerplate-line removal (a line on 3+ pages is template, not
  *     content);
  *   - keep-first (`keepFirst = true`): the doc with the SMALLEST id
  *     keeps its occurrences, every later doc loses them — CCNet's
  *     first-occurrence paragraph dedup at doc granularity (with ids
  *     monotone in ingest order, "first" = earliest ingested, the same
  *     ownership convention as [[graft.streaming.DedupIngest]]).
  * Distinct-doc counting (not raw occurrence counting) keeps a within-doc
  * refrain from being mistaken for cross-corpus boilerplate — repetition
  * INSIDE a doc is p18's (repetitionColumns) signal, not this one's.
  *
  * Scale (100 TB): one posexplode of the corpus into (id, pos, line)
  * rows; line frequencies by partial-agg groupBy(line) — count_distinct
  * collapses to a plain count because (line, id) occurrences are first
  * distinct()'d map-side; the resulting boilerplate DICTIONARY (lines
  * with df >= minDocs, typically orders of magnitude smaller than the
  * corpus — template lines are few, their occurrences are many) joins
  * back broadcast by default; the rewrite is one groupBy(id)
  * re-assembling kept lines in position order. Text crosses the wire
  * only as its own lines — never as whole documents plus lines. Unlike
  * Decontaminate's auto-switch, the dictionary's size cannot be probed
  * without running the corpus-sized aggregation that produces it, so the
  * escape hatch is a PIN: `broadcastDict = false` takes the shuffled
  * inverted-index join (bounded executor memory) for corpora whose
  * template dictionary outgrows a broadcast — same output, spec-proven
  * on both paths. The dictionary branch re-scans the corpus;
  * `persistLines = true` caches the exploded lines instead
  * (TfIdf.topTerms' explicit-persist pattern) for the two consumers.
  */
object LineDedup {

  /** Rewrite each doc with shared lines removed. Output per input doc:
    * (idCol, n_lines, n_dropped, clean_text) — clean_text is the kept
    * lines re-joined with `sep` in original position order ("" when every
    * line was dropped; a doc never disappears, so funnel accounting stays
    * per-doc). Docs with null/empty text pass through with n_lines = 0.
    */
  def dropSharedLines(docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n", minDocs: Int = 2, keepFirst: Boolean = false,
      broadcastDict: Boolean = true,
      persistLines: Boolean = false): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs — a " +
      "1-doc threshold would drop every line of every document")
    val lines0 = docs
      .select(col(idCol), posexplode_outer(
        when(length(col(textCol)) > 0,
          split(col(textCol), java.util.regex.Pattern.quote(sep)))))
      .toDF(idCol, "pos", "line")
    val lines = if (persistLines)
      lines0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else lines0
    // boilerplate dictionary: distinct (line, doc) first so the heavy agg
    // is a plain partial-agg count; min(id) rides along for keep-first
    val dict = lines.filter(col("line").isNotNull)
      .select(col("line"), col(idCol)).distinct()
      .groupBy("line")
      .agg(count(lit(1)).as("line_df"), min(col(idCol)).as("first_id"))
      .filter(col("line_df") >= minDocs)
      .select(col("line"), col("first_id"))
    val dictHinted =
      if (broadcastDict) broadcast(dict) else dict.hint("SHUFFLE_HASH")
    val flagged = lines
      .join(dictHinted, Seq("line"), "left")
      .withColumn("is_boiler",
        if (keepFirst)
          col("first_id").isNotNull && col(idCol) =!= col("first_id")
        else col("first_id").isNotNull)
    flagged.groupBy(col(idCol))
      .agg(
        count(col("line")).as("n_lines"),
        sum(when(col("is_boiler"), 1L).otherwise(0L)).as("n_dropped"),
        coalesce(array_join(transform(
          array_sort(collect_list(when(!col("is_boiler"),
            struct(col("pos"), col("line"))))),
          x => x("line")), sep), lit("")).as("clean_text"))
  }
}
