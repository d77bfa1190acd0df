package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.api.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Word count over `documents` — the reference's entire semantic surface
    * (scan→flatMap→shuffle→agg→sort) in one declarative plan (SURVEY.md §7.1).
    */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("wc_wordcount").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Headline queries timed by Bench at sf0.1 (legacy-12 anchor group). */
  def benchQueries: Seq[String] = Registry.all.filter(_.bench).map(_.name)

  /** Extended bench group: everything newer than the legacy 12, ONE
    * stable set going forward. Round 12 folded the former r9/r10 anchor
    * groups in here (mapping note in PLANS.md round-12 entry) — four
    * generations of per-round groups had made round-over-round
    * comparison a bookkeeping exercise. Storage-layout queries are NOT
    * here: they get build/read-split accounting in their own group.
    */
  def benchQueriesExtended: Seq[String] =
    Registry.all.filter(_.benchExt).map(_.name) ++ Seq(
      // former r9 group
      "p72_quality_classifier", "p73_bpe_encode",
      "p75_embedding_covariance", "p76_sequence_packing",
      "p77_kmeans_lloyd", "q84_source_group_pushdown",
      "q85_storage_partitioned_join",
      // former r10 group, minus the storage-layout queries
      "p82_exact_substr_dedup", "p83_bm25_topk", "p84_audio_neardup",
      "p85_distinct_ngram_diversity", "p86_exact_auc",
      "p87_retrieval_metrics", "p88_k_anonymity",
      "p89_tokenizer_fertility", "p90_quality_canonical_keep",
      "p91_calibration_bins")

  /** Storage-layout queries, timed with build/read SPLIT accounting
    * ([[graft.queries.StorageLayout]]): tables build once per bench
    * process, the pruned read is the timed signal.
    */
  def benchQueriesStorage: Seq[String] =
    graft.queries.StorageLayout.benchPairs.map(_._1)
}
