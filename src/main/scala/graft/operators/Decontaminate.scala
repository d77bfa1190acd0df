package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Benchmark decontamination — remove training documents that overlap an
  * evaluation/benchmark set, the standard pre-training hygiene step (the
  * n-gram-overlap procedure popularized by GPT-3 appendix C / PaLM /
  * Llama): a training doc is contaminated when it shares any word n-gram
  * with an eval doc.
  *
  * Scale design: the eval side is benchmarks — MBs, thousands of docs —
  * while the train side is the 100 TB corpus. The eval n-gram set is
  * therefore built distinct and BROADCAST; the corpus streams through a
  * broadcast hash join with NO shuffle of the train side at all. The only
  * wide operation is the final per-doc count, which shuffles one (id,
  * gram-count) pair per contaminated doc — vanishingly small. The corpus
  * is never re-partitioned, so this composes with upstream dedup/quality
  * stages without an extra exchange.
  *
  * When the eval set is too big to broadcast (a consortium of benchmarks,
  * a held-out split that is itself corpus-sized), the gram join becomes a
  * SHUFFLED hash join — the inverted-index shape the n-gram Jaccard dedup
  * uses — trading the train-side exchange for bounded executor memory.
  * Same output, proven by spec on both paths. The switch is AUTOMATIC:
  * unless the caller pins `broadcastEval`, the eval gram count is probed
  * (a bounded `limit(threshold+1).count()` over the eval side only — MBs,
  * never the corpus) and an eval set above [[DefaultMaxBroadcastGrams]]
  * takes the shuffled path by default, so the 100 TB-safe behavior needs
  * no opt-in. Threshold rationale in SCALE.md.
  */
object Decontaminate {

  /** Auto-switch threshold: distinct eval grams above this take the
    * shuffled join. ~1M grams ≈ 50–100 MB as a broadcast hash table
    * (40–60 byte strings + table overhead) — comfortably inside a
    * multi-GB executor, an order of magnitude below the sizes that make
    * broadcast OOM a risk. See SCALE.md.
    */
  val DefaultMaxBroadcastGrams: Long = 1000000L

  /** Per-train-doc count of distinct word n-grams also present anywhere in
    * the eval set. Only contaminated docs (count >= 1) are returned.
    * Shingles come from the same native ShingleArray expression as the
    * dedup family (already distinct per doc), so "overlap" here means
    * distinct shared n-grams.
    *
    * `broadcastEval` pins the join strategy; `None` (the default) probes
    * the eval gram count against `maxBroadcastGrams` and picks
    * automatically — oversized eval sets get the shuffled inverted-index
    * join (the 100 TB escape hatch) without the caller having to know
    * the knob exists. The probe costs one bounded scan of the EVAL side
    * only (`limit(threshold+1).count()`), never of the corpus.
    */
  def overlapCounts(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int,
      broadcastEval: Option[Boolean] = None,
      maxBroadcastGrams: Long = DefaultMaxBroadcastGrams): DataFrame = {
    // shingle_rows GENERATOR, not explode(shingle_array(...)): nothing
    // downstream needs the array VALUE (unlike Dedup, where signatures
    // and the Jaccard verify consume it), so the per-doc gram array
    // would be pure allocation — the generator streams each gram
    // straight into the join/distinct. Same rows, same order (spec-
    // pinned), and on the corpus side this runs once per training doc.
    // Measured (tools.MicroBench, sf0.1, local[32], min-of-3): 0.56 s
    // vs 0.80 s for the array form on this exact join+count shape —
    // ~30% off the corpus-side scan.
    val evalGrams = eval
      .select(Fns.shingleRows(Fns.tokens(col(textCol)), n).as("gram"))
      .distinct()
    // NOTE: when broadcastEval is None, plan CONSTRUCTION runs the probe
    // (an eager bounded limit+collect Spark job over the eval side)
    // before the DataFrame is returned — explain-only flows that must
    // stay lazy should pin broadcastEval explicitly. When pinned, the
    // probe (and its threshold) is unused, so the threshold is only
    // validated on the probe path.
    //
    // Round-19 (optimization): the probe COLLECTS the (bounded) gram
    // rows instead of counting them — when the eval set is under the
    // threshold, the probe has already derived the complete distinct
    // gram set, so the broadcast build side becomes a local relation
    // and the eval subtree (scan → shingle → distinct, two jobs' worth
    // before) runs exactly ONCE per call instead of once for the probe
    // and again inside the join. Driver memory is the same order as the
    // broadcast the driver was about to build anyway (≤ threshold grams,
    // ~50–100 MB at the 1M default); an oversized eval set still pays
    // only the bounded limit(threshold+1) pull before taking the
    // shuffled path. Same gram set, same join, same counts — the
    // auto-switch boundary and both join strategies stay spec-pinned.
    val probedGrams: Option[Array[String]] = broadcastEval match {
      case Some(_) => None
      case None =>
        // the probe is a limit(threshold+1), so the threshold must fit an
        // Int — past ~2B grams the broadcast table would be 100+ GB anyway,
        // far beyond any sane executor, so reject rather than silently
        // capping the probe and always choosing broadcast
        require(maxBroadcastGrams < Int.MaxValue,
          s"maxBroadcastGrams must be < ${Int.MaxValue} (a broadcast that " +
            s"size is never viable), got $maxBroadcastGrams")
        Some(evalGrams.limit(maxBroadcastGrams.toInt + 1)
          .collect().map(_.getString(0)))
    }
    val useBroadcast = broadcastEval.getOrElse(
      probedGrams.get.length <= maxBroadcastGrams)
    val trainGrams = train.select(col(idCol).as("id"),
      Fns.shingleRows(Fns.tokens(col(textCol)), n).as("gram"))
    // shuffle_hash (not merge): gram-keyed rows need no sort, and the
    // eval side stays the hash-table build side at any partition count
    val spark = train.sparkSession
    import spark.implicits._
    val evalSide =
      if (useBroadcast) broadcast(probedGrams match {
        case Some(g) => g.toSeq.toDF("gram") // the probe's complete set
        case None => evalGrams // pinned broadcast: derive in-plan
      })
      else evalGrams.hint("shuffle_hash")
    trainGrams.join(evalSide, Seq("gram"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** The train set with every doc sharing >= `maxOverlap` distinct eval
    * n-grams removed (maxOverlap = 1 => any shared n-gram disqualifies).
    * Same broadcast shape, but as a LEFT ANTI join so clean docs pass
    * through untouched with their full payload.
    */
  def clean(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int, maxOverlap: Long = 1L,
      broadcastEval: Option[Boolean] = None,
      maxBroadcastGrams: Long = DefaultMaxBroadcastGrams): DataFrame = {
    val dirty = overlapCounts(train, eval, idCol, textCol, n, broadcastEval,
        maxBroadcastGrams)
      .filter(col("n_overlap") >= maxOverlap)
      .select(col("id").as(idCol))
    // no broadcast hint: the dirty-id set is usually tiny (AQE will
    // broadcast it), but a heavily-contaminated corpus can make it
    // arbitrarily large — a forced broadcast would OOM exactly when
    // decontamination matters most
    train.join(dirty, Seq(idCol), "left_anti")
  }

  /** Semantic (embedding-space) decontamination — the vector twin of
    * [[overlapCounts]]: a train example is contaminated when its
    * embedding's cosine against ANY eval embedding reaches `threshold`.
    * This is the leakage n-gram overlap cannot see — a benchmark item
    * paraphrased, translated, or re-templated into the crawl shares few
    * 4-grams with its source but sits next to it in embedding space.
    * Returns contaminated train rows only: (id, max_cos, n_hits).
    *
    * Scale design mirrors the lexical path's asymmetry argument: the
    * eval side is benchmarks — thousands of vectors, KBs-to-MBs — and
    * is BROADCAST; the train side streams through one codegen'd native
    * cosine per (train, eval) pair with NO shuffle of the train side
    * (p09's brute-force envelope: linear in |train| x |eval|,
    * embarrassingly parallel). The only wide operation is the per-id
    * partial-agg max/count — one row per contaminated doc. For an eval
    * side too big to broadcast, prefilter candidates with sign-LSH
    * buckets (Similarity.lshTopK's machinery) and verify exactly;
    * recall then follows the LSH S-curve, which is why the EXACT
    * brute-force form is the one registered under an oracle (p64).
    */
  def semanticOverlap(train: DataFrame, eval: DataFrame, idCol: String,
      embCol: String, threshold: Double): DataFrame = {
    val t = train.select(col(idCol).cast("long").as("id"),
      col(embCol).as("tv"))
    val e = eval.select(col(embCol).as("ev"))
    t.crossJoin(broadcast(e))
      .select(col("id"),
        round(Fns.cosineSimilarity(col("tv"), col("ev")), 6).as("cs"))
      .groupBy("id")
      .agg(max("cs").as("max_cos"),
        sum(when(col("cs") >= threshold, 1L).otherwise(0L)).as("n_hits"))
      .filter(col("n_hits") >= 1)
  }

  /** Train rows with every semantically-contaminated doc removed —
    * [[clean]]'s contract on the embedding path (left anti on the
    * contaminated id set; train columns pass through untouched).
    */
  def semanticClean(train: DataFrame, eval: DataFrame, idCol: String,
      embCol: String, threshold: Double): DataFrame =
    train.join(
      semanticOverlap(train, eval, idCol, embCol, threshold)
        .select(col("id").as(idCol)),
      Seq(idCol), "left_anti")
}
