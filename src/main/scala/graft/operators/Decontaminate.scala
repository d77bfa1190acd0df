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
  * a held-out split that is itself corpus-sized), set
  * `broadcastEval = false`: the gram join becomes a SHUFFLED hash join —
  * the inverted-index shape the n-gram Jaccard dedup uses — trading the
  * train-side exchange for bounded executor memory. Same output, proven
  * by spec on both paths.
  */
object Decontaminate {

  /** Per-train-doc count of distinct word n-grams also present anywhere in
    * the eval set. Only contaminated docs (count >= 1) are returned.
    * Shingles come from the same native ShingleArray expression as the
    * dedup family (already distinct per doc), so "overlap" here means
    * distinct shared n-grams.
    *
    * `broadcastEval = false` switches to the shuffled inverted-index join
    * for eval gram sets that exceed broadcast capacity (executor memory,
    * driver collect ceiling) — the 100 TB escape hatch.
    */
  def overlapCounts(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int,
      broadcastEval: Boolean = true): DataFrame = {
    val evalGrams = eval
      .select(explode(Fns.shingles(Fns.tokens(col(textCol)), n)).as("gram"))
      .distinct()
    val trainGrams = train.select(col(idCol).as("id"),
      explode(Fns.shingles(Fns.tokens(col(textCol)), n)).as("gram"))
    // shuffle_hash (not merge): gram-keyed rows need no sort, and the
    // eval side stays the hash-table build side at any partition count
    val evalSide =
      if (broadcastEval) broadcast(evalGrams) else evalGrams.hint("shuffle_hash")
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
      broadcastEval: Boolean = true): DataFrame = {
    val dirty = overlapCounts(train, eval, idCol, textCol, n, broadcastEval)
      .filter(col("n_overlap") >= maxOverlap)
      .select(col("id").as(idCol))
    // no broadcast hint: the dirty-id set is usually tiny (AQE will
    // broadcast it), but a heavily-contaminated corpus can make it
    // arbitrarily large — a forced broadcast would OOM exactly when
    // decontamination matters most
    train.join(dirty, Seq(idCol), "left_anti")
  }
}
