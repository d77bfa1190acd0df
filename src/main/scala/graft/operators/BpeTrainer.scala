package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING (Sennrich et al. 2016) — learn the merge
  * table from the corpus itself, the step upstream of every subword
  * tokenizer this repo can already run (p47 WordPiece is INFERENCE over
  * a given vocab; this produces the vocab). Classic algorithm: start
  * from characters, repeatedly merge the most frequent adjacent token
  * pair (ties lexicographic), emit the ordered merge table.
  *
  * Scale design — the reason BPE training is feasible at 100 TB at all:
  * the corpus is touched EXACTLY ONCE, by the word-frequency aggregate
  * (partial-agg count per distinct word). Every merge round thereafter
  * runs on the WORD-FREQUENCY table — vocab-sized, millions of rows at
  * web scale, not billions — as one pair-explode + partial-agg + 1-row
  * TakeOrdered, and applies the chosen merge as a per-row aggregate()
  * fold over each word's token array (a codegen HOF — no UDF). Driver
  * state per round is ONE collected (pair, count) row; lineage is cut
  * per round (localCheckpoint on the vocab-sized frame — on a cluster
  * use a reliable checkpoint dir, the p14/q74 iterative convention), so
  * round r does not replan rounds 1..r-1.
  *
  * Determinism contract (what makes an exact SQL oracle possible —
  * DuckDB unrolls the same rounds with the same list_reduce fold):
  * argmax ties break on (count DESC, lhs ASC, rhs ASC); the merge
  * application compares WHOLE tokens (a merged "ab" never re-matches a
  * bare "a"), and the left-to-right fold realizes BPE's non-overlapping
  * greedy semantics ("aaa" under (a,a) -> ["aa", "a"]).
  */
object BpeTrainer {

  /** The learned merge table: (merge_rank, lhs, rhs, freq) — merge_rank
    * is 1-based learn order, freq the pair's corpus frequency at
    * selection time. Stops early (fewer rows) if the corpus runs out of
    * adjacent pairs.
    */
  def learnMerges(docs: DataFrame, textCol: String,
      numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, textCol, numMerges)._1
      .toDF("merge_rank", "lhs", "rhs", "freq")
  }

  /** The corpus's subword vocabulary AFTER applying the learned merges —
    * what the trainer exists to produce: (token, freq), frequencies
    * weighted by word counts. Same single-corpus-pass bill as
    * [[learnMerges]]; the vocabulary aggregate runs on the vocab-sized
    * merged table.
    */
  def subwordVocab(docs: DataFrame, textCol: String,
      numMerges: Int): DataFrame =
    train(docs, textCol, numMerges)._2
      .select(col("cnt"), explode(col("ts")).as("token"))
      .groupBy("token").agg(sum("cnt").as("freq"))

  private def train(docs: DataFrame, textCol: String, numMerges: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    var cur = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), split(col("word"), "").as("ts"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      val top = cur.filter(size(col("ts")) >= 2)
        .select(col("cnt"), explode(
          transform(sequence(lit(0), size(col("ts")) - 2), i =>
            struct(element_at(col("ts"), i + 1).as("lhs"),
              element_at(col("ts"), i + 2).as("rhs")))).as("pr"))
        .groupBy(col("pr.lhs").as("lhs"), col("pr.rhs").as("rhs"))
        .agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).as[(String, String, Long)].collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, rr, c) = top.head
        r += 1
        merges += ((r, l, rr, c))
        cur = cur
          .withColumn("ts", applyMerge(col("ts"), l, rr))
          .localCheckpoint()
      }
    }
    (merges.toSeq, cur)
  }

  /** One BPE merge applied to a token array: left-to-right fold that
    * joins each (lhs, rhs) adjacency into one token, non-overlapping —
    * the accumulator's last element is compared as a WHOLE token, so a
    * token produced by this very merge never chains into the next
    * occurrence within the same round.
    */
  private[operators] def applyMerge(ts: Column, lhs: String,
      rhs: String): Column =
    aggregate(ts, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(lhs) &&
          x === lit(rhs),
        concat(slice(acc, lit(1), size(acc) - 1),
          array(concat(element_at(acc, -1), x))))
        .otherwise(concat(acc, array(x))))
}
