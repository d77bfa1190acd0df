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
  * runs on the WORD-FREQUENCY table — vocab-sized, not corpus-sized —
  * and that table's size picks the finish strategy:
  *
  *  - **Driver finish** (≤ [[DefaultDriverMaxWords]] distinct words,
  *    the common case even for web corpora after word-level dedup when
  *    a frequency floor is applied): the (cnt, tokens) table is
  *    collected ONCE and the merge rounds run as a plain in-JVM loop —
  *    zero Spark jobs per round, no per-round scheduling/codegen
  *    overhead, which at real vocab sizes (numMerges in the tens of
  *    thousands) is the difference between minutes and hours. Driver
  *    memory is O(vocab), a bounded parameter, not a data size.
  *  - **Distributed rounds** (above the threshold): each round is one
  *    pair-explode + partial-agg + 1-row TakeOrdered over the
  *    word-frequency frame, with the chosen merge applied as a per-row
  *    aggregate() fold (a codegen HOF — no UDF) and lineage cut per
  *    round (localCheckpoint; on a cluster use a reliable checkpoint
  *    dir, the p14/q74 iterative convention).
  *
  * The two paths are SELECTION-IDENTICAL: the driver loop counts pairs
  * weighted by word frequency and breaks argmax ties on
  * (count DESC, lhs ASC, rhs ASC) under UTF-8 BYTE order — the same
  * total order Spark's binary string comparison uses — and applies
  * merges with the same whole-token left-to-right non-overlapping fold
  * (BpeTrainerSpec pins crossover equality on both merges and vocab).
  *
  * Determinism contract (what makes an exact SQL oracle possible —
  * DuckDB unrolls the same rounds with the same list_reduce fold):
  * argmax ties break on (count DESC, lhs ASC, rhs ASC); the merge
  * application compares WHOLE tokens (a merged "ab" never re-matches a
  * bare "a"), and the left-to-right fold realizes BPE's non-overlapping
  * greedy semantics ("aaa" under (a,a) -> ["aa", "a"]).
  */
object BpeTrainer {

  /** Distinct-word threshold below which the merge loop runs in-JVM on
    * the driver after the single corpus scan. 64k words x ~tens of
    * bytes is single-digit MB of driver state — far under any sane
    * driver heap — while vocab tables past it stay distributed.
    */
  val DefaultDriverMaxWords: Long = 65536L

  /** Spark-identical string order: UTF-8 byte order (= code point
    * order), NOT Java's UTF-16 code-unit order — they diverge for
    * supplementary characters, and the tie-break contract must match
    * the distributed path bit-for-bit.
    */
  private val utf8Order: Ordering[String] = (a: String, b: String) =>
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** The learned merge table: (merge_rank, lhs, rhs, freq) — merge_rank
    * is 1-based learn order, freq the pair's corpus frequency at
    * selection time. Stops early (fewer rows) if the corpus runs out of
    * adjacent pairs.
    */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int,
      driverMaxWords: Long = DefaultDriverMaxWords): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, textCol, numMerges, driverMaxWords)._1
      .toDF("merge_rank", "lhs", "rhs", "freq")
  }

  /** The corpus's subword vocabulary AFTER applying the learned merges —
    * what the trainer exists to produce: (token, freq), frequencies
    * weighted by word counts. Same single-corpus-pass bill as
    * [[learnMerges]]; the vocabulary aggregate runs on the vocab-sized
    * merged table.
    */
  def subwordVocab(docs: DataFrame, textCol: String, numMerges: Int,
      driverMaxWords: Long = DefaultDriverMaxWords): DataFrame =
    train(docs, textCol, numMerges, driverMaxWords)._2
      .select(col("cnt"), explode(col("ts")).as("token"))
      .groupBy("token").agg(sum("cnt").as("freq"))

  private def train(docs: DataFrame, textCol: String, numMerges: Int,
      driverMaxWords: Long)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    // the ONE corpus touch: word-frequency aggregate, materialized so
    // the path decision's count() doesn't rescan the corpus
    val freq = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), split(col("word"), "").as("ts"))
      .transform(Materialize.cut)
    if (freq.count() <= driverMaxWords)
      trainDriver(freq, numMerges)
    else trainDistributed(freq, numMerges)
  }

  /** In-JVM finish: the word-frequency table is already on the driver's
    * side of the size threshold — run the rounds as a plain loop.
    */
  private def trainDriver(freq: DataFrame, numMerges: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    val spark = freq.sparkSession
    import spark.implicits._
    var vocab: Seq[(Vector[String], Long)] = freq
      .as[(Long, Seq[String])].collect().toSeq
      .map { case (c, ts) => (ts.toVector, c) }
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    implicit val tieOrder: Ordering[(Long, String, String)] =
      Ordering.Tuple3(Ordering.Long.reverse, utf8Order, utf8Order)
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (ts, c) =>
        var i = 0
        while (i + 1 < ts.length) {
          val pr = (ts(i), ts(i + 1))
          pairs(pr) = pairs.getOrElse(pr, 0L) + c
          i += 1
        }
      }
      if (pairs.isEmpty) exhausted = true
      else {
        val ((l, rr), c) = pairs.minBy { case ((a, b), n) => (n, a, b) }
        r += 1
        merges += ((r, l, rr, c))
        vocab = vocab.map { case (ts, cnt) =>
          (ts.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == l && x == rr)
              acc.init :+ (acc.last + x)
            else acc :+ x
          }, cnt)
        }
      }
    }
    (merges.toSeq,
      vocab.map { case (ts, c) => (c, ts) }.toDF("cnt", "ts"))
  }

  /** Distributed rounds for vocab tables past the driver threshold. */
  private def trainDistributed(freq: DataFrame, numMerges: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    val spark = freq.sparkSession
    import spark.implicits._
    var cur = freq
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
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
          .transform(Materialize.cut)
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
