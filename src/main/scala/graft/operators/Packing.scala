package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pad-free sequence PACKING — the step that turns a tokenized corpus
  * into fixed-length training sequences (GPT-style document packing:
  * concatenate all documents in id order into one token stream, slice
  * it into `seqLen`-token sequences; no padding, documents crossing a
  * boundary continue in the next sequence). The output is the PACKING
  * MAP — one row per (sequence, document) overlap with exact token
  * spans — which is what a training loader actually needs: which bytes
  * of which doc land in which sequence at which offset.
  * ([[Chunking.withSequenceIds]] is this operator's coarse sibling:
  * per-stratum, it only assigns each doc to the sequence its FIRST
  * token lands in — no spans, straddling docs left to the tokenizer.
  * This one produces the exact global map.)
  *
  * Scale design — the global running sum WITHOUT a one-partition
  * window: a naive `Window.orderBy(id)` (no partition) serializes the
  * corpus through a single task. Instead the classic two-phase scan:
  * range-repartition by id, per-PARTITION cumulative sums (a window
  * PARTITIONED by the physical partition id — fully parallel), then an
  * O(partitions) driver collect of per-partition totals whose running
  * sum re-enters the plan as a broadcast join of partition offsets.
  * The only data-sized shuffle is the range partition; everything
  * after is per-row arithmetic plus a chunk-span explode bounded by
  * ceil(docTokens / seqLen) + 1 rows per doc. Offsets use integer
  * `div`/`mod` throughout — exact at any corpus size (a double-based
  * floor would corrupt token offsets past 2^53).
  *
  * Determinism: ids order the stream, so the packing is a pure
  * function of (corpus, seqLen) — range boundaries chosen by the
  * repartition sampler cannot move any doc's global offset. Docs with
  * zero tokens are excluded (they occupy no span).
  */
object Packing {

  /** The packing map: (seq_id, id, doc_from, seq_from, n_toks) — doc
    * tokens [doc_from, doc_from + n_toks) land in sequence `seq_id` at
    * positions [seq_from, seq_from + n_toks). Token counts come from
    * whitespace tokenization of `textCol`; pass a pre-tokenized count
    * via [[packCounts]] to use any tokenizer.
    */
  def packChunks(docs: DataFrame, idCol: String, textCol: String,
      seqLen: Int): DataFrame =
    packCounts(
      docs.select(col(idCol).cast("long").as("id"),
        size(split(col(textCol), " ")).cast("long").as("n")),
      seqLen)

  /** Same, over pre-computed (id, n) token counts. `baseOffset` shifts
    * the global stream origin — the streaming twin
    * ([[graft.streaming.PackIngest]]) packs each micro-batch from the
    * offset its predecessor committed, so batch maps concatenate into
    * exactly the one-shot corpus map.
    */
  def packCounts(counts: DataFrame, seqLen: Int,
      baseOffset: Long = 0L): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    require(baseOffset >= 0, s"baseOffset must be >= 0, got $baseOffset")
    val spark = counts.sparkSession
    import spark.implicits._
    val parted = counts.select(col("id"), col("n"))
      .filter(col("n") > 0)
      .repartitionByRange(col("id"))
      .sortWithinPartitions("id")
      .withColumn("pid", spark_partition_id())
      .transform(Materialize.cut) // pin the partition layout: the offset collect
                         // and the main plan must see the SAME pids
    val w = Window.partitionBy("pid").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("local_end", sum("n").over(w))
    // per-partition totals -> running offsets (O(partitions) driver work)
    val totals = local.groupBy("pid").agg(max("local_end").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsetRows = {
      var acc = 0L
      totals.map { case (pid, t) => val o = (pid, acc); acc += t; o }
    }
    val offsetDf = offsetRows.toSeq.toDF("pid", "offset")
    val glob = local.join(broadcast(offsetDf), Seq("pid"))
      .withColumn("start",
        col("offset") + col("local_end") - col("n") + lit(baseOffset))
    val L = lit(seqLen.toLong)
    glob
      .withColumn("seq_id", explode(sequence(
        expr(s"start div ${seqLen}L"),
        expr(s"(start + n - 1) div ${seqLen}L"))))
      .select(
        col("seq_id"),
        col("id"),
        greatest(lit(0L), col("seq_id") * L - col("start")).as("doc_from"),
        greatest(lit(0L), col("start") - col("seq_id") * L).as("seq_from"),
        (least(col("start") + col("n"), (col("seq_id") + 1) * L) -
          greatest(col("start"), col("seq_id") * L)).as("n_toks"))
  }
}
