package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.IncrementalDedup

/** Streaming near-dup dedup ingest — the composition a 100 TB pipeline
  * actually runs: documents arrive as a stream, each micro-batch is
  * deduped against the PERSISTED MinHash band index
  * ([[IncrementalDedup]]), survivors land in a clean output table, and
  * the batch is folded into the index so the next batch sees it. The
  * corpus is never rescanned; per batch the work is O(batch) text
  * compute plus column-pruned index probes.
  *
  * KEEP RULE (and why it is batch-boundary INVARIANT): a doc is dropped
  * iff it near-dups ANY doc seen before it — where "before" is the id
  * order, and ids are REQUIRED to be monotone with ingest order (the
  * standard ingest contract; p25's contiguous id assignment produces
  * exactly this). Every batch doc appears as the GREATER id (id_b) of
  * its pairs, so drops = {id_b of every pair touching the batch}, and
  * because the WHOLE batch (kept and dropped alike) is appended to the
  * index, the decision for a later doc never depends on where a batch
  * boundary fell: d3 ~ d2 drops d3 whether d2 arrived in the same batch
  * (batch-internal pair) or an earlier one (index pair), even when d2
  * itself was dropped. The result provably equals the batch-global
  * greedy rule "drop every id_b of the full-corpus near-dup pair set" —
  * which is what the spec recomputes with [[graft.operators.Dedup]].
  * (This is the SemDeDup-style drop-against-all-seen policy; keep-one-
  * per-component is the batch [[graft.operators.ConnectedComponents]]
  * path.)
  *
  * EXACTLY-ONCE: [[processBatch]] is guarded by a per-batch commit
  * marker in the index dir — a foreachBatch replay of a committed batch
  * id is a no-op (MergeSink's manifest idea at batch granularity). The
  * kept-table write and the two index appends are not atomic as a
  * group: a crash between them can leave a committed-LOOKING partial
  * state only if it lands exactly between the last append and the
  * marker write, in which case the replay re-appends (duplicate index
  * rows make later candidate generation redundant but pairs are
  * distinct()'d; the kept table is written FIRST, so survivors are
  * never duplicated). A production deployment would wrap the three
  * writes in a table-format transaction.
  */
object DedupIngest {

  private def markerPath(indexPath: String, batchId: Long) =
    java.nio.file.Paths.get(indexPath, s"_commit_$batchId")

  /** Initialize an EMPTY index at `path` (schema-complete, zero rows) so
    * the first streaming batch has something to probe. Overwrites.
    */
  def initEmptyIndex(spark: SparkSession, idCol: String, textCol: String,
      p: IncrementalDedup.Params, path: String): Unit = {
    import org.apache.spark.sql.types._
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField(idCol, LongType),
        StructField(textCol, StringType))))
    IncrementalDedup.buildIndex(empty, idCol, textCol, p, path)
  }

  /** One micro-batch: dedup against the index, append survivors to
    * `keptPath`, fold the WHOLE batch into the index (see object
    * scaladoc for why kept-and-dropped both go in), mark the batch
    * committed. Idempotent per (indexPath, batchId).
    */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, p: IncrementalDedup.Params, indexPath: String,
      keptPath: String): Unit = {
    if (java.nio.file.Files.exists(markerPath(indexPath, batchId))) return
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    batch.persist()
    try {
      val pairs = IncrementalDedup.nearDupsAgainstIndex(
        spark, batch, idCol, textCol, p, indexPath)
      // monotone ids: the batch side of every pair is the greater id
      val drops = pairs.select(col("id_b").cast("long").as(idCol)).distinct()
      batch.join(drops, Seq(idCol), "left_anti")
        .write.mode(SaveMode.Append).parquet(keptPath)
      // MUST follow nearDupsAgainstIndex (its ordering contract): once
      // the batch is indexed, its rows would sit on both probe sides
      IncrementalDedup.appendBatch(batch, idCol, textCol, p, indexPath)
      java.nio.file.Files.createFile(markerPath(indexPath, batchId))
    } finally batch.unpersist()
  }

  /** Start the ingest stream: `docs` must carry (`idCol`, `textCol`)
    * with ids monotone in ingest order. The index at `indexPath` must
    * exist ([[initEmptyIndex]] or a prior [[IncrementalDedup.buildIndex]]).
    */
  def ingestStream(docs: DataFrame, idCol: String, textCol: String,
      p: IncrementalDedup.Params, indexPath: String, keptPath: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        processBatch(batch, bid, idCol, textCol, p, indexPath, keptPath)
      }
      .start()
}
