package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.AnnIndex
import graft.sources.FsMeta

/** Streaming ANN index ingest — the similarity-search twin of
  * [[DedupIngest]], completing the streaming-twin family: embedding
  * vectors arrive as a stream and each micro-batch is folded into the
  * PERSISTED IVF index ([[AnnIndex]]) so queries see it immediately.
  * Assignment is against the STORED centroids — no refit, no corpus
  * rescan (the index contract): per batch the work is O(batch · nlist)
  * distance evaluations plus a partitioned parquet publish, and a
  * stream-folded index is PROBE-FOR-PROBE identical to one built from
  * the same vectors in one batch append (spec-pinned in AnnIngestSpec —
  * assignment is a pure function of (vector, stored centroids), so
  * batch boundaries cannot move a posting).
  *
  * CRASH SEMANTICS (the [[DedupIngest]] marker protocol, all metadata
  * via [[FsMeta]]):
  *   - POSTINGS — exactly-once rows. Each batch is staged then
  *     published by deterministic renames
  *     ([[AnnIndex.appendBatchExactlyOnce]] /
  *     [[graft.sources.StagedAppend]]): a replay of any crash window —
  *     mid-stage, mid-publish, published-but-unmarked — converges to
  *     the same file set with zero duplicate postings.
  *   - MARKER — `_commit_<b>` under the index dir, created LAST; a
  *     foreachBatch replay of a fully-committed batch is a no-op.
  */
object AnnIngest {

  private def markerPath(indexPath: String, batchId: Long) =
    s"$indexPath/_commit_$batchId"

  /** One micro-batch: fold the batch's vectors into the index, mark the
    * batch committed. Idempotent per (indexPath, batchId) — see the
    * crash-semantics contract in the object scaladoc. The index at
    * `indexPath` must exist ([[AnnIndex.buildIndex]] — an IVF index
    * needs fitted centroids before it can accept appends; seed it from
    * a bootstrap corpus or the stream's first materialized batch).
    */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
      embCol: String, p: AnnIndex.Params, indexPath: String): Unit = {
    if (FsMeta.exists(markerPath(indexPath, batchId))) return
    if (batch.isEmpty) return
    AnnIndex.appendBatchExactlyOnce(batch, idCol, embCol, p, indexPath,
      s"b$batchId")
    FsMeta.createMarker(markerPath(indexPath, batchId)): Unit
  }

  /** Start the ingest stream: `vectors` must carry (`idCol`, `embCol`).
    * Query the index at any point with [[AnnIndex.topKAgainstIndex]] —
    * probes and ingest share nothing but the files, so they need no
    * coordination beyond parquet's immutable-file visibility.
    */
  def ingestStream(vectors: DataFrame, idCol: String, embCol: String,
      p: AnnIndex.Params, indexPath: String,
      checkpointDir: String): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        processBatch(batch, bid, idCol, embCol, p, indexPath)
      }
      .start()
}
