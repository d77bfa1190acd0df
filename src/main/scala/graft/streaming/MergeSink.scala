package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** foreachBatch + MERGE — the streaming-upsert sink pattern: each
  * micro-batch folds its rows into a keyed "latest state per key"
  * parquet table.
  *
  * Exactly-once over an at-least-once source comes from two choices:
  *
  *  1. The merge is a COMMUTATIVE, IDEMPOTENT fold — latest-per-key by
  *     (ts, event_id), computed with the engine's TopKPerGroup physical
  *     operator over (current ∪ batch). Replayed or reordered batches
  *     cannot double-apply: folding the same rows twice is a no-op, and
  *     no batch ordering can replace a newer row with an older one
  *     (unlike blind MERGE UPDATE-by-key).
  *  2. Publication is the reference's tmp→rename commit lifted to table
  *     granularity: batch b writes a full new version directory
  *     `<table>/v<b>`, then atomically republishes the one-line
  *     `<table>/MANIFEST` to point at it. A crash between the two
  *     leaves the previous version visible (never a torn table); a
  *     replay after publish short-circuits on the manifest.
  *
  * Scale: the fold shuffles one row per (key × input partition) thanks
  * to TopKPerGroup's map-side partials; the version write is
  * table-sized — at 100 TB the same pattern writes only changed
  * PARTITIONS per version (hive-style partition dirs + a manifest per
  * partition), which this models at fixture granularity.
  */
object MergeSink {

  private val stateCols = Seq("user_id", "event_id", "ts", "event_type", "value")

  private def latestPerKey(df: DataFrame): DataFrame =
    graft.plans.TopKPerGroup.topK(df.select(stateCols.map(col): _*),
      Seq("user_id"), Seq(col("ts").desc, col("event_id").desc), 1)

  private def manifestPath(tableDir: String) =
    java.nio.file.Paths.get(tableDir, "MANIFEST")

  /** The published version name ("v<b>"), if any batch has committed. */
  def currentVersion(tableDir: String): Option[String] = {
    val m = manifestPath(tableDir)
    if (java.nio.file.Files.exists(m))
      Some(java.nio.file.Files.readString(m).trim)
    else None
  }

  /** The current table as of the last committed version. */
  def readCurrent(spark: SparkSession, tableDir: String): Option[DataFrame] =
    currentVersion(tableDir).map(v => spark.read.parquet(s"$tableDir/$v"))

  /** Apply one micro-batch: fold latest-per-key into the current table,
    * write version v<batchId>, atomically publish the manifest.
    * Idempotent — safe to call again with the same (batch, batchId).
    */
  def upsertBatch(batch: DataFrame, tableDir: String, batchId: Long): Unit = {
    val prev = currentVersion(tableDir)
    if (prev.contains(s"v$batchId")) return // replayed after publish
    val spark = batch.sparkSession
    val latest = latestPerKey(batch)
    val merged = readCurrent(spark, tableDir) match {
      case Some(cur) => latestPerKey(cur.unionByName(latest))
      case None => latest
    }
    merged.write.mode("overwrite").parquet(s"$tableDir/v$batchId")
    // tmp→ATOMIC_MOVE rename: readers see the old version or the new
    // one, never a partial manifest (mr/coordinator.go:37-53's protocol)
    val tmp = java.nio.file.Paths.get(tableDir, s".MANIFEST.v$batchId.tmp")
    java.nio.file.Files.writeString(tmp, s"v$batchId")
    java.nio.file.Files.move(tmp, manifestPath(tableDir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // GC: superseded version dirs would otherwise accumulate one full
    // table copy per micro-batch for the stream's lifetime. Keep the
    // just-published version plus the immediately-previous one as a
    // grace window for concurrent readers that resolved the old
    // manifest before the move; delete everything older (including
    // orphans left by replays that crashed before publishing).
    gcVersions(tableDir, keep = Set(s"v$batchId") ++ prev)
  }

  private def gcVersions(tableDir: String, keep: Set[String]): Unit = {
    val dirs = Option(new java.io.File(tableDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d+") &&
        !keep.contains(f.getName))
    dirs.foreach { d =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(d)
    }
  }

  /** Start the streaming query: events stream → foreachBatch upsert. */
  def latestPerUserSink(events: DataFrame, tableDir: String,
      checkpointDir: String): StreamingQuery = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tableDir))
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        upsertBatch(batch, tableDir, batchId)
      }
      .start()
  }
}
