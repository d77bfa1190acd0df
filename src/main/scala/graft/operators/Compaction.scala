package graft.operators

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance counterpart to
  * streaming sinks and incremental writes, which accumulate files far
  * below the optimal scan granularity (every file costs a task, a
  * footer read, and catalog metadata; 100k tiny files can dominate a
  * scan's wall clock at 100 TB).
  *
  * The rewrite sizes the output from the INPUT BYTES (not row counts):
  * nFiles = max(1, ceil(totalBytes / targetBytes)), and uses
  * `coalesce`, not `repartition` — coalesce merges existing partitions
  * without a shuffle, so compaction is a pure read+write at scan speed.
  * (Use [[ClusteredWrite]] instead when the rewrite should also
  * re-SORT for layout locality — that one pays a range shuffle for
  * min/max-stats pruning.)
  */
object Compaction {

  case class CompactionStats(filesBefore: Long, filesAfter: Long,
      bytesBefore: Long)

  // Recursive: hive-partitioned layouts keep their data files in
  // partition SUBDIRECTORIES, which a top-level listing would miss
  // (yielding a misleading "no parquet files" on a perfectly readable
  // table). Entries starting with '_' or '.' are skipped — Spark's own
  // path filter ignores them on read (_temporary, _SUCCESS, .staging),
  // so counting them would size the rewrite from bytes it never reads.
  private def parquetFiles(dir: String): Seq[java.io.File] = {
    def visible(f: java.io.File) =
      !f.getName.startsWith("_") && !f.getName.startsWith(".")
    def walk(d: java.io.File): Seq[java.io.File] = {
      val entries = Option(d.listFiles()).getOrElse(Array.empty).toSeq
        .filter(visible)
      entries.filter(f => f.isFile && f.getName.endsWith(".parquet")) ++
        entries.filter(_.isDirectory).flatMap(walk)
    }
    walk(new java.io.File(dir))
  }

  /** Rewrite `inDir`'s parquet into `outDir` at ~`targetBytes` per file.
    * Returns (before, after, bytes) stats. Compressed-size heuristic:
    * output files land near target since both sides are snappy parquet.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): CompactionStats = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    // overwrite mode deletes the target before writing — the target must
    // not be the input, an ANCESTOR of it (the recursive delete would
    // destroy the input mid-scan), or a DESCENDANT (the output would
    // land inside the input and double-count on the next read)
    val inP = new java.io.File(inDir).getCanonicalPath
    val outP = new java.io.File(outDir).getCanonicalPath
    val sep = java.io.File.separator
    require(inP != outP && !inP.startsWith(outP + sep) &&
        !outP.startsWith(inP + sep),
      s"outDir ($outP) must not overlap inDir ($inP)")
    val files = parquetFiles(inDir)
    require(files.nonEmpty, s"no parquet files under $inDir")
    val totalBytes = files.map(_.length()).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir)
      .coalesce(nOut) // no exchange: compaction runs at scan speed
      .write.mode("overwrite").parquet(outDir)
    CompactionStats(files.size.toLong, parquetFiles(outDir).size.toLong,
      totalBytes)
  }
}
