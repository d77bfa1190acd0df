package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, IncrementalDedup}

/** Dev tool: A/B the p46 incremental-dedup PROBE formulations over the
  * same persisted index files, in BOTH regimes —
  *   - WIDE batch (the p46 oracle split: 20% of the corpus) — here the
  *     batch is index-scale, every bucket is touched, and the win is
  *     bounded to exchange elimination;
  *   - NARROW batch (trickle ingest: a handful of docs against the whole
  *     corpus) — the regime the bucketed layout exists for: the probe
  *     bucket-prunes both index tables to the touched slice.
  * Shapes compared:
  *   - "r7 union probe": read the index dirs as plain parquet (bucketing
  *     ignored), union the index and batch band rows, symmetric
  *     SHUFFLE_HASH self-join, union-side verify — re-shuffles the whole
  *     corpus-sized index every batch;
  *   - "r8 bucketed probe": [[IncrementalDedup.nearDupsAgainstIndex]].
  * (`runMain graft.tools.IncProbeBench [sfDir]`)
  */
object IncProbeBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val docs = graft.api.Tables.t(s, dir, "documents")
    val p = IncrementalDedup.Params()

    // round-7 shape reconstructed over the same files: plain-parquet read
    // (no bucketing metadata), index ∪ batch build side, one-join probe
    def unionProbe(batch: DataFrame, path: String): Long = {
      val bSh = Dedup.shingled(batch, "doc_id", "text", p.shingleSize)
      val bBands = Dedup.bandRows(
        Dedup.minhashSignatures(bSh, p.numHashes), p.numHashes, p.bands)
      val iBands = s.read.parquet(s"$path/bands")
      val all = iBands.unionByName(bBands)
      val cands = bBands.as("x").hint("SHUFFLE_HASH")
        .join(all.as("y").hint("SHUFFLE_HASH"),
          col("x.bkey") === col("y.bkey") && col("x.id") =!= col("y.id"))
        .select(least(col("x.id"), col("y.id")).as("id_a"),
          greatest(col("x.id"), col("y.id")).as("id_b"))
        .distinct()
      val allSh = s.read.parquet(s"$path/shingles").unionByName(bSh)
      Dedup.verifyJaccard(cands, allSh, p.threshold).count()
    }

    def time(label: String, f: () => Long): Unit = {
      val n0 = f() // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: rows $n0  min ${runs.min}%.3f s  median ${runs.sorted.apply(1)}%.3f s")
    }

    // WIDE regime: p46's oracle split
    val widePath = java.nio.file.Files
      .createTempDirectory("graft_incprobe_w").toString
    val wCorpus = docs.filter(col("doc_id") % 5 =!= 0)
    val wBatch = docs.filter(col("doc_id") % 5 === 0)
    IncrementalDedup.buildIndex(wCorpus, "doc_id", "text", p, widePath)
    time("WIDE   r7 union   ", () => unionProbe(wBatch, widePath))
    time("WIDE   r8 bucketed", () => IncrementalDedup.nearDupsAgainstIndex(
      s, wBatch, "doc_id", "text", p, widePath).count())

    // NARROW regime: 20 docs against the WHOLE corpus as index
    val narrowPath = java.nio.file.Files
      .createTempDirectory("graft_incprobe_n").toString
    val nBatch = docs.filter(col("doc_id") % 2500 === 0)
    IncrementalDedup.buildIndex(
      docs.filter(col("doc_id") % 2500 =!= 0), "doc_id", "text", p, narrowPath)
    time("NARROW r7 union   ", () => unionProbe(nBatch, narrowPath))
    time("NARROW r8 bucketed", () => IncrementalDedup.nearDupsAgainstIndex(
      s, nBatch, "doc_id", "text", p, narrowPath).count())
    s.stop()
  }
}
