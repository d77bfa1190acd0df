package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, IncrementalDedup}

/** Dev tool: A/B the p46 incremental-dedup PROBE formulations over the
  * same persisted index files —
  *   - "r7 union probe": read the index dirs as plain parquet (bucketing
  *     ignored), union the index and batch band rows, symmetric
  *     SHUFFLE_HASH self-join, union-side verify — the round-7 shape that
  *     re-shuffles the whole corpus-sized index every batch;
  *   - "r8 bucketed probe": [[IncrementalDedup.nearDupsAgainstIndex]] —
  *     bucket-pruned, exchange-free index sides.
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
    val path = java.nio.file.Files
      .createTempDirectory("graft_incprobe").toString
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    IncrementalDedup.buildIndex(corpus, "doc_id", "text", p, path)

    val bucketed = () => IncrementalDedup.nearDupsAgainstIndex(
      s, batch, "doc_id", "text", p, path).count()

    // round-7 shape reconstructed over the same files: plain-parquet read
    // (no bucketing metadata), index ∪ batch build side, one-join probe
    val unionProbe = () => {
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
    time("r7 union probe   ", unionProbe)
    time("r8 bucketed probe", bucketed)
    s.stop()
  }
}
