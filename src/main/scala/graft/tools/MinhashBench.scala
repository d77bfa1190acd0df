package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev tool: A/B the p02 minhash-near-dup pipeline formulations —
  * the current shape (shingle projection ABOVE the id-exchange, so the
  * raw-text exchange is reused but shingling recomputes per consuming
  * branch) vs a second pinned id-exchange carrying the COMPUTED shingle
  * arrays, which every consumer (signatures + both verify sides) then
  * reads from one reused exchange. Trade: one extra shuffle of shingle
  * arrays (~3x text bytes) vs two redundant shingle computations.
  * (`runMain graft.tools.MinhashBench [sfDir]`)
  */
object MinhashBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val docs = graft.api.Tables.t(s, dir, "documents")

    val current = () => Dedup.minhashNearDupPairs(docs, "doc_id", "text").count()

    val reused = () => {
      val sh = Dedup.shingled(docs, "doc_id", "text", 3)
        .repartition(s.sparkContext.defaultParallelism, col("id"))
      val sigs = Dedup.minhashSignatures(sh, 128)
      Dedup.verifyJaccard(Dedup.lshCandidates(sigs, 128, 32), sh, 0.8).count()
    }

    def time(label: String, f: () => Long): Unit = {
      val n0 = f() // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: rows $n0  min ${runs.min}%.3f s  median ${runs.sorted.apply(1)}%.3f s")
    }
    time("current (shingle above X1) ", current)
    time("reused  (second exchange X2)", reused)
    s.stop()
  }
}
