package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.BpeTrainer

/** Dev tool: A/B the BPE merge-loop finish strategies at
  * numMerges = 256 on the sf0.1 documents table — the DRIVER finish
  * (word-frequency table collected once, rounds as a plain in-JVM
  * loop: zero Spark jobs per round) vs the DISTRIBUTED rounds
  * (per-round pair-agg + TakeOrdered + fold + localCheckpoint). Both
  * learn from the identical single corpus scan; asserts the merge
  * tables are identical. (`runMain graft.tools.BpeAb [sfDir] [n]`)
  */
object BpeAb {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val n = if (args.length > 1) args(1).toInt else 256
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    val docs = s.read.parquet(s"$dir/documents.parquet")
    def time(label: String, driverMax: Long): Seq[(Int, String, String, Long)] = {
      val t0 = System.nanoTime()
      val out = BpeTrainer.learnMerges(docs, "text", n, driverMax)
        .orderBy("merge_rank")
        .as[(Int, String, String, Long)].collect().toSeq
      println(f"$label (numMerges=$n): ${(System.nanoTime() - t0) / 1e9}%.2f s, ${out.size} merges learned")
      out
    }
    val driver = time("driver finish     ", BpeTrainer.DefaultDriverMaxWords)
    val dist = time("distributed rounds", 0L)
    require(driver == dist, "merge tables diverged!")
    println(s"selection-identical across ${driver.size} merges: OK")
    s.stop()
  }
}
