package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev tool: decompose p02's cost — each prefix of the minhash chain
  * timed to a noop sink (`runMain graft.tools.MicroP02 [sfDir]`).
  */
object MicroP02 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val docs = graft.api.Tables.t(s, dir, "documents")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      noop(f) // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-34s min ${runs.min}%.3f s")
    }
    val sh = () => Dedup.shingled(docs, "doc_id", "text", 3)
      .repartition(s.sparkContext.defaultParallelism, col("id"))
    time("shingled+repart") { sh() }
    time("sigs (wide 128)") { Dedup.minhashSignatures(sh(), 128) }
    time("sigs mh array only") {
      sh().select(col("id"),
        graft.functions.Fns.minhashSigs(col("sh"), 128).as("mh"))
        .filter(col("mh").isNotNull)
    }
    time("bandRows") {
      Dedup.bandRows(Dedup.minhashSignatures(sh(), 128), 128, 32) }
    time("lshCandidates") {
      Dedup.lshCandidates(Dedup.minhashSignatures(sh(), 128), 128, 32) }
    time("full p02") {
      Dedup.minhashNearDupPairs(docs, "doc_id", "text") }
    s.stop()
  }
}
