package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.api.Tables
import graft.operators.{BloomPrune, ConnectedComponents, Decontaminate,
  Dedup, IdAssign, Sampling, TextAnalysis}

/** Dev tool: cumulative stage decomposition of p92_pipeline_e2e —
  * times a count() after each stage prefix (min-of-3 each, Bench
  * session shape) so the chain's cost attributes to stages instead of
  * one number (`runMain graft.tools.DbgP92 [sfDir]`).
  */
object DbgP92 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$label%-16s min=${ts.map(_._1).min}%.3f rows=${ts.head._2}")
    }

    val allDocs = Tables.t(s, dir, "documents")
    val fingerprinted = allDocs.withColumn("fp",
      graft.functions.Fns.rollingHash31(substring(col("text"), 1, 200)))
    def docs = BloomPrune.antiKeep(
        facts = fingerprinted.filter(col("doc_id") % 7 =!= 0),
        keyCol = "fp",
        dimKeys = fingerprinted.filter(col("doc_id") % 7 === 0).select("fp"),
        dimKeyCol = "fp", numBits = 1 << 14)
      .drop("fp")
    time("0_crosscorpus") { docs.count() }
    def exactDeduped = docs.join(
      Dedup.exactGroups(docs, "doc_id", "text")
        .select(col("keep_id").as("doc_id")), "doc_id")
    time("1_exact") { exactDeduped.count() }
    def nearPairs = Dedup.minhashNearDupPairs(exactDeduped,
      "doc_id", "text", 3, 128, 32, 0.8)
    time("2_pairs") { nearPairs.count() }
    val pairsV = nearPairs
    def groups = ConnectedComponents.dedupGroups(
      exactDeduped, "doc_id", pairsV)
    time("3_components") { groups.count() }
    val groupsV = groups
    def nearDeduped = exactDeduped.join(
      groupsV.filter(col("is_rep")).select("doc_id"), "doc_id")
    def decon = Decontaminate.clean(
      nearDeduped.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0), "doc_id", "text", n = 4)
    time("4_decontam") { decon.count() }
    def kept = decon
      .select(col("*") +: (TextAnalysis.analysisColumns(col("text")) ++
        TextAnalysis.repetitionColumns(col("text"))): _*)
      .filter(col("quality_score") > 3.0 && col("n_tokens") >= 10 &&
        col("dup_3gram_frac") < 0.5)
    time("5_quality") { kept.count() }
    val quotas = (0 until 20).map(i =>
      s"src$i" -> (if (i % 2 == 0) 25 else 10)).toMap
    def withIds = IdAssign.contiguousIds(
      Sampling.mixture(kept, "source", "doc_id", quotas),
      col("doc_id"), "gid")
    time("6_mix_ids") { withIds.count() }
    s.stop()
  }
}
