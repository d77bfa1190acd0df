package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: A/B p82's hash-prefiltered exact-substring dedup against
  * the naive formulation that groups EVERY stride-1 window by its full
  * span string (the w-token shuffle payload the hash path avoids), and
  * assert the outputs identical. (`runMain graft.tools.SubstrAb
  * [sfDir] [w]`)
  */
object SubstrAb {

  /** The naive baseline: one corpus-sized shuffle keyed by span text. */
  private def naiveCleaned(df: DataFrame, w: Int): DataFrame = {
    val docs = df.select(col("doc_id").cast("long").as("id"),
      split(col("text"), " ").as("tk"))
    val winArr = transform(
      sequence(lit(0), size(col("tk")) - lit(w)),
      i => array_join(slice(col("tk"), i + lit(1), lit(w)), " "))
    val wins = docs
      .select(col("id"),
        when(size(col("tk")) >= w, winArr)
          .otherwise(array().cast("array<string>")).as("wa"))
      .select(col("id"), posexplode(col("wa")))
      .select(col("id"), col("pos").as("s"), col("col").as("span"))
    val dup = wins.groupBy("span").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("span")
    val matched = wins.join(dup, "span").select("id", "s")
    matched.groupBy("id").agg(count(lit(1)).as("n_hits"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val w = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.api.Tables.t(spark, sfDir, "documents")

    def time(tag: String)(f: => Long): Long = {
      f // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: min ${runs.min}%.3f s median ${runs.sorted.apply(1)}%.3f s")
      f
    }
    val hash = graft.operators.ExactSubstrDedup
      .cleanedCorpus(docs, "doc_id", "text", w = w)
    time("hash-prefilter (p82)") { hash.count() }
    time("naive span-string groupBy") { naiveCleaned(docs, w).count() }
    // equivalence: identical per-doc span telemetry
    val a = hash.select("doc_id", "n_spans", "dup_tokens", "cleaned_text")
      .collect().toSet
    val b = graft.operators.ExactSubstrDedup
      .cleanedCorpus(docs, "doc_id", "text", w = w,
        broadcastCandidates = false)
      .select("doc_id", "n_spans", "dup_tokens", "cleaned_text")
      .collect().toSet
    assert(a == b, "broadcast and shuffle candidate paths must agree")
    println(s"paths agree on ${a.size} docs")
    spark.stop()
  }
}
