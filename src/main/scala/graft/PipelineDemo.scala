package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{BloomPrune, ConnectedComponents, Decontaminate, Dedup, GapFill, IdAssign, Sampling, TextAnalysis}

/** End-to-end training-data pipeline demo: the chain a 100 TB corpus
  * would run, at fixture scale —
  *   documents → cross-corpus dedup (bloom anti-join vs the previously
  *               ingested corpus) → exact dedup → near-dup removal
  *               (MinHash+LSH) → benchmark decontamination →
  *               quality/repetition gate → mixture sampling →
  *               leakage-safe train/val/test split → token accounting
  *               → parquet (+ a deterministic per-language sample
  *               manifest + gap-filled daily ingest telemetry).
  * Every stage is one of the library operators; nothing touches the
  * driver except the final summary counts.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "/tmp/graft-pipeline"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val allDocs = graft.api.Tables.t(spark, dir, "documents")
    val n00 = allDocs.count()

    // 0. cross-corpus dedup at ingest: docs whose 200-char-prefix
    //    fingerprint already exists in the "previously ingested" corpus
    //    (stand-in: doc_id % 7 = 0) are dropped by the bloom-accelerated
    //    exact anti-join — the bulk of a real crawl never reaches a join
    //    exchange
    val fingerprinted = allDocs.withColumn("fp",
      graft.functions.Fns.rollingHash31(substring(col("text"), 1, 200)))
    val docs = BloomPrune.antiKeep(
        facts = fingerprinted.filter(col("doc_id") % 7 =!= 0),
        keyCol = "fp",
        dimKeys = fingerprinted.filter(col("doc_id") % 7 === 0).select("fp"),
        dimKeyCol = "fp", numBits = 1 << 14)
      .drop("fp")
    val n0 = docs.count()

    // 1. exact dedup: keep the min doc_id of each identical text
    val keepExact = Dedup.exactGroups(docs, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val exactDeduped = docs.join(keepExact, "doc_id")
    val n1 = exactDeduped.count()

    // 2. near-dup removal: verified pairs → connected components → keep
    //    exactly one representative per group (near-dup is not
    //    transitive; dropping the higher id of each PAIR would keep
    //    overlapping "groups" — see ConnectedComponents)
    val nearPairs = Dedup.minhashNearDupPairs(exactDeduped, "doc_id", "text")
    val groups = ConnectedComponents.dedupGroups(exactDeduped, "doc_id", nearPairs)
    val nearDeduped = exactDeduped.join(
      groups.filter(col("is_rep")).select("doc_id"), "doc_id")
    val n2 = nearDeduped.count()

    // 3. benchmark decontamination: docs sharing any word 4-gram with
    //    the held-out eval split (doc_id % 20 = 0) leave the train pool
    val evalDocs = docs.filter(col("doc_id") % 20 === 0)
    val trainPool = nearDeduped.filter(col("doc_id") % 20 =!= 0)
    val decontaminated = Decontaminate.clean(
      trainPool, evalDocs, "doc_id", "text", n = 4)
    val n3 = decontaminated.count()

    // 4. analysis + quality/repetition gate — appended as a pure
    //    projection (a join back on doc_id would recompute the
    //    decontamination prefix twice)
    val analyzed = decontaminated.select(col("*") +:
      (TextAnalysis.analysisColumns(col("text")) ++
        TextAnalysis.repetitionColumns(col("text"))): _*)
    val kept = analyzed.filter(col("quality_score") > 3.0 &&
      col("n_tokens") >= 10 && col("dup_3gram_frac") < 0.5)
    val n4 = kept.count()

    // 5. data mixing: per-source quotas (upweight even sources), then
    //    contiguous global ids in doc_id order — the stable sequence ids
    //    a downstream tokenizer shards by
    val quotas = (0 until 20).map(i =>
      s"src$i" -> (if (i % 2 == 0) 25 else 10)).toMap
    val mixed = Sampling.mixture(kept, "source", "doc_id", quotas)
    val withIds = IdAssign.contiguousIds(mixed, col("doc_id"), "gid")
    val n5 = withIds.count()

    // 6. leakage-safe train/val/test split: assignment hashes the doc's
    //    DEDUP GROUP (from step 2's verified pairs), so near-duplicate
    //    clusters never straddle a split boundary. Derived from step 2's
    //    ALREADY-COMPUTED components — leakageSafeSplit(withIds,
    //    nearPairs) would re-run the MinHash + label-propagation job
    val withSplit = withIds
      .join(groups.select("doc_id", "group_id"), "doc_id")
      .withColumn("split",
        graft.operators.Sampling.splitForGroup(col("group_id")))
      .drop("group_id")
    val splitCounts = withSplit.groupBy("split").count()
      .orderBy("split").collect()
      .map(r => s"${r.get(0)}=${r.get(1)}").mkString("/")

    // 7. token accounting + sink + deterministic per-language sample
    //    manifest (for eyeballing / eval construction)
    val stats = withSplit.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum("ws_tokens").as("total_tokens"),
      round(avg("quality_score"), 3).as("avg_quality"))
    withSplit.select("gid", "doc_id", "lang", "split", "text", "n_tokens",
        "quality_score")
      .write.mode("overwrite").parquet(out)
    Sampling.perStratum(withSplit, "lang", "doc_id", k = 5)
      .select("doc_id", "lang", "n_tokens")
      .write.mode("overwrite").parquet(s"$out-sample")

    // 8. ingest telemetry: gap-filled daily event volume per event type
    //    (LOCF over calendar gaps) — the ops-side series a pipeline
    //    dashboards next to the corpus counts
    val daily = graft.api.Tables.t(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("n_events"))
    val telemetry = GapFill.dailyLocf(daily, "event_type", "day", "n_events")
    val nTelemetry = telemetry.count()
    val nFilled = telemetry.filter(col("is_gap")).count()

    val summary = stats.orderBy("lang").collect()
      .map(r => s"${r.get(0)}:${r.get(1)} docs/${r.get(2)} tokens")
      .mkString(", ")
    println(s"[pipeline] $n00 docs -> $n0 after cross-corpus dedup -> " +
      s"$n1 after exact dedup -> " +
      s"$n2 after near-dedup -> $n3 after decontamination -> " +
      s"$n4 after quality gate -> $n5 after mixing (ids 0..${n5 - 1}) | " +
      s"split $splitCounts | $summary | telemetry $nTelemetry day-rows " +
      s"($nFilled gap-filled) | wrote $out (+ -sample manifest)")
    spark.stop()
  }
}
