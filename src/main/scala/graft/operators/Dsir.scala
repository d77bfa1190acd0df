package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023) —
  * pick the raw-corpus documents that look most like a small TARGET
  * domain, using hashed n-gram bag models exactly as the paper does:
  * build unigram models over HASHED n-gram features (a `buckets`-sized
  * table, not an open vocabulary) for target and raw, score each raw
  * doc by its mean log-likelihood RATIO, keep the top-k. This is the
  * data-selection method behind domain-targeted pretraining subsets;
  * beside [[Coreset]] (geometry-driven) and [[Sampling]]
  * (frequency-driven) it is the DISTRIBUTION-MATCHING member of the
  * selection family.
  *
  * Determinism: features are distinct word n-grams hashed by the
  * engine-mirrorable RollingHash31 mod `buckets`; both models are
  * add-one smoothed over the bucket space, the ratio is computed in
  * ln, the per-doc score is the MEAN over the doc's distinct features
  * (length-normalized — the paper's sum variant favors long documents;
  * 6dp-rounded before ranking) and the top-k cut breaks ties on min
  * id. The paper's Gumbel-noise resampling is replaced by the
  * deterministic top-k — the variant an exact oracle can certify
  * ([[Sampling.weighted]] holds the seeded-noise pattern if wanted).
  *
  * Scale: both models are buckets-sized partial-agg counts (the hash
  * fence keeps them bounded regardless of corpus vocabulary); totals
  * ride 1-row broadcasts (p30/p38's envelope); scoring joins each raw
  * doc's gram rows against the broadcast bucket models and
  * partial-aggs the mean; the cut is a TakeOrdered — map-side k-row
  * heaps, no global sort. The raw corpus is scanned twice (model +
  * scoring); `persistGrams = true` caches the gram stream once
  * (TfIdf's explicit-persist pattern).
  */
object Dsir {

  /** Top-k raw docs by target-likeness: (id, dsir_score) — mean ln
    * ratio, 6dp.
    */
  def selectTopK(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, n: Int = 2, buckets: Int = 4096, k: Int = 100,
      persistGrams: Boolean = false): DataFrame = {
    require(n >= 1 && buckets >= 2 && k >= 1,
      s"need n >= 1, buckets >= 2, k >= 1; got $n/$buckets/$k")
    def grams(df: DataFrame) = df
      .select(col(idCol).cast("long").as("id"),
        Fns.shingleRows(Fns.tokens(col(textCol)), n).as("gram"))
      .select(col("id"),
        pmod(Fns.rollingHash31(col("gram")), lit(buckets)).as("g"))
    val rawGrams0 = grams(raw)
    val rawGrams = if (persistGrams)
      rawGrams0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else rawGrams0
    def model(g: DataFrame, cAs: String) =
      g.groupBy("g").agg(count(lit(1)).cast("double").as(cAs))
    val tm = model(grams(target), "ct")
    val rm = model(rawGrams, "cr")
    val tot = tm.agg(sum("ct").as("nt")).crossJoin(rm.agg(sum("cr").as("nr")))
    // smoothed per-bucket ln ratio; buckets unseen on a side get the
    // add-one floor via the LEFT joins' coalesce(0)
    val scored = rawGrams
      .join(broadcast(tm), Seq("g"), "left")
      .join(broadcast(rm), Seq("g"), "left")
      .crossJoin(broadcast(tot))
      .select(col("id"),
        (log((coalesce(col("ct"), lit(0.0)) + 1) / (col("nt") + buckets)) -
          log((coalesce(col("cr"), lit(0.0)) + 1) / (col("nr") + buckets)))
          .as("lr"))
      .groupBy("id")
      .agg(round(avg("lr"), 6).as("dsir_score"))
    scored.orderBy(col("dsir_score").desc, col("id").asc).limit(k)
  }
}
