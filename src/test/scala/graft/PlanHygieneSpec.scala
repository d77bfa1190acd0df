package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.Registry

/** Whole-registry plan audit: no query may regress into a cross product.
  * Planning only — nothing executes — so this sweeps all queries in
  * seconds and permanently pins the "no all-pairs node anywhere" claim
  * PLANS.md makes (the first property to silently rot when a join
  * condition is edited).
  */
class PlanHygieneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // Every BNLJ in the engine is a deliberate small-broadcast design,
  // enumerated here so a NEW one fails loudly:
  //  - q20_theta_join: pure theta, no equi conjunct exists — BNL over the
  //    broadcast dim is the correct plan at any scale
  //  - q54_bloom_prune: the "join" is a one-row broadcast carrying the
  //    bloom bitmap to every task — O(n) by construction
  //  - p09_ann_bruteforce: brute-force ANN is all-pairs BY DEFINITION;
  //    the query side is the small broadcast, the corpus streams
  //  - p13_ann_ivf: query × 16 centroids assignment (nlist is a constant)
  //  - p23_tfidf_topterms: the corpus size N joins in as a ONE-ROW
  //    broadcast aggregate (the alternative is a driver-side collect)
  //  - p29_cross_corpus_dedup: BloomPrune.antiKeep cross-broadcasts the
  //    ONE-ROW bloom bitmap to every task — same q54 pattern
  //  - p30_lm_score: the corpus token total joins in as a ONE-ROW
  //    broadcast aggregate — same p23 pattern
  //  - p33_collocations: the token and bigram totals join in as ONE-ROW
  //    broadcast aggregates — same p23/p30 pattern
  //  - p34_ann_quantized: brute force over int8 codes — all-pairs BY
  //    DEFINITION like p09; queries broadcast, corpus streams
  //  - p35_hard_negatives: p09's brute-force shape with a band filter
  //  - p37_corpus_drift: the (nr, nc, v) totals join in as a ONE-ROW
  //    broadcast aggregate — same p23/p30/p33 pattern
  //  - p38_ref_lm_score: the reference-LM (n, v) totals join in as a
  //    ONE-ROW broadcast aggregate — same pattern
  //  - p42_bigram_lm: the vocabulary size V joins in as a ONE-ROW
  //    broadcast aggregate — same p23/p30/p38 pattern
  //  - p50_temperature_mixture: the normalizer Z joins in as a ONE-ROW
  //    broadcast aggregate — same p23/p30 pattern
  //  - p51_curriculum_bins: the quantile-cutoff array joins in as a
  //    ONE-ROW broadcast aggregate — same pattern
  //  - p55_interp_lm: the (N, V) totals join in as a ONE-ROW broadcast
  //    aggregate — same p30/p38/p42 pattern
  private val bnljAllowed = Set("q20_theta_join", "q54_bloom_prune",
    "p09_ann_bruteforce", "p13_ann_ivf", "p23_tfidf_topterms",
    "p29_cross_corpus_dedup", "p30_lm_score", "p33_collocations",
    "p34_ann_quantized", "p35_hard_negatives", "p37_corpus_drift",
    "p38_ref_lm_score", "p42_bigram_lm", "p50_temperature_mixture",
    "p51_curriculum_bins", "p55_interp_lm")

  test("no cartesian product or unexpected BNLJ in any registered query") {
    val offenders = Registry.all.flatMap { q =>
      val plan =
        try q.run(spark, TestSpark.sf0001).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"${q.name} failed to plan: $e") }
      val cartesian = plan.contains("CartesianProduct")
      val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
        !bnljAllowed(q.name)
      if (cartesian || bnlj)
        Some(s"${q.name}: cartesian=$cartesian bnlj=$bnlj")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
