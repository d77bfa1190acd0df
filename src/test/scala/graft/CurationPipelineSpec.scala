package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CurationPipeline

/** Curation funnel (p57): stage attribution on a hand-computed fixture,
  * cross-source canonical assignment, and the persistBase cache contract.
  */
class CurationPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // srcA: one good doc (5 tokens), one too_short, one duplicate of the
  // good doc with a HIGHER id. srcB: the same duplicate text under the
  // LOWEST id of its hash group — canonical lands in srcB, so srcA's
  // copy is counted in n_quality but not n_canonical.
  private val good = "alpha beta gamma delta epsilon"
  private def docs = Seq(
    (10L, "srcA", good),
    (11L, "srcA", "too short"),
    (12L, "srcA", good),
    (2L, "srcB", good),
    (20L, "srcB", "one two three four five six"))
    .toDF("doc_id", "source", "text")

  test("funnel counts per stage and source; canonical crosses sources to the min id") {
    val got = CurationPipeline.funnelReport(docs, "doc_id", "text", "source")
      .orderBy("source")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // srcA: 3 in, 2 pass quality, 0 canonical (the md5 group's min id is
    // 2L in srcB); srcB: 2 in, 2 pass, both canonical, 5 + 6 tokens kept
    assert(got == Seq(
      ("srcA", 3L, 2L, 0L, 0L),
      ("srcB", 2L, 2L, 2L, 11L)))
  }

  test("a source whose every doc fails the gate reports zero canonical rows, not null") {
    val d = Seq((1L, "bad", "x"), (2L, "ok", good))
      .toDF("doc_id", "source", "text")
    val got = CurationPipeline.funnelReport(d, "doc_id", "text", "source")
      .orderBy("source")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("bad", 1L, 0L, 0L, 0L), ("ok", 1L, 1L, 1L, 5L)))
  }

  test("persistBase caches the projection for both consumers, result unchanged") {
    val plain = CurationPipeline.funnelReport(docs, "doc_id", "text",
      "source").orderBy("source").collect().toSeq
    val cached = CurationPipeline.funnelReport(docs, "doc_id", "text",
      "source", persistBase = true)
    val plan = cached.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      s"persistBase must put the base projection in cache:\n$plan")
    assert(cached.orderBy("source").collect().toSeq == plain)
    spark.sharedState.cacheManager.clearCache()
  }
}
