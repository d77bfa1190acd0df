package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dsir

/** DSIR selection (p70): distribution matching actually recovers the
  * target domain without reading the label, the persist flag changes
  * the plan but not the answer, layout invariance, and guards.
  */
class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")

  test("top-k recovers the target domain from content alone") {
    val target = docs.filter($"lang" === "de")
    val nTarget = target.count()
    val sel = Dsir.selectTopK(docs, target, "doc_id", "text", k = 100)
      .select("id").as[Long].collect().toSet
    val selLangs = docs.filter($"doc_id".isin(sel.toSeq: _*))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // the lang column never enters the score; hashed-bigram likelihood
    // ratios alone must still surface the de slice
    assert(selLangs.getOrElse("de", 0L) >= (nTarget * 8) / 10,
      s"expected >= 80% of the $nTarget de docs in the top-100, " +
        s"got $selLangs")
    assert(selLangs("de") > selLangs.filter(_._1 != "de").values.max,
      "the target language must dominate the selection")
  }

  test("persistGrams caches the gram stream without changing the answer") {
    val target = docs.filter($"lang" === "fr")
    def run(p: Boolean) = Dsir.selectTopK(docs, target, "doc_id", "text",
      k = 40, persistGrams = p)
    assert(run(true).as[(Long, Double)].collect().toSeq ==
      run(false).as[(Long, Double)].collect().toSeq)
    assert(run(true).queryExecution.executedPlan.toString
      .contains("InMemoryTableScan"))
  }

  test("layout invariance: the same selection under any input partitioning") {
    val target = docs.filter($"lang" === "zh")
    def run(parts: Int) = Dsir.selectTopK(docs.repartition(parts), target,
      "doc_id", "text", k = 30).as[(Long, Double)].collect().toSeq
    assert(run(1) == run(13))
  }

  test("degenerate parameters are rejected") {
    intercept[IllegalArgumentException] {
      Dsir.selectTopK(docs, docs, "doc_id", "text", buckets = 1)
    }
    intercept[IllegalArgumentException] {
      Dsir.selectTopK(docs, docs, "doc_id", "text", k = 0)
    }
  }
}
