package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Decontaminate, TextAnalysis}

class PipelineExtSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val eval = Seq(
    (100L, "the quick brown fox jumps"),
    (101L, "pack my box with five dozen jugs"))
    .toDF("doc_id", "text")

  private val train = Seq(
    (1L, "the quick brown fox sleeps"),            // shares "the quick brown", "quick brown fox"
    (2L, "completely unrelated words here now"),   // clean
    (3L, "pack my box with care"),                 // shares "pack my box" (+ "my box with")
    (4L, "fox jumps"))                             // too short for 3-grams
    .toDF("doc_id", "text")

  test("decontaminate: overlap counts = distinct shared n-grams per doc") {
    val got = Decontaminate
      .overlapCounts(train, eval, "doc_id", "text", n = 3)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (3L, 2L)))
  }

  test("decontaminate: clean() drops contaminated docs, keeps payload intact") {
    val kept = Decontaminate.clean(train, eval, "doc_id", "text", n = 3)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(kept == Seq(
      (2L, "completely unrelated words here now"),
      (4L, "fox jumps")))
  }

  test("decontaminate: corpus side is never shuffled (broadcast join plan)") {
    val plan = Decontaminate
      .overlapCounts(train, eval, "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // in treeString the streamed (train) subtree prints between the join
    // node and the BroadcastExchange of the eval side: that segment must
    // be shuffle-free (the eval side's distinct may shuffle — it's tiny)
    val joinDown = plan.substring(plan.indexOf("BroadcastHashJoin"))
    val trainSide = joinDown.substring(0, joinDown.indexOf("BroadcastExchange"))
    assert(!trainSide.contains("Exchange hashpartitioning"), plan)
  }

  test("repetition metrics match hand computation") {
    val df = Seq(
      (1L, "a a a a"),        // words 4/1 distinct; 2-grams 3 occ/1 distinct; 3-grams 2/1
      (2L, "a b a b a"),      // words 5/2; 2-grams 4 occ/2 distinct; 3-grams 3/2
      (3L, "x y z"),          // all distinct
      (4L, "x"))              // too short for 2/3-grams -> 0.0
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id") +:
        TextAnalysis.repetitionColumns(col("text")): _*)
      .orderBy("doc_id")
      .as[(Long, Double, Double, Double)].collect().toSeq
    def r(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got == Seq(
      (1L, 0.75, r(2.0 / 3), 0.5),
      (2L, 0.6, 0.5, r(1.0 / 3)),
      (3L, 0.0, 0.0, 0.0),
      (4L, 0.0, 0.0, 0.0)))
  }
}
