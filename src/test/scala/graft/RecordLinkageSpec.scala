package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RecordLinkage
import graft.operators.RecordLinkage.{exactRule, withinRule}

/** Record linkage (p66): the blocked Fellegi-Sunter decision — scoring,
  * blocking precision (cross-block matches are invisible by design),
  * the threshold boundary, and guards.
  */
class RecordLinkageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (rid, name, seg, bal, blk)
  private val srcA = Seq(
    (1L, "alice", "AUTO", 100.00, 1),
    (2L, "bob", "AUTO", 250.00, 1),
    (3L, "carol", "BLDG", 7.25, 2))
  private def dfA = srcA.toDF("rid", "name", "seg", "bal", "blk")

  private def link(bRows: Seq[(Long, String, String, Double, Int)],
      threshold: Double) =
    RecordLinkage.scoredPairs(dfA,
        bRows.toDF("rid", "name", "seg", "bal", "blk"), "rid", Seq("blk"),
        Seq(exactRule("name", 3.0), exactRule("seg", 2.0),
          withinRule("bal", 0.5, 1.0)),
        threshold)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("weighted field scores and the decision threshold") {
    val b = Seq(
      (11L, "alice", "AUTO", 100.4, 1), // full agreement -> 6
      (12L, "bob", "HSLD", 250.0, 1),   // seg disagrees -> 4
      (13L, "carol", "BLDG", 99.0, 2))  // bal out of tol -> 5
    val out = link(b, threshold = 4.0)
    assert(out((1L, 11L)) == 6.0)
    assert(out((2L, 12L)) == 4.0)
    assert(out((3L, 13L)) == 5.0)
    // same-block non-matches score below the bar and are absent
    assert(!out.contains((1L, 12L)) || out((1L, 12L)) >= 4.0)
    assert(link(b, threshold = 5.0).keySet == Set((1L, 11L), (3L, 13L)))
  }

  test("blocking fences the comparison: a cross-block twin is invisible by design") {
    val b = Seq((11L, "alice", "AUTO", 100.0, 2)) // perfect match, wrong block
    val all = link(b, threshold = 0.0)
    assert(!all.contains((1L, 11L)),
      "records that disagree on every block key are never compared — " +
        "a perfect cross-block match stays invisible")
    // the twin IS compared within its own block (against carol), scoring 0
    assert(all.get((3L, 11L)).contains(0.0))
    // multi-pass cure: a second pass blocked on the field that DOES
    // agree finds it
    val secondPass = RecordLinkage.scoredPairs(dfA,
        b.toDF("rid", "name", "seg", "bal", "blk"), "rid", Seq("seg"),
        Seq(exactRule("name", 3.0)), threshold = 3.0)
      .as[(Long, Long, Double)].collect()
    assert(secondPass.map(r => (r._1, r._2)).toSet == Set((1L, 11L)))
  }

  test("no cartesian product: candidates come from the block equi-join") {
    val b = Seq((11L, "alice", "AUTO", 100.0, 1))
    val plan = RecordLinkage.scoredPairs(dfA,
        b.toDF("rid", "name", "seg", "bal", "blk"), "rid", Seq("blk"),
        Seq(exactRule("name", 1.0)), threshold = 0.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("empty blocking or rule sets are rejected") {
    val b = dfA
    intercept[IllegalArgumentException] {
      RecordLinkage.scoredPairs(dfA, b, "rid", Nil,
        Seq(exactRule("name", 1.0)), 0.0)
    }
    intercept[IllegalArgumentException] {
      RecordLinkage.scoredPairs(dfA, b, "rid", Seq("blk"), Nil, 0.0)
    }
  }
}
