package graft

import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ExactSubstrDedup

/** Exact-substring dedup (p82): hand-computed span removal — cross-doc
  * runs, intra-doc repeats, touch-merged adjacent runs, sub-width docs —
  * plus the hash-pre-filter invisibility contract and the no-WindowExec
  * plan shape.
  */
class ExactSubstrDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rRun = (1 to 12).map(i => s"r$i").mkString(" ") // shared 12-run
  private val qRun = (1 to 8).map(i => s"q$i").mkString(" ")
  private val uRun = (1 to 8).map(i => s"u$i").mkString(" ")
  private val vRun = (1 to 8).map(i => s"v$i").mkString(" ")
  private def docs = Seq(
    (0L, s"a1 a2 $rRun a3"),          // shares the 12-run with doc 1
    (1L, s"$rRun b1 b2"),
    (2L, s"$qRun c1 c2 c3 $qRun"),    // INTRA-doc repeat
    (3L, s"$uRun $vRun"),             // two adjacent dup runs: touch-merge
    (4L, s"x1 $uRun x2"),
    (5L, s"y1 $vRun y2"),
    (6L, "g1 g2 g3"),                 // shorter than the window: untouched
    (7L, "h1 h2 h3 h4 h5 h6 h7 h8 h9")) // all windows unique: untouched
    .toDF("doc_id", "text")

  private def cleaned(broadcastCandidates: Boolean = true) =
    ExactSubstrDedup.cleanedCorpus(docs, "doc_id", "text",
        w = 8, minCount = 2, broadcastCandidates = broadcastCandidates)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Int, String)].collect().toSeq

  test("cross-doc, intra-doc, and touch-merged spans remove exactly the duplicated runs") {
    assert(cleaned() == Seq(
      // doc 0: matched starts 2..6 merge to [2,14) — the whole r-block
      (0L, 1L, 12L, 15, "a1 a2 a3"),
      (1L, 1L, 12L, 14, "b1 b2"),
      // doc 2: starts 0 and 11 are separate islands (11 > 0+8)
      (2L, 2L, 16L, 19, "c1 c2 c3"),
      // doc 3: starts 0 and 8 TOUCH (8 <= 0+8) -> one maximal [0,16) span
      (3L, 1L, 16L, 16, ""),
      (4L, 1L, 8L, 10, "x1 x2"),
      (5L, 1L, 8L, 10, "y1 y2"),
      (6L, 0L, 0L, 3, "g1 g2 g3"),
      (7L, 0L, 0L, 9, "h1 h2 h3 h4 h5 h6 h7 h8 h9")))
  }

  test("hash pre-filter is invisible: shuffle-join candidate path is identical") {
    assert(cleaned(broadcastCandidates = false) == cleaned())
  }

  test("no WindowExec anywhere in the plan (island merge is a HOF fold)") {
    val plan = ExactSubstrDedup.cleanedCorpus(docs, "doc_id", "text")
      .queryExecution.executedPlan
    assert(plan.collectWithSubqueries { case w: WindowExec => w }.isEmpty)
  }

  test("parameter guards: w >= 1, minCount >= 2") {
    intercept[IllegalArgumentException] {
      ExactSubstrDedup.cleanedCorpus(docs, "doc_id", "text", w = 0)
    }
    intercept[IllegalArgumentException] {
      ExactSubstrDedup.cleanedCorpus(docs, "doc_id", "text", minCount = 1)
    }
  }
}
