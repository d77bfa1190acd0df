package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LineDedup

/** Line-level boilerplate dedup (p60): drop-all vs keep-first policies,
  * distinct-doc (not occurrence) frequency, docs that lose everything,
  * empty docs, and the broadcast/shuffle dictionary-join equivalence.
  */
class LineDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(minDocs: Int, keepFirst: Boolean = false,
      broadcastDict: Boolean = true,
      rows: Seq[(Long, String)]): Map[Long, (Long, Long, String)] =
    LineDedup.dropSharedLines(rows.toDF("id", "text"), "id", "text",
        sep = "\n", minDocs = minDocs, keepFirst = keepFirst,
        broadcastDict = broadcastDict)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  private val fixture = Seq(
    1L -> "boiler\na\nboiler", // within-doc repeat: df counts the DOC once
    2L -> "boiler\nb",
    3L -> "boiler\nc",
    4L -> "x\ny")

  test("drop-all removes every occurrence of a >=minDocs line") {
    val out = run(minDocs = 3, rows = fixture)
    // "boiler" is in 3 distinct docs; BOTH of doc 1's occurrences go
    assert(out(1L) == ((3L, 2L, "a")))
    assert(out(2L) == ((2L, 1L, "b")))
    assert(out(3L) == ((2L, 1L, "c")))
    assert(out(4L) == ((2L, 0L, "x\ny")))
  }

  test("distinct-doc counting: a within-doc refrain alone is not boilerplate") {
    // "boiler" df = 3 (not 4): raising the bar past the doc count keeps it
    val out = run(minDocs = 4, rows = fixture)
    assert(out(1L) == ((3L, 0L, "boiler\na\nboiler")))
    assert(out(2L) == ((2L, 0L, "boiler\nb")))
  }

  test("keep-first: the smallest id keeps its occurrences, later docs lose them") {
    val out = run(minDocs = 2, keepFirst = true, rows = fixture)
    assert(out(1L) == ((3L, 0L, "boiler\na\nboiler")))
    assert(out(2L) == ((2L, 1L, "b")))
    assert(out(3L) == ((2L, 1L, "c")))
    assert(out(4L) == ((2L, 0L, "x\ny")))
  }

  test("a doc can lose every line but never disappears; empty docs pass through") {
    val rows = Seq(1L -> "boiler", 2L -> "boiler", 3L -> "boiler\nkeep",
      4L -> "")
    val out = run(minDocs = 3, rows = rows)
    assert(out(1L) == ((1L, 1L, "")))
    assert(out(3L) == ((2L, 1L, "keep")))
    assert(out(4L) == ((0L, 0L, "")))
    assert(out.size == 4)
  }

  test("position order survives the rewrite") {
    val rows = Seq(1L -> "z\nboiler\na\nboiler\nm",
      2L -> "boiler", 3L -> "boiler")
    val out = run(minDocs = 3, rows = rows)
    assert(out(1L) == ((5L, 2L, "z\na\nm")))
  }

  test("shuffled dictionary join (broadcastDict = false) is output-identical") {
    val b = run(minDocs = 3, rows = fixture)
    val s = run(minDocs = 3, broadcastDict = false, rows = fixture)
    assert(b == s)
    // and the two pins actually produce the two join strategies
    def plan(bd: Boolean) = LineDedup.dropSharedLines(
      fixture.toDF("id", "text"), "id", "text", minDocs = 3,
      broadcastDict = bd).queryExecution.executedPlan.toString
    assert(plan(true).contains("BroadcastHashJoin"))
    assert(plan(false).contains("ShuffledHashJoin"))
  }

  test("minDocs = 1 is rejected (it would drop every line everywhere)") {
    val e = intercept[IllegalArgumentException] {
      LineDedup.dropSharedLines(fixture.toDF("id", "text"), "id", "text",
        minDocs = 1)
    }
    assert(e.getMessage.contains("minDocs"))
  }
}
