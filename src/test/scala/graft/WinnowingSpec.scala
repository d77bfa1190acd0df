package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Winnowing

/** Winnowing fingerprints (p62): the paper's detection guarantee (a
  * shared token run >= w + k - 1 always yields a shared fingerprint),
  * edit locality (one edit perturbs only nearby fingerprints), short-doc
  * behavior, and the exchange-free selection plan.
  */
class WinnowingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 4
  private val W = 4

  private def fps(rows: Seq[(Long, String)]): Map[Long, Set[Long]] =
    Winnowing.fingerprints(rows.toDF("id", "text"), "id", "text", K, W)
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (id, a) => id -> a.map(_._2).toSet }

  /** Deterministic unique filler tokens, so unrelated doc regions share
    * no grams at all.
    */
  private def filler(tag: String, n: Int): Seq[String] =
    (0 until n).map(i => s"${tag}_$i")

  test("guarantee: a shared run of w + k - 1 tokens always shares a fingerprint") {
    // shared span of exactly w + k - 1 = 7 tokens, buried at different
    // offsets inside otherwise-disjoint docs — the minimum span the
    // paper guarantees; try several offsets so the window alignment
    // cannot save the test by luck
    val shared = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta")
    for (off <- Seq(0, 3, 11)) {
      val d1 = (filler("x", off) ++ shared ++ filler("y", 9)).mkString(" ")
      val d2 = (filler("p", off + 5) ++ shared ++ filler("q", 2))
        .mkString(" ")
      val m = fps(Seq(1L -> d1, 2L -> d2))
      assert((m(1L) & m(2L)).nonEmpty,
        s"offset $off: shared 7-token run must yield a shared fingerprint")
    }
  }

  test("whole-doc fingerprint brittleness is gone: one edit keeps most fingerprints") {
    val base = (0 until 60).map(i => s"tok$i")
    val edited = base.updated(30, "EDITED")
    val m = fps(Seq(1L -> base.mkString(" "), 2L -> edited.mkString(" ")))
    val kept = (m(1L) & m(2L)).size.toDouble / m(1L).size
    assert(kept > 0.6, s"one mid-doc edit should keep most fingerprints " +
      s"(kept fraction $kept)")
    assert(m(1L) != m(2L), "but the edit must perturb the set")
  }

  test("short docs: >= k tokens emit the min over all grams; < k emit nothing") {
    val m = fps(Seq(
      1L -> "a b c d e",  // 2 grams < w windows -> one truncated window
      2L -> "a b c",      // < k tokens -> nothing
      3L -> "a b c d"))   // exactly k -> single gram
    assert(m(1L).size == 1)
    assert(!m.contains(2L))
    assert(m(3L).size == 1)
  }

  test("overlapPairs reports symmetric-canonical pairs with shared counts") {
    val shared = filler("s", 20)
    val rows = Seq(
      1L -> (filler("a", 5) ++ shared).mkString(" "),
      2L -> (shared ++ filler("b", 5)).mkString(" "),
      3L -> filler("c", 30).mkString(" "))
    val out = Winnowing.overlapPairs(rows.toDF("id", "text"), "id", "text",
        K, W, minShared = 1)
      .as[(Long, Long, Long)].collect()
    assert(out.length == 1 && out.head._1 == 1L && out.head._2 == 2L)
    assert(out.head._3 >= 1L)
  }

  test("fingerprint selection plans no exchange and no UDF") {
    val plan = Winnowing.fingerprints(
        spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet"),
        "doc_id", "text", K, W)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"per-row fingerprinting must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }

  test("maxDf cap drops hot fingerprints; effect is one-sided (never adds pairs)") {
    val boiler = filler("hot", 10) // shared by EVERY doc -> hot fingerprints
    val rows = (1L to 5L).map(i =>
      i -> (boiler ++ filler(s"u$i", 12)).mkString(" ")) :+
      (6L -> (filler("u1", 12) ++ filler("z", 3)).mkString(" ")) // real overlap with doc 1
    def pairs(cap: Option[Int]) =
      Winnowing.overlapPairs(rows.toDF("id", "text"), "id", "text", K, W,
          minShared = 1, maxDf = cap)
        .as[(Long, Long, Long)].collect().map(p => (p._1, p._2) -> p._3).toMap
    val exact = pairs(None)
    val capped = pairs(Some(3))
    // capping can only remove pairs or lower counts
    assert(capped.keySet.subsetOf(exact.keySet))
    assert(capped.forall { case (k2, v) => v <= exact(k2) })
    // the all-docs boilerplate pairs vanish; the genuine 1-6 overlap
    // (df = 2 <= cap) survives with its count intact
    assert(exact.contains((1L, 2L)) && !capped.contains((1L, 2L)))
    assert(capped.get((1L, 6L)) == exact.get((1L, 6L)) &&
      capped.contains((1L, 6L)))
  }

  test("degenerate parameters are rejected") {
    val e = intercept[IllegalArgumentException] {
      Winnowing.fingerprints(Seq(1L -> "a").toDF("id", "text"), "id",
        "text", 0, 4)
    }
    assert(e.getMessage.contains("k >= 1"))
  }
}
