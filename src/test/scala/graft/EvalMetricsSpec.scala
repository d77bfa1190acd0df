package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EvalMetrics

/** Exact AUC (p86): textbook anchors, hand-computed ties via midrank,
  * input-layout invariance (the two-phase scan must not depend on
  * partitioning), and the empty-class guard.
  */
class EvalMetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def auc(rows: Seq[(Double, Boolean)]): Option[Double] =
    EvalMetrics.aucRoc(rows.toDF("s", "y"), "s", "y")
      .as[(Long, Long, Long, Option[Double])].head()._4

  test("textbook anchors: perfect 1.0, inverted 0.0, all-tied 0.5") {
    assert(auc(Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false)))
      .contains(1.0))
    assert(auc(Seq((0.1, true), (0.2, true), (0.8, false), (0.9, false)))
      .contains(0.0))
    assert(auc(Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false)))
      .contains(0.5))
  }

  test("midrank ties hand case") {
    // pos scores {3, 2}, neg {2, 1}: pairs (3,2)+1 (3,1)+1 (2,2)+0.5
    // (2,1)+1 => U = 3.5, AUC = 3.5/4 = 0.875
    assert(auc(Seq((3.0, true), (2.0, true), (2.0, false), (1.0, false)))
      .contains(0.875))
  }

  test("result is invariant to input partitioning and row order") {
    val rows = (0 until 997).map(i =>
      (((i * 37) % 101).toDouble / 7.0, i % 3 == 0))
    val a = auc(rows)
    val b = auc(scala.util.Random.shuffle(rows))
    val c = EvalMetrics.aucRoc(
        rows.toDF("s", "y").repartition(13), "s", "y")
      .as[(Long, Long, Long, Option[Double])].head()._4
    assert(a == b && a == c && a.isDefined)
  }

  test("single-class input yields null AUC, not a division blowup") {
    assert(auc(Seq((0.5, true), (0.7, true))).isEmpty)
  }
}
