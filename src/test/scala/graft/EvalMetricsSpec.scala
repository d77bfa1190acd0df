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

  test("calibration bins: a perfectly calibrated scorer sits on the diagonal") {
    // bin centers k/10 with exactly k positives per 10 rows -> each
    // bin's frac_pos equals its (single) score
    val rows = for {
      k <- 0 to 9
      i <- 0 until 10
    } yield (k / 10.0 + 0.005, i < k) // +0.005 keeps each k in its own bin
    val got = EvalMetrics.calibrationBins(rows.toDF("s", "y"), "s", "y")
      .orderBy("bin")
      .as[(Int, Double, Double, Long, Double, Double)].collect().toSeq
    assert(got.size == 10)
    got.foreach { case (bin, _, _, n, mean, frac) =>
      val want = BigDecimal(bin / 10.0 + 0.005)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(n == 10 && mean == want && frac == bin / 10.0,
        s"bin $bin drifted: n=$n mean=$mean frac=$frac")
    }
    // range edges: first lo = min score, last hi = max score
    assert(got.head._2 == 0.005 && got.last._3 == 0.905)
  }

  test("calibration bins: constant scores collapse to one bin, no division blowup") {
    val got = EvalMetrics.calibrationBins(
        Seq((0.5, true), (0.5, false)).toDF("s", "y"), "s", "y")
      .as[(Int, Double, Double, Long, Double, Double)].collect().toSeq
    assert(got == Seq((0, 0.5, 0.5, 2L, 0.5, 0.5)))
  }

  test("retrieval metrics hand case: recall, MRR, and nDCG at k=3") {
    // corpus labels: q0 has label A; corpus A = {0, 10, 11, 12} -> n_rel 3
    val labels = Seq((0L, "A"), (10L, "A"), (11L, "A"), (12L, "A"),
      (20L, "B"), (21L, "B")).toDF("vec_id", "label")
    // ranked for q0: rank1=B(miss), rank2=A(hit), rank3=A(hit)
    val ranked = Seq((0L, 20L, 1), (0L, 10L, 2), (0L, 11L, 3))
      .toDF("qid", "nid", "rank")
    val got = EvalMetrics.labelRetrievalMetrics(ranked, labels, k = 3)
      .as[(Long, Long, Long, Option[Double], Double, Option[Double])]
      .head()
    val w = EvalMetrics.dcgWeights(3)
    val ndcg = BigDecimal((w(1) + w(2)) / (w(0) + w(1) + w(2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == ((0L, 3L, 2L, Some(0.666667), 0.5, Some(ndcg))))
  }

  test("retrieval edges: perfect ranking scores nDCG 1.0; no hits score 0 with positive n_rel") {
    val labels = Seq((0L, "A"), (1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"))
      .toDF("vec_id", "label")
    val perfect = Seq((0L, 1L, 1), (0L, 2L, 2)).toDF("qid", "nid", "rank")
    val p = EvalMetrics.labelRetrievalMetrics(perfect, labels, k = 2)
      .as[(Long, Long, Long, Option[Double], Double, Option[Double])].head()
    assert(p._4.contains(1.0) && p._5 == 1.0 && p._6.contains(1.0))
    val misses = Seq((0L, 3L, 1), (0L, 4L, 2)).toDF("qid", "nid", "rank")
    val m = EvalMetrics.labelRetrievalMetrics(misses, labels, k = 2)
      .as[(Long, Long, Long, Option[Double], Double, Option[Double])].head()
    assert(m._4.contains(0.0) && m._5 == 0.0 && m._6.contains(0.0))
  }
}
