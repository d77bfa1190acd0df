package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Embeddings

/** PCA whitening (p75 + pcaWhiten): the one-pass covariance against a
  * driver recompute, Jacobi against known eigensystems and the
  * residual norm on real data, and the whitening contract — identity
  * covariance of the output, determinism, near-null-direction guard.
  */
class EmbeddingsPcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")

  test("one-pass covariance equals the two-pass driver recompute") {
    val (n, mean, cov) = Embeddings.covarianceStats(emb, "embedding", 64)
    val xs = emb.select($"embedding".cast("array<double>"))
      .as[Seq[Double]].collect()
    assert(n == xs.length.toLong)
    val mu = (0 until 64).map(i => xs.map(_(i)).sum / n)
    mean.zip(mu).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    for (i <- 0 until 64; j <- i until 64) {
      val exact = xs.map(x => (x(i) - mu(i)) * (x(j) - mu(j))).sum / (n - 1)
      assert(math.abs(cov(i)(j) - exact) < 1e-9, s"cov($i,$j)")
      assert(cov(i)(j) == cov(j)(i), "symmetry")
    }
  }

  test("Jacobi solves a known 2x2 and 3x3 eigensystem exactly") {
    // [[2,1],[1,2]] -> eigenvalues 3, 1; vectors (1,1)/sqrt2, (1,-1)/sqrt2
    val (e2, v2) = Embeddings.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(e2(0) - 3.0) < 1e-12 && math.abs(e2(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2.0)
    assert(v2(0).zip(Array(r, r)).forall(t => math.abs(t._1 - t._2) < 1e-12))
    assert(v2(1).zip(Array(r, -r)).forall(t => math.abs(t._1 - t._2) < 1e-12))
    // diag(5, 2, 7) -> sorted 7, 5, 2 with axis vectors
    val (e3, v3) = Embeddings.jacobiEigen(Array(
      Array(5.0, 0.0, 0.0), Array(0.0, 2.0, 0.0), Array(0.0, 0.0, 7.0)))
    assert(e3.toSeq == Seq(7.0, 5.0, 2.0))
    assert(v3(0).toSeq == Seq(0.0, 0.0, 1.0))
    assert(v3(1).toSeq == Seq(1.0, 0.0, 0.0))
  }

  test("Jacobi on the real 64-dim covariance: C v = lambda v, orthonormal V, trace preserved") {
    val (_, _, cov) = Embeddings.covarianceStats(emb, "embedding", 64)
    val (evals, evecs) = Embeddings.jacobiEigen(cov)
    assert(evals.zip(evals.tail).forall { case (a, b) => a >= b }, "sorted")
    assert(math.abs(evals.sum - (0 until 64).map(i => cov(i)(i)).sum) < 1e-9,
      "trace = eigenvalue sum")
    for (j <- Seq(0, 1, 31, 63)) {
      val v = evecs(j)
      val cv = (0 until 64).map(i => (0 until 64).map(k => cov(i)(k) * v(k)).sum)
      val resid = math.sqrt(
        cv.zip(v).map { case (a, b) => (a - evals(j) * b) * (a - evals(j) * b) }.sum)
      assert(resid < 1e-9, s"||Cv - lv|| for component $j: $resid")
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-12, "unit norm")
    }
    assert(math.abs(evecs(0).zip(evecs(1)).map(t => t._1 * t._2).sum) < 1e-9,
      "orthogonal")
  }

  test("whitened output has identity covariance and zero mean; deterministic") {
    val k = 8
    val out = Embeddings.pcaWhiten(emb, "vec_id", "embedding", 64, k)
    val rows = out.orderBy("vec_id").collect()
      .map(r => (0 until k).map(j => r.getDouble(j + 1)).toArray)
    val n = rows.length
    for (j <- 0 until k) {
      val mu = rows.map(_(j)).sum / n
      assert(math.abs(mu) < 1e-4, s"component $j mean $mu")
      val va = rows.map(x => (x(j) - mu) * (x(j) - mu)).sum / (n - 1)
      assert(math.abs(va - 1.0) < 1e-3, s"component $j variance $va")
      for (j2 <- j + 1 until k) {
        val cv = rows.map(x => (x(j) - mu) * x(j2)).sum / (n - 1)
        assert(math.abs(cv) < 1e-3, s"cov($j,$j2) = $cv not ~0")
      }
    }
    val again = Embeddings.pcaWhiten(emb, "vec_id", "embedding", 64, k)
      .orderBy("vec_id").collect()
      .map(r => (0 until k).map(j => r.getDouble(j + 1)).toSeq)
    assert(rows.map(_.toSeq).toSeq == again.toSeq, "deterministic")
  }

  test("a near-null direction is refused instead of amplified") {
    // rank-deficient data: 3 points in a 3-dim space spanning 2 dims
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)), (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(2.0f, 1.0f, 0.0f)), (4L, Array(1.0f, 2.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Embeddings.pcaWhiten(df, "vec_id", "embedding", 3, 3)
    }
    assert(e.getMessage.contains("variance"))
    // k = 2 works
    assert(Embeddings.pcaWhiten(df, "vec_id", "embedding", 3, 2)
      .count() == 4)
  }
}
