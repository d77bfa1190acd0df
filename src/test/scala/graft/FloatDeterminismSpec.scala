package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.api.Registry

/** The float-reduction query family must be bit-stable under a DIFFERENT
  * physical layout — more scan partitions, a different shuffle width —
  * not just across same-JVM re-runs (DeterminismSpec re-runs on the same
  * partitioning, so it cannot see combine-order sensitivity; the p75
  * r9/r10 investigation is what motivated this suite). Each query runs
  * once on the shared session and once on a sibling session whose scan
  * splits are ~64 KB and whose shuffle width is a co-prime 7, and the
  * string renderings (which distinguish -0.0 from 0.0) must agree
  * byte-for-byte. Runs at sf0.01 — the driver's own gate scale.
  */
class FloatDeterminismSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val perturbed = {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", 7)
    s.conf.set("spark.sql.files.maxPartitionBytes", 65536L)
    s
  }

  val family = Seq("p75_embedding_covariance", "p91_calibration_bins",
    "q64_regression", "p86_exact_auc")

  family.foreach { name =>
    test(s"$name is bit-stable under a different partitioning (sf0.01)") {
      val q = Registry.all.find(_.name == name).getOrElse(fail(s"$name not registered"))
      val a = q.run(spark, TestSpark.sf001).collect().toSeq.map(_.toString)
      val b = q.run(perturbed, TestSpark.sf001).collect().toSeq.map(_.toString)
      assert(a == b, name)
    }
  }

  test("covarianceStats is bit-identical across input partitionings") {
    val df = spark.read.parquet(s"${TestSpark.sf001}/embeddings.parquet")
    val Seq((n1, m1, c1), (n2, m2, c2), (n3, m3, c3)) =
      Seq(df.repartition(1), df.repartition(3), df.repartition(13)).map { d =>
        graft.operators.Embeddings.covarianceStats(d, "embedding", 64)
      }
    assert(n1 == n2 && n2 == n3)
    def bits(a: Array[Double]) = a.map(java.lang.Double.doubleToRawLongBits).toSeq
    // the MEAN is a pure function of the (order-insensitive up to the
    // fold) sums — with 1 vs 3 vs 13 partitions the raw float partials
    // differ, so equality here is only over the 6dp-rounded contract the
    // registered query exposes
    def r6(a: Array[Double]) = a.map(x =>
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(bits(r6(m1)) == bits(r6(m2)) && bits(r6(m2)) == bits(r6(m3)))
    assert(bits(r6(c1.flatten)) == bits(r6(c2.flatten)) &&
      bits(r6(c2.flatten)) == bits(r6(c3.flatten)))
  }

  test("covarianceStats is bit-identical across re-runs on one partitioning") {
    val df = spark.read.parquet(s"${TestSpark.sf001}/embeddings.parquet")
      .repartition(13, col("vec_id"))
    val (_, m1, c1) = graft.operators.Embeddings.covarianceStats(df, "embedding", 64)
    val (_, m2, c2) = graft.operators.Embeddings.covarianceStats(df, "embedding", 64)
    def bits(a: Array[Double]) = a.map(java.lang.Double.doubleToRawLongBits).toSeq
    // same partitioning => the UNROUNDED sums must match to the last bit
    // (this is the deterministic-fold contract treeReduce could not give)
    assert(bits(m1) == bits(m2))
    assert(bits(c1.flatten) == bits(c2.flatten))
  }
}
