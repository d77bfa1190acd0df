package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Mmr

/** MMR selection (p78): λ=1 degenerates to relevance top-k, λ<1
  * penalizes redundancy (a near-duplicate of pick 1 loses to a less
  * relevant but different item), determinism, guards.
  */
class MmrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // query along axis 0; ids 1-3 nearly identical high-relevance docs;
  // id 4 moderately relevant but pointing elsewhere
  private val q = Array(1.0, 0.0, 0.0, 0.0)
  private def fixture = Seq(
    (1L, Array(1.0f, 0.01f, 0f, 0f)),
    (2L, Array(1.0f, 0.011f, 0f, 0f)),
    (3L, Array(1.0f, 0.012f, 0f, 0f)),
    (4L, Array(0.6f, 0f, 0.8f, 0f)))
    .toDF("vec_id", "embedding")

  private def pick(lambda: Double, k: Int): Seq[Long] =
    Mmr.select(fixture, "vec_id", "embedding", q, k, lambda)
      .orderBy("sel_round").select("id").as[Long].collect().toSeq

  test("lambda = 1 is pure relevance: the redundant trio wins in cosine order") {
    assert(pick(1.0, 3) == Seq(1L, 2L, 3L))
  }

  test("lambda < 1 penalizes redundancy: the different doc displaces a near-duplicate") {
    // after picking doc 1, docs 2/3 have ms ~ 1.0 while doc 4's ms ~ 0.6
    // — the diversity term pushes doc 4 into round 2
    assert(pick(0.5, 2) == Seq(1L, 4L))
  }

  test("deterministic on real embeddings; selections distinct") {
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val qv = e.orderBy("vec_id").limit(1)
      .select($"embedding".cast("array<double>")).as[Seq[Double]]
      .head().toArray
    def run() = Mmr.select(e, "vec_id", "embedding", qv, 5, 0.7)
      .orderBy("sel_round").as[(Int, Long, Double)].collect().toSeq
    val a = run()
    assert(a == run())
    assert(a.map(_._2).distinct.length == 5)
    // round 1 is the pure relevance argmax (the query doc itself,
    // cosine 1.0 -> score 0.7*1 + 0.3*1 = 1.0)
    assert(a.head._3 == 1.0)
  }

  test("degenerate parameters rejected") {
    intercept[IllegalArgumentException] {
      Mmr.select(fixture, "vec_id", "embedding", q, k = 10, lambda = 0.5)
    }
    intercept[IllegalArgumentException] {
      Mmr.select(fixture, "vec_id", "embedding", q, k = 2, lambda = 1.5)
    }
  }
}
