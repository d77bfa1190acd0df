package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Coreset

/** Greedy k-center coreset (p65): one pick per planted cluster, the
  * non-increasing selection-distance invariant, seed/tie determinism,
  * and guards.
  */
class CoresetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vec(axis: Int, bump: Double): Array[Float] = {
    val v = Array.fill(8)(0.0f)
    v(axis) = 100.0f
    v((axis + 1) % 8) = bump.toFloat
    v
  }

  test("one pick per planted far-apart cluster, diversity before density") {
    // cluster 2 has 10 tightly-packed points, clusters 0/1 have 2 each:
    // frequency-driven sampling would flood from cluster 2; k-center
    // must still cover all three clusters within k = 3
    val rows =
      (0 until 2).map(i => (i.toLong, vec(0, i * 0.1))) ++
      (10 until 12).map(i => (i.toLong, vec(3, (i - 10) * 0.1))) ++
      (20 until 30).map(i => (i.toLong, vec(6, (i - 20) * 0.1)))
    val sel = Coreset.kCenter(rows.toDF("vec_id", "embedding"), "vec_id",
        "embedding", k = 3)
      .select("id").as[Long].collect().toSet
    def cluster(id: Long) = id / 10
    assert(sel.map(cluster) == Set(0L, 1L, 2L),
      s"k-center must pick one exemplar per cluster, got $sel")
  }

  test("selection distances are non-increasing after the seed") {
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val out = Coreset.kCenter(e, "vec_id", "embedding", k = 5)
      .orderBy("sel_round")
      .select("sel_round", "id", "dist")
      .as[(Int, Long, Double)].collect()
    assert(out.length == 5 && out.head._1 == 1 && out.head._3 == 0.0)
    val ds = out.drop(1).map(_._3)
    assert(ds.zip(ds.drop(1)).forall { case (a, b) => a >= b },
      s"FPF max-min distances must be non-increasing: ${ds.toSeq}")
    assert(ds.head > 0.0)
    assert(out.map(_._2).distinct.length == 5, "no duplicate picks")
  }

  test("seed is min id; exact duplicates break ties to min id and never crash") {
    val twin = vec(0, 0.0)
    val rows = Seq((7L, twin), (3L, twin), (9L, vec(4, 0.0)))
    val out = Coreset.kCenter(rows.toDF("vec_id", "embedding"), "vec_id",
        "embedding", k = 3)
      .orderBy("sel_round").select("id").as[Long].collect().toSeq
    // seed = 3 (min id); round 2 = 9 (the only far point); round 3 = 7
    // (md 0, tie broken to the remaining min id)
    assert(out == Seq(3L, 9L, 7L))
  }

  /** In-JVM reference: the RESCAN formulation (round r rebuilds min over
    * all r selected centers, 6dp-rounded before comparison) — the path
    * the operator used before going incremental. Selection must be
    * bit-identical: least(md, d_new) == least(d_1..d_new) exactly,
    * because round(·, 6) is monotone.
    */
  private def referenceFpf(rows: Seq[(Long, Array[Double])], k: Int): Seq[(Int, Long, Double)] = {
    def d(a: Array[Double], b: Array[Double]): Double = {
      val s = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      BigDecimal(math.sqrt(s)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val seed = rows.minBy(_._1)
    var centers = Vector((seed._1, seed._2, 0.0))
    while (centers.size < k) {
      val cand = rows.filterNot(r => centers.exists(_._1 == r._1))
        .map { case (id, v) => (id, v, centers.map(c => d(v, c._2)).min) }
      val next = cand.minBy { case (id, _, md) => (-md, id) }
      centers = centers :+ next
    }
    centers.zipWithIndex.map { case ((id, _, dist), i) => (i + 1, id, dist) }
  }

  test("incremental path is selection-identical to the rescan reference (k = 12)") {
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val rows = e.select($"vec_id".cast("long"), $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq.map { case (id, v) => (id, v.toArray) }
    val expected = referenceFpf(rows, k = 12)
    val got = Coreset.kCenter(e, "vec_id", "embedding", k = 12)
      .orderBy("sel_round").as[(Int, Long, Double)].collect().toSeq
    assert(got == expected,
      s"incremental FPF must match the rescan formulation exactly\ngot      $got\nexpected $expected")
  }

  test("per-round plan carries exactly ONE distance expression, independent of r") {
    // the incremental claim made concrete: nextState folds one
    // distTo(newCenter) into md — a rescan formulation at round r would
    // show r zip_with distance kernels in the plan
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val state = e.select($"vec_id".cast("long").as("id"),
        $"embedding".cast("array<double>").as("v"))
      .withColumn("md", org.apache.spark.sql.functions.lit(1.0))
    val round9 = Coreset.nextState(state, 42L, Array.fill(64)(0.5))
    val plan = round9.queryExecution.analyzed.toString
    val kernels = "zip_with".r.findAllIn(plan.toLowerCase).length
    assert(kernels == 1,
      s"expected exactly 1 distance kernel in the round plan, found $kernels")
  }

  test("k beyond the corpus is rejected; k = 1 returns just the seed") {
    val rows = Seq((5L, vec(0, 0.0)), (2L, vec(1, 0.0)))
    val e = intercept[IllegalArgumentException] {
      Coreset.kCenter(rows.toDF("vec_id", "embedding"), "vec_id",
        "embedding", k = 3)
    }
    assert(e.getMessage.contains("centers"))
    val one = Coreset.kCenter(rows.toDF("vec_id", "embedding"), "vec_id",
        "embedding", k = 1)
      .select("id").as[Long].collect().toSeq
    assert(one == Seq(2L))
  }
}
