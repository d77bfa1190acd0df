package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

class SamplingWeightedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong, if (i % 10 == 0) 1000.0 else 1.0))
      .toDF("id", "w")

  test("weighted: exactly k rows, deterministic across runs and layouts") {
    val df = corpus(500)
    val a = Sampling.weighted(df, "id", col("w"), 50)
      .orderBy("id").as[(Long, Double, Double)].collect().toSeq
    val b = Sampling.weighted(df.repartition(13), "id", col("w"), 50)
      .orderBy("id").as[(Long, Double, Double)].collect().toSeq
    assert(a.size == 50)
    assert(a == b) // pure function of ids+weights, not of partitioning
  }

  test("weighted: selection probability scales with weight (A-ES)") {
    // 50 heavy rows at w=1000 vs 450 light rows at w=1: at k=50 the
    // heavies (10% of rows) must dominate the sample
    val sel = Sampling.weighted(corpus(500), "id", col("w"), 50)
      .as[(Long, Double, Double)].collect()
    val heavy = sel.count(_._1 % 10 == 0)
    assert(heavy >= 40, s"expected >=40/50 heavy-weight rows, got $heavy")
  }

  test("weighted: k larger than the input returns every row") {
    assert(Sampling.weighted(corpus(20), "id", col("w"), 100).count() == 20)
  }

  test("weighted: plans as TakeOrderedAndProject, no global sort exchange") {
    val plan = Sampling.weighted(corpus(500), "id", col("w"), 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
  }

  test("temperatureMixture: T=1 is proportional, smaller T flattens toward uniform") {
    // 800 rows of src_big, 100 of src_mid, 4 of src_tiny
    val df = ((0 until 800).map(i => (i.toLong, "src_big")) ++
      (800 until 900).map(i => (i.toLong, "src_mid")) ++
      (900 until 904).map(i => (i.toLong, "src_tiny")))
      .toDF("id", "source")
    def quotas(t: Double) = Sampling.temperatureMixture(df, "source", "id", t, 100)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val q1 = quotas(1.0)
    // proportional: floor(100*800/904)=88, floor(100*100/904)=11, tiny floors to 0 -> min 1
    assert(q1 == Map("src_big" -> 88L, "src_mid" -> 11L, "src_tiny" -> 1L), q1.toString)
    val qHalf = quotas(0.5)
    // sqrt scaling: z = sqrt(800)+sqrt(100)+sqrt(4) = 28.28+10+2
    // big: floor(100*28.28/40.28)=70, mid: floor(100*10/40.28)=24, tiny: floor(100*2/40.28)=4
    assert(qHalf == Map("src_big" -> 70L, "src_mid" -> 24L, "src_tiny" -> 4L), qHalf.toString)
    // flattening is monotone: the dominant source's share shrinks as T drops
    assert(qHalf("src_big") < q1("src_big"))
    assert(qHalf("src_tiny") > q1("src_tiny"))
  }

  test("temperatureMixture: deterministic across layouts; a stratum never exceeds its size") {
    val df = ((0 until 30).map(i => (i.toLong, "a")) ++
      (30 until 33).map(i => (i.toLong, "b"))).toDF("id", "source")
    val x = Sampling.temperatureMixture(df, "source", "id", 0.5, 20)
      .select("id").as[Long].collect().toSet
    val y = Sampling.temperatureMixture(df.repartition(7), "source", "id", 0.5, 20)
      .select("id").as[Long].collect().toSet
    assert(x == y, "selection must be a pure function of the data")
    // b has 3 rows; its quota can exceed 3 only nominally — selection caps at |b|
    val perSrc = Sampling.temperatureMixture(df, "source", "id", 0.5, 20)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(perSrc("b") <= 3)
  }

  test("quantileBins: quartiles are balanced on a uniform score, boundaries go low") {
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
    val bins = Sampling.quantileBins(df, "id", col("s"), 4)
      .as[(Long, Double, Int)].collect()
    val byBin = bins.groupBy(_._3).view.mapValues(_.length).toMap
    // exact quartile cuts on 1..100: 25.75 / 50.5 / 75.25 — 25-ish per bin
    assert(byBin.keySet == Set(1, 2, 3, 4), byBin.toString)
    assert(byBin.values.forall(n => n >= 24 && n <= 26), byBin.toString)
    // score == cut lands in the LOWER bin (strict > against the cut)
    val two = Sampling.quantileBins(
      Seq((1L, 1.0), (2L, 1.0), (3L, 2.0), (4L, 2.0)).toDF("id", "s"),
      "id", col("s"), 2).as[(Long, Double, Int)].collect().toSet
    // cut (median) = 1.5: the 1.0s bin 1, the 2.0s bin 2
    assert(two == Set((1L, 1.0, 1), (2L, 1.0, 1), (3L, 2.0, 2), (4L, 2.0, 2)))
    // layout-invariant: cutoffs are a global aggregate, not per-partition
    val re = Sampling.quantileBins(df.repartition(7), "id", col("s"), 4)
      .as[(Long, Double, Int)].collect().toSet
    assert(re == bins.toSet)
  }

  test("leakageSafeSplit: near-dup groups never straddle splits") {
    val docs = (0L until 100L).toDF("doc_id")
    // chain pairs: {0,1,2} one group, {10,11} another, rest singletons
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Sampling.leakageSafeSplit(docs, "doc_id", pairs)
    val bySplit = out.groupBy("group_id")
      .agg(countDistinct("split").as("n")).as[(Long, Long)].collect()
    assert(bySplit.forall(_._2 == 1L))
    val g0 = out.filter(col("doc_id").isin(0L, 1L, 2L))
      .select("split").distinct().count()
    assert(g0 == 1L)
    // 80/10/10 buckets: each split non-empty at n=100 and train largest
    val counts = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"), counts)
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
  }

  test("geomean UDAF equals exp(avg(ln)) and survives SQL registration") {
    spark.udf.register("geomean", udaf(graft.functions.GeoMean))
    val df = Seq(2.0, 8.0, 4.0, 16.0).toDF("x")
    df.createOrReplaceTempView("gm_t")
    val got = spark.sql("SELECT round(geomean(x), 9) g FROM gm_t")
      .as[Double].head()
    val want = math.exp(Seq(2.0, 8.0, 4.0, 16.0).map(math.log).sum / 4)
    assert(got == BigDecimal(want).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
