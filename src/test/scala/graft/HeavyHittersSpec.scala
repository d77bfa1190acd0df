package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.HeavyHitters

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact regime: capacity above distinct count reproduces exact top-k") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(20000)(rnd.nextInt(500).toLong).toDF("k")
      .repartition(8)
    val got = HeavyHitters.topK(rows, "k", k = 10, capacity = 1024)
      .as[(Long, Long)].collect().toSeq
    val exact = rows.groupBy("k").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("k")).limit(10)
      .as[(Long, Long)].collect().toSeq
    assert(got == exact)
  }

  test("approximate regime: heavy keys survive a tiny capacity under skew") {
    // 3 heavy keys at ~25% / 15% / 10% of the stream, buried in a long
    // uniform tail of 2000 light keys; capacity 64 << 2003 distinct.
    // Every heavy key's per-partition frequency far exceeds N_p/64, so
    // Misra-Gries must retain them and the recount ranks them exactly.
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(40000) {
      val d = rnd.nextDouble()
      if (d < 0.25) 900001L
      else if (d < 0.40) 900002L
      else if (d < 0.50) 900003L
      else 1000L + rnd.nextInt(2000)
    }.toDF("k").repartition(8)
    val got = HeavyHitters.topK(rows, "k", k = 3, capacity = 64)
      .as[(Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(900001L, 900002L, 900003L))
    val exactCounts = rows.filter($"k" >= 900001L).groupBy("k")
      .agg(count(lit(1)).as("cnt")).as[(Long, Long)].collect().toMap
    got.foreach { case (k, cnt) => assert(cnt == exactCounts(k), s"key $k") }
  }

  test("nulls are ignored and ties break by key ascending") {
    val rows = Seq[Option[Long]](
      Some(1L), Some(1L), Some(2L), Some(2L), Some(3L), None, None, None)
      .toDF("k")
    val got = HeavyHitters.topK(rows, "k", k = 3, capacity = 16)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 2L), (3L, 1L)))
  }

  test("string keys work (operator is key-type generic)") {
    val rows = Seq("a", "a", "b", "a", "c", "b").toDF("k")
    val got = HeavyHitters.topK(rows, "k", k = 2, capacity = 8)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 3L), ("b", 2L)))
  }

  test("capacity < k rejected") {
    intercept[IllegalArgumentException] {
      HeavyHitters.topK(Seq(1L).toDF("k"), "k", k = 10, capacity = 4)
    }
  }

  test("TopKFreq UDAF: exact regime equals the exact per-group count window") {
    import graft.functions.TopKFreq
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(10000)(
        (rnd.nextInt(4).toString, rnd.nextInt(40).toString))
      .toDF("g", "k").repartition(8)
    val tf = udaf(new TopKFreq(5, 256), org.apache.spark.sql.Encoders.STRING)
    val got = rows.groupBy("g").agg(tf(col("k")).as("tk"))
      .select(col("g"), posexplode(col("tk.items")).as(Seq("pos", "kc")))
      .select(col("g"), col("pos"), col("kc.key"), col("kc.cnt"))
      .as[(String, Int, String, Long)].collect().toSet
    val exact = rows.groupBy("g", "k").agg(count(lit(1)).as("cnt"))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(col("cnt").desc, col("k"))) - 1)
      .filter(col("pos") < 5).select("g", "pos", "k", "cnt")
      .as[(String, Int, String, Long)].collect().toSet
    assert(got == exact)
  }

  test("TopKFreq UDAF: buffers stay capacity-bounded through skewed merges") {
    import graft.functions.{MGBuf, TopKFreq}
    val agg = new TopKFreq(3, 8)
    // 100 distinct keys through capacity-8 buffers: every intermediate
    // state must respect the bound (the shuffle-size contract)
    val b1 = (0 until 100).map(_.toString)
      .foldLeft(agg.zero)((b, k) => agg.reduce(b, k))
    assert(b1.m.size <= 8, s"reduce bound violated: ${b1.m.size}")
    val heavy = (0 until 500).map(_ => "HOT")
      .foldLeft(agg.zero)((b, k) => agg.reduce(b, k))
    val merged = agg.merge(b1, heavy)
    assert(merged.m.size <= 8, s"merge bound violated: ${merged.m.size}")
    // the genuinely heavy key survives decrements and wins
    assert(agg.finish(merged).items.head.key == "HOT")
    // null inputs are ignored, empty buffer finishes empty
    assert(agg.finish(agg.reduce(agg.zero, null)) ==
      graft.functions.TopKOut(Seq.empty))
  }
}
