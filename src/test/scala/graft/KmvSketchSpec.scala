package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.KmvDistinct

/** The KMV distinct-count sketch contract (q81): exact below capacity,
  * bounded-error estimator past saturation, LAYOUT-INVARIANT merges
  * (the property Misra-Gries cannot offer), null hygiene.
  */
class KmvSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def kmv(capacity: Int) =
    udaf(new KmvDistinct(capacity), org.apache.spark.sql.Encoders.STRING)

  test("exact regime: distinct < capacity returns the exact count, merges included") {
    // 3 groups x up to 900 distinct keys, capacity 1024; repartition by
    // key scatters each group across partitions so the final result is
    // merged from many partial sketches
    val rows = (0 until 3).flatMap { g =>
      (0 until 300 * (g + 1)).flatMap(i => Seq.fill(3)((g, s"k_${g}_$i")))
    }
    val out = rows.toDF("g", "k")
      .repartition(17, col("k"))
      .groupBy("g").agg(kmv(1024)(col("k")).as("d"))
      .as[(Int, Long)].collect().toMap
    assert(out == Map(0 -> 300L, 1 -> 600L, 2 -> 900L))
  }

  test("saturated regime: estimator lands within ~3 stderr of truth") {
    val n = 50000
    val out = (0 until n).map(i => s"key_$i").toDF("k")
      .repartition(13)
      .agg(kmv(1024)(col("k")).as("d")).as[Long].head()
    // stderr ~ 1/sqrt(1022) ~ 3.1%; 10% is > 3 sigma
    assert(math.abs(out - n).toDouble / n < 0.10,
      s"estimate $out too far from $n")
  }

  test("layout invariance: identical sketch result under any partitioning, even saturated") {
    val df = (0 until 20000).map(i => s"v$i").toDF("k")
    def run(parts: Int): Long =
      df.repartition(parts).agg(kmv(256)(col("k")).as("d")).as[Long].head()
    val r1 = run(1)
    assert(run(7) == r1 && run(31) == r1,
      "the capacity smallest distinct hashes do not depend on layout")
  }

  test("nulls are ignored; an all-null group counts zero") {
    val out = Seq((1, Option("a")), (1, None), (1, Option("a")), (2, None))
      .toDF("g", "k")
      .groupBy("g").agg(kmv(64)(col("k")).as("d"))
      .as[(Int, Long)].collect().toMap
    assert(out == Map(1 -> 1L, 2 -> 0L))
  }

  test("tiny capacity is rejected") {
    val e = intercept[IllegalArgumentException](new KmvDistinct(1))
    assert(e.getMessage.contains("capacity"))
  }
}
