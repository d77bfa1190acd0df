package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profiler

/** One-scan profiler (p71): null/distinct/mode facts, exact quartiles
  * for numeric columns (null for the rest), all-null columns, the
  * single-pass plan claim, and guards.
  */
class ProfilerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private type ProfRow = (String, Long, Long, Long, Option[String],
    Option[Long], Option[Double], Option[Double], Option[Double])

  private val rows = Seq(
    (Some("a"), Some(1)), (Some("a"), None), (Some("b"), Some(2)),
    (None, Some(2)), (None, None))
  private def df = rows.toDF("s", "i")

  private def prof(cols: String*) =
    Profiler.profile(df, cols)
      .as[ProfRow].collect().map(r => r._1 -> r).toMap

  test("null counts, exact distincts, and the modal value with string tie-break") {
    val p = prof("s", "i")
    // s non-numeric -> null quartiles
    assert(p("s") == (("s", 5L, 2L, 2L, Some("a"), Some(2L), None, None, None)))
    // i: values 1, 2, 2 -> mode "2"x2; distinct 2; nulls 2; quartiles
    // interpolate over the sorted non-null values [1, 2, 2] at rank
    // p*(n-1): q25 = 1.5, q50 = 2.0, q75 = 2.0
    assert(p("i") == (("i", 5L, 2L, 2L, Some("2"), Some(2L),
      Some(1.5), Some(2.0), Some(2.0))))
  }

  test("quartiles equal a hand-sorted interpolated recompute on real data") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val got = Profiler.profile(docs, Seq("n_chars"))
      .as[ProfRow].collect().head
    val xs = docs.select($"n_chars".cast("double")).na.drop()
      .as[Double].collect().sorted
    def qc(p: Double): Double = {
      val r = p * (xs.length - 1)
      val lo = r.toInt
      val frac = r - lo
      val v = if (lo + 1 < xs.length) xs(lo) * (1 - frac) + xs(lo + 1) * frac
        else xs(lo)
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert((got._7, got._8, got._9) ==
      ((Some(qc(0.25)), Some(qc(0.5)), Some(qc(0.75)))))
  }

  test("an all-null column profiles as zero-distinct with no modal value") {
    val d = Seq((Option.empty[String], 1)).toDF("s", "i")
    val p = Profiler.profile(d, Seq("s")).as[ProfRow].collect().head
    assert(p == (("s", 1L, 1L, 0L, None, None, None, None, None)))
  }

  test("ALL columns profile in one scan of the input") {
    val plan = Profiler.profile(df, Seq("s", "i"))
      .queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(plan).length
    assert(scans == 1, s"expected exactly one input scan, got $scans:\n$plan")
  }

  test("unknown columns and empty column lists are rejected") {
    intercept[IllegalArgumentException](Profiler.profile(df, Seq("nope")))
    intercept[IllegalArgumentException](Profiler.profile(df, Nil))
  }
}
