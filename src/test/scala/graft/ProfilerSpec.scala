package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profiler

/** One-scan profiler (p71): null/distinct/mode facts, all-null columns,
  * the single-pass plan claim, and guards.
  */
class ProfilerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows = Seq(
    (Some("a"), Some(1)), (Some("a"), None), (Some("b"), Some(2)),
    (None, Some(2)), (None, None))
  private def df = rows.toDF("s", "i")

  private def prof(cols: String*) =
    Profiler.profile(df, cols)
      .as[(String, Long, Long, Long, Option[String], Option[Long])]
      .collect().map(r => r._1 -> r).toMap

  test("null counts, exact distincts, and the modal value with string tie-break") {
    val p = prof("s", "i")
    assert(p("s") == (("s", 5L, 2L, 2L, Some("a"), Some(2L))))
    // i: values 1, 2, 2 -> mode "2"x2; distinct 2; nulls 2
    assert(p("i") == (("i", 5L, 2L, 2L, Some("2"), Some(2L))))
  }

  test("an all-null column profiles as zero-distinct with no modal value") {
    val d = Seq((Option.empty[String], 1)).toDF("s", "i")
    val p = Profiler.profile(d, Seq("s"))
      .as[(String, Long, Long, Long, Option[String], Option[Long])]
      .collect().head
    assert(p == (("s", 1L, 1L, 0L, None, None)))
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
