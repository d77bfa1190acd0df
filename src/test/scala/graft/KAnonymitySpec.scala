package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Anonymize

/** k-anonymity (p88): suppression releases only >= k groups and the
  * release certifies itself; generalization monotonically eases release.
  */
class KAnonymitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ages cluster at 30..34 (many) with rare outliers 80, 81
  private def people = ((1 to 20).map(i => (i.toLong, 30L + i % 5, "x")) ++
    Seq((100L, 80L, "x"), (101L, 81L, "y")))
    .toDF("id", "age", "zip")

  test("suppression drops exactly the sub-k groups; the release is self-certifying") {
    val released = Anonymize.suppressSmallGroups(people, Seq("age", "zip"), 3)
    assert(released.count() == 20)
    assert(!released.select("id").as[Long].collect().exists(_ >= 100))
    val audit = Anonymize.kAnonymityReport(released, Seq("age", "zip"), 3)
    assert(audit.filter(!col("compliant")).count() == 0)
  }

  test("generalizing the quasi-identifier monotonically grows the releasable set") {
    def releasedAt(width: Long): Long =
      Anonymize.suppressSmallGroups(
        people.withColumn("age", Anonymize.generalize(col("age"), width)),
        Seq("age", "zip"), 3).count()
    val widths = Seq(1L, 5L, 50L)
    val counts = widths.map(releasedAt)
    assert(counts == counts.sorted,
      s"wider buckets must never shrink the release: $widths -> $counts")
    // at width 50 the 80/81 'x' outlier joins the x-majority bucket? No:
    // bucket(80)=50, bucket(30..34)=0..0 — outliers stay rare; but the
    // y-row can never reach k=3 alone at any width
    assert(releasedAt(100L) == 21) // 80-'x' merges into bucket 0 with the rest
  }

  test("NULL quasi values: enforcement agrees with the report's NULL group (null-safe join)") {
    // 5 rows with NULL zip (compliant at k=3), 3 with 'a' (compliant),
    // 1 with 'b' (suppressed). A plain-equality semi join would drop
    // every NULL row even though the report marks the group compliant.
    val df = ((1 to 5).map(i => (i.toLong, Option.empty[String])) ++
      Seq((10L, Some("a")), (11L, Some("a")), (12L, Some("a")),
        (20L, Some("b")))).toDF("id", "zip")
    val released = Anonymize.suppressSmallGroups(df, Seq("zip"), 3)
    assert(released.select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L),
      "the compliant NULL group must be released, sub-k 'b' suppressed")
    val audit = Anonymize.kAnonymityReport(released, Seq("zip"), 3)
    assert(audit.filter(!col("compliant")).count() == 0)
  }
}
