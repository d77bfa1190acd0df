package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Layout capstone (q91): one table, every skipping structure — the
  * range-clustered key prunes by zone map, the scattered key prunes by
  * bloom, and a combined predicate prunes by BOTH (intersection).
  */
class LayoutCapstoneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"

  private def filesRead(df: org.apache.spark.sql.DataFrame): Int =
    "files=(\\d+)/(\\d+)".r
      .findFirstMatchIn(df.queryExecution.executedPlan.toString)
      .get.group(1).toInt

  test("clustered-key ranges, scattered-key blooms, and their intersection all skip") {
    val dir = Files.createTempDirectory("graft_capstone").toString
    // okey clustered 0..3999 over 8 files; ckey near-unique and
    // SCATTERED vs the cluster order (every file's ckey range spans the
    // space, but each value lives in exactly one file — bloom territory)
    spark.range(0, 4000).select(col("id").as("okey"),
        (col("id") * 2654435761L % 1000003L).as("ckey"),
        concat(lit("p"), col("id") % 5).as("prio"))
      .repartitionByRange(8, col("okey")).sortWithinPartitions("okey")
      .write.format(Fmt).option("path", dir)
      .option("bloomColumns", "ckey").mode(SaveMode.Append).save()
    def read() = spark.read.format(Fmt).option("path", dir).load()
    val range = read().filter(col("okey") >= 500L && col("okey") < 900L)
    assert(range.count() == 400)
    assert(filesRead(range) <= 2, "zone maps must prune the range")
    val probe = 777L * 2654435761L % 1000003L // id 777's ckey
    val point = read().filter(col("ckey") === probe)
    assert(point.count() == 1)
    val pointFiles = filesRead(point)
    assert(pointFiles < 8, "blooms must prune a scattered-key lookup")
    val both = read().filter(col("okey") >= 500L && col("okey") < 900L &&
      col("ckey") === probe)
    assert(both.count() == 1) // id 777 lies inside [500, 900)
    assert(filesRead(both) <= math.min(2, pointFiles),
      "combined predicate must intersect both skipping structures")
  }
}
