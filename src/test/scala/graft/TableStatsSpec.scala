package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ManifestTable

/** DSv2 statistics report (`SupportsReportStatistics`): the manifest's
  * recorded per-file byte counts (`#sz`) and live row counts reach the
  * optimizer. Without the report Spark costs every DSv2 relation at
  * `spark.sql.defaultSizeInBytes` (Long.MaxValue), so a join against
  * even a 1 KB gtab could never auto-broadcast — the report is what
  * lets the planner pick a broadcast hash join for a small dimension
  * gtab instead of shuffling both sides.
  */
class TableStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"
  private def tmp(): String =
    Files.createTempDirectory("graft_stats").toString

  private def read(dir: String): DataFrame =
    spark.read.format(Fmt).option("path", dir).load()

  private def dataBytes(dir: String): Long =
    Option(new java.io.File(dir + "/data").listFiles())
      .map(_.filter(_.getName.endsWith(".gtab")).map(_.length()).sum)
      .getOrElse(0L)

  test("sizeInBytes matches the data files exactly; rowCount is exact") {
    val dir = tmp()
    (0 until 500).map(i => (i.toLong, s"name-$i", i * 1.5))
      .toDF("id", "s", "x")
      .repartition(3)
      .write.format(Fmt).option("path", dir).mode(SaveMode.Append).save()
    val st = read(dir).queryExecution.optimizedPlan.stats
    assert(st.sizeInBytes == BigInt(dataBytes(dir)),
      s"full-projection sizeInBytes must equal the recorded file bytes " +
        s"(${dataBytes(dir)}), got ${st.sizeInBytes}")
    assert(st.rowCount.contains(BigInt(500)))
  }

  test("column pruning scales the byte estimate down") {
    val dir = tmp()
    (0 until 400)
      .map(i => (i.toLong, "x" * 50, i * 1.0, s"tag-$i"))
      .toDF("id", "pad", "x", "tag")
      .write.format(Fmt).option("path", dir).mode(SaveMode.Append).save()
    val full = read(dir).queryExecution.optimizedPlan.stats.sizeInBytes
    val slim = read(dir).select("id")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(slim < full,
      s"a 1-of-4-column projection must cost less than the full scan " +
        s"($slim vs $full)")
  }

  test("file pruning shrinks the report: a skipped file's bytes drop out") {
    val dir = tmp()
    // range-clustered: two files with disjoint id ranges
    (0 until 1000).map(i => (i.toLong, s"r$i")).toDF("id", "s")
      .repartitionByRange(2, col("id")).sortWithinPartitions("id")
      .write.format(Fmt).option("path", dir).mode(SaveMode.Append).save()
    val all = read(dir).queryExecution.optimizedPlan.stats
    val half = read(dir).filter(col("id") < 100)
      .queryExecution.optimizedPlan.stats
    assert(half.sizeInBytes < all.sizeInBytes,
      "zone-map file pruning must be visible in the statistics report")
  }

  test("small gtab auto-broadcasts against a large side without hints") {
    val dir = tmp()
    (0 until 50).map(i => (i.toLong, s"dim-$i")).toDF("k", "label")
      .write.format(Fmt).option("path", dir).mode(SaveMode.Append).save()
    // big side: ~16 MB by Spark's own range estimate — above the 10 MB
    // autoBroadcastJoinThreshold, so only the gtab side is eligible
    val big = spark.range(2000000).select(col("id") % 50 as "k")
    val j = big.join(read(dir), "k")
    val plan = j.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"statistics report must enable the auto-broadcast:\n$plan")
    assert(j.count() == 2000000L)
  }

  test("legacy entries without #sz fall back to a row-based estimate") {
    val dir = tmp()
    (0 until 100).map(i => (i.toLong, s"r$i")).toDF("id", "s")
      .write.format(Fmt).option("path", dir).mode(SaveMode.Append).save()
    val m = ManifestTable.readManifest(dir).get
    // simulate a pre-round-13 manifest: strip the #sz keys
    val stripped = m.files.map(f =>
      f.copy(stats = f.stats.filterNot(_._1 == "#sz")))
    ManifestTable.commitVersion(dir, m.schema, Nil, keepPrevious = false)
    ManifestTable.commitVersion(dir, m.schema, stripped,
      keepPrevious = false)
    val st = read(dir).queryExecution.optimizedPlan.stats
    assert(st.rowCount.contains(BigInt(100)))
    assert(st.sizeInBytes > 0 && st.sizeInBytes < BigInt(Long.MaxValue) / 2,
      s"legacy estimate must be finite and positive, got ${st.sizeInBytes}")
  }

  test("deletion vectors lower the reported live row count") {
    val dir = tmp()
    (0 until 200).map(i => (i.toLong, s"r$i")).toDF("id", "s")
      .write.format(Fmt).option("path", dir).mode(SaveMode.Append).save()
    graft.sources.CowOps.deleteMor(spark, dir,
      spark.range(0, 200, 4).select(col("id")), "id")
    val st = read(dir).queryExecution.optimizedPlan.stats
    assert(st.rowCount.contains(BigInt(150)),
      s"150 live rows after the MOR delete, got ${st.rowCount}")
  }
}
