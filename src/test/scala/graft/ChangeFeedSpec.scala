package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{CowOps, ManifestTable}

/** Change data feed from the manifest diff (q94): changed entries only
  * (by (name, crc, stats) — so stats-only MOR hops are caught), row
  * symmetric difference as insert/delete, unchanged files never opened,
  * schema-evolution hops projected to the TO schema.
  */
class ChangeFeedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"
  private def tmp(): String =
    Files.createTempDirectory("graft_cdf").toString

  private def build(dir: String): Unit =
    spark.range(0, 100).select(col("id").as("k"),
        concat(lit("v"), col("id")).as("s"))
      .repartitionByRange(5, col("k")).sortWithinPartitions("k")
      .write.format(Fmt).option("path", dir).mode(SaveMode.Append).save()

  private def feedRows(df: org.apache.spark.sql.DataFrame) =
    df.select("_change_type", "k", "s").as[(String, Long, String)]
      .collect().toSet

  test("COW merge hop: delete+insert pairs for updates, insert for new keys, unchanged rows cancel, unchanged files never opened") {
    val dir = tmp()
    build(dir)
    val v0 = ManifestTable.readManifest(dir).get.version
    // keys 5, 17 live in file [0,19]; 1000 inserts beyond every range
    CowOps.merge(spark, dir,
      Seq((5L, "U5"), (17L, "U17"), (1000L, "new")).toDF("k", "s"), "k")
    val v1 = ManifestTable.readManifest(dir).get.version
    val feed = ManifestTable.changeFeed(spark, dir, v0, v1)
    assert(feedRows(feed) == Set(
      ("delete", 5L, "v5"), ("delete", 17L, "v17"),
      ("insert", 5L, "U5"), ("insert", 17L, "U17"),
      ("insert", 1000L, "new")))
    // O(changed files): the `files` read option restricts the manifest
    // BEFORE the scan plans (pruning by construction, not by filter) —
    // every scan in the feed touches at most the changed entries, never
    // the 5-file table
    val plan = feed.queryExecution.executedPlan.toString
    val scanned = "files=(\\d+)/(\\d+)".r.findAllMatchIn(plan)
      .map(m => (m.group(1).toInt, m.group(2).toInt)).toSeq
    assert(scanned.nonEmpty && scanned.forall { case (n, of) =>
      n <= 2 && of <= 2 },
      s"expected only changed-entry scans (<=2 files), got $scanned in:\n$plan")
  }

  test("merge-on-read hop: a stats-only dv change is detected; feed is deletes only") {
    val dir = tmp()
    build(dir)
    val v0 = ManifestTable.readManifest(dir).get.version
    CowOps.deleteMor(spark, dir, Seq(5L, 17L).toDF("k"), "k")
    val v1 = ManifestTable.readManifest(dir).get.version
    val feed = ManifestTable.changeFeed(spark, dir, v0, v1)
    assert(feedRows(feed) == Set(
      ("delete", 5L, "v5"), ("delete", 17L, "v17")),
      "the dv'd file is on both sides; the except must yield exactly " +
        "the deleted rows")
  }

  test("schema-evolution hop: both sides in the TO schema, appended rows as inserts") {
    val dir = tmp()
    Seq((1L, "a")).toDF("id", "s")
      .write.format(Fmt).option("path", dir).mode(SaveMode.Append).save()
    val v0 = ManifestTable.readManifest(dir).get.version
    Seq((2L, "b", 9.5)).toDF("id", "s", "x")
      .write.format(Fmt).option("path", dir).mode(SaveMode.Append).save()
    val v1 = ManifestTable.readManifest(dir).get.version
    val feed = ManifestTable.changeFeed(spark, dir, v0, v1)
    assert(feed.schema.fieldNames.toSeq == Seq("id", "s", "x", "_change_type"))
    val rows = feed.select("_change_type", "id", "x")
      .as[(String, Long, Option[Double])].collect().toSeq
    assert(rows == Seq(("insert", 2L, Some(9.5))))
  }

  test("feed-maintained aggregate equals recompute, including group birth and death") {
    val dir = tmp()
    // (k, g, v): groups 0/1/2 of ~33 rows each, plus singleton group 7
    spark.range(0, 99).select(col("id").as("k"), (col("id") % 3).as("g"),
        col("id").as("v"))
      .unionByName(Seq((99L, 7L, 99L)).toDF("k", "g", "v"))
      .repartitionByRange(5, col("k")).sortWithinPartitions("k")
      .write.format(Fmt).option("path", dir).mode(SaveMode.Append).save()
    val v0 = ManifestTable.readManifest(dir).get.version
    val agg0 = spark.read.format(Fmt).option("path", dir)
      .option("versionAsOf", v0).load()
      .groupBy("g").agg(count(lit(1)).as("cnt"), sum("v").as("sv"))
    // two commits in the hop: group 7 DIES (its only row deleted), a
    // row MOVES group (k=0: g 0 -> 5, births group 5), one inserts
    CowOps.delete(spark, dir, Seq(99L).toDF("k"), "k")
    CowOps.merge(spark, dir,
      Seq((0L, 5L, 0L), (1000L, 9L, 10L)).toDF("k", "g", "v"), "k")
    val v2 = ManifestTable.readManifest(dir).get.version
    val feed = ManifestTable.changeFeed(spark, dir, v0, v2)
    val maintained = graft.operators.IncrementalAgg.applyFeedDelta(
        agg0, feed, "g", "v", "cnt", "sv")
      .orderBy("g")
      .as[(Long, Long, Long)].collect().toSeq
    val recomputed = spark.read.format(Fmt).option("path", dir).load()
      .groupBy("g").agg(count(lit(1)).as("cnt"), sum("v").as("sv"))
      .orderBy("g")
      .as[(Long, Long, Long)].collect().toSeq
    assert(maintained == recomputed,
      s"maintained $maintained != recomputed $recomputed")
    val groups = maintained.map(_._1).toSet
    assert(!groups.contains(7L), "emptied group must be dropped")
    assert(groups.contains(5L) && groups.contains(9L),
      "born groups must appear")
  }

  test("guards: inverted version order is rejected, expired snapshots throw the time-travel error") {
    val dir = tmp()
    build(dir)
    val v = ManifestTable.readManifest(dir).get.version
    intercept[IllegalArgumentException] {
      ManifestTable.changeFeed(spark, dir, v, v)
    }
    intercept[IllegalArgumentException] {
      ManifestTable.changeFeed(spark, dir, v - 1, v) // v-1 never existed
    }
  }
}

/** Multiplicity and null semantics of the one-pass symmetric
  * difference (round 16 replaced two exceptAlls with one tagged
  * union + |new − old| replicate): duplicate rows are counted, not
  * set-collapsed, and null fields group as equal — exceptAll's exact
  * contract, now pinned independently of exceptAll.
  */
class ChangeFeedMultiplicitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"

  test("duplicate rows feed with multiplicity; null rows cancel by " +
      "null-safe grouping") {
    val dir = Files.createTempDirectory("graft_cdf_mult").toString + "/t"
    def write(rows: Seq[(String, java.lang.Long)], mode: SaveMode): Unit =
      rows.toDF("s", "v").repartition(1).write.format(Fmt)
        .option("path", dir).mode(mode).save()
    // v1: a x3, (b, null) x2, c x1
    write(Seq(("a", 1L), ("a", 1L), ("a", 1L),
      ("b", null), ("b", null), ("c", 7L)), SaveMode.Append)
    // v2: a x1, (b, null) x2 (cancels), c x4, d x1
    write(Seq(("a", 1L), ("b", null), ("b", null),
      ("c", 7L), ("c", 7L), ("c", 7L), ("c", 7L), ("d", 9L)),
      SaveMode.Overwrite)
    val feed = ManifestTable.changeFeed(spark, dir, 1L, 2L)
      .groupBy("_change_type", "s", "v").count()
      .as[(String, String, Option[Long], Long)].collect().toSet
    assert(feed == Set(
      ("delete", "a", Some(1L), 2L),   // 3 -> 1: two deletes
      ("insert", "c", Some(7L), 3L),   // 1 -> 4: three inserts
      ("insert", "d", Some(9L), 1L)))  // (b, null) x2 both sides: cancels
  }

  test("dotted top-level column names resolve as names, not nested paths") {
    // the one-pass feed groups by data-column NAME; an unquoted
    // col("a.b") parses as a struct path and fails analysis — the
    // quoted resolution must treat the dot as part of the name
    val dir = Files.createTempDirectory("graft_cdf_dot").toString + "/t"
    def write(ids: Range, mode: SaveMode): Unit =
      spark.range(ids.head, ids.last + 1).select(col("id").as("k"),
          concat(lit("v"), col("id")).as("a.b"))
        .repartition(1).write.format(Fmt).option("path", dir)
        .mode(mode).save()
    write(0 to 9, SaveMode.Append)
    write(10 to 12, SaveMode.Append)
    val feed = ManifestTable.changeFeed(spark, dir, 1L, 2L)
    assert(feed.select(col("_change_type"), col("k"), col("`a.b`"))
      .as[(String, Long, String)].collect().toSet ==
      (10 to 12).map(i => ("insert", i.toLong, s"v$i")).toSet)
  }

  test("a user column literally named _change_type is refused, not overwritten") {
    val dir = Files.createTempDirectory("graft_cdf_reserved").toString + "/t"
    def write(n: Int, mode: SaveMode): Unit =
      spark.range(0, n).select(col("id").as("k"),
          lit("user-data").as("_change_type"))
        .repartition(1).write.format(Fmt).option("path", dir)
        .mode(mode).save()
    write(5, SaveMode.Append)
    write(7, SaveMode.Overwrite)
    val e = intercept[IllegalArgumentException] {
      ManifestTable.changeFeed(spark, dir, 1L, 2L)
    }
    assert(e.getMessage.contains("_change_type"))
  }
}
