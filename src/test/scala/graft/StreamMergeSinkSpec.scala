package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{EventStreams, MergeSink}

/** Streaming sink patterns: stream-static enrichment (batch-equal) and
  * the foreachBatch exactly-once MERGE sink (order- and replay-proof
  * latest-per-key fold + manifest commit).
  */
class StreamMergeSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("stream-static enrichment equals the batch join") {
    val customers = graft.api.Tables.t(spark, TestSpark.sf0001, "customer")
    val streamed = EventStreams.runToMemory(spark, TestSpark.sf0001,
      "enrich_mem", mode = "append")(EventStreams.enrichWithSegment(_, customers))
      .as[(Long, Long, String, String)].collect().toSet
    val batchEvents = graft.api.Tables.t(spark, TestSpark.sf0001, "events")
    val batch = EventStreams.enrichWithSegment(batchEvents, customers)
      .as[(Long, Long, String, String)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("foreachBatch merge sink: multi-batch stream folds to the batch latest-per-user") {
    val src = graft.api.Tables.t(spark, TestSpark.sf0001, "events")
      .select("user_id", "event_id", "ts", "event_type", "value")
    val staged = tmpDir("graft-merge-src")
    src.repartitionByRange(4, col("ts")).write.mode("overwrite").parquet(staged)
    val table = tmpDir("graft-merge-table")
    val q = MergeSink.latestPerUserSink(
      spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1").parquet(staged),
      table, tmpDir("graft-merge-ckpt"))
    try q.processAllAvailable() finally q.stop()
    // > 1 version directory proves the fold really ran incrementally
    val versions = java.nio.file.Files.list(java.nio.file.Paths.get(table))
      .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    val vCount = Iterator.continually(versions)
      .takeWhile(_.hasNext).map(_.next().getFileName.toString)
      .count(_.startsWith("v"))
    assert(vCount >= 2, s"expected multiple micro-batches, saw $vCount versions")
    val got = MergeSink.readCurrent(spark, table).get
      .as[(Long, Long, java.sql.Timestamp, String, Double)].collect().toSet
    val expected = graft.plans.TopKPerGroup.topK(src,
        Seq("user_id"), Seq(col("ts").desc, col("event_id").desc), 1)
      .as[(Long, Long, java.sql.Timestamp, String, Double)].collect().toSet
    assert(got == expected)
  }

  test("merge sink is replay-proof: re-applying a batch changes nothing") {
    val src = graft.api.Tables.t(spark, TestSpark.sf0001, "events")
      .select("user_id", "event_id", "ts", "event_type", "value")
    val older = src.filter(col("event_id") % 2 === 0)
    val newer = src.filter(col("event_id") % 2 === 1)
    val table = tmpDir("graft-merge-replay")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(table))
    MergeSink.upsertBatch(older, table, 0L)
    MergeSink.upsertBatch(newer, table, 1L)
    def snapshot() = MergeSink.readCurrent(spark, table).get
      .as[(Long, Long, java.sql.Timestamp, String, Double)].collect().toSet
    val committed = snapshot()
    // replay AFTER publish: manifest short-circuit
    MergeSink.upsertBatch(newer, table, 1L)
    assert(snapshot() == committed)
    assert(MergeSink.currentVersion(table).contains("v1"))
    // replay of the same DATA under a new batch id (at-least-once source
    // after a checkpoint rollback): the commutative fold is a no-op
    MergeSink.upsertBatch(newer, table, 2L)
    assert(snapshot() == committed)
    // and an OLD batch re-delivered late cannot regress newer state
    MergeSink.upsertBatch(older, table, 3L)
    assert(snapshot() == committed)
  }

  test("merge sink GC: superseded version dirs are deleted, current + previous retained") {
    val src = graft.api.Tables.t(spark, TestSpark.sf0001, "events")
      .select("user_id", "event_id", "ts", "event_type", "value")
    val table = tmpDir("graft-merge-gc")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(table))
    for (b <- 0L to 4L)
      MergeSink.upsertBatch(src.filter(col("event_id") % 5 === b), table, b)
    def vDirs() = Option(new java.io.File(table).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName).toSet
    // unbounded growth is the bug: one full table copy per micro-batch.
    // After 5 batches only the published version and its predecessor
    // (concurrent-reader grace window) may remain.
    assert(vDirs() == Set("v4", "v3"), vDirs().toString)
    assert(MergeSink.currentVersion(table).contains("v4"))
    // the retained pair keeps the table readable and correct
    val got = MergeSink.readCurrent(spark, table).get
      .as[(Long, Long, java.sql.Timestamp, String, Double)].collect().toSet
    val expected = graft.plans.TopKPerGroup.topK(src,
        Seq("user_id"), Seq(col("ts").desc, col("event_id").desc), 1)
      .as[(Long, Long, java.sql.Timestamp, String, Double)].collect().toSet
    assert(got == expected)
  }

  test("merge sink time travel: the retained previous version reads back pre-publish state") {
    val src = graft.api.Tables.t(spark, TestSpark.sf0001, "events")
      .select("user_id", "event_id", "ts", "event_type", "value")
    val table = tmpDir("graft-merge-travel")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(table))
    MergeSink.upsertBatch(src.filter(col("event_id") % 2 === 0), table, 0L)
    val v0Snapshot = MergeSink.readCurrent(spark, table).get
      .as[(Long, Long, java.sql.Timestamp, String, Double)].collect().toSet
    MergeSink.upsertBatch(src.filter(col("event_id") % 2 === 1), table, 1L)
    assert(MergeSink.listVersions(table) == Seq("v0", "v1"))
    // the grace-window version answers "before this publish" exactly
    val travel = MergeSink.readVersion(spark, table, "v0").get
      .as[(Long, Long, java.sql.Timestamp, String, Double)].collect().toSet
    assert(travel == v0Snapshot)
    assert(travel != MergeSink.readCurrent(spark, table).get
      .as[(Long, Long, java.sql.Timestamp, String, Double)].collect().toSet)
    // a reclaimed / never-published version is None, not an error
    assert(MergeSink.readVersion(spark, table, "v99").isEmpty)
    intercept[IllegalArgumentException](
      MergeSink.readVersion(spark, table, "../etc"))
  }

  test("merge sink manifest: torn or corrupted pointer is detected, not silently followed") {
    val src = graft.api.Tables.t(spark, TestSpark.sf0001, "events")
      .select("user_id", "event_id", "ts", "event_type", "value").limit(10)
    val table = tmpDir("graft-merge-manifest")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(table))
    MergeSink.upsertBatch(src, table, 0L)
    assert(MergeSink.currentVersion(table).contains("v0"))
    val m = java.nio.file.Paths.get(table, "MANIFEST")
    val published = java.nio.file.Files.readString(m)
    // a torn write on a non-atomic store: version name truncated mid-byte
    java.nio.file.Files.writeString(m, published.dropRight(3))
    assertThrows[IllegalStateException](MergeSink.currentVersion(table))
    // bit-rot: pointer intact but checksum disagrees
    java.nio.file.Files.writeString(m, "v0 00000000")
    assertThrows[IllegalStateException](MergeSink.currentVersion(table))
    // repair by re-pointing (the documented operator action: the version
    // dirs are still on disk) restores the table
    java.nio.file.Files.writeString(m, published)
    assert(MergeSink.currentVersion(table).contains("v0"))
    // the sink folds latest-per-user, so one row per distinct user
    val users = src.select("user_id").distinct().count()
    assert(MergeSink.readCurrent(spark, table).get.count() == users)
  }

  test("merge sink manifest: legacy bare-version manifests stay readable and upgrade on publish") {
    val src = graft.api.Tables.t(spark, TestSpark.sf0001, "events")
      .select("user_id", "event_id", "ts", "event_type", "value").limit(10)
    val table = tmpDir("graft-merge-legacy")
    MergeSink.upsertBatch(src, table, 0L)
    val m = java.nio.file.Paths.get(table, "MANIFEST")
    // a manifest written before checksumming existed: bare "v<b>"
    java.nio.file.Files.writeString(m, "v0")
    assert(MergeSink.currentVersion(table).contains("v0"),
      "pre-CRC manifests must stay readable without hand-migration")
    assert(MergeSink.readCurrent(spark, table).get.count() > 0)
    // the next publish rewrites the checksummed form in place
    MergeSink.upsertBatch(src, table, 1L)
    assert(MergeSink.currentVersion(table).contains("v1"))
    assert(java.nio.file.Files.readString(m).trim.split("\\s+").length == 2,
      "publish should upgrade the manifest to the checksummed format")
  }

  test("merge sink runs against scheme-qualified file:/ URIs") {
    val src = graft.api.Tables.t(spark, TestSpark.sf0001, "events")
      .select("user_id", "event_id", "ts", "event_type", "value").limit(40)
    val table = "file:" + tmpDir("graft-merge-uri")
    MergeSink.upsertBatch(src.filter(col("event_id") % 2 === 0), table, 0L)
    MergeSink.upsertBatch(src.filter(col("event_id") % 2 === 1), table, 1L)
    assert(MergeSink.currentVersion(table).contains("v1"))
    val users = src.select("user_id").distinct().count()
    assert(MergeSink.readCurrent(spark, table).get.count() == users)
    assert(MergeSink.listVersions(table) == Seq("v0", "v1"))
  }

  test("merge sink GC grace window: recent version dirs survive past the keep-two rule") {
    val src = graft.api.Tables.t(spark, TestSpark.sf0001, "events")
      .select("user_id", "event_id", "ts", "event_type", "value")
    val table = tmpDir("graft-merge-grace")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(table))
    // an hour-long grace: every version written in this test is younger,
    // so a slow reader's dir is never deleted under it
    for (b <- 0L to 4L)
      MergeSink.upsertBatch(src.filter(col("event_id") % 5 === b), table, b,
        gcGraceMs = 3600L * 1000L)
    def vDirs() = Option(new java.io.File(table).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName).toSet
    assert(vDirs() == Set("v0", "v1", "v2", "v3", "v4"), vDirs().toString)
    // a zero-grace publish then collapses history back to the keep-two
    // floor — the age check augments, never replaces, the version keep-set
    MergeSink.upsertBatch(src.filter(col("event_id") % 7 === 0), table, 5L)
    assert(vDirs() == Set("v4", "v5"), vDirs().toString)
    assert(MergeSink.currentVersion(table).contains("v5"))
  }
}
