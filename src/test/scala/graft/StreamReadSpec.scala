package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{CowOps, ManifestTable}

/** Micro-batch streaming READ of the manifest table (Delta readStream
  * shape): manifest versions are the offsets, appends tail exactly once
  * across restarts, change commits fail-or-skip by option.
  */
class StreamReadSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"
  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_sread_$tag").toString

  private def append(dir: String, rows: (Long, String)*): Unit =
    rows.toSeq.toDF("k", "s")
      .write.format(Fmt).option("path", dir).mode(SaveMode.Append).save()

  /** Drain the source into an in-JVM buffer via foreachBatch (driver-side,
    * checkpoint-aware — committed batches are not redelivered on restart).
    */
  private def start(dir: String, cp: String,
      got: ConcurrentLinkedQueue[(Long, String)],
      extra: Map[String, String] = Map.empty) = {
    var src = spark.readStream.format(Fmt).option("path", dir)
    extra.foreach { case (k, v) => src = src.option(k, v) }
    src.load()
      .writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (df: Dataset[Row], _: Long) =>
        df.collect().foreach(r => got.add((r.getLong(0), r.getString(1))))
        ()
      }
      .start()
  }

  test("append-only tail: full table first, per-trigger appends after, exactly once across restart") {
    val dir = tmp("tail"); val cp = tmp("cp")
    append(dir, 1L -> "a", 2L -> "b")
    val got = new ConcurrentLinkedQueue[(Long, String)]
    val q = start(dir, cp, got)
    try {
      q.processAllAvailable()
      assert(got.toArray.toSet == Set((1L, "a"), (2L, "b")))
      append(dir, 3L -> "c")
      q.processAllAvailable()
      assert(got.toArray.toSet ==
        Set((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
    // restart from the same checkpoint: only NEW data arrives
    append(dir, 4L -> "d")
    val got2 = new ConcurrentLinkedQueue[(Long, String)]
    val q2 = start(dir, cp, got2)
    try {
      q2.processAllAvailable()
      assert(got2.toArray.toSet == Set((4L, "d")),
        s"restart must resume at the committed version, got ${got2.toArray.toSeq}")
    } finally q2.stop()
  }

  test("startingVersion=latest skips history; a number includes that version onward") {
    val dir = tmp("sv")
    append(dir, 1L -> "old1")
    append(dir, 2L -> "old2") // version 2
    val gotLatest = new ConcurrentLinkedQueue[(Long, String)]
    val q = start(dir, tmp("cp1"), gotLatest,
      Map("startingVersion" -> "latest"))
    try {
      q.processAllAvailable()
      assert(gotLatest.isEmpty, "latest must skip all history")
      append(dir, 3L -> "new")
      q.processAllAvailable()
      assert(gotLatest.toArray.toSet == Set((3L, "new")))
    } finally q.stop()
    val gotV2 = new ConcurrentLinkedQueue[(Long, String)]
    val q2 = start(dir, tmp("cp2"), gotV2, Map("startingVersion" -> "2"))
    try {
      q2.processAllAvailable()
      assert(gotV2.toArray.toSet == Set((2L, "old2"), (3L, "new")),
        s"startingVersion=2 must include version 2 onward, got ${gotV2.toArray.toSeq}")
    } finally q2.stop()
  }

  test("a change commit fails the stream; skipChangeCommits skips it but keeps later appends") {
    val dir = tmp("chg"); val cp = tmp("cpc")
    append(dir, 10L -> "x", 11L -> "y")
    val got = new ConcurrentLinkedQueue[(Long, String)]
    val q = start(dir, cp, got)
    try {
      q.processAllAvailable()
      CowOps.merge(spark, dir, Seq((10L, "X2")).toDF("k", "s"), "k")
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("append-only")),
        s"expected the append-only error, got: ${messages(e)}")
    } finally q.stop()
    // same checkpoint, skipChangeCommits: the change hop is skipped,
    // later pure appends flow
    append(dir, 12L -> "z")
    val got2 = new ConcurrentLinkedQueue[(Long, String)]
    val q2 = start(dir, cp, got2, Map("skipChangeCommits" -> "true"))
    try {
      q2.processAllAvailable()
      assert(got2.toArray.toSet == Set((12L, "z")),
        s"skipped change commit must not resurface, got ${got2.toArray.toSeq}")
    } finally q2.stop()
  }

  test("maxFilesPerTrigger paces the backlog across triggers at version granularity") {
    val dir = tmp("adm")
    append(dir, 1L -> "a")
    append(dir, 2L -> "b")
    append(dir, 3L -> "c") // 3 versions, 1 file each
    val batches = new ConcurrentLinkedQueue[Int]
    val q = spark.readStream.format(Fmt).option("path", dir)
      .option("maxFilesPerTrigger", "1").load()
      .writeStream
      .option("checkpointLocation", tmp("cpa"))
      .foreachBatch { (df: Dataset[Row], _: Long) =>
        val n = df.count().toInt
        if (n > 0) batches.add(n)
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(batches.toArray.toSeq == Seq(1, 1, 1),
        s"a 3-version backlog at 1 file/trigger must land as 3 batches, " +
          s"got ${batches.toArray.toSeq}")
    } finally q.stop()
  }

  test("gtab-to-gtab pipe: streaming read into the streaming write is exactly-once table to table") {
    val src = tmp("pipesrc"); val dst = tmp("pipedst")
    append(src, 1L -> "a", 2L -> "b")
    val q = spark.readStream.format(Fmt).option("path", src).load()
      .writeStream.format(Fmt).option("path", dst)
      .option("checkpointLocation", tmp("cpp"))
      .start()
    try {
      q.processAllAvailable()
      append(src, 3L -> "c")
      q.processAllAvailable()
      val out = spark.read.format(Fmt).option("path", dst).load()
        .as[(Long, String)].collect().toSet
      assert(out == Set((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
  }
}
