package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Burst
import graft.streaming.BurstMonitor

/** Streaming burst monitor: the per-batch report equals the batch
  * operator over the stream prefix, the final report is
  * batch-boundary-invariant, and replays are safe — DriftMonitor's
  * contract on the time axis.
  */
class BurstMonitorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val events =
    spark.read.parquet(s"${TestSpark.sf0001}/events.parquet")

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_burst_$tag").toString

  private def report(df: DataFrame): Set[(String, String, Long, Double)] =
    df.select(col("event_type"), col("day").cast("string"), col("n"),
        col("z"))
      .as[(String, String, Long, Double)].collect().toSet

  test("streamed monitor converges to the batch report under any trigger size") {
    val expected = report(Burst.dailyBursts(events, "event_type", "ts"))
    assert(expected.nonEmpty, "the events fixture must contain bursts")

    def runWith(nSplits: Int, tag: String): Set[(String, String, Long, Double)] = {
      val root = tmpDir(s"stream_$tag")
      val src = s"$root/src"
      val ids = events.select(max("event_id")).as[Long].head() + 1
      events.withColumn("part",
          floor($"event_id" * nSplits / ids).cast("int"))
        .repartition(1).write.partitionBy("part").parquet(src)
      val stream = spark.readStream
        .schema(events.withColumn("part", lit(0)).schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .drop("part")
      val q = BurstMonitor.monitorStream(stream, "event_type", "ts", root,
        s"$root/ckpt")
      try q.processAllAvailable() finally q.stop()
      val last = spark.read.parquet(s"$root/bursts")
        .select(max("batch_id")).as[Long].head()
      report(spark.read.parquet(s"$root/bursts/batch=$last"))
    }

    assert(runWith(3, "a") == expected)
    assert(runWith(5, "b") == expected,
      "daily counts are additive: boundaries must not change the report")
  }

  test("per-batch report covers the cumulative prefix; replays are safe") {
    val root = tmpDir("prefix")
    val b0 = events.filter($"event_id" % 2 === 0)
    val b1 = events.filter($"event_id" % 2 =!= 0)
    BurstMonitor.processBatch(b0, 0L, "event_type", "ts", root)
    assert(report(spark.read.parquet(s"$root/bursts/batch=0")) ==
      report(Burst.dailyBursts(b0, "event_type", "ts")))
    BurstMonitor.processBatch(b1, 1L, "event_type", "ts", root)
    val full = report(Burst.dailyBursts(events, "event_type", "ts"))
    assert(report(spark.read.parquet(s"$root/bursts/batch=1")) == full)
    // committed replay no-ops; uncommitted replay replaces
    val before = spark.read.parquet(s"$root/counts").count()
    BurstMonitor.processBatch(b1, 1L, "event_type", "ts", root)
    assert(spark.read.parquet(s"$root/counts").count() == before)
    graft.sources.FsMeta.deleteRecursive(s"$root/_commit_1")
    BurstMonitor.processBatch(b1, 1L, "event_type", "ts", root)
    assert(spark.read.parquet(s"$root/counts").count() == before)
    assert(report(spark.read.parquet(s"$root/bursts/batch=1")) == full)
  }
}
