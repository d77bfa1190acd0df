package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Drift
import graft.streaming.DriftMonitor

/** Streaming drift monitor: each batch's metrics row equals the batch
  * operator over the stream prefix (shared formula path), the final row
  * is batch-boundary-invariant, and replays are committed no-ops.
  */
class DriftMonitorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
  private lazy val ref = docs.filter($"doc_id" % 2 === 0)
  private lazy val cand = docs.filter($"doc_id" % 2 =!= 0)

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_drift_$tag").toString

  private def klRow(df: DataFrame): (Long, Double, Double) =
    df.select("n_vocab", "kl_ref_cand", "kl_cand_ref")
      .as[(Long, Double, Double)].head()

  test("per-batch metrics equal the batch operator over the stream prefix") {
    val root = tmpDir("prefix")
    val refPath = s"$root/ref"
    DriftMonitor.initReference(ref, "text", refPath)
    val b0 = cand.filter($"doc_id" % 4 === 1)
    val b1 = cand.filter($"doc_id" % 4 === 3)
    DriftMonitor.processBatch(b0, 0L, "text", refPath, root)
    assert(klRow(spark.read.parquet(s"$root/metrics/batch=0")) ==
      klRow(Drift.tokenKl(ref, b0, "text")))
    DriftMonitor.processBatch(b1, 1L, "text", refPath, root)
    assert(klRow(spark.read.parquet(s"$root/metrics/batch=1")) ==
      klRow(Drift.tokenKl(ref, cand, "text")),
      "batch 1's row must cover the CUMULATIVE ingested prefix")
    // drift detection actually detects: the two slices differ
    val (_, klRc, klCr) = klRow(Drift.tokenKl(ref, cand, "text"))
    assert(klRc > 0.0 || klCr > 0.0)
  }

  test("streamed monitor converges to the batch answer under any trigger size") {
    val expected = klRow(Drift.tokenKl(ref, cand, "text"))

    def runWith(nSplits: Int, tag: String): (Long, Double, Double) = {
      val root = tmpDir(s"stream_$tag")
      val src = s"$root/src"
      val ids = cand.select(max("doc_id")).as[Long].head() + 1
      cand.withColumn("part",
          floor($"doc_id" * nSplits / ids).cast("int"))
        .repartition(1).write.partitionBy("part").parquet(src)
      val refPath = s"$root/ref"
      DriftMonitor.initReference(ref, "text", refPath)
      val stream = spark.readStream
        .schema(cand.withColumn("part", lit(0)).schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .drop("part")
      val q = DriftMonitor.monitorStream(stream, "text", refPath, root,
        s"$root/ckpt")
      try q.processAllAvailable() finally q.stop()
      val m = spark.read.parquet(s"$root/metrics")
      klRow(m.orderBy(col("batch_id").desc).limit(1))
    }

    assert(runWith(3, "a") == expected)
    assert(runWith(5, "b") == expected,
      "different batch boundaries must converge to the same drift state")
  }

  test("a replayed committed batch is a no-op") {
    val root = tmpDir("replay")
    val refPath = s"$root/ref"
    DriftMonitor.initReference(ref, "text", refPath)
    val b = cand.limit(40)
    DriftMonitor.processBatch(b, 0L, "text", refPath, root)
    val before = spark.read.parquet(s"$root/counts").count()
    val row = klRow(spark.read.parquet(s"$root/metrics/batch=0"))
    DriftMonitor.processBatch(b, 0L, "text", refPath, root)
    assert(spark.read.parquet(s"$root/counts").count() == before)
    assert(klRow(spark.read.parquet(s"$root/metrics/batch=0")) == row)
    // and an UNCOMMITTED replay overwrites rather than double-counts
    graft.sources.FsMeta.deleteRecursive(s"$root/_commit_0")
    DriftMonitor.processBatch(b, 0L, "text", refPath, root)
    assert(spark.read.parquet(s"$root/counts").count() == before,
      "replay must overwrite its batch directory, not append beside it")
    assert(klRow(spark.read.parquet(s"$root/metrics/batch=0")) == row)
  }
}
