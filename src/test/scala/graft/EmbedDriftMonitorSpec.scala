package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Drift
import graft.streaming.EmbedDriftMonitor

/** Streaming embedding-drift monitor: per-batch metrics equal the batch
  * operator (p80) over the stream prefix at reported precision, the
  * final state is batch-boundary-invariant, and replays are no-ops.
  */
class EmbedDriftMonitorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
  private lazy val ref = emb.filter($"vec_id" % 2 === 0)
  private lazy val cand = emb.filter($"vec_id" % 2 =!= 0)

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_edrift_$tag").toString

  private def rows(df: DataFrame) =
    df.select("dim", "mean_ref", "mean_cand", "var_ref", "var_cand", "smd")
      .orderBy("dim")
      .as[(Long, Double, Double, Double, Double, Option[Double])]
      .collect().toSeq

  private lazy val batchAnswer =
    rows(Drift.embeddingDrift(ref, cand, "embedding", 64))

  test("cumulative metrics equal the p80 batch operator over the stream prefix") {
    val root = tmpDir("prefix")
    val refPath = s"$root/ref"
    EmbedDriftMonitor.initReference(ref, "embedding", refPath)
    val b0 = cand.filter($"vec_id" % 4 === 1)
    val b1 = cand.filter($"vec_id" % 4 === 3)
    EmbedDriftMonitor.processBatch(b0, 0L, "embedding", refPath, root)
    assert(rows(spark.read.parquet(s"$root/metrics/batch=0")) ==
      rows(Drift.embeddingDrift(ref, b0, "embedding", 64)))
    EmbedDriftMonitor.processBatch(b1, 1L, "embedding", refPath, root)
    assert(rows(spark.read.parquet(s"$root/metrics/batch=1")) == batchAnswer,
      "batch 1's rows must cover the CUMULATIVE ingested prefix")
  }

  test("streamed monitor converges to the batch answer under any trigger size") {
    def runWith(nSplits: Int, tag: String) = {
      val root = tmpDir(s"stream_$tag")
      val src = s"$root/src"
      val ids = cand.select(max("vec_id")).as[Long].head() + 1
      cand.withColumn("part",
          floor($"vec_id" * nSplits / ids).cast("int"))
        .repartition(1).write.partitionBy("part").parquet(src)
      val refPath = s"$root/ref"
      EmbedDriftMonitor.initReference(ref, "embedding", refPath)
      val stream = spark.readStream
        .schema(cand.withColumn("part", lit(0)).schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .drop("part")
      val q = EmbedDriftMonitor.monitorStream(stream, "embedding", refPath,
        root, s"$root/ckpt")
      try q.processAllAvailable() finally q.stop()
      val m = spark.read.parquet(s"$root/metrics")
      val last = m.select(max("batch_id")).as[Long].head()
      rows(m.filter($"batch_id" === last))
    }
    assert(runWith(3, "a") == batchAnswer)
    assert(runWith(5, "b") == batchAnswer,
      "different batch boundaries must converge to the same drift state")
  }

  test("a replayed committed batch is a no-op; crash-window replay replaces its own dirs") {
    val root = tmpDir("replay")
    val refPath = s"$root/ref"
    EmbedDriftMonitor.initReference(ref, "embedding", refPath)
    val b = cand.limit(40)
    EmbedDriftMonitor.processBatch(b, 0L, "embedding", refPath, root)
    val before = rows(spark.read.parquet(s"$root/metrics/batch=0"))
    EmbedDriftMonitor.processBatch(b, 0L, "embedding", refPath, root)
    assert(rows(spark.read.parquet(s"$root/metrics/batch=0")) == before)
    // crash window: marker missing -> replay overwrites instead of doubling
    graft.sources.FsMeta.deleteRecursive(s"$root/_commit_0")
    EmbedDriftMonitor.processBatch(b, 0L, "embedding", refPath, root)
    assert(rows(spark.read.parquet(s"$root/metrics/batch=0")) == before)
    val n = spark.read.parquet(s"$root/stats").groupBy("dim")
      .agg(sum("n").as("n")).select(max("n")).as[Long].head()
    assert(n == 40L, "crash-window replay must not double-count stats")
  }
}
