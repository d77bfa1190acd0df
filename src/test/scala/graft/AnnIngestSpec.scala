package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AnnIndex
import graft.streaming.AnnIngest
import graft.sources.{FsMeta, StagedAppend}

/** Streaming ANN ingest (the [[AnnIngest]] twin): a stream-folded index
  * is probe-for-probe identical to a batch-built one, replays of
  * committed batches are no-ops, and every crash window converges with
  * zero duplicate postings (the exactly-once staged-publish protocol).
  */
class AnnIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val P = AnnIndex.Params(nlist = 8, dims = 64)

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_anningest_$tag").toString

  private lazy val emb =
    spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
  private lazy val boot = emb.filter($"vec_id" < 200)
  private lazy val rest = emb.filter($"vec_id" >= 200)

  private def postings(idx: String) =
    spark.read.parquet(s"$idx/postings")
      .select($"cell", $"nid").as[(Int, Long)].collect().toSeq

  private def probeAll(idx: String) = {
    val q = emb.filter($"vec_id" % 50 === 0)
    AnnIndex.topKAgainstIndex(spark, q, "vec_id", "embedding", 5,
        P.nlist, P, idx)
      .select($"qid", $"nid", $"rank").as[(Long, Long, Int)].collect().toSet
  }

  test("stream-folded index equals batch-built index probe-for-probe") {
    // batch twin: bootstrap + one append of everything else
    val batchIdx = tmpDir("batch")
    AnnIndex.buildIndex(boot, "vec_id", "embedding", P, batchIdx)
    AnnIndex.appendBatch(rest, "vec_id", "embedding", P, batchIdx)

    // stream twin: same bootstrap, the rest in id-ranged micro-batches
    val root = tmpDir("stream")
    val streamIdx = s"$root/idx"
    AnnIndex.buildIndex(boot, "vec_id", "embedding", P, streamIdx)
    rest.withColumn("part", ($"vec_id" % 3).cast("int"))
      .repartition(1).write.partitionBy("part").parquet(s"$root/src")
    val stream = spark.readStream
      .schema(rest.withColumn("part", lit(0)).schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$root/src")
      .drop("part")
    val q = AnnIngest.ingestStream(stream, "vec_id", "embedding", P,
      streamIdx, s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()

    // same postings (assignment is a pure function of the stored
    // centroids — batch boundaries cannot move a vector's cell)...
    assert(postings(streamIdx).sorted == postings(batchIdx).sorted)
    assert(postings(streamIdx).size == emb.count())
    // ...and the same exhaustive-probe answers, rank for rank
    val got = probeAll(streamIdx)
    assert(got == probeAll(batchIdx))
    assert(got.nonEmpty)
  }

  test("a replayed committed batch is a no-op; crash windows leave zero duplicate postings") {
    val idx = tmpDir("crash")
    AnnIndex.buildIndex(boot, "vec_id", "embedding", P, idx)
    val b0 = rest.filter($"vec_id" % 2 === 0)
    AnnIngest.processBatch(b0, 0L, "vec_id", "embedding", P, idx)
    val after = postings(idx).sorted
    assert(after.map(_._2).distinct.size == after.size, "sanity: unique ids")

    // committed replay: marker present -> untouched
    AnnIngest.processBatch(b0, 0L, "vec_id", "embedding", P, idx)
    assert(postings(idx).sorted == after)

    // crash window: postings fully published but the marker was lost —
    // the replay must re-stage and publish NOTHING new
    FsMeta.deleteRecursive(s"$idx/_commit_0")
    AnnIngest.processBatch(b0, 0L, "vec_id", "embedding", P, idx)
    assert(postings(idx).sorted == after,
      "replay after a pre-marker crash must not duplicate postings")

    // and a later batch lands once on top
    val b1 = rest.filter($"vec_id" % 2 === 1)
    AnnIngest.processBatch(b1, 1L, "vec_id", "embedding", P, idx)
    val all = postings(idx)
    assert(all.size == all.distinct.size)
    assert(all.size == emb.count())
  }

  test("StagedAppend converges per file: full replay publishes 0, a lost file exactly 1") {
    val root = tmpDir("staged")
    val stage = s"$root/stage"
    val live = s"$root/live"
    def writeStage(): Unit =
      spark.range(100).select(($"id" % 4).cast("int").as("k"), $"id")
        .repartition(4, $"k")
        .write.mode("overwrite").parquet(stage)
    writeStage()
    val n = StagedAppend.publish(stage, live, "b7", bucketed = false)
    assert(n > 0)
    assert(spark.read.parquet(live).count() == 100)
    // replay: re-staged files rename to occupied destinations -> skipped
    writeStage()
    assert(StagedAppend.publish(stage, live, "b7", bucketed = false) == 0)
    assert(spark.read.parquet(live).count() == 100)
    // a destination lost mid-publish is re-published alone
    val victim = FsMeta.listDataFilesRecursive(live).head._2
    FsMeta.deleteRecursive(s"$live/$victim")
    writeStage()
    assert(StagedAppend.publish(stage, live, "b7", bucketed = false) == 1)
    assert(spark.read.parquet(live).count() == 100)
  }
}
