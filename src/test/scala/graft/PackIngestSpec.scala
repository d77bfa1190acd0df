package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Packing
import graft.streaming.PackIngest
import graft.sources.FsMeta

/** Streaming sequence packing (PackIngest): batch-boundary invariance
  * against the one-shot map, replay/crash idempotence, and the
  * offset-in-marker protocol.
  */
class PackIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private type Span = (Long, Long, Long, Long, Long)

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_packingest_$tag").toString

  private lazy val docs =
    spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")

  private def oneShot: Seq[Span] =
    Packing.packChunks(docs, "doc_id", "text", 64)
      .orderBy("seq_id", "id").as[Span].collect().toSeq

  private def readMap(out: String): Seq[Span] =
    spark.read.parquet(out)
      .select("seq_id", "id", "doc_from", "seq_from", "n_toks")
      .orderBy("seq_id", "id").as[Span].collect().toSeq

  test("stream-packed map equals the one-shot corpus map under any trigger size") {
    def runWith(nSplits: Int): Seq[Span] = {
      val root = tmpDir(s"s$nSplits")
      val src = s"$root/src"
      val ids = docs.select(max("doc_id")).as[Long].head() + 1
      docs.withColumn("part",
          floor($"doc_id" * nSplits / ids).cast("int"))
        .repartition(1).write.partitionBy("part").parquet(src)
      val out = s"$root/out"
      val stream = spark.readStream
        .schema(docs.withColumn("part", lit(0)).schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .drop("part")
      val q = PackIngest.ingestStream(stream, "doc_id", "text", 64, out,
        s"$root/ckpt")
      try q.processAllAvailable() finally q.stop()
      readMap(out)
    }
    val expect = oneShot
    assert(runWith(4) == expect)
    assert(runWith(2) == expect)
    assert(expect.nonEmpty)
  }

  test("offsets live in the markers; committed replays no-op; crash replays converge") {
    val root = tmpDir("crash")
    val out = s"$root/out"
    val mid = docs.select(max("doc_id")).as[Long].head() / 2
    val b0 = docs.filter($"doc_id" <= mid)
    val b1 = docs.filter($"doc_id" > mid)
    PackIngest.processBatch(b0, 0L, "doc_id", "text", 64, out)
    val t0 = b0.select(sum(size(split($"text", " ")))).as[Long].head()
    assert(PackIngest.offsetAfter(out, 0L) == t0,
      "marker payload must be the stream offset after the batch")
    val after0 = readMap(out)
    // committed replay: untouched
    PackIngest.processBatch(b0, 0L, "doc_id", "text", 64, out)
    assert(readMap(out) == after0)
    // crash window: batch dir written, marker lost -> replay rewrites
    // the same bytes and republishes the same offset
    FsMeta.deleteRecursive(s"$out/_commit_0")
    PackIngest.processBatch(b0, 0L, "doc_id", "text", 64, out)
    assert(readMap(out) == after0)
    assert(PackIngest.offsetAfter(out, 0L) == t0)
    // batch 1 continues the stream; the concatenation equals one-shot
    PackIngest.processBatch(b1, 1L, "doc_id", "text", 64, out)
    assert(readMap(out) == oneShot)
    val total = docs.select(sum(size(split($"text", " ")))).as[Long].head()
    assert(PackIngest.offsetAfter(out, 1L) == total)
  }

  test("an empty batch commits its marker so the stream can continue") {
    val root = tmpDir("empty")
    val out = s"$root/out"
    PackIngest.processBatch(docs.limit(0), 0L, "doc_id", "text", 64, out)
    assert(PackIngest.offsetAfter(out, 0L) == 0L)
    PackIngest.processBatch(docs, 1L, "doc_id", "text", 64, out)
    assert(readMap(out) == oneShot)
  }
}
