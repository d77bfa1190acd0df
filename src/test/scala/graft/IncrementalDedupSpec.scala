package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, IncrementalDedup}

/** The persisted-index dedup contract (p46): batch-vs-index equals the
  * full-corpus recompute restricted to pairs touching the batch; the
  * batch phase never reads corpus text; appended batches become part of
  * the index for later batches; a family mismatch is rejected loudly.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val P = IncrementalDedup.Params(shingleSize = 3, numHashes = 128,
    bands = 32, threshold = 0.8)

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_incdedup_$tag").toString

  private lazy val docs =
    spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet

  test("batch-vs-index equals full recompute filtered to batch-touching pairs") {
    val idx = tmpDir("eq")
    val corpus = docs.filter($"doc_id" % 5 =!= 0)
    val batch = docs.filter($"doc_id" % 5 === 0)
    IncrementalDedup.buildIndex(corpus, "doc_id", "text", P, idx)
    val inc = pairSet(IncrementalDedup.nearDupsAgainstIndex(
      spark, batch, "doc_id", "text", P, idx))
    val full = pairSet(Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        P.shingleSize, P.numHashes, P.bands, P.threshold)
      .filter($"id_a" % 5 === 0 || $"id_b" % 5 === 0))
    assert(inc == full)
    assert(full.nonEmpty, "fixtures plant near-dups; an empty filter " +
      "split would make this test vacuous")
    // and the batch phase surfaces cross pairs, not just batch-internal
    assert(full.exists(p => p._1 % 5 != 0 || p._2 % 5 != 0),
      "expected at least one batch×corpus pair")
  }

  test("batch plan reads only the index and the batch — zero corpus scans") {
    val root = tmpDir("scan")
    val corpusSrc = s"$root/corpus_src"
    val batchSrc = s"$root/batch_src"
    val idx = s"$root/idx"
    docs.filter($"doc_id" % 5 =!= 0).write.parquet(corpusSrc)
    docs.filter($"doc_id" % 5 === 0).write.parquet(batchSrc)
    IncrementalDedup.buildIndex(
      spark.read.parquet(corpusSrc), "doc_id", "text", P, idx)
    val inc = IncrementalDedup.nearDupsAgainstIndex(
      spark, spark.read.parquet(batchSrc), "doc_id", "text", P, idx)
    val plan = inc.queryExecution.executedPlan.toString
    assert(!plan.contains(corpusSrc),
      s"corpus text is scanned in the batch plan:\n$plan")
    assert(plan.contains(idx), "index parquet must feed the batch plan")
    assert(plan.contains(batchSrc), "batch parquet must feed the batch plan")
    // the pruned plan still produces the exact answer
    val full = pairSet(Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        P.shingleSize, P.numHashes, P.bands, P.threshold)
      .filter($"id_a" % 5 === 0 || $"id_b" % 5 === 0))
    assert(pairSet(inc) == full)
  }

  test("appendBatch folds a batch into the index for later batches") {
    val idx = tmpDir("append")
    val corpus = docs.filter($"doc_id" % 5 =!= 0)
    val b1 = docs.filter($"doc_id" % 10 === 0)
    val b2 = docs.filter($"doc_id" % 10 === 5)
    IncrementalDedup.buildIndex(corpus, "doc_id", "text", P, idx)
    val r1 = pairSet(IncrementalDedup.nearDupsAgainstIndex(
      spark, b1, "doc_id", "text", P, idx))
    IncrementalDedup.appendBatch(b1, "doc_id", "text", P, idx)
    val r2 = pairSet(IncrementalDedup.nearDupsAgainstIndex(
      spark, b2, "doc_id", "text", P, idx))
    // r1 covers pairs touching b1 (within corpus∪b1); r2 covers pairs
    // touching b2 (within corpus∪b1∪b2) — together exactly the full
    // recompute's pairs touching b1∪b2 (doc_id % 5 == 0)
    val full = pairSet(Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        P.shingleSize, P.numHashes, P.bands, P.threshold)
      .filter($"id_a" % 5 === 0 || $"id_b" % 5 === 0))
    assert((r1 ++ r2) == full)
    // no pair is double-reported across the two batch runs: a (b1, b2)
    // pair belongs to r2 alone (b1 was not yet indexed during r1)
    assert((r1 & r2).isEmpty)
  }

  test("streaming ingest: kept set equals the batch-global greedy drop rule, any batch boundaries") {
    import graft.streaming.DedupIngest
    // expected: drop every id_b of the FULL near-dup pair set — the
    // drop-against-all-seen rule the object scaladoc proves
    // boundary-invariant (ids are monotone in ingest order here)
    val dropIds = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        P.shingleSize, P.numHashes, P.bands, P.threshold)
      .select($"id_b").as[Long].collect().toSet
    val expected = docs.select($"doc_id").as[Long].collect().toSet -- dropIds
    assert(dropIds.nonEmpty, "fixtures plant near-dups")

    def runWith(nSplits: Int, tag: String): Set[Long] = {
      val root = tmpDir(s"stream_$tag")
      val src = s"$root/src"
      // id-ranged files so ingest (file) order == id order
      val ids = docs.select(max("doc_id")).as[Long].head() + 1
      docs.withColumn("part",
          floor($"doc_id" * nSplits / ids).cast("int"))
        .repartition(1).write.partitionBy("part").parquet(src)
      val idx = s"$root/idx"
      val kept = s"$root/kept"
      DedupIngest.initEmptyIndex(spark, "doc_id", "text", P, idx)
      val stream = spark.readStream
        .schema(docs.withColumn("part", lit(0)).schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .drop("part")
      val q = DedupIngest.ingestStream(stream, "doc_id", "text", P, idx,
        kept, s"$root/ckpt")
      try q.processAllAvailable() finally q.stop()
      spark.read.parquet(kept).select($"doc_id").as[Long].collect().toSet
    }

    assert(runWith(4, "a") == expected)
    // different batch boundaries, same answer
    assert(runWith(2, "b") == expected)
  }

  test("streaming ingest: a replayed batch id is a committed no-op") {
    import graft.streaming.DedupIngest
    val root = tmpDir("replay")
    val idx = s"$root/idx"
    val kept = s"$root/kept"
    DedupIngest.initEmptyIndex(spark, "doc_id", "text", P, idx)
    val b = docs.limit(50)
    DedupIngest.processBatch(b, 0L, "doc_id", "text", P, idx, kept)
    val after = spark.read.parquet(kept).count()
    // at-least-once replay of the same batch id: marker short-circuits
    DedupIngest.processBatch(b, 0L, "doc_id", "text", P, idx, kept)
    assert(spark.read.parquet(kept).count() == after)
  }

  test("probing with a different MinHash family is rejected") {
    val idx = tmpDir("params")
    IncrementalDedup.buildIndex(docs.limit(20), "doc_id", "text", P, idx)
    val e = intercept[IllegalArgumentException] {
      IncrementalDedup.nearDupsAgainstIndex(spark, docs.limit(5),
        "doc_id", "text", P.copy(bands = 16), idx)
    }
    assert(e.getMessage.contains("family"))
  }
}
