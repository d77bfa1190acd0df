package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AnnIndex, IncrementalDedup, IndexMaintenance}

/** Distributed right-to-be-forgotten for the persisted indexes
  * (IncrementalDedup.purgeIndex / AnnIndex.purgeIndex): the drop set is
  * a DataFrame, never a driver list, and the purge provably equals an
  * index without the dropped ids — while the corpus-sized retained
  * branch never enters a shuffle (bloom split: definite misses rewrite
  * in place of layout; only candidates pay the exact anti-join). The
  * shuffle-records bound IS the 100 TB contract: a purge of a 100 TB
  * index shuffles O(dropset + FPP·index) rows, not the index.
  */
class PurgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val P = IncrementalDedup.Params(shingleSize = 3, numHashes = 128,
    bands = 32, threshold = 0.8)

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_purge_$tag").toString

  private lazy val docs =
    spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
  private lazy val emb =
    spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")

  private def pairSet(df: DataFrame) =
    df.select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet

  /** Sum of shuffle records written by every task while `body` runs —
    * the purge's exchange volume, end to end (bloom build, drop-set
    * distinct, survivor re-alignment; the retained branch must
    * contribute zero).
    */
  private def shuffleRecordsDuring[A](body: => A): (A, Long) = {
    val listener = new SparkListener {
      @volatile var records = 0L
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) records += m.shuffleWriteMetrics.recordsWritten
      }
    }
    // drain the async bus BEFORE registering: task-end events from
    // queries that ran before `body` (index build, fixture counts)
    // would otherwise deliver into the capture window and inflate the
    // O(dropset) shuffle bound — the same registration race the
    // round-17 verdict adjudicated in IncrementalDedupSpec's pin
    org.apache.spark.sql.graftshim.Bridge.waitForListeners(spark)
    spark.sparkContext.addSparkListener(listener)
    try {
      val a = body
      org.apache.spark.sql.graftshim.Bridge.waitForListeners(spark)
      (a, listener.records)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("dedup purge equals an index built without the dropped docs; shuffle is O(dropset), not O(index)") {
    val root = tmpDir("dedup")
    val idx = s"$root/idx"
    val out = s"$root/idx_purged"
    val rebuilt = s"$root/idx_rebuilt"
    val corpus = docs.filter($"doc_id" % 5 =!= 0)
    val batch = docs.filter($"doc_id" % 5 === 0)
    IncrementalDedup.buildIndex(corpus, "doc_id", "text", P, idx)
    val indexRows = spark.read.parquet(s"$idx/bands").count() +
      spark.read.parquet(s"$idx/shingles").count()
    assert(indexRows > 10000, s"fixture too small to make the shuffle " +
      s"bound meaningful: $indexRows index rows")

    // the drop set arrives as a FRAME (takedown list, join result...) —
    // ~1/7 of the corpus, far past any literal-filter regime, and it
    // includes pair participants so the equality below cannot pass
    // vacuously
    val victims = corpus.filter($"doc_id" % 7 === 1).select($"doc_id")
    val victimSet = victims.as[Long].collect().toSet
    val baseline = pairSet(IncrementalDedup.nearDupsAgainstIndex(
      spark, batch, "doc_id", "text", P, idx))
    assert(baseline.exists(p =>
      victimSet.contains(p._1) || victimSet.contains(p._2)),
      "fixture must plant pairs touching the drop set")

    val (stats, shuffled) = shuffleRecordsDuring {
      IncrementalDedup.purgeIndex(spark, idx, out, victims, "doc_id")
    }
    // THE pin: the retained branch (the index) contributed nothing —
    // everything shuffled is drop-set handling + bloom false positives
    assert(shuffled < indexRows / 5,
      s"purge shuffled $shuffled records against $indexRows index rows " +
        "— the retained branch is leaking into an exchange")
    assert(stats.bandFilesAfter <= 2L * P.numBuckets,
      s"expected at most miss+survivor files per bucket, got $stats")

    // ground truth: an index built fresh from the retained corpus
    IncrementalDedup.buildIndex(
      corpus.join(victims, Seq("doc_id"), "left_anti"),
      "doc_id", "text", P, rebuilt)
    val afterPurge = pairSet(IncrementalDedup.nearDupsAgainstIndex(
      spark, batch, "doc_id", "text", P, out))
    val groundTruth = pairSet(IncrementalDedup.nearDupsAgainstIndex(
      spark, batch, "doc_id", "text", P, rebuilt))
    assert(afterPurge == groundTruth)
    assert(afterPurge != baseline,
      "purging pair participants must change the result")
    // physically gone from both tables
    assert(spark.read.parquet(s"$out/bands")
      .join(victims.withColumnRenamed("doc_id", "id"), Seq("id"), "semi")
      .count() == 0)
    assert(spark.read.parquet(s"$out/shingles")
      .join(victims.withColumnRenamed("doc_id", "id"), Seq("id"), "semi")
      .count() == 0)
    // and the family survives verbatim — a mismatched probe still rejects
    val e = intercept[IllegalArgumentException] {
      IncrementalDedup.nearDupsAgainstIndex(spark, batch, "doc_id", "text",
        P.copy(bands = 16), out)
    }
    assert(e.getMessage.contains("family"))
  }

  test("ann purge equals the literal-drop compaction; cell layout survives; shuffle is O(dropset)") {
    val p = AnnIndex.Params(nlist = 8, dims = 64)
    val root = tmpDir("ann")
    val idx = s"$root/idx"
    val out = s"$root/idx_purged"
    AnnIndex.buildIndex(emb, "vec_id", "embedding", p, idx)
    val indexRows = spark.read.parquet(s"$idx/postings").count()

    val victims = emb.filter($"vec_id" % 9 === 2).select($"vec_id")
    val nVictims = victims.count()
    assert(nVictims > 10)
    val queries = emb.filter($"vec_id" % 40 === 0)
    def exhaustive(path: String) =
      AnnIndex.topKAgainstIndex(spark, queries, "vec_id", "embedding",
          k = 5, nprobe = p.nlist, p, path)
        .select("qid", "nid", "cos", "rank")
        .orderBy("qid", "rank").collect().toSeq

    val before = exhaustive(idx)
    val (_, shuffled) = shuffleRecordsDuring {
      AnnIndex.purgeIndex(spark, idx, out, victims, "vec_id")
    }
    assert(shuffled < indexRows / 2,
      s"ann purge shuffled $shuffled of $indexRows postings — the " +
        "retained branch is leaking into an exchange")

    // ground truth: the literal-drop compaction (already pinned against
    // a retained rebuild in AnnIndexSpec)
    val literal = s"$root/idx_literal"
    AnnIndex.compactIndex(spark, idx, literal,
      dropIds = victims.as[Long].collect().toSeq)
    val got = exhaustive(out)
    assert(got == exhaustive(literal))
    assert(got != before, "purging must change some top-k list")
    val victimSet = victims.as[Long].collect().toSet
    assert(!got.exists(r => victimSet.contains(r.getLong(1))),
      "a purged vector must appear in no result")
    // purged postings physically gone; cell dirs intact for pruning
    assert(spark.read.parquet(s"$out/postings")
      .filter($"nid".isin(victimSet.toSeq: _*)).count() == 0)
    assert(graft.sources.FsMeta.listSubdirs(s"$out/postings")
      .count(_.startsWith("cell=")) == p.nlist)
  }

  test("index maintenance routes large delete feeds to the distributed purge, same answers as the literal tier") {
    val root = tmpDir("maint")
    val idx = s"$root/idx"
    IncrementalDedup.buildIndex(docs, "doc_id", "text", P, idx)

    // a takedown feed: deletes only, bigger than the (overridden) tier
    // gate — plus a couple of fresh inserts to exercise delete+append
    val feed = docs.filter($"doc_id" % 11 === 3)
      .select($"doc_id", $"text", lit("delete").as("_change_type"))
      .unionByName(Seq(
        (9100L, "alpha beta gamma delta epsilon zeta eta theta"),
        (9101L, "alpha beta gamma delta epsilon zeta eta iota"))
        .toDF("doc_id", "text")
        .withColumn("_change_type", lit("insert")))
    val nDel = feed.filter($"_change_type" === "delete").count()
    assert(nDel > 8, s"fixture drifted: $nDel deletes")

    val rDist = IndexMaintenance.maintainDedupIndex(spark, feed,
      "doc_id", "text", P, idx, s"$root/idx_dist",
      literalDeleteMaxIds = 8)
    assert(rDist.distributedPurge && rDist.deleted == nDel &&
      rDist.inserted == 2, s"expected the distributed tier, got $rDist")
    val rLit = IndexMaintenance.maintainDedupIndex(spark, feed,
      "doc_id", "text", P, idx, s"$root/idx_lit",
      literalDeleteMaxIds = 10000)
    assert(!rLit.distributedPurge, s"expected the literal tier, got $rLit")

    // both tiers answer identically (and differently from the unpurged
    // index, so the comparison bites)
    val probe = docs.filter($"doc_id" % 7 === 3).select($"doc_id", $"text")
      .unionByName(Seq((9200L, "alpha beta gamma delta epsilon zeta eta kappa"))
        .toDF("doc_id", "text"))
    val viaDist = pairSet(IncrementalDedup.nearDupsAgainstIndex(
      spark, probe, "doc_id", "text", P, rDist.path))
    val viaLit = pairSet(IncrementalDedup.nearDupsAgainstIndex(
      spark, probe, "doc_id", "text", P, rLit.path))
    assert(viaDist == viaLit)
    assert(viaDist.nonEmpty, "fixtures plant near-dups for the probe")
    val viaOld = pairSet(IncrementalDedup.nearDupsAgainstIndex(
      spark, probe, "doc_id", "text", P, idx))
    assert(viaDist != viaOld,
      "the deletes (or the inserted near-dup pair) must change the probe")
  }

  test("a null delete id is ignored identically by BOTH tiers, never a crash") {
    val root = tmpDir("nullid")
    val idx = s"$root/idx"
    IncrementalDedup.buildIndex(docs.limit(60), "doc_id", "text", P, idx)
    // a malformed feed: real deletes plus a null id — the same feed must
    // take the literal tier and the distributed tier without the null
    // crashing one (driver collect) or silently changing the other
    val feed = docs.limit(60).filter($"doc_id" % 3 === 0)
      .select($"doc_id", $"text")
      .unionByName(Seq((null.asInstanceOf[java.lang.Long], "x"))
        .toDF("doc_id", "text"))
      .withColumn("_change_type", lit("delete"))
    val nDel = feed.filter($"doc_id".isNotNull).count()
    assert(nDel > 2)
    val rLit = IndexMaintenance.maintainDedupIndex(spark, feed,
      "doc_id", "text", P, idx, s"$root/lit",
      literalDeleteMaxIds = 10000)
    val rDist = IndexMaintenance.maintainDedupIndex(spark, feed,
      "doc_id", "text", P, idx, s"$root/dist",
      literalDeleteMaxIds = 1)
    assert(!rLit.distributedPurge && rDist.distributedPurge)
    // the null id is not a delete: both tiers count only the real ids
    assert(rLit.deleted == nDel && rDist.deleted == nDel,
      s"expected $nDel deletes, got $rLit / $rDist")
    // and both surviving indexes hold the identical row sets
    Seq("bands", "shingles").foreach { t =>
      val a = spark.read.parquet(s"$root/lit/$t")
      val b = spark.read.parquet(s"$root/dist/$t")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"tier divergence in $t")
    }
  }
}
