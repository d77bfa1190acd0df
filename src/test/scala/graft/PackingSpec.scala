package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Packing

/** Sequence packing (p76): hand-computed map on a tiny corpus,
  * conservation invariants on real data, partition-layout invariance,
  * and the no-single-partition-window plan claim.
  */
class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private type Span = (Long, Long, Long, Long, Long)

  test("hand-computed packing map: docs of 3/5/4 tokens into 4-token sequences") {
    // stream: d1[0,3) d2[3,8) d3[8,12); sequences of 4:
    //   seq0 = d1(3) + d2(1), seq1 = d2(4), seq2 = d3(4)
    val docs = Seq((1L, "a b c"), (2L, "d e f g h"), (3L, "i j k l"))
      .toDF("doc_id", "text")
    val got = Packing.packChunks(docs, "doc_id", "text", seqLen = 4)
      .orderBy("seq_id", "id").as[Span].collect().toSeq
    assert(got == Seq(
      (0L, 1L, 0L, 0L, 3L),
      (0L, 2L, 0L, 3L, 1L),
      (1L, 2L, 1L, 0L, 4L),
      (2L, 3L, 0L, 0L, 4L)))
  }

  test("conservation on real data: docs fully packed, sequences exactly full") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val L = 64
    val map = Packing.packChunks(docs, "doc_id", "text", L)
    map.persist()
    try {
      // every doc's spans cover exactly its token count, contiguously
      val perDoc = map.groupBy("id")
        .agg(sum("n_toks").as("packed"), min("doc_from").as("f0"))
        .as[(Long, Long, Long)].collect()
      val counts = docs.select(col("doc_id").cast("long"),
          size(split(col("text"), " ")).cast("long"))
        .as[(Long, Long)].collect().toMap
      perDoc.foreach { case (id, packed, f0) =>
        assert(packed == counts(id) && f0 == 0L, s"doc $id")
      }
      assert(perDoc.length == counts.size)
      // every sequence except the last carries exactly L tokens
      val perSeq = map.groupBy("seq_id").agg(sum("n_toks").as("t"))
        .orderBy("seq_id").as[(Long, Long)].collect()
      val lastId = perSeq.map(_._1).max
      perSeq.foreach { case (sid, t) =>
        if (sid < lastId) assert(t == L, s"sequence $sid holds $t tokens")
        else assert(t >= 1 && t <= L)
      }
      assert(perSeq.map(_._1).toSeq == (0L to lastId).toSeq, "no gaps")
      // within-sequence spans tile [0, L) without overlap
      val spans = map.filter(col("seq_id") === 0)
        .orderBy("seq_from").as[Span].collect()
      var pos = 0L
      spans.foreach { case (_, _, _, seqFrom, n) =>
        assert(seqFrom == pos); pos += n
      }
      assert(pos == L)
    } finally map.unpersist(): Unit
  }

  test("the packing map is invariant to the input's partition layout") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    def run(d: org.apache.spark.sql.DataFrame) =
      Packing.packChunks(d, "doc_id", "text", 64)
        .orderBy("seq_id", "id").as[Span].collect().toSeq
    val a = run(docs)
    val b = run(docs.repartition(3))
    val c = run(docs.coalesce(1))
    assert(a == b && b == c && a.nonEmpty)
  }

  test("no single-partition window: the running sum is the two-phase scan") {
    val counts = spark.range(1000).select(col("id"), lit(5L).as("n"))
    val plan = Packing.packCounts(counts, 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global cumsum must not serialize through one partition:\n$plan")
  }

  test("zero-token docs are excluded; degenerate seqLen rejected") {
    val counts = Seq((1L, 3L), (2L, 0L), (3L, 5L)).toDF("id", "n")
    val ids = Packing.packCounts(counts, 4)
      .select("id").distinct().as[Long].collect().toSet
    assert(ids == Set(1L, 3L))
    intercept[IllegalArgumentException] {
      Packing.packCounts(counts, 0)
    }
  }
}
