package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Chunking

class ChunkingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunks: stride windows cover all tokens and the final partial chunk is kept") {
    val docs = Seq((1L, (1 to 9).map("t" + _).mkString(" ")), (2L, "solo"))
      .toDF("doc_id", "text")
    val got = Chunking.chunks(docs, "doc_id", "text", window = 4, stride = 3)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 3L, 4L, "t4 t5 t6 t7"),
      (1L, 6L, 3L, "t7 t8 t9"),
      (2L, 0L, 1L, "solo")))
    // every token index is covered by at least one chunk when stride <= window
    val covered = got.filter(_._1 == 1L)
      .flatMap(c => c._2 until (c._2 + c._3)).toSet
    assert(covered == (0L until 9L).toSet)
  }

  test("packing: a doc joins the sequence its first token lands in, per stratum") {
    val df = Seq(("en", 1L, 1500), ("en", 2L, 1000), ("en", 3L, 800),
      ("de", 4L, 2047), ("de", 5L, 2)).toDF("lang", "doc_id", "nt")
    val got = Chunking.withSequenceIds(df, "lang", "doc_id", col("nt"), 2048)
      .select($"lang", $"doc_id", $"seq_id")
      .as[(String, Long, Long)].collect().toSet
    // en: starts at 0, 1500, 2500 -> seqs 0, 0, 1; de: starts 0, 2047 -> 0, 0
    assert(got == Set(("en", 1L, 0L), ("en", 2L, 0L), ("en", 3L, 1L),
      ("de", 4L, 0L), ("de", 5L, 0L)))
  }
}
