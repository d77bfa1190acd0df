package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bm25

/** BM25 retrieval (p83): hand-computed scores, the ranking properties
  * that define the scheme (length normalization, tf saturation, rare-term
  * idf dominance), query-term dedup, and the no-WindowExec plan.
  */
class Bm25Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // corpus: 4 docs; "rare" appears in 1 doc, "common" in 3
  private def docs = Seq(
    (0L, "rare common alpha beta"),
    (1L, "common gamma delta epsilon zeta eta theta iota"),
    (2L, "common kappa"),
    (3L, "lambda mu nu xi"))
    .toDF("doc_id", "text")

  private def q(terms: String*) =
    Seq((0L, terms)).toDF("query_id", "qterms")

  private def bm25(queries: org.apache.spark.sql.DataFrame) =
    Bm25.scores(docs, "doc_id", "text", queries, "query_id", "qterms")
      .orderBy(col("score").desc, col("id"))
      .as[(Long, Long, Double)].collect().toSeq

  private def handScore(tf: Long, df: Long, dl: Long): Double = {
    val n = 4.0; val avgdl = 18.0 / 4.0; val k1 = 1.2; val b = 0.75
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    val raw = idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("single-term scores match the hand formula; non-matching docs absent") {
    assert(bm25(q("rare")) == Seq((0L, 0L, handScore(1, 1, 4))))
    assert(bm25(q("common")) == Seq(
      (0L, 2L, handScore(1, 3, 2)),  // shortest doc wins: length norm
      (0L, 0L, handScore(1, 3, 4)),
      (0L, 1L, handScore(1, 3, 8))))
  }

  test("rare terms dominate: doc 0 outranks docs matching only 'common'") {
    val got = bm25(q("rare", "common"))
    assert(got.head._2 == 0L) // matches both terms, one of them rare
    assert(got.map(_._2).toSet == Set(0L, 1L, 2L))
  }

  test("duplicate query terms are binary: no double counting") {
    assert(bm25(q("rare", "rare")) == bm25(q("rare")))
  }

  test("tf saturates: contribution grows sublinearly in tf") {
    val rep = Seq((0L, "t t t t"), (1L, "t u v w")).toDF("doc_id", "text")
    val s = Bm25.scores(rep, "doc_id", "text", q("t"), "query_id", "qterms")
      .orderBy("id").as[(Long, Long, Double)].collect()
    assert(s(0)._3 < 4 * s(1)._3 && s(0)._3 > s(1)._3)
  }

  test("topK plan has no WindowExec and respects the k cut") {
    val queries = docs.filter(col("doc_id") < 2)
      .select(col("doc_id").as("query_id"),
        array_distinct(split(col("text"), " ")).as("qterms"))
    val top = Bm25.topK(docs, "doc_id", "text", queries, "query_id", "qterms",
      k = 2)
    assert(top.queryExecution.executedPlan
      .collectWithSubqueries { case w: WindowExec => w }.isEmpty)
    val rows = top.as[(Long, Long, Double)].collect()
    assert(rows.groupBy(_._1).forall(_._2.length <= 2))
    // each query's own source doc matches every term -> must rank first
    assert(rows.groupBy(_._1).forall { case (qid, rs) =>
      rs.maxBy(r => (r._3, -r._2))._2 == qid })
  }
}
