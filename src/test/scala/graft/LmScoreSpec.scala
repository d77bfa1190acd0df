package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

class LmScoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("unigram LM score matches the hand-computed cross-entropy") {
    // corpus: 6 tokens total; p(a)=3/6, p(b)=2/6, p(c)=1/6
    val docs = Seq((1L, "a a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLmScore(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pa = 3.0 / 6; val pb = 2.0 / 6; val pc = 1.0 / 6
    val d1 = r6(-(math.log(pa) + math.log(pa) + math.log(pb)) / 3)
    val d2 = r6(-(math.log(pa) + math.log(pb) + math.log(pc)) / 3)
    assert(got == Seq((1L, d1), (2L, d2)))
  }

  test("stopword-heavy prose scores lower than rare-token text") {
    val common = Seq.fill(20)("the quick brown fox").mkString(" ")
    val docs = (Seq((1L, common), (2L, "zxqv jkwp mnbv gfds")) ++
      (3L to 12L).map(i => (i, common))).toDF("doc_id", "text")
    val scores = TextAnalysis.unigramLmScore(docs, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(scores(2L) > scores(1L))
  }

  test("score is invariant to input partitioning") {
    val docs = (1L to 200L).map(i => (i, s"tok${i % 7} tok${i % 3} shared"))
      .toDF("doc_id", "text")
    val a = TextAnalysis.unigramLmScore(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    val b = TextAnalysis.unigramLmScore(docs.repartition(17), "doc_id", "text")
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    assert(a == b)
  }
}
