package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{BpeTrainer, TokenizerEval}

/** Tokenizer fertility report (p89): hand anchors at the two extremes
  * (no merges = char tokenizer, saturating merges = word tokenizer) and
  * the monotone effect of vocabulary growth.
  */
class TokenizerEvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def report(docs: Seq[(String, String)],
      merges: Seq[(String, String)]) =
    TokenizerEval.fertilityReport(docs.toDF("lang", "text"), "text", "lang",
        merges)
      .orderBy("slice")
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq

  test("no merges = character tokenizer: chars_per_piece 1, fertility = chars/word") {
    val got = report(Seq(("x", "ab abc")), Seq.empty)
    assert(got == Seq(("x", 2L, 5L, 5L, 2.5, 1.0)))
  }

  test("a saturating merge halves the pieces of the words it covers") {
    // "ab" words collapse to ONE piece under the (a,b) merge
    val got = report(Seq(("x", "ab ab cd")), Seq(("a", "b")))
    // pieces: [ab] [ab] [c d] -> 4; words 3; chars 6
    assert(got == Seq(("x", 3L, 6L, 4L, 1.333333, 1.5)))
  }

  test("fertility is non-increasing in trained vocabulary size, per slice") {
    val docs = Seq(("a", "spark spark table table query"),
      ("b", "join join merge")).toDF("lang", "text")
    def fert(n: Int): Map[String, Double] = {
      val merges =
        if (n == 0) Seq.empty[(String, String)]
        else BpeTrainer.learnMerges(docs, "text", numMerges = n)
          .orderBy("merge_rank").select("lhs", "rhs")
          .as[(String, String)].collect().toSeq
      TokenizerEval.fertilityReport(docs, "text", "lang", merges)
        .as[(String, Long, Long, Long, Double, Double)]
        .collect().map(r => r._1 -> r._5).toMap
    }
    val ladder = Seq(0, 2, 4, 8).map(fert)
    ladder.sliding(2).foreach { case Seq(lo, hi) =>
      lo.keys.foreach(k => assert(hi(k) <= lo(k),
        s"fertility must not rise as merges grow: $k ${lo(k)} -> ${hi(k)}"))
    case _ => ()
    }
  }
}
