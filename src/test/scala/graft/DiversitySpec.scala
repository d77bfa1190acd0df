package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Corpus-level distinct-n diversity (p85): hand-computed counts, the
  * mode-collapse discrimination per-doc metrics cannot make, and the
  * sub-width edge.
  */
class DiversitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed distinct-n per slice; sub-width docs contribute zero grams") {
    val docs = Seq(
      ("a", "x y x y"),   // 1-grams: 4 occ, 2 distinct; 2-grams: 3 occ, 2 distinct ("x y","y x")
      ("a", "x y z"),     // adds: 3 occ (z new); 2 occ ("y z" new)
      ("b", "w"))         // 1 occ 1 distinct; NO 2-grams (sub-width)
      .toDF("lang", "text")
    val got = TextAnalysis.distinctNgramDiversity(docs, "lang", "text",
        ns = Seq(1, 2))
      .orderBy("slice", "n")
      .as[(String, Int, Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("a", 1, 7L, 3L, Some(0.428571)), // round(3/7, 6)
      ("a", 2, 5L, 3L, Some(0.6)),
      ("b", 1, 1L, 1L, Some(1.0)),
      ("b", 2, 0L, 0L, None)))
  }

  test("mode collapse is visible at corpus level when every doc is internally varied") {
    // each doc is individually diverse (all tokens distinct), but the
    // slice repeats ONE doc — corpus distinct-2 craters
    val collapsed = (0 until 50).map(_ => ("m", "a b c d e f g h"))
    val varied = (0 until 50).map(i =>
      ("v", (0 until 8).map(j => s"t${i}_$j").mkString(" ")))
    val got = TextAnalysis.distinctNgramDiversity(
        (collapsed ++ varied).toDF("lang", "text"), "lang", "text",
        ns = Seq(2))
      .orderBy("slice")
      .as[(String, Int, Long, Long, Option[Double])].collect()
    val m = got.find(_._1 == "m").get
    val v = got.find(_._1 == "v").get
    assert(m._5.get < 0.05 && v._5.get == 1.0,
      s"collapsed slice must crater vs varied: $m vs $v")
  }
}
