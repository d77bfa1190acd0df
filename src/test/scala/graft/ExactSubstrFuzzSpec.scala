package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ExactSubstrDedup

/** Seeded differential fuzz for p82 (the DedupFamilyFuzzSpec pattern):
  * random small-vocabulary corpora — built to force duplicated runs —
  * against an independent in-JVM brute-force reference of the same
  * semantics (stride-1 windows, corpus count >= minCount, touch-merged
  * islands, token removal).
  */
class ExactSubstrFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def reference(docs: Seq[(Long, String)], w: Int,
      minCount: Int): Seq[(Long, Long, Long, Int, String)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val wins = toks.flatMap { case (id, tk) =>
      (0 to tk.length - w).map(s => (id, s, tk.slice(s, s + w).mkString(" ")))
    }
    val counts = wins.groupBy(_._3).view.mapValues(_.size).toMap
    val byDoc = wins.filter(x => counts(x._3) >= minCount)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    toks.map { case (id, tk) =>
      val islands = byDoc.getOrElse(id, Seq.empty)
        .foldLeft(Vector.empty[(Int, Int)]) { (acc, s) =>
          if (acc.nonEmpty && s <= acc.last._2)
            acc.init :+ (acc.last._1, math.max(acc.last._2, s + w))
          else acc :+ (s, s + w)
        }
      val dupTokens = islands.map(i => i._2 - i._1).sum
      val cleaned = tk.zipWithIndex.collect {
        case (t, i) if !islands.exists(isl => i >= isl._1 && i < isl._2) => t
      }.mkString(" ")
      (id, islands.size.toLong, dupTokens.toLong, tk.length, cleaned)
    }.sortBy(_._1)
  }

  test("random small-vocab corpora match the in-JVM reference (10 seeds)") {
    val vocab = Array("a", "b", "c", "d", "e")
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      val docs = (0L until 30L).map { id =>
        val n = 1 + rnd.nextInt(20)
        id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      val w = 2 + rnd.nextInt(3) // 2..4
      val got = ExactSubstrDedup.cleanedCorpus(
          docs.toDF("doc_id", "text"), "doc_id", "text",
          w = w, minCount = 2)
        .orderBy("doc_id")
        .as[(Long, Long, Long, Int, String)].collect().toSeq
      assert(got == reference(docs, w, 2), s"seed=$seed w=$w")
    }
  }
}
