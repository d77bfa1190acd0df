package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BpeTrainer

/** BPE merge learning (p68): hand-computed goldens, frequency-weighted
  * word counting, non-overlapping greedy application, merge
  * interaction (later merges consume earlier merges' outputs), early
  * exhaustion, and tie determinism.
  */
class BpeTrainerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def learn(texts: Seq[String], n: Int): Seq[(Int, String, String, Long)] =
    BpeTrainer.learnMerges(texts.toDF("text"), "text", n)
      .orderBy("merge_rank")
      .as[(Int, String, String, Long)].collect().toSeq

  test("the classic example: er from lower/lowest family, weighted by word frequency") {
    // words: low x3, lower x2, lowest x1  ->  (l,o) 6, (o,w) 6, (w,e) 3,
    // (e,r) 2, (e,s) 1, (s,t) 1; ties (l,o)/(o,w) at 6 break
    // lexicographically to (l,o)
    val out = learn(Seq("low low lower", "low lower lowest"), 3)
    assert(out(0) == ((1, "l", "o", 6L)))
    // after merge 1: lo|w -> (lo,w) 6, (w,e) 3 ...
    assert(out(1) == ((2, "lo", "w", 6L)))
    // after merge 2: low is one token; (low,e) 3 leads
    assert(out(2) == ((3, "low", "e", 3L)))
  }

  test("merge interaction: a later merge consumes an earlier merge's output token") {
    val out = learn(Seq("abab abab abab"), 2)
    // (a,b) 6 adjacencies (2 per word x 3) wins; then (ab,ab) 3
    assert(out(0) == ((1, "a", "b", 6L)))
    assert(out(1) == ((2, "ab", "ab", 3L)))
  }

  test("non-overlapping greedy: aaa yields pair count 2 but only one merged pair per word") {
    val out = learn(Seq("aaa aaa"), 2)
    // adjacency count: 2 per word x 2 words = 4
    assert(out(0) == ((1, "a", "a", 4L)))
    // after applying: [aa, a] per word -> (aa, a) twice
    assert(out(1) == ((2, "aa", "a", 2L)))
  }

  test("exhaustion stops early instead of looping") {
    val out = learn(Seq("a b c a"), 5)
    assert(out.isEmpty, "single-char words have no adjacent pairs")
    val one = learn(Seq("ab ab"), 5)
    assert(one == Seq((1, "a", "b", 2L)),
      "one merge exhausts the corpus; later rounds must stop")
  }

  test("subwordVocab: mass conservation and token-count reduction") {
    val texts = Seq("low low lower", "low lower lowest")
    val vocab = BpeTrainer.subwordVocab(texts.toDF("text"), "text", 3)
      .as[(String, Long)].collect().toMap
    // character-mass conservation: total characters across weighted
    // subwords == total characters in the corpus words
    val chars = texts.flatMap(_.split(" ")).map(_.length.toLong).sum
    assert(vocab.map { case (t, f) => t.length * f }.sum == chars)
    // after (l,o), (lo,w), (low,e): "low" is ONE token
    assert(vocab("low") >= 3L)
    // token-count reduction vs characters: merging strictly shrinks
    assert(vocab.values.sum < chars)
  }

  test("driver finish and distributed rounds are selection-identical across the threshold") {
    // driverMaxWords = 0 forces the distributed path; the default takes
    // the driver finish — merges AND final vocab must match exactly on
    // a corpus with ties, merge interaction, and early-exhausting words
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val viaDriver = BpeTrainer.learnMerges(docs, "text", numMerges = 8)
      .orderBy("merge_rank").as[(Int, String, String, Long)].collect().toSeq
    val viaDist = BpeTrainer.learnMerges(docs, "text", numMerges = 8,
        driverMaxWords = 0L)
      .orderBy("merge_rank").as[(Int, String, String, Long)].collect().toSeq
    assert(viaDriver == viaDist, "merge tables diverged across the threshold")
    val vocabDriver = BpeTrainer.subwordVocab(docs, "text", numMerges = 8)
      .orderBy($"freq".desc, $"token").as[(String, Long)].collect().toSeq
    val vocabDist = BpeTrainer.subwordVocab(docs, "text", numMerges = 8,
        driverMaxWords = 0L)
      .orderBy($"freq".desc, $"token").as[(String, Long)].collect().toSeq
    assert(vocabDriver == vocabDist, "vocabularies diverged across the threshold")
  }

  test("driver finish preserves the exhaustion and tie contracts") {
    val out = learn(Seq("a b c a"), 5)
    assert(out.isEmpty)
    // zy/ba tie -> (b, a) under byte order, same as the distributed path
    val tie = BpeTrainer.learnMerges(Seq("zy ba").toDF("text"), "text", 1,
        driverMaxWords = 0L)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(tie == learn(Seq("zy ba"), 1))
  }

  test("tie-break is lexicographic on (lhs, rhs)") {
    // (z,y) and (b,a) both occur once: (b,a) wins the tie
    val out = learn(Seq("zy ba"), 1)
    assert(out == Seq((1, "b", "a", 1L)))
  }
}
