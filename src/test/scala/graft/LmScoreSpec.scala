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

  test("bigram LM matches hand computation and is order-SENSITIVE where unigram is not") {
    // corpus: doc 1 "a b a b", doc 2 "b a b a" — same bag of words,
    // different bigram streams. bigrams: d1 = ab, ba, ab; d2 = ba, ab, ba
    // counts: c(a,b)=3, c(b,a)=3 (corpus-wide), c(a)=4, c(b)=4, V=2
    val docs = Seq((1L, "a b a b"), (2L, "b a b a")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val p = (3.0 + 1) / (4.0 + 2) // every bigram here has the same prob
    assert(got == Seq((1L, r6(-math.log(p))), (2L, r6(-math.log(p)))))

    // order sensitivity: phrase-structured text vs its scrambled twin.
    // The unigram LM cannot tell them apart; the bigram LM must.
    val phrase = Seq.fill(30)("the quick brown fox jumps").mkString(" ")
    val scrambled = new scala.util.Random(7)
      .shuffle(phrase.split(" ").toSeq).mkString(" ")
    val pair = Seq((10L, phrase), (11L, scrambled)).toDF("doc_id", "text")
    val uni = TextAnalysis.unigramLmScore(pair, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    val bi = TextAnalysis.bigramLmScore(pair, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(math.abs(uni(10L) - uni(11L)) < 1e-9, "unigram is order-blind")
    assert(bi(10L) < bi(11L), s"bigram must prefer phrase structure: $bi")
  }

  test("interpolated LM matches hand computation; backoff beats raw OOV; short docs absent") {
    import org.apache.spark.sql.functions.col
    // reference: one doc "a b a c" — bigrams ab, ba, ac; c(a)=2, c(b)=1,
    // c(c)=1, N=4, V=3
    val ref = Seq((0L, "a b a c")).toDF("doc_id", "text")
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def puni(c: Double) = (c + 1) / (4.0 + 3 + 1)
    val lam = 0.7
    // scored doc "a b": P = λ·(c(a,b)/c(a)) + (1−λ)·P_uni(b)
    val docs = Seq(
      (1L, "a b"),    // seen bigram: λ·(1/2) + .3·puni(1)
      (2L, "b c"),    // seen words, unseen bigram: backoff only
      (3L, "q w"),    // full OOV: history unseen -> pure smoothed backoff
      (4L, "a")       // single token: no bigrams, absent
    ).toDF("doc_id", "text")
    val got = TextAnalysis.interpolatedLmScore(docs, ref, "doc_id", "text", lam)
      .orderBy("doc_id").as[(Long, Double)].collect().toMap
    assert(!got.contains(4L), "no-bigram docs must be absent")
    assert(got(1L) == r6(-math.log(lam * 0.5 + (1 - lam) * puni(1))))
    assert(got(2L) == r6(-math.log(0.0 + (1 - lam) * puni(1))))
    assert(got(3L) == r6(-math.log(0.0 + (1 - lam) * puni(0))))
    // smooth backoff ordering: seen bigram < seen-words-unseen-bigram < OOV
    assert(got(1L) < got(2L) && got(2L) < got(3L), got.toString)

    // interpolation tempers add-one's over-penalty: for a plausible
    // unseen bigram of frequent words, the interpolated score must beat
    // (score lower than) what OOV gets — the smoothing's entire point
    val bigRef = Seq((0L, Seq.fill(50)("x y").mkString(" ") + " z")).toDF("doc_id", "text")
    val probe = Seq((1L, "y x"), (2L, "qq ww")).toDF("doc_id", "text")
    val s = TextAnalysis.interpolatedLmScore(probe, bigRef, "doc_id", "text", lam)
      .as[(Long, Double)].collect().toMap
    assert(s(1L) < s(2L), s"frequent-word unseen bigram must outrank OOV: $s")
  }

  test("zipf fit: slope ~ -1 on a harmonic corpus, r2 near 1, degenerate flat corpus slope 0") {
    // token k appears floor(240/k) times, k = 1..40 — by construction
    // count(rank k) ~ 240/k, so ln(count) ~ ln(240) - ln(rank)
    val words = (1 to 40).flatMap(k => Seq.fill(240 / k)(s"w${"%02d".format(k)}"))
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val fit = TextAnalysis.zipfFit(docs, "text", topN = 40)
      .as[(Long, Double, Double, Double)].collect().head
    assert(fit._1 == 40L)
    assert(math.abs(fit._2 - (-1.0)) < 0.05, s"slope ${fit._2}")
    assert(fit._4 > 0.99, s"r2 ${fit._4}")
    // flat (uniform) frequencies: slope 0 exactly, by construction
    val flat = (1 to 30).map(k => s"u$k").mkString(" ")
    val fit2 = TextAnalysis.zipfFit(
        Seq((1L, flat)).toDF("doc_id", "text"), "text", topN = 30)
      .as[(Long, Double, Double, Double)].collect().head
    assert(fit2._2 == 0.0, s"flat corpus slope ${fit2._2}")
    assert(fit2._4 == 1.0, s"flat corpus r2 convention ${fit2._4}")
  }

  test("zipf plan: the rank window runs AFTER the top-N limit, never over the vocabulary") {
    // the 100 TB trap this operator exists to avoid: a single-partition
    // window over the full vocabulary. In the tree string parents print
    // before children, so the Window node must appear ABOVE (before)
    // the TakeOrderedAndProject that feeds it
    val plan = graft.api.Registry.byName("q73_zipf_fit")
      .run(spark, TestSpark.sf0001).queryExecution.executedPlan.toString
    val win = plan.indexOf("Window ")
    val take = plan.indexOf("TakeOrderedAndProject")
    assert(win >= 0 && take >= 0, plan)
    assert(win < take, s"rank window must consume the LIMITED rows:\n$plan")
  }

  test("explicit-persist flags: every multi-branch consumer reads the cache, results unchanged") {
    // TfIdf.scored(persistTf)'s pattern generalized (VERDICT r7 #3): each
    // scorer's repeated subtree materializes once behind InMemoryTableScan
    // on EVERY consuming branch, and the cached plan answers identically.
    import graft.operators.{Sampling, TextAnalysis}
    import org.apache.spark.sql.functions.col
    val docs = (1L to 60L)
      .map(i => (i, s"tok${i % 7} tok${i % 3} shared words tok${i % 5}"))
      .toDF("doc_id", "text")
    val ref = (1L to 30L)
      .map(i => (i, s"tok${i % 4} shared words tok${i % 6}"))
      .toDF("doc_id", "text")
    def imts(df: org.apache.spark.sql.DataFrame): Int =
      "InMemoryTableScan".r
        .findAllIn(df.queryExecution.executedPlan.toString).size
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    try {
      // p42: tok feeds 2 branches, bg feeds 2 branches → >= 3 cache reads
      // (bg's own build reads tok's cache)
      val bgOn = TextAnalysis.bigramLmScore(docs, "doc_id", "text",
        persistGrams = true)
      assert(imts(bgOn) >= 3, bgOn.queryExecution.executedPlan.toString)
      assert(rows(bgOn) == rows(
        TextAnalysis.bigramLmScore(docs, "doc_id", "text")))
      // p55: rTok feeds 2 branches, uniCnt 3 consumers → >= 4 cache reads
      val ipOn = TextAnalysis.interpolatedLmScore(docs, ref, "doc_id",
        "text", persistCounts = true)
      assert(imts(ipOn) >= 4, ipOn.queryExecution.executedPlan.toString)
      assert(rows(ipOn) == rows(
        TextAnalysis.interpolatedLmScore(docs, ref, "doc_id", "text")))
      // p33: three branches off the tokenized corpus
      val coOn = TextAnalysis.collocationsPmi(docs, "text", minCount = 2,
        k = 20, persistTokens = true)
      assert(imts(coOn) >= 3, coOn.queryExecution.executedPlan.toString)
      assert(rows(coOn) == rows(
        TextAnalysis.collocationsPmi(docs, "text", minCount = 2, k = 20)))
      // p50: histogram + cut both read the cached input
      val withSrc = docs.withColumn("source",
        (col("doc_id") % 3).cast("string"))
      val tmOn = Sampling.temperatureMixture(withSrc, "source", "doc_id",
        0.5, 10, persistInput = true)
      assert(imts(tmOn) >= 2, tmOn.queryExecution.executedPlan.toString)
      assert(rows(tmOn) == rows(
        Sampling.temperatureMixture(withSrc, "source", "doc_id", 0.5, 10)))
    } finally spark.sharedState.cacheManager.clearCache()
  }
}
