package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Anonymize, Decontaminate, Embeddings, Sampling, TextAnalysis, TfIdf}

class PipelineExtSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val eval = Seq(
    (100L, "the quick brown fox jumps"),
    (101L, "pack my box with five dozen jugs"))
    .toDF("doc_id", "text")

  private val train = Seq(
    (1L, "the quick brown fox sleeps"),            // shares "the quick brown", "quick brown fox"
    (2L, "completely unrelated words here now"),   // clean
    (3L, "pack my box with care"),                 // shares "pack my box" (+ "my box with")
    (4L, "fox jumps"))                             // too short for 3-grams
    .toDF("doc_id", "text")

  test("quality gate: each rule fires on its fixture, first-failure attribution, clean doc keeps") {
    val docs = Seq(
      (1L, "a clean sentence with enough ordinary words here"), // keeps
      (2L, "too short"),                                        // too_short
      (3L, "spam spam spam spam spam spam ham eggs"),           // repetitive
      (4L, "a bb cc " + "x" * 200 + " dd ee ff gg hh"),         // token_length
      (5L, "no no no")                                          // short AND repetitive -> FIRST rule wins
    ).toDF("doc_id", "text")
    val got = TextAnalysis.qualityGate(docs, "doc_id", "text")
      .select("doc_id", "keep", "fail_reason")
      .as[(Long, Boolean, String)].collect()
      .map { case (id, k, r) => id -> ((k, r)) }.toMap
    assert(got(1L) == ((true, null)))
    assert(got(2L) == ((false, "too_short")))
    assert(got(3L) == ((false, "repetitive")))
    assert(got(4L) == ((false, "token_length")))
    assert(got(5L) == ((false, "too_short")), "attribution order: first failing rule")

    // NULL text: every other predicate is NULL and would fall through
    // the chain — the explicit first rule must catch it as a drop
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(6L, null.asInstanceOf[String]))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val nullRow = TextAnalysis.qualityGate(withNull, "doc_id", "text")
      .select("keep", "fail_reason").as[(Boolean, String)].collect().head
    assert(nullRow == ((false, "empty")), nullRow.toString)
  }

  test("encoding gate: control chars, replacement chars and null text all trip the gate") {
    val docs = Seq(
      (1L, "clean ascii text"),                     // keeps
      (2L, "tab\tand\nnewline are fine\r"),         // \t\n\r exempt: keeps
      (3L, "binary \u0001junk\u0002 here"),           // C0 controls: drops
      (4L, "decoder lost �� this"),       // replacement chars: drops
      (5L, "naïve café — non-ascii but valid"),     // keeps, ratio < 1
      (6L, "")                                      // empty: keeps (nothing wrong)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.encodingGate(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._5))).toMap
    assert(got(1L) == ((0L, 0L, true)))
    assert(got(2L) == ((0L, 0L, true)), "tab/newline/cr must not count as control")
    assert(got(3L) == ((2L, 0L, false)))
    assert(got(4L) == ((0L, 2L, false)))
    assert(got(5L) == ((0L, 0L, true)))
    assert(got(6L) == ((0L, 0L, true)))
    // ratio: doc 5 has 4 non-ascii chars (ï, é, —, and none else)
    val r5 = TextAnalysis.encodingGate(docs.filter($"doc_id" === 5), "doc_id", "text")
      .select("ascii_ratio").as[Double].head()
    val t5 = "naïve café — non-ascii but valid"
    val exp = math.rint(t5.count(c => c >= 0x20 && c <= 0x7E).toDouble / t5.length * 1e6) / 1e6
    assert(r5 == exp)
    // null text: gated out, not NULL-propagated
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(7L, null.asInstanceOf[String]))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val nr = TextAnalysis.encodingGate(withNull, "doc_id", "text")
      .as[(Long, Long, Long, Double, Boolean)].collect().head
    assert(nr == ((7L, 0L, 0L, 0.0, false)), nr.toString)
  }

  test("ngram novelty: first-occurrence fractions match hand computation") {
    val docs = Seq(
      (1L, "a b c d"),        // grams "a b c","b c d" — both first here
      (2L, "a b c d e"),      // "a b c","b c d" seen; "c d e" novel -> 1/3
      (3L, "a b c"),          // "a b c" seen -> 0
      (4L, "z"),              // no grams: excluded from output
      (5L, "x y z w")         // all novel -> 1.0
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(docs, "doc_id", "text", 3)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, g, nv, f) => id -> ((g, nv, f)) }.toMap
    assert(got == Map(
      1L -> ((2L, 2L, 1.0)),
      2L -> ((3L, 1L, 0.333333)),
      3L -> ((1L, 0L, 0.0)),
      5L -> ((2L, 2L, 1.0))))
    // duplicate grams inside one doc count once (distinct per doc)
    val dup = TextAnalysis.ngramNovelty(
      Seq((9L, "p q r p q r p q r")).toDF("doc_id", "text"),
      "doc_id", "text", 3).as[(Long, Long, Long, Double)].collect().head
    // 7 gram positions but only 3 distinct grams ("p q r","q r p","r p q")
    assert(dup._2 == 3L, s"distinct grams of the repeated phrase: $dup")
  }

  test("decontaminate: overlap counts = distinct shared n-grams per doc") {
    val got = Decontaminate
      .overlapCounts(train, eval, "doc_id", "text", n = 3)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (3L, 2L)))
  }

  test("decontaminate: clean() drops contaminated docs, keeps payload intact") {
    val kept = Decontaminate.clean(train, eval, "doc_id", "text", n = 3)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(kept == Seq(
      (2L, "completely unrelated words here now"),
      (4L, "fox jumps")))
  }

  test("decontaminate: corpus side is never shuffled (broadcast join plan)") {
    val plan = Decontaminate
      .overlapCounts(train, eval, "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // in treeString the streamed (train) subtree prints between the join
    // node and the BroadcastExchange of the eval side: that segment must
    // be shuffle-free (the eval side's distinct may shuffle — it's tiny)
    val joinDown = plan.substring(plan.indexOf("BroadcastHashJoin"))
    val trainSide = joinDown.substring(0, joinDown.indexOf("BroadcastExchange"))
    assert(!trainSide.contains("Exchange hashpartitioning"), plan)
  }

  test("decontaminate: shuffled fallback (broadcastEval=false) equals the broadcast path") {
    // the too-big-to-broadcast escape: same distinct-overlap output and
    // clean() survivors on both join strategies
    val bc = Decontaminate.overlapCounts(train, eval, "doc_id", "text", n = 3)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val sh = Decontaminate.overlapCounts(train, eval, "doc_id", "text", n = 3,
        broadcastEval = Some(false))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(sh == bc && sh == Seq((1L, 2L), (3L, 2L)))
    val keptSh = Decontaminate.clean(train, eval, "doc_id", "text", n = 3,
        broadcastEval = Some(false))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(keptSh.map(_._1) == Seq(2L, 4L))
  }

  test("decontaminate: auto-switch picks each path by eval gram count, identical output at the boundary") {
    // the eval fixture yields 6 distinct 3-grams; a threshold of exactly
    // 6 sits ON the boundary (<= keeps broadcast), 5 tips it over to the
    // shuffled join — same rows either way, strategy proven from the plan
    val nGrams = eval.select(explode(graft.functions.Fns.shingles(
        graft.functions.Fns.tokens(col("text")), 3)).as("g"))
      .distinct().count()
    val under = Decontaminate.overlapCounts(train, eval, "doc_id", "text",
      n = 3, maxBroadcastGrams = nGrams)
    val over = Decontaminate.overlapCounts(train, eval, "doc_id", "text",
      n = 3, maxBroadcastGrams = nGrams - 1)
    assert(under.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val overPlan = over.queryExecution.executedPlan.toString
    assert(overPlan.contains("ShuffledHashJoin") &&
      !overPlan.contains("BroadcastHashJoin"), overPlan)
    assert(under.orderBy("id").as[(Long, Long)].collect().toSeq ==
      over.orderBy("id").as[(Long, Long)].collect().toSeq)
  }

  test("decontaminate: shuffled fallback plans a shuffled hash join, no broadcast of eval grams") {
    val plan = Decontaminate
      .overlapCounts(train, eval, "doc_id", "text", n = 3, broadcastEval = Some(false))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan)
    // the gram join must not smuggle the eval side in via broadcast —
    // the whole point of the fallback is bounded per-executor memory
    assert(!plan.contains("BroadcastHashJoin"), plan)
  }

  test("reference-LM score: in-vocabulary text scores below OOV text") {
    import graft.operators.TextAnalysis
    val ref = Seq((100L, "alpha beta gamma alpha beta"),
      (101L, "beta gamma delta")).toDF("doc_id", "text")
    val docs = Seq((1L, "alpha beta gamma"), // fully in-vocab
      (2L, "qqq zzz xxx")).toDF("doc_id", "text") // fully OOV
    val got = TextAnalysis.refLmScore(docs, ref, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Double)].collect()
    assert(got(0)._2 < got(1)._2, got.mkString(","))
    // every OOV token has the same smoothed probability 1/(N+V+1), so
    // doc 2's score is exactly -ln(1/(8+4+1))
    assert(math.abs(got(1)._2 - math.log(13.0)) < 1e-6, got(1).toString)
  }

  test("corpus drift: KL is zero on identical slices, rises under boilerplate injection") {
    import graft.operators.Drift
    val base = Seq((1L, "alpha beta gamma delta"), (2L, "beta gamma epsilon"),
      (3L, "alpha epsilon zeta")).toDF("doc_id", "text")
    val same = Drift.tokenKl(base, base, "text")
      .as[(Long, Double, Double)].head()
    assert(same._2 == 0.0 && same._3 == 0.0)
    // injected boilerplate shifts the candidate distribution: both KL
    // directions must strictly exceed the identical-slices baseline
    val polluted = base.union(Seq(
      (4L, "cookie policy cookie policy cookie policy"),
      (5L, "cookie policy cookie policy cookie policy")).toDF("doc_id", "text"))
    val drift = Drift.tokenKl(base, polluted, "text")
      .as[(Long, Double, Double)].head()
    assert(drift._2 > 0.0 && drift._3 > 0.0, drift.toString)
    assert(drift._1 > same._1) // union vocab grew
  }

  test("corpus drift: KL is non-negative on random corpora (Gibbs, seeded property)") {
    import graft.operators.Drift
    val rnd = new scala.util.Random(29)
    val vocab = ('a' to 'p').map(_.toString)
    def corpus(skew: Int) = (1 to 20).map { i =>
      val words = (1 to 5 + rnd.nextInt(15)).map { _ =>
        vocab(math.min(rnd.nextInt(vocab.size) / skew, vocab.size - 1))
      }
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    for (trial <- 1 to 3) {
      val r = Drift.tokenKl(corpus(1), corpus(1 + trial), "text")
        .as[(Long, Double, Double)].head()
      assert(r._2 >= 0.0 && r._3 >= 0.0, s"trial $trial: $r")
    }
  }

  test("repetition metrics match hand computation") {
    val df = Seq(
      (1L, "a a a a"),        // words 4/1 distinct; 2-grams 3 occ/1 distinct; 3-grams 2/1
      (2L, "a b a b a"),      // words 5/2; 2-grams 4 occ/2 distinct; 3-grams 3/2
      (3L, "x y z"),          // all distinct
      (4L, "x"))              // too short for 2/3-grams -> 0.0
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id") +:
        TextAnalysis.repetitionColumns(col("text")): _*)
      .orderBy("doc_id")
      .as[(Long, Double, Double, Double)].collect().toSeq
    def r(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got == Seq(
      (1L, 0.75, r(2.0 / 3), 0.5),
      (2L, 0.6, 0.5, r(1.0 / 3)),
      (3L, 0.0, 0.0, 0.0),
      (4L, 0.0, 0.0, 0.0)))
  }

  test("int8 quantization: max element hits ±127, zero vector is all-zero") {
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)), // maxabs 1.0 -> codes 64, -127, 32
      (2L, Seq(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Embeddings.quantizeInt8(df, "vec_id", "embedding")
      .orderBy("vec_id")
      .as[(Long, Double, Seq[Int])].collect().toSeq
    assert(got == Seq((1L, 1.0, Seq(64, -127, 32)), (2L, 0.0, Seq(0, 0, 0))))
  }

  test("int8 digest checksum pins codes and positions") {
    val df = Seq((1L, Seq(0.5f, -1.0f, 0.25f))).toDF("vec_id", "embedding")
    val got = Embeddings.int8Digest(df, "vec_id", "embedding")
      .as[(Long, Long, Double, Double, Long)].collect().head
    // 1*64 + 2*(-127) + 3*32 = -94; norm = sqrt(0.25 + 1 + 0.0625)
    assert(got == ((1L, 3L, math.rint(math.sqrt(1.3125) * 1e6) / 1e6, 1.0, -94L)))
  }

  test("normalized() yields unit vectors and passes zero vectors through") {
    val df = Seq((1L, Seq(3.0f, 4.0f)), (2L, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"),
        Embeddings.normalized(col("embedding")).as("u"))
      .orderBy("vec_id").as[(Long, Seq[Double])].collect().toSeq
    assert(got.head._2.map(x => math.rint(x * 100) / 100) == Seq(0.6, 0.8))
    assert(got(1)._2 == Seq(0.0, 0.0))
  }

  test("anonymize: digit masking, salted pseudonym, bucket generalization") {
    val df = Seq(("Customer#042", 2543.75), ("Customer#042", -12.5))
      .toDF("name", "bal")
    val got = df.select(
        Anonymize.maskDigits(col("name")).as("m"),
        Anonymize.pseudonym(col("name"), "s1").as("p1"),
        Anonymize.pseudonym(col("name"), "s2").as("p2"),
        Anonymize.generalize(col("bal"), 1000L).as("b"))
      .as[(String, String, String, Long)].collect().toSeq
    assert(got.map(_._1).distinct == Seq("Customer####"))
    assert(got.head._2 == got(1)._2)            // deterministic
    assert(got.head._2 != got.head._3)          // salt changes the pseudonym
    assert(got.head._2.matches("[0-9a-f]{64}"))
    assert(got.map(_._4) == Seq(2000L, -1000L)) // floor, not truncate
  }

  test("embedding drift: identical slices read zero; a planted mean shift reads its exact smd") {
    import graft.operators.Drift
    val base = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(4)(d => ((i * 7 + d * 3) % 11 - 5).toFloat))
    }
    val ref = base.toDF("vec_id", "embedding")
    // self-drift: every smd is exactly 0, means/vars agree
    val self = Drift.embeddingDrift(ref, ref, "embedding", 4)
      .as[(Long, Double, Double, Double, Double, Option[Double])].collect()
    assert(self.length == 4)
    self.foreach { r =>
      assert(r._2 == r._3 && r._4 == r._5 && r._6.contains(0.0))
    }
    // shift dim 0 by +2.0 in the candidate: smd = 2 / sqrt(var) there,
    // exactly 0 elsewhere (variance unchanged by a constant shift)
    val cand = base.map { case (id, v) =>
      (id, v.zipWithIndex.map { case (x, d) => if (d == 0) x + 2.0f else x })
    }.toDF("vec_id", "embedding")
    val got = Drift.embeddingDrift(ref, cand, "embedding", 4)
      .orderBy("dim")
      .as[(Long, Double, Double, Double, Double, Option[Double])].collect()
    assert(got(0)._3 == got(0)._2 + 2.0)
    val exp = BigDecimal(2.0 / math.sqrt(got(0)._4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0)._6.contains(exp))
    (1 until 4).foreach(d => assert(got(d)._6.contains(0.0), s"dim $d"))
    // zero-variance dimension -> null smd, no crash
    val flat = Seq((1L, Array(1.0f)), (2L, Array(1.0f))).toDF("vec_id", "embedding")
    val z = Drift.embeddingDrift(flat, flat, "embedding", 1)
      .as[(Long, Double, Double, Double, Double, Option[Double])].collect()
    assert(z.head._6.isEmpty)
  }

  test("pii: detection counts on original text, class-ordered scrub, no cross-class rematch") {
    val df = Seq(
      (1L, "mail a.b+c@test.org and x@y.io, host 10.0.0.1, acct 12345678"),
      (2L, "no pii here, short num 12345, bad ip 10.0.0"),
      (3L, "")).toDF("doc_id", "text")
    val got = Anonymize.piiReport(df, "doc_id", "text")
      .orderBy("id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got(0) == ((1L, 2L, 1L, 1L,
      "mail [EMAIL] and [EMAIL], host [IP], acct [ID]")))
    // 5-digit run is below the id floor; a 3-octet dotted pair is not an
    // IPv4 — near-misses must not scrub
    assert(got(1) == ((2L, 0L, 0L, 0L,
      "no pii here, short num 12345, bad ip 10.0.0")))
    assert(got(2) == ((3L, 0L, 0L, 0L, "")))
    // a digit run embedded in an email's local part has no leading word
    // boundary (letter->digit is word-internal), so the id pattern never
    // fires inside it — the whole address is consumed by the EMAIL pass
    val leak = Anonymize.piiReport(
        Seq((9L, "user1234567@test.org")).toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Long, Long, String)].collect().head
    assert(leak == ((9L, 1L, 0L, 0L, "[EMAIL]")))
  }

  test("NFC normalization: decomposed accents compose, fast path intact") {
    import graft.functions.{Fns, NormalizeNFC}
    import org.apache.spark.unsafe.types.UTF8String
    val decomposed = "cafe\u0301 nai\u0308ve" // e + U+0301, i + U+0308
    val composed = "caf\u00e9 na\u00efve"
    val rows = Seq(decomposed, composed, "plain ascii", "日本語")
      .toDF("t")
      .select($"t", Fns.normalizeNfc($"t").as("n"),
        graft.operators.TextAnalysis.normalizeText($"t").as("full"))
      .as[(String, String, String)].collect()
    assert(rows(0)._2 == composed)            // composition happened
    assert(rows(1)._2 == composed)            // already-NFC unchanged
    assert(rows(2)._2 == "plain ascii")
    assert(rows(3)._2 == "日本語")
    assert(rows(0)._3 == rows(1)._3)          // normalizeText unifies both
    // codegen path == direct JVM call
    rows.foreach { case (t, n, _) =>
      assert(n == NormalizeNFC.nfc(UTF8String.fromString(t)).toString)
    }
    // whitespace collapse + lower + trim
    val messy = Seq("  A\tB\n\nC  ").toDF("t")
      .select(graft.operators.TextAnalysis.normalizeText($"t"))
      .as[String].head()
    assert(messy == "a b c")
  }

  test("per-stratum sample: exact k, layout-invariant, TopKPerGroup plan") {
    val df = (1L to 500L).map(i => (i, s"s${i % 3}")).toDF("id", "stratum")
    val a = Sampling.perStratum(df.repartition(7), "stratum", "id", 5)
      .orderBy("stratum", "id").as[(Long, String)].collect().toSeq
    val b = Sampling.perStratum(df.repartition(2, col("id")), "stratum", "id", 5)
      .orderBy("stratum", "id").as[(Long, String)].collect().toSeq
    assert(a == b)                                   // layout-invariant
    assert(a.groupBy(_._2).values.forall(_.size == 5)) // exactly k each
    // small strata return all their rows, not an error
    val tiny = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "stratum")
    assert(Sampling.perStratum(tiny, "stratum", "id", 5).count() == 3)
    // planned through the custom physical operator, not a window
    val plan = Sampling.perStratum(df, "stratum", "id", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan)
    assert(!plan.contains("WindowExec"), plan)
  }

  test("mixture sample: per-stratum quotas, unlisted strata dropped") {
    val df = (1L to 300L).map(i => (i, s"s${i % 3}")).toDF("id", "stratum")
    val got = Sampling.mixture(df, "stratum", "id",
        Map("s0" -> 7, "s1" -> 3))
      .as[(Long, String)].collect().toSeq
    val bySize = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySize == Map("s0" -> 7, "s1" -> 3)) // s2 dropped (no quota)
    // quota rows are a PREFIX of perStratum's hash order — same ordering
    val ps = Sampling.perStratum(df, "stratum", "id", 7)
      .filter($"stratum" === "s0").as[(Long, String)].collect().toSeq
    assert(got.filter(_._2 == "s0").toSet == ps.toSet)
    // quota larger than the stratum returns the whole stratum
    val all = Sampling.mixture(df, "stratum", "id", Map("s2" -> 1000))
    assert(all.count() == 100)
  }

  test("tfidf: scores match hand computation, rarer term outranks common") {
    // 3 docs; "rare" appears only in doc 1, "the" in all three.
    val docs = Seq(
      (1L, "the rare the"),
      (2L, "the common words"),
      (3L, "the common stuff")).toDF("doc_id", "text")
    val got = TfIdf.scored(docs, "doc_id", "text")
      .orderBy("id", "term")
      .as[(Long, String, Long, Double)].collect().toSeq
    def idf(df: Long) = math.log(4.0 / (df + 1)) + 1.0
    val exp = Seq(
      (1L, "rare", 1L, 1 * idf(1)), (1L, "the", 2L, 2 * idf(3)),
      (2L, "common", 1L, 1 * idf(2)), (2L, "the", 1L, 1 * idf(3)),
      (2L, "words", 1L, 1 * idf(1)),
      (3L, "common", 1L, 1 * idf(2)), (3L, "stuff", 1L, 1 * idf(1)),
      (3L, "the", 1L, 1 * idf(3)))
    assert(got == exp)
    // top-1 of doc 2: the df=1 terms beat "common" (df=2) and "the" (df=3)
    val top = TfIdf.topTerms(docs, "doc_id", "text", 1)
      .filter($"id" === 2L).select("term").as[String].head()
    assert(top == "words")
  }

  test("tfidf: top-k planned through TopKPerGroup, N never collected") {
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val plan = TfIdf.topTerms(docs, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan)
    assert(!plan.contains("WindowExec"), plan)
    // corpus size joins in as a broadcast aggregate, not a driver collect
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }

  test("tfidf: persistTf caches the posting list — one materialized pass feeds both branches") {
    val docs = Seq(
      (1L, "the rare the"),
      (2L, "the common words"),
      (3L, "the common stuff")).toDF("doc_id", "text")
    val scored = TfIdf.scored(docs, "doc_id", "text", persistTf = true)
    try {
      val plan = scored.queryExecution.executedPlan.toString
      // both the df aggregate branch and the tf side of the join read the
      // cache: the tokenize+explode subtree materializes exactly once
      assert("InMemoryTableScan".r.findAllIn(plan).size >= 2, plan)
      val got = scored.orderBy("id", "term")
        .as[(Long, String, Long, Double)].collect().toSeq
      val exp = TfIdf.scored(docs, "doc_id", "text").orderBy("id", "term")
        .as[(Long, String, Long, Double)].collect().toSeq
      assert(got == exp)
    } finally spark.sharedState.cacheManager.clearCache()
  }

  test("projection sign matrix: ±1, decorrelated rows (avalanche regression)") {
    val signs = Embeddings.projectionSigns(8, 64)
    assert(signs.flatten.forall(s => s == 1.0 || s == -1.0))
    // raw-FNV-parity bug made every row pair exact (anti-)correlates;
    // with the avalanche mix |row_a . row_b| stays far from ±64
    for (a <- 0 until 8; b <- (a + 1) until 8) {
      val dot = (0 until 64).map(i => signs(a)(i) * signs(b)(i)).sum
      assert(math.abs(dot) < 32, s"rows $a,$b correlate: $dot")
    }
  }

  test("random projection: matches a literal-matrix hand fold") {
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f, 4.0f))).toDF("vec_id", "embedding")
    val got = Embeddings.randomProjection(df, "vec_id", "embedding",
      outDims = 2, inDims = 4).collect().head
    val signs = Embeddings.projectionSigns(2, 4)
    val v = Array(1.0, 2.0, 3.0, 4.0)
    def expect(j: Int) = {
      val dot = (0 until 4).map(i => v(i) * signs(j)(i)).sum
      BigDecimal(dot / math.sqrt(2.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.getDouble(1) == expect(0) && got.getDouble(2) == expect(1))
  }
}
