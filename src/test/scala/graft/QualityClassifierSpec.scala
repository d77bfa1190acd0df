package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.QualityClassifier

/** Trainable hashed BoW quality classifier (p72): the learned boundary
  * separates disjoint-vocabulary classes, round-1 weights match the
  * hand-computed exact-integer gradient, training is deterministic, the
  * score is a function of TEXT (not the label), and guards.
  */
class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // two disjoint vocabularies: positives say "good", negatives "spam"
  private def corpus(nPos: Int, nNeg: Int) =
    ((0 until nPos).map(i => (i.toLong, "good clean prose text", true)) ++
      (nPos until nPos + nNeg).map(i =>
        (i.toLong, "spam junk noise garbage", false)))
      .toDF("doc_id", "text", "is_target")

  test("learned weights rank every target doc above every non-target doc") {
    val docs = corpus(6, 10)
    val top = QualityClassifier.scoreTopK(docs, "doc_id", "text",
        "is_target", buckets = 64, rounds = 3, lr = 0.01, k = 6)
      .select("id").as[Long].collect().toSet
    assert(top == (0L until 6L).toSet,
      s"top-6 must be exactly the positive class, got $top")
    // and the margin is real: min positive score > max negative score
    val all = QualityClassifier.scoreTopK(docs, "doc_id", "text",
        "is_target", buckets = 64, rounds = 3, lr = 0.01, k = 16)
      .as[(Long, Double)].collect().toMap
    val pos = (0L until 6L).map(all)
    val neg = (6L until 16L).map(all)
    assert(pos.min > neg.max)
  }

  test("round-1 weights equal the hand-computed exact-integer gradient step") {
    // w0 = 0 -> pred = 0 -> grad_b = sum(-y * cnt_b) / n; with 4 tokens
    // per doc, n = 4 docs (2 pos, 2 neg) and disjoint vocab the per-token
    // gradient is -2*1/4 (pos buckets) and +2*1/4 (neg buckets) when no
    // buckets collide, so w1 = -lr*grad
    val docs = corpus(2, 2)
    val w = QualityClassifier.train(docs, "doc_id", "text", "is_target",
      buckets = 512, rounds = 1, lr = 0.01)
    val nonZero = w.filter(_ != 0.0)
    // 8 distinct tokens; allow hash collisions to merge buckets, but on
    // 512 buckets the 8 tokens land apart (checked: 8 distinct weights)
    assert(nonZero.length == 8)
    assert(nonZero.count(_ > 0) == 4 && nonZero.count(_ < 0) == 4)
    val expect = BigDecimal(0.01 * 2.0 / 4.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(nonZero.forall(x => math.abs(x) == expect),
      s"per-bucket |w1| must be lr*2/4 = $expect, got ${nonZero.toSeq}")
  }

  test("training is deterministic run-to-run") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .withColumn("is_target", col("lang") === "de")
    val w1 = QualityClassifier.train(docs, "doc_id", "text", "is_target",
      buckets = 8, rounds = 3, lr = 0.001)
    val w2 = QualityClassifier.train(docs, "doc_id", "text", "is_target",
      buckets = 8, rounds = 3, lr = 0.001)
    assert(w1.toSeq == w2.toSeq)
    assert(w1.exists(_ != 0.0), "training must move some weight")
  }

  test("the score is a function of text, not of the label") {
    // a mislabeled doc with target-like text must still score high: the
    // label steers TRAINING, never the score
    val docs = (corpus(6, 10).collect().map(r =>
        (r.getLong(0), r.getString(1), r.getBoolean(2))).toSeq :+
        ((99L, "good clean prose text", false)))
      .toDF("doc_id", "text", "is_target")
    val all = QualityClassifier.scoreTopK(docs, "doc_id", "text",
        "is_target", buckets = 64, rounds = 3, lr = 0.01, k = 17)
      .as[(Long, Double)].collect().toMap
    assert(all(99L) == all(0L),
      "identical text must score identically regardless of label")
  }

  test("degenerate parameters are rejected") {
    val docs = corpus(1, 1)
    intercept[IllegalArgumentException] {
      QualityClassifier.train(docs, "doc_id", "text", "is_target",
        buckets = 1)
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.scoreTopK(docs, "doc_id", "text", "is_target",
        rounds = 0)
    }
  }
}
