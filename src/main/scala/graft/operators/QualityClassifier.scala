package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Trainable hashed bag-of-words quality classifier — the GPT-3-style
  * learned quality filter (Brown et al. 2020 trained a classifier to
  * score web documents against a trusted reference corpus and kept the
  * high scorers): a LINEAR model over hashed token-count features,
  * trained IN the engine by full-batch gradient descent on the squared
  * loss, then used to score and rank the corpus. Beside the selection
  * family this completes: [[Dsir]] matches distributions, [[Coreset]]
  * covers geometry, [[Sampling]] reweights frequencies — this one
  * LEARNS a decision boundary from labeled examples (the label can be
  * any trusted/untrusted split: a reference corpus flag, a human
  * audit, a heuristic gate's verdict).
  *
  * Determinism contract (what makes 3 rounds of training EXACTLY
  * oracle-able, the p65/q74 unrolled-iteration move): features are
  * RollingHash31-bucketed token counts (integers — the round-1
  * gradient is exact); labels are ±1; each round's gradient vector is
  * 6dp-rounded BEFORE the update and the updated weights are
  * 6dp-rounded again (BigDecimal HALF_UP, matching both engines'
  * double round), so the weight trajectory is bit-identical between
  * Spark and the oracle's unrolled CTEs; final scores are 6dp-rounded
  * and ranked with ties to min id.
  *
  * Scale: the corpus text is touched ONCE (tokenize → hash → per-doc
  * bucket counts, a partial agg); the persisted feature table is at
  * most `buckets` rows per doc. Each round is two aggregations over
  * that table (predictions per doc, then gradient per bucket) and ONE
  * O(buckets) driver collect — the weight vector is a parameter, not
  * a data size, and rides into the next round as plan literals
  * ([[SemanticDedup]]'s centroid move; no join against a weight
  * table). Rounds are a small constant; for buckets beyond the
  * literal-plan comfort zone the weight vector becomes a broadcast
  * join, same plan shape.
  */
object QualityClassifier {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Per-doc hashed token-count features with the ±1 label attached:
    * (id, b, cnt, y). One corpus-text pass.
    */
  private def features(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, buckets: Int): DataFrame =
    docs
      .select(col(idCol).cast("long").as("id"),
        when(col(labelCol), 1.0).otherwise(-1.0).as("y"),
        explode(Fns.tokens(col(textCol))).as("tok"))
      .select(col("id"), col("y"),
        pmod(Fns.rollingHash31(col("tok")), lit(buckets)).as("b"))
      .groupBy("id", "y", "b")
      .agg(count(lit(1)).cast("double").as("cnt"))

  private def trainOnFeatures(f: DataFrame, n: Double, buckets: Int,
      rounds: Int, lr: Double): Array[Double] = {
    var w = Array.fill(buckets)(0.0)
    for (_ <- 1 to rounds) {
      val wLit = array(w.map(lit): _*)
      // pred per doc under the current plan-literal weights, then the
      // squared-loss gradient per bucket: sum((pred - y) * cnt) / n
      val pred = f
        .groupBy("id", "y")
        .agg(sum(col("cnt") * element_at(wLit, (col("b") + 1).cast("int"))).as("pred"))
      val grad = f.join(pred.select("id", "pred"), Seq("id"))
        .groupBy("b")
        .agg(round(sum((col("pred") - col("y")) * col("cnt")) / n, 6)
          .as("g"))
        .collect().map(r => r.getAs[Number](0).intValue -> r.getDouble(1)).toMap
      w = w.zipWithIndex.map { case (wj, j) =>
        round6(wj - lr * grad.getOrElse(j, 0.0)) }
    }
    w
  }

  /** Train `rounds` full-batch GD rounds; returns the learned weight
    * vector (length `buckets`). `labelCol` must be boolean (true =
    * positive class).
    */
  def train(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, buckets: Int = 1024, rounds: Int = 3,
      lr: Double = 0.001): Array[Double] = {
    require(buckets >= 2 && rounds >= 1 && lr > 0,
      s"need buckets >= 2, rounds >= 1, lr > 0; got $buckets/$rounds/$lr")
    trainOnFeatures(
      features(docs, idCol, textCol, labelCol, buckets).transform(Materialize.cut),
      docs.count().toDouble, buckets, rounds, lr)
  }

  /** Train, score every doc under the learned weights, keep the top-k:
    * (id, score). Docs with zero tokens have no features and are
    * unscored (they carry no evidence either way). The feature table is
    * built once and shared between the training rounds and the final
    * scoring pass.
    */
  def scoreTopK(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, buckets: Int = 1024, rounds: Int = 3,
      lr: Double = 0.001, k: Int = 100): DataFrame = {
    require(buckets >= 2 && rounds >= 1 && lr > 0 && k >= 1,
      s"need buckets >= 2, rounds >= 1, lr > 0, k >= 1; " +
        s"got $buckets/$rounds/$lr/$k")
    val f = features(docs, idCol, textCol, labelCol, buckets)
      .transform(Materialize.cut)
    val w = trainOnFeatures(f, docs.count().toDouble, buckets, rounds, lr)
    val wLit = array(w.map(lit): _*)
    f.groupBy("id")
      .agg(round(sum(col("cnt") * element_at(wLit, (col("b") + 1).cast("int"))), 6)
        .as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }
}
