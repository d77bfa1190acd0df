package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier/ranker evaluation metrics, exact and distributed — the
  * measurement half of the curation stack (the p72 quality classifier,
  * DSIR weights, p51 difficulty bins all emit scores whose OPERATING
  * QUALITY someone must certify before a trillion-token filter runs).
  *
  * AUC-ROC is computed exactly as the Mann-Whitney U statistic with
  * midrank tie handling: group rows by 6dp-rounded score (one partial
  * agg, distinct-score-sized), then a TWO-PHASE global cumulative scan
  * (p76 packing's pattern — range-repartition by score, per-partition
  * window, O(partitions) offset collect re-entering as a broadcast
  * join; never a SinglePartition window) yields each score's
  * negatives-below count, and U2 = Σ np·(2·negBelow + nnAt) stays in
  * exact integer arithmetic until the single final division — so the
  * result is bit-identical across engines and partitionings (the
  * engine-invariance rule: one deterministic division, no float
  * accumulation).
  */
object EvalMetrics {

  /** One row: (n_pos, n_neg, n_scores, auc). `labelCol` is truthy
    * (non-zero/true = positive); scores are rounded to 6dp BEFORE
    * grouping, so ties are decided identically on every engine. AUC is
    * null when either class is empty.
    */
  def aucRoc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val s = df.select(round(col(scoreCol).cast("double"), 6).as("score"),
      when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("y"))
    val g = s.groupBy("score")
      .agg(sum(col("y")).as("np"), sum(lit(1L) - col("y")).as("nn"))
    val parted = g.repartitionByRange(col("score"))
      .sortWithinPartitions("score")
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // pin layout: offset collect and main plan must
                         // see the SAME pids (p76's contract)
    val w = Window.partitionBy("pid").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("cum_nn", sum("nn").over(w))
    val totals = local.groupBy("pid").agg(max("cum_nn").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = {
      var acc = 0L
      totals.map { case (pid, t) => val o = (pid, acc); acc += t; o }
    }.toSeq.toDF("pid", "offset")
    local.join(broadcast(offsets), Seq("pid"))
      .withColumn("below", col("offset") + col("cum_nn") - col("nn"))
      .agg(
        sum(col("np") * (lit(2L) * col("below") + col("nn"))).as("u2"),
        sum("np").as("n_pos"), sum("nn").as("n_neg"),
        count(lit(1)).as("n_scores"))
      .select(col("n_pos"), col("n_neg"), col("n_scores"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("u2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), 6))
          .as("auc"))
  }
}
