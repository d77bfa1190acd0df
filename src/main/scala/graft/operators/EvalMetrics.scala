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
  * running sum over the checkpointed order, O(partitions) offset
  * collect re-entering as a broadcast join; never a SinglePartition
  * window) yields each score's
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
      .transform(Materialize.cut) // pin layout: offset collect and main plan must
                         // see the SAME pids (p76's contract)
    // Per-partition running sum of nn. The checkpoint's ExistingRDD
    // reports unknown partitioning, so a Window.partitionBy(pid) here
    // re-shuffles and re-sorts the histogram it already has in order
    // (round-16 ExplainQ finding: an extra Exchange+Sort in both the
    // offsets job and the main job); a mapPartitions running sum uses
    // the checkpointed order directly — zero exchanges, same integers.
    val cumSchema = parted.schema
      .add(org.apache.spark.sql.types.StructField("cum_nn",
        org.apache.spark.sql.types.LongType, nullable = false))
    // resolve nn by NAME once per partition — a hard-coded ordinal would
    // silently sum the wrong column if the upstream select ever reorders
    val nnIdx = parted.schema.fieldIndex("nn")
    val local = parted.mapPartitions { it =>
      var acc = 0L
      it.map { r =>
        acc += r.getLong(nnIdx)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ acc)
      }
    }(org.apache.spark.sql.Encoders.row(cumSchema))
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

  /** Calibration report — the reliability-diagram bins behind Expected
    * Calibration Error: rows binned by score over the OBSERVED score
    * range (the [min, max] pair rides in as a 1-row broadcast — exact
    * values, so bin edges are bit-identical on every engine), and each
    * bin reports size, mean score ("confidence"), and positive fraction
    * ("accuracy"). A well-calibrated scorer tracks the diagonal; the
    * quality/difficulty scorers the engine trains (p72) and the
    * heuristic signals it gates on should be CHECKED here before their
    * thresholds ship. Scores pre-rounded 6dp; the only order-sensitive
    * float op is the per-bin mean, rounded after the sum (p55's
    * regime). Output: (bin, lo, hi, n, mean_score, frac_pos).
    */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need >= 2 bins, got $bins")
    val s = df.select(round(col(scoreCol).cast("double"), 6).as("s"),
      when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("y"))
    val mm = s.agg(min("s").as("mn"), max("s").as("mx"))
    val b = bins.toDouble
    s.crossJoin(broadcast(mm))
      .withColumn("bin",
        when(col("mx") === col("mn"), lit(0))
          .otherwise(least(
            floor((col("s") - col("mn")) / (col("mx") - col("mn")) * b),
            lit(b - 1)).cast("int")))
      .groupBy("bin", "mn", "mx")
      .agg(count(lit(1)).as("n"),
        round(sum("s") / count(lit(1)), 6).as("mean_score"),
        round(sum("y").cast("double") / count(lit(1)), 6).as("frac_pos"))
      .select(col("bin"),
        round(col("mn") + col("bin") * (col("mx") - col("mn")) / b, 6)
          .as("lo"),
        round(col("mn") + (col("bin") + 1) * (col("mx") - col("mn")) / b, 6)
          .as("hi"),
        col("n"), col("mean_score"), col("frac_pos"))
  }

  /** Discount weight 1/log2(r+1) per rank, and its prefix sums (IDCG for
    * n relevant), computed ONCE in Scala — both the engine plan and the
    * DuckDB oracle embed these very doubles as literals, so the only
    * float ops at query time are a deterministic left fold and one
    * division (the p83 shared-constant discipline).
    */
  def dcgWeights(k: Int): Seq[Double] =
    (1 to k).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))
  def idcgPrefix(k: Int): Seq[Double] = dcgWeights(k).scanLeft(0.0)(_ + _)

  /** Per-query ranked-retrieval metrics — recall@k, MRR, nDCG@k — for a
    * label-match relevance model: a result is relevant iff it carries
    * the query's label, and a query's total relevant count is its
    * label's corpus frequency minus itself. `ranked` carries
    * (qid, nid, rank) with rank 1-based and <= k per query (p09's
    * brute-force output, or any ANN path's); `labels` carries
    * (vec_id, label).
    *
    * Scale shape: two broadcast label joins onto the ranked rows (k·|Q|
    * rows — results-sized, not corpus-sized), one per-query partial agg
    * whose only list state is the k-bounded (rank, rel) array, and the
    * label-frequency table rides in as a broadcast. DCG folds the
    * SORTED array left-to-right against the literal weights, so the
    * metric is bit-stable across engines and partitionings.
    */
  def labelRetrievalMetrics(ranked: DataFrame, labels: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 63, s"need 1 <= k <= 63, got $k")
    val lab = labels.select(col("vec_id"), col("label"))
    val cnt = lab.groupBy("label").agg(count(lit(1)).as("lab_n"))
    val t = ranked.select(col("qid"), col("nid"), col("rank"))
      .join(broadcast(lab.select(col("vec_id").as("qid"),
        col("label").as("qlab"))), "qid")
      .join(broadcast(lab.select(col("vec_id").as("nid"),
        col("label").as("nlab"))), "nid")
      .withColumn("rel", (col("qlab") === col("nlab")).cast("int"))
    val wArr = array(dcgWeights(k).map(lit): _*)
    val idcgArr = array(idcgPrefix(k).map(lit): _*)
    val g = t.groupBy("qid", "qlab")
      .agg(sort_array(collect_list(struct(col("rank"), col("rel"))))
          .as("rr"),
        sum("rel").as("hits"),
        min(when(col("rel") === 1, col("rank"))).as("first_rel"))
      .join(broadcast(cnt.withColumnRenamed("label", "qlab")), "qlab")
      .withColumn("n_rel", col("lab_n") - 1)
    val dcg = aggregate(col("rr"), lit(0.0), (a, x) =>
      a + x.getField("rel") * element_at(wArr, x.getField("rank")))
    val idcg = element_at(idcgArr,
      least(col("n_rel"), lit(k.toLong)).cast("int") + 1)
    g.select(col("qid"), col("n_rel"), col("hits"),
      when(col("n_rel") > 0,
        round(col("hits").cast("double") / col("n_rel"), 6))
        .as(s"recall_at_$k"),
      coalesce(round(lit(1.0) / col("first_rel"), 6), lit(0.0)).as("mrr"),
      when(least(col("n_rel"), lit(k.toLong)) > 0,
        round(dcg / idcg, 6)).as(s"ndcg_at_$k"))
  }
}
