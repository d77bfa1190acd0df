package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance selection (Carbonell & Goldstein 1998) —
  * pick k items that are RELEVANT to a query vector but not REDUNDANT
  * with each other: round r selects
  * argmax λ·rel(d) − (1−λ)·max_{s∈S} cos(d, s). The retrieval-side
  * member of the selection family ([[Coreset]] covers the space with
  * no relevance signal; MMR trades coverage against closeness to a
  * query — RAG context assembly, diverse few-shot pools, eval-set
  * picking).
  *
  * Determinism contract (exact-oracle, the p65 lineage): rel = cosine
  * to the query, 6dp-rounded; every pairwise cosine is 6dp-rounded
  * before entering the running max; the running max starts at −1 (the
  * cosine floor, so round 1 is a pure relevance argmax up to a
  * constant shift — the textbook's first pick); scores are 6dp-rounded
  * before comparison, ties to min id.
  *
  * Scale — incremental like round-9 [[Coreset]]: state (id, v, rel,
  * ms) carries the running max-similarity-to-selected; each round
  * folds in exactly ONE new cosine (`greatest(ms, cos(v, picked))`,
  * the picked vector a plan literal), localCheckpoints to truncate
  * lineage, and the only wide op per round is a 1-row TakeOrdered —
  * O(k · corpus) similarity evaluations total, the same bill as FPF.
  */
object Mmr {

  private def cosTo(center: Array[Double]): Column = {
    val dot = aggregate(
      zip_with(col("v"), array(center.map(lit): _*), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    val nv = sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x))
    val nc = lit(math.sqrt(center.map(x => x * x).sum))
    round(dot / (nv * nc), 6)
  }

  /** The k selections as (sel_round, id, score): score = the 6dp MMR
    * objective at selection time.
    */
  def select(emb: DataFrame, idCol: String, embCol: String,
      queryVec: Array[Double], k: Int, lambda: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1], got $lambda")
    val spark = emb.sparkSession
    import spark.implicits._
    val base = emb.select(col(idCol).cast("long").as("id"),
      col(embCol).cast("array<double>").as("v"))
    var state = base
      .withColumn("rel", cosTo(queryVec))
      .withColumn("ms", lit(-1.0))
      .transform(Materialize.cut)
    val n = state.count()
    require(n >= k, s"cannot select $k of $n items")
    var picked = Vector.empty[(Long, Array[Double], Double)]
    while (picked.size < k) {
      val score = round(lit(lambda) * col("rel") -
        lit(1.0 - lambda) * col("ms"), 6)
      val next = state.select(col("id"), col("v"), score.as("score"))
        .orderBy(col("score").desc, col("id").asc).limit(1)
        .as[(Long, Seq[Double], Double)].head()
      picked = picked :+ ((next._1, next._2.toArray, next._3))
      if (picked.size < k)
        state = state.filter(col("id") =!= next._1)
          .withColumn("ms", greatest(col("ms"), cosTo(next._2.toArray)))
          .transform(Materialize.cut)
    }
    picked.zipWithIndex
      .map { case ((id, _, s), i) => (i + 1, id, s) }
      .toDF("sel_round", "id", "score")
  }
}
