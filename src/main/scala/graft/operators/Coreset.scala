package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy k-center (farthest-point-first, Gonzalez 1985) coreset
  * selection over an embedding column — diversity-aware data selection:
  * pick k examples that COVER the embedding space (each new pick is the
  * point farthest from everything picked so far), the classic 2-approx
  * to the k-center objective and the selection rule behind
  * coreset/active-learning pipelines, where a diverse few beat a
  * redundant many for a fixed annotation or training budget
  * (north-star scope; complements [[Sampling]]'s frequency-driven rules
  * with a GEOMETRY-driven one).
  *
  * Determinism contract (engine-invariant, so an exact SQL oracle can
  * unroll the same k rounds): seed = min id; every pairwise distance is
  * euclidean ROUNDED to 6dp before any comparison; each round selects
  * max min-distance with ties to min id. Duplicate embeddings get
  * distance 0 after their twin is selected and can only be picked when
  * nothing positive remains — the selection degrades deterministically,
  * never fails.
  *
  * Scale — INCREMENTAL min-distance (the canonical FPF formulation):
  * the state is (id, v, md) where md = min distance to the selected set
  * so far. Each round computes exactly ONE new distance per surviving
  * row — `least(md, distTo(newCenter))` — instead of rebuilding
  * `least` over all r centers, so the total bill is O(k · corpus)
  * distance evaluations and the per-round plan carries exactly one
  * center literal regardless of r (round r of a rescan formulation
  * would carry r literals and cost O(k²/2 · corpus) total; the
  * equivalence `least(md_{r-1}, d_r) = least(d_1..d_r)` holds EXACTLY
  * under 6dp rounding because `round` is monotone, so min-of-rounded =
  * rounded-min — selection is bit-identical to the rescan path, which
  * CoresetSpec asserts). State is `localCheckpoint`ed per round to
  * truncate lineage (plan depth stays O(1), a task retry replays one
  * round, not the whole history); superseded checkpoints drop out of
  * scope and are reclaimed by Spark's ContextCleaner. The only wide op
  * per round is a TakeOrdered of ONE row; driver state is the
  * O(k · dims) center list, a parameter not a data size. For k beyond
  * the sequential-round comfort zone (~thousands), the standard
  * scale-out is hierarchical FPF over a pre-sample.
  */
object Coreset {

  private def distTo(center: Array[Double]): Column =
    round(sqrt(aggregate(
      zip_with(col("v"), array(center.map(lit): _*),
        (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)), 6)

  /** One FPF round's state transition: drop the just-selected center,
    * fold ONE new distance into the running min-distance column.
    * Exposed for the plan assert in CoresetSpec (exactly one distance
    * expression per round, independent of how many centers precede it).
    */
  private[graft] def nextState(state: DataFrame, centerId: Long,
      center: Array[Double]): DataFrame =
    state.filter(col("id") =!= centerId)
      .withColumn("md", least(col("md"), distTo(center)))

  /** The k selected points as (sel_round, id, dist): sel_round = 1-based
    * selection order, dist = the point's min-distance to the previously
    * selected set at selection time (0.0 for the seed).
    */
  def kCenter(embeddings: DataFrame, idCol: String, embCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val base = embeddings
      .select(col(idCol).cast("long").as("id"),
        col(embCol).cast("array<double>").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = base.count()
      require(n >= k, s"cannot select $k centers from $n points")
      val seed = base.orderBy("id").limit(1)
        .select(col("id"), col("v")).as[(Long, Seq[Double])].head()
      var centers = Vector((seed._1, seed._2.toArray, 0.0))
      if (k > 1) {
        // initial state: md = distance to the seed (one scan, one center)
        var state = base.filter(col("id") =!= seed._1)
          .select(col("id"), col("v"), distTo(seed._2.toArray).as("md"))
          .transform(Materialize.cut)
        while (centers.size < k) {
          val next = state
            .orderBy(col("md").desc, col("id").asc).limit(1)
            .as[(Long, Seq[Double], Double)].head()
          centers = centers :+ ((next._1, next._2.toArray, next._3))
          if (centers.size < k)
            state = nextState(state, next._1, next._2.toArray)
              .transform(Materialize.cut)
        }
      }
      centers.zipWithIndex
        .map { case ((id, _, d), i) => (i + 1, id, d) }
        .toDF("sel_round", "id", "dist")
    } finally base.unpersist(): Unit
  }
}
