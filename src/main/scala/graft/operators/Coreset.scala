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
  * Scale: round r scans the corpus once with a per-row expression over
  * the r PLAN-LITERAL centers picked so far (SemanticDedup's
  * centroids-as-literals move — no join, no shuffle; the only wide op
  * per round is a TakeOrdered of ONE row). Total cost O(k · corpus)
  * distance evaluations, the canonical FPF bill; driver state is the
  * O(k · dims) center list, a parameter not a data size. The corpus
  * projection is persisted for the k passes and unpersisted before
  * returning (the operator is EAGER — selection is inherently
  * sequential). For k beyond the literal-plan comfort zone (~hundreds),
  * the standard scale-out is hierarchical FPF over a pre-sample.
  */
object Coreset {

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
      def distTo(center: Array[Double]): Column =
        round(sqrt(aggregate(
          zip_with(col("v"), array(center.map(lit): _*),
            (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x)), 6)
      val seed = base.orderBy("id").limit(1)
        .select(col("id"), col("v")).as[(Long, Seq[Double])].head()
      var centers = Vector((seed._1, seed._2.toArray, 0.0))
      while (centers.size < k) {
        val ds = centers.map(c => distTo(c._2))
        val md = if (ds.size == 1) ds.head else least(ds: _*)
        // already-selected ids are excluded explicitly: a duplicate
        // embedding's md hits 0 once its twin is picked, and an
        // all-zero tail must still select k DISTINCT points
        val next = base
          .filter(!col("id").isin(centers.map(_._1): _*))
          .select(col("id"), col("v"), md.as("md"))
          .orderBy(col("md").desc, col("id").asc).limit(1)
          .as[(Long, Seq[Double], Double)].head()
        centers = centers :+ ((next._1, next._2.toArray, next._3))
      }
      centers.zipWithIndex
        .map { case ((id, _, d), i) => (i + 1, id, d) }
        .toDF("sel_round", "id", "dist")
    } finally base.unpersist(): Unit
  }
}
