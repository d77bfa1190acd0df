package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank — the second iterative fixed-point graph algorithm beside
  * [[ConnectedComponents]] (label propagation): rank flows along edges,
  * rank(v) = (1−d)/N + d · Σ_{u→v} rank(u)/outdeg(u), iterated a fixed
  * number of rounds from the uniform vector. The simplified model
  * (dangling rank leaks, fixed iteration count) keeps every value a
  * closed-form arithmetic function of the edge set — deterministically
  * mirrorable by an unrolled SQL oracle.
  *
  * Scale design (100 TB edge sets): each round is one edges⋈ranks
  * equi-join + a partial-agg sum per destination — the same
  * shuffle-per-round shape as ConnectedComponents, with lineage cut by
  * `localCheckpoint` every round so the plan does not grow with the
  * iteration count (the spark.ml iterative idiom). Out-degrees are
  * computed once. Ranks/degrees are node-sized (≪ edges); AQE picks
  * broadcast vs shuffle for the per-round join by measured size. The
  * one driver-side scalar is N (a count job), needed by the teleport
  * term.
  */
object PageRank {

  /** Ranks after `iterations` rounds over `edges` (cols: src, dst).
    * Every node appearing as src or dst participates. Output: (node,
    * rank), unnormalized by convention (sums to ≤ 1 when dangling nodes
    * exist — their rank leaks, as in the simplified textbook model).
    */
  def run(edges: DataFrame, iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val e = edges.select(col("src"), col("dst"))
    // deg and nodes are read EVERY round — checkpoint both, or each
    // round's contribs job re-aggregates the full edge set (10 extra
    // corpus-scale scans at 10 iterations)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .transform(Materialize.cut)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .transform(Materialize.cut)
    val n = nodes.count().toDouble
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      val contribs = e.join(ranks, e("src") === ranks("node"))
        .join(deg, "src")
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy("node").agg(sum("c").as("flowed"))
      ranks = nodes.join(contribs, Seq("node"), "left_outer")
        .select(col("node"),
          (lit((1 - damping) / n) +
            lit(damping) * coalesce(col("flowed"), lit(0.0))).as("rank"))
        .transform(Materialize.cut) // cut lineage: plan size constant per round
    }
    ranks
  }
}
