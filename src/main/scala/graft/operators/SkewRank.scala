package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.TopKPerGroup

/** Skew-safe ranking: top-k per group in two salted phases — the answer
  * to SCALE.md's "a single key with billions of rows" window breaker.
  *
  * A plain `row_number().over(partitionBy(group))` (and equally a single
  * TopKPerGroup final) must route EVERY surviving row of a group through
  * one reducer task: with TopKPerGroup's map-side partial that is
  * k × input-partitions rows per group — bounded, but still concentrated
  * on one task per group (at 100k input partitions, 100k·k rows of one
  * hot group in one reducer). Salting splits that reducer `salts` ways:
  *
  *   phase 1: exact top-k per (group, salt), salt = hash(saltCols) % salts
  *            — each reducer holds ≤ k rows of state per (group, salt);
  *   phase 2: exact top-k per group over the ≤ salts·k phase-1 survivors
  *            — per-group input is now capped by `salts·k`, independent
  *            of the group's true cardinality.
  *
  * Exactness: every row lands in exactly one salt, and any row in the
  * true group top-k is in its salt's top-k (removing rows from OTHER
  * salts cannot demote it), so phase 2 sees every true winner — the
  * result is identical to the unsalted rank for ANY salt assignment,
  * which is what the q75 oracle (plain DuckDB window) proves and
  * SkewRankSpec pins per salt count. Both phases run through the engine's
  * TopKPerGroup physical operator (streamed O(n log k) partials, no
  * WindowExec sort-and-buffer anywhere).
  */
object SkewRank {

  private val SaltCol = "__graft_salt"

  /** Exact top-k rows per `groupCols` ordered by `orderCols` (must be a
    * total order within a group — include a tiebreak column), salted
    * `salts` ways by `hash(saltCols) % salts`. `saltCols` only spreads
    * load (any deterministic row-level choice is correct); pass a
    * high-cardinality key so one hot group fans over all salts.
    */
  def topKSalted(df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column],
      k: Int, salts: Int, saltCols: Seq[Column]): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(saltCols.nonEmpty, "saltCols must be non-empty")
    require(!df.columns.contains(SaltCol), s"input already has a $SaltCol column")
    val salted = df.withColumn(SaltCol, pmod(hash(saltCols: _*), lit(salts)))
    val phase1 = TopKPerGroup.topK(salted, groupCols :+ SaltCol, orderCols, k)
      .drop(SaltCol)
    TopKPerGroup.topK(phase1, groupCols, orderCols, k)
  }
}
