package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage) — match records ACROSS two noisy
  * sources that share no key: the Fellegi-Sunter decision shape
  * (blocking -> per-field agreement scores -> weighted sum -> threshold)
  * that powers dedupe-across-vendors, customer-360 joins, and
  * training-set provenance reconciliation (north-star scope; the
  * reference's nearest semantics is key-grouping,
  * /root/reference/mr/worker.go:139-155 — here the key is the BLOCK).
  *
  * The scale contract is the blocking join: candidate pairs come ONLY
  * from an equi-join on caller-chosen block keys (records that disagree
  * on every block key are never compared), so the pairwise stage costs
  * sum over blocks of |A_b| x |B_b| instead of |A| x |B| — the same
  * fence every dedup family in this repo puts around quadratic work
  * (LSH bands, k-means cells, fingerprint buckets). Blocking recall is
  * the caller's modeling decision: a true match split across blocks is
  * invisible by construction (use multiple redundant block keys — pass
  * several and union — for the standard multi-pass blocking cure).
  * Scores are plain column expressions, so the whole pipeline stays in
  * codegen; weights are plan literals; hot blocks are the AQE skew
  * case.
  */
object RecordLinkage {

  /** One field comparison: `score(aCol, bCol)` must yield a DOUBLE in
    * [0, 1] (1 = full agreement); `weight` is its Fellegi-Sunter-style
    * log-odds surrogate.
    */
  final case class FieldRule(column: String,
      score: (Column, Column) => Column, weight: Double)

  /** Exact-equality rule — the common case. */
  def exactRule(column: String, weight: Double): FieldRule =
    FieldRule(column,
      (a, b) => when(a === b, 1.0).otherwise(0.0), weight)

  /** Numeric-closeness rule: full agreement within `tol`, else 0. */
  def withinRule(column: String, tol: Double, weight: Double): FieldRule =
    FieldRule(column,
      (a, b) => when(abs(a - b) <= tol, 1.0).otherwise(0.0), weight)

  /** Scored candidate pairs: block-join `a` and `b` on `blockCols`
    * (present in both), apply every rule, and keep pairs whose weighted
    * score reaches `threshold`. Output: (id_a, id_b, score) with score
    * rounded to 6dp — block keys equal by construction, each side's id
    * column must be unique within its source.
    */
  def scoredPairs(a: DataFrame, b: DataFrame, idCol: String,
      blockCols: Seq[String], rules: Seq[FieldRule],
      threshold: Double): DataFrame = {
    require(blockCols.nonEmpty, "at least one block column is required — " +
      "an empty blocking key would compare |A| x |B| pairs")
    require(rules.nonEmpty, "at least one field rule is required")
    def side(df: DataFrame, tag: String) = {
      val cols = ((idCol +: blockCols) ++ rules.map(_.column)).distinct
      df.select(cols.map(c => col(c).as(s"${tag}_$c")): _*)
    }
    val left = side(a, "a")
    val right = side(b, "b")
    val joined = left.join(right,
      blockCols.map(c => col(s"a_$c") === col(s"b_$c")).reduce(_ && _))
    val score = rules.map(r =>
      r.score(col(s"a_${r.column}"), col(s"b_${r.column}")) * lit(r.weight))
      .reduce(_ + _)
    joined.select(col(s"a_$idCol").as("id_a"), col(s"b_$idCol").as("id_b"),
        round(score, 6).as("score"))
      .filter(col("score") >= threshold)
  }
}
