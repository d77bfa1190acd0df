package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** LEAKAGE-SAFE train/val/test splitting — the step naive hash splits
  * get wrong: near-duplicate documents assigned to different splits
  * leak training data into evaluation (the contamination every
  * "surprisingly good" eval score should be suspected of). The fix is
  * to split GROUPS, not documents: near-dup components
  * ([[ConnectedComponents.dedupGroups]]) are assigned atomically by a
  * deterministic hash of the GROUP id, so every member of a component
  * — including transitive near-dups no single pair connects — lands
  * in the same split by construction.
  *
  * Determinism: the split is a pure function of (corpus, pair set,
  * fractions) — Fnv1a32 of the group id mod 100 against cumulative
  * percentage cut points (q32's engine-mirrorable hash split, lifted
  * from rows to components). Reruns, re-shards, and re-orderings
  * cannot move a document across splits.
  *
  * Scale: component labeling is the O(log chain) pointer-jumping
  * already paid by the dedup family; the assignment itself is one
  * per-row hash — no extra shuffle beyond dedupGroups' own.
  */
object Splits {

  /** Per-document assignment: (doc_id, group_id, split) with split ∈
    * train|val|test by `trainPct`/`valPct` cumulative cut points over
    * the group-id hash (remainder = test).
    */
  def leakageSafe(docs: DataFrame, idCol: String, pairs: DataFrame,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct >= 1 && valPct >= 0 && trainPct + valPct <= 100,
      s"need 1 <= trainPct, 0 <= valPct, trainPct + valPct <= 100; " +
        s"got $trainPct/$valPct")
    ConnectedComponents.dedupGroups(docs, idCol, pairs)
      .withColumn("__b",
        pmod(Fns.fnv1a32(col("group_id").cast("string")), lit(100)))
      .withColumn("split",
        when(col("__b") < trainPct, "train")
          .when(col("__b") < trainPct + valPct, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("group_id"), col("split"))
  }

  /** The per-split rollup (split, n_docs, n_groups) — the registered
    * shape.
    */
  def leakageSafeSummary(docs: DataFrame, idCol: String, pairs: DataFrame,
      trainPct: Int = 80, valPct: Int = 10): DataFrame =
    leakageSafe(docs, idCol, pairs, trainPct, valPct)
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("group_id").as("n_groups"))
}
