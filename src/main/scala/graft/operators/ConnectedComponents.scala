package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the step that
  * turns dedup PAIRS into dedup GROUPS (one representative document kept
  * per group, everything else dropped), which is what a training-data
  * pipeline actually executes: near-dup relations are not transitive, so
  * without the closure a chain a~b~c dedups to two "groups" {a,b},{b,c}
  * that both survive a pairwise keep-one rule.
  *
  * Algorithm: iterative min-label propagation with pointer jumping —
  * each round every node takes the min label among itself and its
  * neighbors (one edges-to-labels shuffle join + groupBy min), then
  * label-of-label compression halves remaining chain length, giving
  * O(log diameter) rounds instead of O(diameter). Labels live only on
  * nodes that appear in a pair (the near-dup subgraph — at 100 TB that
  * is orders of magnitude smaller than the corpus); singletons join back
  * at the end with group_id = own id. Per round the lineage is cut with
  * an eager localCheckpoint, the standard Spark iterative-algorithm
  * shape (spark.ml KMeans does the same); block cleanup is handled by
  * the ContextCleaner as superseded label frames go out of scope. On a
  * real cluster the label frame would use a reliable checkpoint dir and
  * the edge frame would be bucketed by both endpoints.
  */
object ConnectedComponents {

  /** Component label (min node id in component) for every node that
    * appears in `pairs` (columns id_a, id_b). Output: (id, label).
    *
    * Round-19 A/B REJECTED: the designed single-join round (self-loop
    * edges so neighbor-min over N(s) ∪ {s} is one join+aggregate, the
    * old label carried out as max(dl WHERE d = s), the per-round
    * labels-side left join gone). Jobs/round did drop (DbgCC 8 → 7)
    * but end-to-end it measured consistently SLOWER — p90 interleaved
    * pairs {2.17, 2.34, 2.05} vs {1.82, 1.75, 1.70} before, p92
    * 6.36 vs 5.57 — because the near-dup graphs converge in 1-2 rounds:
    * the one-time distinct + bigger edge checkpoint (self-loops ride
    * every round's join) cost more than the single removed join saves.
    * On a high-diameter graph (many rounds amortizing the build) the
    * fused round would win; at this workload's clique-shaped components
    * the three-join round stays.
    */
  def componentLabels(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").cast("long").as("s"),
        col("id_b").cast("long").as("d"))
      .union(pairs.select(col("id_b").cast("long").as("s"),
        col("id_a").cast("long").as("d")))
      // round-18: checkpoint the edge frame PRE-PARTITIONED on the
      // per-round join key (localCheckpoint preserves the physical
      // partitioning), so each round's neighbor-min join shuffles only
      // the label frame — the edge side, the larger one on real
      // graphs, moves zero bytes after round 0
      .repartition(col("d"))
      .transform(Materialize.cut(_)) // pair generation (LSH + verify) runs ONCE
    // round-18: the label init IS the first neighbor-min round, fused —
    // min(own id, min over neighbors) costs the same single exchange +
    // aggregate the old `distinct()` init did (same key, same shuffle
    // shape) but starts the loop one propagation ahead: a clique (the
    // common near-dup component) converges on its first CHECK instead
    // of its second round. Identical fixpoint — this is exactly round
    // 0's neighbor-min applied to identity labels.
    var labels = edges.groupBy(col("s"))
      .agg(least(col("s"), min(col("d"))).as("label"))
      .select(col("s").as("id"), col("label"))
      .transform(Materialize.cut(_))
    // `improving` counts only rounds that changed a label; the final
    // confirming round (no changes) is always allowed on top of maxIter,
    // so a graph that stabilizes exactly on its maxIter-th improving
    // round is certified rather than spuriously rejected
    var improving = 0
    var converged = false
    while (improving <= maxIter && !converged) {
      // neighbor min: for each node s, the smallest label among N(s)
      val nm = edges
        .join(labels.select(col("id").as("d"), col("label").as("dl")), "d")
        .groupBy(col("s").as("id")).agg(min("dl").as("nmin"))
      val prop = labels.join(nm, Seq("id"), "left")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("mid"))
      // pointer jump: follow the new label one hop (label(label(v)))
      val next = prop
        .join(labels.select(col("id").as("mid"), col("label").as("midl")), "mid")
        .select(col("id"), col("old"), least(col("mid"), col("midl")).as("label"))
        .transform(Materialize.cut(_))
      converged = next.filter(col("label") =!= col("old")).isEmpty
      labels = next.select("id", "label")
      if (!converged) improving += 1
    }
    require(converged,
      s"connected components did not converge within $maxIter improving " +
        "rounds — raise maxIter (improving rounds needed ~ log2 of the " +
        "longest near-dup chain; the confirming round is not counted)")
    labels
  }

  /** Dedup-group assignment for EVERY document: group_id = min doc id of
    * its near-dup component (own id for singletons), is_rep marks the one
    * row per group a keep-one dedup retains.
    */
  def dedupGroups(docs: DataFrame, idCol: String, pairs: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val labels = componentLabels(pairs, maxIter)
      .select(col("id").as(idCol), col("label"))
    docs.select(col(idCol).cast("long").as(idCol))
      .join(labels, Seq(idCol), "left")
      .select(col(idCol).as("doc_id"),
        coalesce(col("label"), col(idCol)).as("group_id"))
      .withColumn("is_rep", col("doc_id") === col("group_id"))
  }

  /** Canonical-document selection — the KEEP POLICY a pipeline runs after
    * grouping: [[dedupGroups]] marks min-id representatives, but real
    * dedup keeps the BEST copy of each group, not the lowest-numbered one
    * (near-dup copies differ — truncation, boilerplate injection — and
    * dropping the complete copy for an id accident throws data away).
    * Picks argmax(`qualityCol`) per group, ties to min id, via the
    * TopKPerGroup physical operator (k=1 streamed partials — no
    * WindowExec sort-and-buffer; the group frame is near-dup-subgraph
    * sized plus singletons, and the topK partial bounds per-task state
    * at one row per group per partition).
    *
    * Output: one row per document — (doc_id, group_id, quality,
    * is_canonical); a keep-one dedup retains the is_canonical rows.
    */
  def canonicalDocs(docs: DataFrame, idCol: String, pairs: DataFrame,
      qualityCol: String, maxIter: Int = 20): DataFrame = {
    val scored = docs.select(col(idCol).cast("long").as("doc_id"),
      col(qualityCol).as("quality"))
    val grouped = dedupGroups(docs, idCol, pairs, maxIter)
      .join(scored, Seq("doc_id"))
    val canon = graft.plans.TopKPerGroup.topK(grouped, Seq("group_id"),
        Seq(col("quality").desc, col("doc_id").asc), 1)
      .select(col("group_id"), col("doc_id").as("canon_id"))
    grouped.join(canon, Seq("group_id"))
      .select(col("doc_id"), col("group_id"), col("quality"),
        (col("doc_id") === col("canon_id")).as("is_canonical"))
  }
}
