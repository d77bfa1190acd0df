package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS algorithm): from the rolling sequence of
  * k-gram hashes, keep the MINIMUM of every w-long window. The selected
  * set is position-robust where global fingerprints (p06) are brittle —
  * editing one token changes p06's whole-document hash but perturbs only
  * the k-grams overlapping the edit here — and it carries the paper's
  * guarantee: any shared token run of length >= w + k - 1 contributes at
  * least one shared fingerprint (every length-w window of the shared
  * run selects the same minimum in both documents), so overlap
  * detection has zero false negatives above that span length
  * (spec-pinned with planted shared substrings). Density is ~2/(w+1) of
  * all grams — the knob trading index size for the detectable span
  * floor.
  *
  * Scale (100 TB): fingerprint selection is a pure per-row expression
  * chain (token slice -> RollingHash31 per gram -> windowed array_min ->
  * distinct) — no shuffle, no UDF, fuses into the scan; overlap
  * detection is the dedup family's inverted-index shape (equi-join on
  * the fingerprint value, count per pair, threshold) — only pairs
  * sharing >= 1 selected hash are ever formed, and the fingerprint
  * stream is ~2/(w+1) the size of the gram stream the n-gram Jaccard
  * join (p03) would shuffle. A hot fingerprint (ubiquitous boilerplate
  * gram) is the standard skew key; the built-in fuse is
  * [[overlapPairs]]' `maxDf` cap — drop fingerprints above a
  * document-frequency ceiling before the join ([[LineDedup]]'s
  * dictionary move), with the one-sided recall trade documented there.
  */
object Winnowing {

  /** (id, fp) — each document's distinct winnowing fingerprints.
    * Documents with fewer than k tokens emit nothing; documents with
    * fewer than w k-grams emit the min over all their grams (one
    * truncated window — every doc with >= k tokens stays detectable).
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got k=$k w=$w")
    val toks = Fns.tokens(col(textCol))
    docs
      .select(col(idCol).cast("long").as("id"), toks.as("ts"))
      .filter(size(col("ts")) >= k)
      .select(col("id"), transform(
        sequence(lit(0), size(col("ts")) - lit(k)),
        i => Fns.rollingHash31(
          array_join(slice(col("ts"), i + 1, lit(k)), " "))).as("hs"))
      .select(col("id"), explode(array_distinct(transform(
        sequence(lit(0), greatest(size(col("hs")) - lit(w), lit(0))),
        j => array_min(slice(col("hs"), j + 1, lit(w)))))).as("fp"))
  }

  /** Document pairs sharing >= `minShared` fingerprints, with the shared
    * count — the MOSS overlap report (id_a < id_b).
    *
    * `maxDf` is the hot-fingerprint fuse for boilerplate-heavy corpora:
    * a fingerprint present in more than maxDf documents is dropped
    * BEFORE the join (one dimension-sized partial-agg df pass —
    * [[LineDedup]]'s dictionary move), bounding any single join key's
    * contribution at maxDf² pair rows. The trade is explicit and
    * one-sided: dropped fingerprints can only LOWER n_shared (pairs may
    * fall below minShared; none can appear), which is MOSS's own
    * stance — a gram shared by thousands of documents identifies
    * boilerplate, not copying. None (the default) keeps exactness.
    */
  def overlapPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, minShared: Int = 1,
      maxDf: Option[Int] = None): DataFrame = {
    val fps0 = fingerprints(docs, idCol, textCol, k, w)
    val fps = maxDf match {
      case None => fps0
      case Some(cap) =>
        require(cap >= 2, s"maxDf must be >= 2, got $cap — a cap below 2 " +
          "would drop every shareable fingerprint")
        val hot = fps0.groupBy("fp")
          .agg(count(lit(1)).as("__df")).filter(col("__df") > cap)
          .select("fp")
        fps0.join(broadcast(hot), Seq("fp"), "left_anti")
    }
    fps.select(col("id").as("id_a"), col("fp"))
      .join(fps.select(col("id").as("id_b"), col("fp")), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
