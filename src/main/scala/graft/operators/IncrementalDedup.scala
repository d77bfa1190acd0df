package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-duplicate detection against a PERSISTED MinHash band
  * index — the shape a real 100 TB ingest pipeline needs: the historical
  * corpus is shingled and minhashed ONCE ([[buildIndex]]); every new batch
  * is then deduped against the index ([[nearDupsAgainstIndex]]) without
  * re-reading a byte of corpus text, and folded into the index
  * ([[appendBatch]]) so the next batch sees it. This lifts the reference's
  * only incremental artifact — shuffle files persisted across stages
  * (/root/reference/mr/coordinator.go:98-113) — to table granularity.
  *
  * The index is two parquet tables under `path`:
  *   - `bands/`    (id, band, bkey): the LSH bucket keys, exactly the
  *     frame [[Dedup.lshCandidates]] self-joins — so an index row and a
  *     live batch row collide iff the full recompute would collide;
  *   - `shingles/` (id, sh): the per-doc distinct shingle sets that the
  *     exact-Jaccard verify consumes.
  * Both carry the signature family's determinism: same RollingHash31 base
  * hash, same affine permutations, same band hashing — which is what makes
  * "batch vs index" provably hash-equal to "full recompute, filtered to
  * pairs touching the batch" (IncrementalDedupSpec; driver oracle p46).
  *
  * Scale (100 TB): the batch phase touches (a) the batch's own text —
  * O(batch); (b) the index parquet — column-pruned scans of precomputed
  * keys, no shingling, no signature hashing; the heavy per-byte compute is
  * paid once per document EVER, not once per run. The candidate join is
  * the same banded equi-join as the one-shot path (no all-pairs product),
  * and appends are parquet file appends — no rewrite of existing index
  * files. On a cluster, partition `bands/` by `band` (and bucket by
  * `bkey`) so a batch's probe join prunes to the touched buckets.
  */
object IncrementalDedup {

  /** MinHash family + verify threshold. Must match between buildIndex and
    * every later batch run — persisted alongside the index as `params.json`
    * and re-validated on read, because an index probed with a different
    * family silently finds nothing.
    */
  final case class Params(shingleSize: Int = 3, numHashes: Int = 128,
      bands: Int = 32, threshold: Double = 0.8) {
    def json: String =
      s"""{"shingleSize":$shingleSize,"numHashes":$numHashes,""" +
        s""""bands":$bands,"threshold":$threshold}"""
  }

  private def bandsPath(path: String) = s"$path/bands"
  private def shinglesPath(path: String) = s"$path/shingles"
  private def paramsPath(path: String) =
    java.nio.file.Paths.get(path, "params.json")

  /** Shingle + minhash + band `docs` once and persist the index at `path`
    * (overwriting any previous index there). Runs two write jobs eagerly —
    * an index build IS a job, not a lazy plan.
    */
  def buildIndex(corpus: DataFrame, idCol: String, textCol: String,
      p: Params, path: String): Unit = {
    val sh = Dedup.shingled(corpus, idCol, textCol, p.shingleSize)
    sh.write.mode(SaveMode.Overwrite).parquet(shinglesPath(path))
    // re-derive from the persisted shingles (not the in-memory frame) so
    // the signature job reads the column-pruned parquet instead of
    // re-shingling the corpus text a second time
    val persisted = corpus.sparkSession.read.parquet(shinglesPath(path))
    Dedup.bandRows(Dedup.minhashSignatures(persisted, p.numHashes),
        p.numHashes, p.bands)
      .write.mode(SaveMode.Overwrite).parquet(bandsPath(path))
    java.nio.file.Files.writeString(paramsPath(path), p.json)
  }

  /** Fold an already-deduped batch into the index so subsequent batches
    * dedup against it too: parquet APPENDs of the batch's shingle and band
    * rows — existing index files are never rewritten.
    */
  def appendBatch(batch: DataFrame, idCol: String, textCol: String,
      p: Params, path: String): Unit = {
    requireSameParams(p, path)
    val sh = Dedup.shingled(batch, idCol, textCol, p.shingleSize)
    sh.write.mode(SaveMode.Append).parquet(shinglesPath(path))
    Dedup.bandRows(Dedup.minhashSignatures(sh, p.numHashes),
        p.numHashes, p.bands)
      .write.mode(SaveMode.Append).parquet(bandsPath(path))
  }

  private def requireSameParams(p: Params, path: String): Unit = {
    val stored = java.nio.file.Files.readString(paramsPath(path)).trim
    require(stored == p.json,
      s"index at $path was built with $stored, probed with ${p.json} — " +
        "a mismatched MinHash family finds nothing; rebuild or fix params")
  }

  /** Near-dup pairs TOUCHING `batch`: batch×index plus batch-internal,
    * exact-Jaccard verified — equals the full-corpus recompute restricted
    * to pairs with at least one batch member (canonical id_a < id_b).
    * The corpus side comes entirely from the persisted index; the plan
    * contains no scan of corpus text (spec-asserted).
    *
    * Ordering contract: run this BEFORE [[appendBatch]] for the same
    * batch — once the batch's ids are in the index, its shingle rows sit
    * on both sides of the verify union and every surviving pair row would
    * be emitted once per duplicate.
    */
  def nearDupsAgainstIndex(spark: SparkSession, batch: DataFrame,
      idCol: String, textCol: String, p: Params, path: String): DataFrame = {
    requireSameParams(p, path)
    val bSh = Dedup.shingled(batch, idCol, textCol, p.shingleSize)
    val bBands = Dedup.bandRows(
      Dedup.minhashSignatures(bSh, p.numHashes), p.numHashes, p.bands)
    val iBands = spark.read.parquet(bandsPath(path))
    // probe side = batch only; build side = index ∪ batch. This yields
    // batch×corpus and batch×batch collisions but never corpus×corpus —
    // exactly the "touching the batch" pair set. least/greatest
    // canonicalizes (a batch id may sort before or after a corpus id) and
    // distinct collapses multi-band + both-orientation hits. SHUFFLE_HASH
    // for lshCandidates' reasons: no one-sided broadcast conversion, so
    // the batch banding subtree is one exchange read twice.
    val all = iBands.unionByName(bBands)
    val cands = bBands.as("x").hint("SHUFFLE_HASH")
      .join(all.as("y").hint("SHUFFLE_HASH"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.id") =!= col("y.id"))
      .select(least(col("x.id"), col("y.id")).as("id_a"),
        greatest(col("x.id"), col("y.id")).as("id_b"))
      .distinct()
    val allSh = spark.read.parquet(shinglesPath(path)).unionByName(bSh)
    Dedup.verifyJaccard(cands, allSh, p.threshold)
  }
}
