package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.functions.{BloomMightContain, BloomUtil}
import org.apache.spark.sql.graftshim.Bridge.{toCol, toExpr}

/** Explicit bloom-filter join pruning — the runtime-filter pattern
  * (Spark's own InjectRuntimeFilter, Snowflake/BigQuery's bloom pushdown)
  * as a composable library operator: build a compact bitmap over the
  * small side's join keys, broadcast it, and drop non-matching fact rows
  * BEFORE they reach the join's exchange.
  *
  * Scale design: the bitmap is sized bits/key (default ~10 bits/key ≈ 1%
  * false positives with 7 hashes) — a 10M-key dim is ~12 MB, broadcast
  * once. The probe is a codegen'd per-row expression on the scan side,
  * so a 100 TB fact table sheds its non-matching rows at scan speed and
  * the join's shuffle carries only (matches + FPP·rows). False positives
  * are handled by the real join that follows; false negatives cannot
  * occur because build and probe share BloomUtil's bit positions.
  *
  * The build side is a typed Aggregator (SURVEY §2.4 UDAF surface): a
  * partial bitmap per partition, merged by OR — one pass, no shuffle of
  * the keys themselves.
  */
object BloomPrune {

  private class BloomAgg(numWords: Int, numHashes: Int)
      extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](numWords)
    def reduce(b: Array[Long], key: java.lang.Long): Array[Long] = {
      if (key != null) BloomUtil.set(b, key.longValue, numHashes)
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderHolder.arrayLongEnc
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoderHolder.arrayLongEnc
  }

  private object ExpressionEncoderHolder {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val arrayLongEnc: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Largest legal bitmap size: the word count (numBits + 63) / 64 is
    * computed in Int, so a numBits above this overflows it negative —
    * callers auto-sizing from a key count must clamp HERE, not at
    * Int.MaxValue (which is 63 past the safe ceiling).
    */
  val MaxBits: Int = Int.MaxValue - 63

  /** One-row DataFrame holding the bitmap (`bloom: array<bigint>`) over
    * `keys`'s `keyCol` (integral). Size the filter ~10 bits per expected
    * distinct key for ~1% FPP at 7 hashes.
    */
  def build(keys: DataFrame, keyCol: String, numBits: Int,
      numHashes: Int = 7): DataFrame = {
    require(numBits >= 64 && numBits <= MaxBits && numHashes >= 1,
      s"need 64 <= numBits <= $MaxBits (got $numBits) and numHashes >= 1 " +
        s"(got $numHashes)")
    val numWords = (numBits + 63) / 64
    val agg = udaf(new BloomAgg(numWords, numHashes))
    keys.select(col(keyCol).cast("long").as("k"))
      .agg(agg(col("k")).as("bloom"))
  }

  def mightContain(bloom: Column, key: Column, numHashes: Int = 7): Column =
    toCol(BloomMightContain(toExpr(bloom), toExpr(key.cast("long")), numHashes))

  /** `facts` minus the rows whose `keyCol` is definitely not in the
    * bloom. Cross-broadcast of the one-row bitmap + a codegen'd filter:
    * no shuffle, no join — compose the REAL join downstream to resolve
    * the ~FPP false positives.
    */
  def prune(facts: DataFrame, keyCol: String, bloom: DataFrame,
      numHashes: Int = 7): DataFrame = {
    val cols = facts.columns
    facts.crossJoin(broadcast(bloom))
      .filter(mightContain(col("bloom"), col(keyCol), numHashes))
      .select(cols.map(col): _*)
  }

  /** EXACT anti-join (`facts` rows whose `keyCol` is NOT in `dimKeys`),
    * bloom-accelerated: a definite bloom miss PROVES absence, so
    * bloom-negative rows are kept without touching any join — only the
    * (true matches + FPP) bloom-positive slice pays the exact anti-join.
    * At 100 TB this is the cross-corpus dedup shape: the incoming crawl
    * streams through a broadcast bitmap at scan speed and the exchange
    * carries a few percent of it, yet the result is exactly
    * `facts LEFT ANTI JOIN dimKeys` — false positives are resolved by
    * the real anti-join, false negatives cannot occur (build and probe
    * share BloomUtil's bit positions).
    *
    * Null keys (or keys that cast to null) follow anti-join semantics: a
    * null join condition is never true, so null-key rows are KEPT — they
    * ride the misses branch (the bloom probe returns null for them, which
    * coalesces to "definite miss").
    *
    * Cost note: the two branches each re-evaluate the flagged subtree, so
    * `facts` is scanned twice (the probe itself is a codegen'd filter at
    * scan speed, and only the bloom-positive slice — a few percent —
    * reaches the anti-join's exchange). Folding both branches into one
    * join would instead shuffle EVERY fact row, which is worse at 100 TB;
    * if the double scan dominates (e.g. facts is an expensive subquery,
    * not a parquet scan), persist/checkpoint `facts` first.
    */
  def antiKeep(facts: DataFrame, keyCol: String, dimKeys: DataFrame,
      dimKeyCol: String, numBits: Int, numHashes: Int = 7): DataFrame = {
    val bloom = build(dimKeys, dimKeyCol, numBits, numHashes)
    val (misses, survivors) =
      antiKeepSplitWith(facts, keyCol, bloom, dimKeys, dimKeyCol, numHashes)
    misses.unionByName(survivors)
  }

  /** The bloom-split PAIR behind [[antiKeep]], with the bitmap supplied
    * by the caller (build it once with [[build]] over `dimKeys`'s
    * `dimKeyCol` and the same `numHashes`, persist it, reuse it across
    * several fact tables — the index-purge shape): returns
    * (definite misses, exact survivors among bloom positives). Misses
    * are proven absent by the bitmap (no false negatives — shared
    * BloomUtil bit positions) and reach the caller without any join,
    * preserving the fact scan's task layout; only the bloom-positive
    * slice pays the exact anti-join. `misses ∪ survivors` IS
    * `facts LEFT ANTI JOIN dimKeys` — callers that need the branches
    * separately (to write each in its own layout-preserving job) take
    * this form, everyone else takes [[antiKeep]].
    */
  def antiKeepSplitWith(facts: DataFrame, keyCol: String, bloom: DataFrame,
      dimKeys: DataFrame, dimKeyCol: String, numHashes: Int = 7,
      broadcastDim: Boolean = false): (DataFrame, DataFrame) = {
    val cols = facts.columns
    val flag = "__bloom_might"
    require(!cols.contains(flag) && !cols.contains("bloom"),
      s"column names $flag and bloom are reserved by antiKeep")
    val flagged = facts.crossJoin(broadcast(bloom))
      .withColumn(flag, mightContain(col("bloom"), col(keyCol), numHashes))
      .select(cols.map(col) :+ col(flag): _*)
    // coalesce: a null probe result (null key) is a definite miss — the
    // row must be kept, exactly as LEFT ANTI JOIN keeps null-key rows.
    val misses = flagged.filter(!coalesce(col(flag), lit(false)))
      .select(cols.map(col): _*)
    val candidates = flagged.filter(coalesce(col(flag), lit(false)))
      .select(cols.map(col): _*)
    // broadcastDim: callers that KNOW dimKeys is broadcast-sized (the
    // purge paths gate on the counted drop-set size) hint it, making
    // the exact anti-join's shuffle volume provably zero — without the
    // hint AQE/stats may pick a shuffle join and the candidate slice
    // (dropset + FPP·facts) pays an exchange. Never hinted blindly:
    // antiKeep's dimKeys can be corpus-scale (cross-corpus dedup).
    val dk0 = dimKeys.select(col(dimKeyCol).cast("long").as("__dim_key"))
    val dk = if (broadcastDim) broadcast(dk0) else dk0
    val survivors = candidates.join(dk,
      col(keyCol).cast("long") === col("__dim_key"), "left_anti")
      .select(cols.map(col): _*)
    (misses, survivors)
  }

  /** Drop sets up to this many distinct keys get the exact anti-join's
    * dim side broadcast-hinted by the purge paths. Sized for the
    * MATERIALIZED relation, not raw bytes: a broadcast hash join builds
    * a LongHashedRelation at ~2-4× the 8 B/key payload, and a dedup
    * purge broadcasts it once per table (sh + bands) on top of the
    * bloom bitmap — 1M keys keeps the whole purge's broadcast footprint
    * in the tens of MB on a default-memory driver. Beyond the gate
    * Spark plans the join from stats (its own size-based safety valve
    * restored) — the shuffle volume is then O(dropset + FPP·index)
    * instead of ~0, still never O(index).
    */
  val BroadcastDimMaxKeys: Long = 1L << 20

  /** The purge-entry prologue both persisted indexes share: normalize a
    * caller drop frame to the `__drop_id` convention (cast to long,
    * null-filtered, deduped) and PERSIST it — the frame feeds the tier
    * count, the bitmap build, and every write job. Callers unpersist.
    */
  def normalizeDrops(dropIds: DataFrame, dropIdCol: String): DataFrame =
    dropIds.select(col(dropIdCol).cast("long").as("__drop_id"))
      .filter(col("__drop_id").isNotNull).distinct().persist()

  /** Auto-sized, PERSISTED bitmap over a [[normalizeDrops]]-shaped frame
    * whose count is `nDrop` (counted by the caller — counting here would
    * hide the materialization the caller already paid for). Sizing is
    * bitsPerKey·nDrop clamped to [64, MaxBits]; callers unpersist.
    */
  def bloomFor(drops: DataFrame, nDrop: Long, bitsPerKey: Int,
      numHashes: Int): DataFrame = {
    require(nDrop > 0,
      "purgeIndex needs a non-empty drop set; use compactIndex for a " +
        "plain (no-deletion) rewrite")
    val numBits = math.min(MaxBits.toLong,
      math.max(64L, nDrop * bitsPerKey.toLong)).toInt
    build(drops, "__drop_id", numBits, numHashes).persist()
  }
}
