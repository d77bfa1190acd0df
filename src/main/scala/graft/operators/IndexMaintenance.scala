package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** CDC-driven maintenance for the persisted indexes: apply a change feed
  * ([[graft.sources.ManifestTable.changeFeed]]'s `_change_type` shape —
  * or any frame shaped like it) to a MinHash dedup index (p46) or an
  * IVF ANN index (p58) instead of rebuilding.
  *
  * Semantics per feed: DELETES first (a retention-filtered compaction —
  * the only way rows leave an append-only index), INSERTS second
  * (appendBatch against the stored parameters/centroids); an UPDATE,
  * which the feed surfaces as a delete+insert pair of the same id, thus
  * lands as drop-old-derived-rows then append-new — exactly an index
  * upsert. With no deletes the append folds IN PLACE and `inPath` is
  * returned; with deletes the maintained index lands at `outPath`
  * (compaction never rewrites its input — the crash-safety contract).
  *
  * At 100 TB this is THE index story: the feed is O(changed files), the
  * append is O(batch), the deletion compaction is O(index) once per
  * maintenance window rather than O(corpus) per rebuild — and
  * IndexLifecycleSpec already proves aged-equals-fresh across arbitrary
  * interleavings of exactly these primitives. Deletion id lists are
  * driver-bounded (operator-request-sized), the same parameter bound as
  * compactIndex's dropIds; corpus-scale purges should rebuild.
  */
object IndexMaintenance {

  final case class MaintResult(path: String, deleted: Long, inserted: Long)

  private def split(feed: DataFrame, idCol: String)
      : (Seq[Long], DataFrame) = {
    import feed.sparkSession.implicits._
    val dels = feed.filter(col("_change_type") === "delete")
      .select(col(idCol).cast("long")).distinct().as[Long].collect().toSeq
    val ins = feed.filter(col("_change_type") === "insert")
    (dels, ins)
  }

  /** Apply `feed` (with `idCol` + `textCol` payload) to the MinHash
    * dedup index at `inPath`; the maintained index is at the returned
    * path (`outPath` iff the feed carried deletes).
    */
  def maintainDedupIndex(spark: SparkSession, feed: DataFrame,
      idCol: String, textCol: String, p: IncrementalDedup.Params,
      inPath: String, outPath: String): MaintResult = {
    val (dels, ins) = split(feed, idCol)
    val path =
      if (dels.isEmpty) inPath
      else {
        IncrementalDedup.compactIndex(spark, inPath, outPath,
          dropIds = dels)
        outPath
      }
    val nIns = ins.count()
    if (nIns > 0)
      IncrementalDedup.appendBatch(ins.select(col(idCol), col(textCol)),
        idCol, textCol, p, path)
    MaintResult(path, dels.size.toLong, nIns)
  }

  /** Apply `feed` (with `idCol` + `embCol` payload) to the IVF index at
    * `inPath` — inserts assign against the STORED centroids (no refit),
    * so the maintained index answers exactly like one built fresh on
    * the same quantizer.
    */
  def maintainAnnIndex(spark: SparkSession, feed: DataFrame,
      idCol: String, embCol: String, p: AnnIndex.Params,
      inPath: String, outPath: String): MaintResult = {
    val (dels, ins) = split(feed, idCol)
    val path =
      if (dels.isEmpty) inPath
      else {
        AnnIndex.compactIndex(spark, inPath, outPath, dropIds = dels)
        outPath
      }
    val nIns = ins.count()
    if (nIns > 0)
      AnnIndex.appendBatch(ins.select(col(idCol), col(embCol)),
        idCol, embCol, p, path)
    MaintResult(path, dels.size.toLong, nIns)
  }
}
