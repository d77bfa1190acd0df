package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** COPY-ON-WRITE row-level operations on the manifest-committed table —
  * MERGE (upsert) and DELETE that rewrite O(affected files), not
  * O(table): the Delta/Iceberg copy-on-write shape, built from the
  * repo's own parts (zone maps find the affected files, the `files`
  * read option reads exactly those, MergeUpsert supplies the row
  * semantics, commitReplace swaps file references atomically).
  *
  * Protocol, per operation:
  *   1. AFFECTED SET: the manifest's per-file zone maps on the key
  *      column ([lo, hi], exact integer strings) join against the
  *      DISTINCT operation keys — a file is affected iff some key lands
  *      in its range (files without key stats are conservatively
  *      affected). The ranges table is O(files) driver metadata,
  *      broadcast; the range join is key-rows × files worst case, with
  *      the usual interval-index upgrade path when both are huge.
  *   2. REWRITE: ONLY affected files are read (the `files` scan option —
  *      pruning by construction, not by filter), merged/filtered, and
  *      staged through the connector's own write path into a private
  *      stage table; staged data files then MOVE (O(1) renames) into
  *      the live data directory under their collision-free names.
  *   3. COMMIT: one manifest publish drops the affected entries and adds
  *      the staged ones; untouched files carry over by reference —
  *      never opened, never moved. Crash before the publish leaves only
  *      unlisted (invisible) files for vacuum; the previous version
  *      remains time-travelable (CowSpec pins both).
  *
  * At 100 TB the bill is proportional to the rows you touch IF the
  * layout cooperates: a key-clustered table (ClusteredWrite / the
  * compact-then-cluster pattern) localizes any key set to few files,
  * while a random layout degrades to table-rewrite — the same
  * layout-as-contract story as q85/q87, here for writes.
  *
  * Keys must be integral (int/long) and non-null: zone-map strings for
  * integral columns are exact at any magnitude, while double stats
  * could round an interval inward and wrongly skip a file.
  */
object CowOps {

  final case class CowResult(version: Long, filesRewritten: Int,
      filesUntouched: Int, filesAdded: Int)

  private val Fmt = "graft.sources.ManifestTable"

  /** Test seam: runs right before each commitReplace attempt (after the
    * rewrite is staged), so a spec can interleave a competing commit
    * deterministically. No-op in production.
    */
  private[graft] var beforeCommitHook: () => Unit = () => ()

  /** Optimistic-concurrency driver for merge/delete: run `body` against
    * the current manifest; when the commit loses the version CAS
    * ([[ManifestTable.ConcurrentCommitException]]), delete the attempt's
    * adopted-but-unreferenced files and RECOMPUTE against the new
    * current version — the affected set, the rewrite, everything (the
    * winner may have touched the same files). Bounded attempts: under
    * genuine write contention a table needs a coordinator, not an
    * unbounded spin.
    */
  private def withCommitRetry(dir: String, ref: String = "")(
      body: ManifestTable.Manifest => CowResult): CowResult = {
    val maxAttempts = 3
    var last: ManifestTable.ConcurrentCommitException = null
    var attempt = 0
    while (attempt < maxAttempts) {
      val m = ManifestTable.readManifest(dir, ref).getOrElse(
        throw new IllegalArgumentException(
          if (ref.isEmpty) s"no committed manifest at $dir"
          else s"no branch '$ref' at $dir — createBranch first"))
      try return body(m)
      catch { case e: ManifestTable.ConcurrentCommitException =>
        last = e; attempt += 1
      }
    }
    throw last
  }

  /** Commit `added` replacing `affected`, cleaning up the staged files
    * if the commit loses the CAS (they are unreferenced; deleting keeps
    * the data dir free of loser debris rather than waiting on vacuum).
    */
  private def commitOrCleanup(dir: String, m: ManifestTable.Manifest,
      affected: Seq[String], added: Seq[ManifestTable.FileEntry],
      ref: String = "", op: String = "replace-files"): Long = {
    beforeCommitHook()
    try ManifestTable.commitReplace(dir, m.version, affected.toSet, added,
      ref, op)
    catch { case e: ManifestTable.ConcurrentCommitException =>
      added.foreach(a => FsMeta.deleteRecursive(s"$dir/data/${a.name}"))
      throw e
    }
  }

  private def requireIntegralKey(df: DataFrame, keyCol: String): Unit = {
    val dt = df.schema(keyCol).dataType
    require(dt == LongType || dt == IntegerType,
      s"copy-on-write key '$keyCol' must be integral, got ${dt.sql}")
  }

  /** The TABLE side of the key contract — validated upfront in both
    * merge and delete: on a double-keyed table the files carry double
    * zone-map stats and affectedFiles' lo.toLong would otherwise throw
    * NumberFormatException mid-operation (merge happened to be fenced
    * by checkSchema; delete, whose keys frame shares only the key
    * column, was not).
    */
  private def requireTableKey(m: ManifestTable.Manifest,
      keyCol: String): Unit = {
    require(m.schema.fieldNames.contains(keyCol),
      s"table has no column '$keyCol' (schema ${m.schema.toDDL})")
    val dt = m.schema(keyCol).dataType
    require(dt == LongType || dt == IntegerType,
      s"table key '$keyCol' must be integral, got ${dt.sql}")
  }

  /** Names of manifest files some key could live in (see step 1). When a
    * file carries a bloom on the key column (q90's
    * `.option("bloomColumns", keyCol)` at write time), its definite-miss
    * test is ANDed into the range check through the codegen'd
    * BloomMightContain probe — on a hash-scattered layout, where every
    * file's range spans the table and zone maps alone would rewrite
    * everything, the bloom cuts the affected set back to the files that
    * could actually hold a key (CowSpec pins it).
    */
  private def affectedFiles(spark: SparkSession,
      m: ManifestTable.Manifest, keys: DataFrame,
      keyCol: String): Seq[String] = {
    import spark.implicits._
    // sharded table: one tiny agg collects the KEY ENVELOPE [min, max]
    // and only shards whose merged zone map intersects it decode — the
    // ranges table below is then O(candidate files), not O(census).
    // Conservative by construction: shards/files without the key's
    // stats always survive the keep (and land in `statless` below).
    val census: Seq[ManifestTable.FileEntry] =
      if (m.shards.isEmpty) m.files
      else {
        val env = keys.agg(
          org.apache.spark.sql.functions.min(col(keyCol).cast("long")),
          org.apache.spark.sql.functions.max(col(keyCol).cast("long")))
          .head()
        if (env.isNullAt(0)) m.files // empty key set: keep old semantics
        else ManifestTable.planFiles(m, GTabSkip.keep(_,
          Seq(org.apache.spark.sql.sources
              .GreaterThanOrEqual(keyCol, env.getLong(0)),
            org.apache.spark.sql.sources
              .LessThanOrEqual(keyCol, env.getLong(1))), m.schema))
      }
    val (statted, statless) = census.partition(_.stats.contains(keyCol))
    val hit = if (statted.isEmpty) Seq.empty[String] else {
      val ranges = statted.map { f =>
        val (lo, hi) = f.stats(keyCol)
        val bloom = f.stats.get(GTabBloom.statKey(keyCol))
          .flatMap { case (kStr, b64) =>
            kStr.toIntOption.map(_ => GTabBloom.decode(b64))
          }.orNull
        (f.name, lo.toLong, hi.toLong, bloom)
      }.toDF("name", "lo", "hi", "bloom")
      val inBloom = col("bloom").isNull ||
        graft.operators.BloomPrune.mightContain(col("bloom"), col("k"),
          GTabBloom.NumHashes)
      keys.select(col(keyCol).cast("long").as("k")).distinct()
        .join(broadcast(ranges),
          col("k") >= col("lo") && col("k") <= col("hi") && inBloom)
        .select("name").distinct().as[String].collect().toSeq
    }
    hit ++ statless.map(_.name)
  }

  private def readOnly(spark: SparkSession, dir: String,
      names: Seq[String], schema: org.apache.spark.sql.types.StructType,
      ref: String = "") =
    if (names.isEmpty)
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    else {
      val r = spark.read.format(Fmt).option("path", dir)
        .option("files", names.mkString(","))
      (if (ref.isEmpty) r else r.option("branch", ref)).load()
    }

  /** The table's bloom configuration, recovered from the per-file stats
    * the writers already persist (`#bloom:<col>` keys): which columns
    * carry blooms, sized to the largest filter seen. COW rewrites pass
    * this to the staged write so a merge/delete does not silently strip
    * blooms from rewritten files — correctness would survive (bloom
    * absence is conservative) but q90 point-lookup skipping and COW's
    * own bloom-localized affected set would degrade permanently after
    * the first rewrite.
    */
  private[graft] def bloomConfig(
      m: ManifestTable.Manifest): (Seq[String], Option[Int]) = {
    // sharded table with census keys: the shard refs already carry the
    // member bloom-column names and max bits — zero decodes (absence of
    // the key marks a pre-census shard; fall back to the exact scan)
    val census: Seq[ManifestTable.FileEntry] =
      if (m.shards.isEmpty || !m.shards.forall(_.agg.contains("#bloomcols")))
        m.files
      else m.inline
    val shardCols =
      if (m.shards.forall(_.agg.contains("#bloomcols")))
        m.shards.flatMap(_.agg("#bloomcols")._1.split(","))
          .filter(_.nonEmpty).map(ManifestTable.unescape)
      else Nil
    val shardBits =
      if (m.shards.forall(_.agg.contains("#bloomcols")))
        m.shards.flatMap(_.agg("#bloomcols")._2.toIntOption)
          .filter(_ > 0).maxOption
      else None
    val cols = (census.flatMap(_.stats.keys)
      .filter(_.startsWith(GTabBloom.KeyPrefix))
      .map(_.stripPrefix(GTabBloom.KeyPrefix)) ++ shardCols)
      .distinct.sorted
    val bits = ((for {
      f <- census; c <- cols
      (_, b64) <- f.stats.get(GTabBloom.statKey(c))
    } yield GTabBloom.decode(b64).length * 64) ++ shardBits).maxOption
    (cols, bits)
  }

  /** The table's NDV-sketch configuration, recovered like [[bloomConfig]]
    * — rewrites pass it through so a COW merge/delete (or compaction)
    * does not silently strip the column statistics the optimizer's join
    * reordering runs on. Only columns still in the live schema count
    * (a rename/drop may have retired the name).
    */
  private[graft] def ndvConfig(m: ManifestTable.Manifest): Seq[String] = {
    val census: Seq[ManifestTable.FileEntry] =
      if (m.shards.isEmpty || !m.shards.forall(_.agg.contains("#ndvcols")))
        m.files
      else m.inline
    val shardCols =
      if (m.shards.forall(_.agg.contains("#ndvcols")))
        m.shards.flatMap(_.agg("#ndvcols")._1.split(","))
          .filter(_.nonEmpty).map(ManifestTable.unescape)
      else Nil
    (census.flatMap(_.stats.keys)
      .filter(_.startsWith(ManifestTable.NdvPrefix))
      .map(_.stripPrefix(ManifestTable.NdvPrefix)) ++ shardCols)
      .filter(m.schema.fieldNames.contains).distinct.sorted
  }

  /** Shape a rewrite/insert row set before staging: range-partitioned
    * and sorted on the key into at most `nFiles` files. Without this,
    * staged output inherits the JOIN's shuffle partitioning — a 2-file
    * COW delete under `spark.sql.shuffle.partitions = 200` would stage
    * up to 200 fragments of scattered key ranges, exploding the file
    * count AND destroying the zone-map prunability the clustered write
    * paid for (the same silent regression layout-preserving compaction
    * fixes, here on the row-level-op path).
    */
  private def reclustered(rows: DataFrame, keyCol: String,
      nFiles: Int): DataFrame =
    rows.repartitionByRange(math.max(1, nFiles), col(keyCol))
      .sortWithinPartitions(keyCol)

  /** The skipping/statistics configuration a REWRITE must apply: the
    * union of what the files already carry ([[bloomConfig]]/[[ndvConfig]]
    * — a rewrite never strips structures) and what the catalog DECLARES
    * in `_TBLMETA` (TBLPROPERTIES). The union is the ADOPTION path: a
    * property SET after the data landed reaches existing files exactly
    * here — at their next compaction / COW / MOR rewrite — closing the
    * chicken-and-egg a file-derived-only config would have (no file
    * carries the bloom yet, so no rewrite would ever add it). Only
    * live-schema columns count.
    */
  private[sources] def effectiveSkipConfig(dir: String,
      m: ManifestTable.Manifest)
      : (Seq[String], Option[Int], Seq[String]) = {
    val props = TblMeta.properties(dir)
    def declared(key: String): Seq[String] = props.get(key)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    val (fileBloom, fileBits) = bloomConfig(m)
    val bloomCols = (fileBloom ++ declared(GTabProps.BloomColumns))
      .distinct.sorted.filter(m.schema.fieldNames.contains)
    val bits = props.get(GTabProps.BloomBits).flatMap(_.toIntOption)
      .orElse(fileBits)
    val ndvCols = (ndvConfig(m) ++ declared(GTabProps.NdvColumns))
      .distinct.sorted.filter(m.schema.fieldNames.contains)
    (bloomCols, bits, ndvCols)
  }

  /** Stage `rows` through the connector, adopt the staged data files
    * into `dir`, and return their manifest entries (step 2). In the
    * no-rename commit mode ([[FsMeta.noRenameCommits]]) the staged
    * write carries `dataDir = dir`, so data files are BORN in the live
    * data directory under their collision-free write-once names —
    * invisible until the caller's manifest publish lists them — and
    * adoption is pure bookkeeping: zero renames, zero copies, the
    * manifest CAS is the only publish point.
    */
  private[sources] def stageAndAdopt(spark: SparkSession, dir: String,
      rows: DataFrame, m: ManifestTable.Manifest)
      : Seq[ManifestTable.FileEntry] = {
    val stage = s"$dir/_cow-stage-${java.util.UUID.randomUUID}"
    val noRename = FsMeta.noRenameCommits
    val (bloomCols, bloomBits, ndvCols) = effectiveSkipConfig(dir, m)
    val w00 = rows.write.format(Fmt).option("path", stage)
    val w0 = if (noRename) w00.option("dataDir", dir) else w00
    val w1 = if (bloomCols.isEmpty) w0
      else w0.option("bloomColumns", bloomCols.mkString(","))
    val w2a = bloomBits.fold(w1)(b => w1.option("bloomBits", b))
    val w2 = if (ndvCols.isEmpty) w2a
      else w2a.option("ndvColumns", ndvCols.mkString(","))
    // partitioned table: staged rewrites keep the `#part:` layout (the
    // bloom-preservation move) — otherwise one COW merge/delete would
    // silently turn the storage-partitioned-join report off for good
    val pcols = ManifestTable.partitionColumnsOf(m)
    val w = if (pcols.isEmpty) w2
      else w2.option("partitionColumn", pcols.mkString(","))
    w.mode(SaveMode.Append).save()
    // empty partitions stage 0-row files — drop them instead of adopting
    // stat-less dead weight into the manifest
    val staged = ManifestTable.readManifest(stage).get.files
    val (entries, zeros) = staged.partition(_.rows > 0)
    if (noRename)
      // files already live at $dir/data under their final names;
      // 0-row leftovers are deleted where they were born
      zeros.foreach(e => FsMeta.deleteRecursive(s"$dir/data/${e.name}"))
    else entries.foreach { e =>
      if (!FsMeta.renameIfAbsent(s"$stage/data/${e.name}",
          s"$dir/data/${e.name}"))
        throw new IllegalStateException(
          s"staged file ${e.name} collides with an existing data file")
    }
    FsMeta.deleteRecursive(stage)
    entries
  }

  private def checkSchema(m: ManifestTable.Manifest, df: DataFrame,
      what: String): Unit =
    require(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        m.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"$what schema ${df.schema.toDDL} must match table ${m.schema.toDDL}")

  /** MERGE (upsert): rows of `updates` replace same-key rows (whole-row
    * semantics — MergeUpsert's contract) and new keys insert; every row
    * in an UNAFFECTED file is byte-untouched. Single-writer discipline
    * per table applies (every publish's contract).
    */
  def merge(spark: SparkSession, dir: String, updates: DataFrame,
      keyCol: String, branch: String = ""): CowResult =
    withCommitRetry(dir, branch) { m =>
    checkSchema(m, updates, "updates")
    requireIntegralKey(updates, keyCol)
    requireTableKey(m, keyCol)
    val affected = affectedFiles(spark, m, updates, keyCol)
    val merged = graft.operators.MergeUpsert.merge(
      readOnly(spark, dir, affected, m.schema, branch)
        .select(m.schema.fieldNames.map(col).toSeq: _*),
      updates.select(m.schema.fieldNames.map(col).toSeq: _*),
      Seq(keyCol))
    val added = stageAndAdopt(spark, dir,
      reclustered(merged, keyCol, math.max(1, affected.size)), m)
    val v = commitOrCleanup(dir, m, affected, added, branch, "cow-merge")
    CowResult(v, affected.size, m.files.size - affected.size, added.size)
  }

  /** DELETE by key set (the right-to-be-forgotten table primitive —
    * IncrementalDedup's deletion story at the table layer): affected
    * files are rewritten without the keys, files emptied by the delete
    * are dropped (not rewritten as empty), untouched files carry over.
    */
  /** DELETE, merge-on-read: instead of rewriting affected files, their
    * manifest entries gain a DELETION-VECTOR sidecar reference
    * (`#dv:<keyCol>` stats key) holding the deleted key set; the
    * connector's read path subtracts those keys row-level, and the next
    * [[ManifestTable.compact]] (or any COW rewrite of the file) reads
    * through the merge and materializes the deletes away. ZERO data
    * files are rewritten — the write cost is O(affected manifest
    * entries + key set), which is why engines choose MOR when deletes
    * are frequent and small relative to file sizes (Iceberg v2
    * deletes, Delta deletion vectors); the read pays a binary-search
    * per row on affected files until compaction. Repeated MOR deletes
    * on a file UNION into one sidecar (entries reference exactly one).
    *
    * The sidecar is EXECUTOR-written ([[writeDvDistributed]]): the
    * distinct key set never collects to the driver — the driver
    * handles the (name, cardinality) ref only. Sidecars are
    * manifest-referenced, so vacuum protects them while any retaining
    * snapshot lives, and time-travel readers of pre-delete versions
    * never see the `#dv:` entry.
    */
  /** Write one value-keyed DV sidecar from the EXECUTORS: the distinct
    * key set (unioned with a prior sidecar's contents, both read as
    * ordinary datasets) sorts into a single partition whose one task
    * streams the run straight into the sidecar file — the driver sees
    * only the (name, cardinality) ref, never the keys. A `DELETE WHERE`
    * whose key frame matches billions of rows costs the cluster one
    * tiny extra stage and the driver nothing, closing what used to be
    * the last data-proportional driver collect in the DML stack. The
    * single-partition sort is fine at any realistic DV size (a sidecar
    * bigger than one task's comfort zone means the table wants a COW
    * rewrite, not a larger vector).
    */
  private def writeDvDistributed(spark: SparkSession, dir: String,
      keys: DataFrame, keyCol: String, prior: Option[String])
      : (String, Long) = {
    import spark.implicits._
    val name = s"dv-${java.util.UUID.randomUUID}.gdv"
    val full = s"$dir/data/$name"
    val confMap = FsMeta.confAsMap()
    val fresh = keys.select(col(keyCol).cast("long").as("__dvk")).as[Long]
    val all = prior match {
      case Some(p) => fresh.union(
        spark.read.textFile(s"$dir/data/$p")
          .filter((l: String) => l.nonEmpty).map(_.toLong))
      case None => fresh
    }
    val n = all.distinct().repartition(1)
      .sortWithinPartitions("__dvk")
      .mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confMap.foreach { case (k, v) => conf.set(k, v) }
        val hp = new org.apache.hadoop.fs.Path(full)
        val out = new java.io.BufferedOutputStream(
          hp.getFileSystem(conf).create(hp, true))
        var count = 0L
        try it.foreach { k =>
          out.write(k.toString.getBytes(
            java.nio.charset.StandardCharsets.UTF_8))
          out.write('\n')
          count += 1
        } finally out.close()
        Iterator.single(count)
      }.collect().sum // one long per partition to the driver, not keys
    (name, n)
  }

  /** DV the distinct `keys` onto `affectedEntries`: one NEW sidecar per
    * distinct prior sidecar (entries sharing a prior share the unioned
    * successor — a file always references exactly one value-keyed
    * sidecar, never a chain). Sidecars are executor-written
    * ([[writeDvDistributed]]); the key frame's plan re-runs once per
    * distinct prior group, which is 1 for every table this side of a
    * partial-history mess. Returns the updated entries plus the sidecar
    * names written (for cleanup if the commit loses the CAS).
    */
  private def attachDvs(spark: SparkSession, dir: String, keyCol: String,
      affectedEntries: Seq[ManifestTable.FileEntry], keys: DataFrame)
      : (Seq[ManifestTable.FileEntry], Seq[String]) = {
    val dvKey = ManifestTable.dvStatKey(keyCol)
    val byPrior = affectedEntries.groupBy(_.stats.get(dvKey).map(_._1))
    val written = scala.collection.mutable.ListBuffer.empty[String]
    val successor: Map[Option[String], (String, Long)] =
      byPrior.keys.map { prior =>
        val (name, n) = writeDvDistributed(spark, dir, keys, keyCol, prior)
        written += name
        prior -> (name, n)
      }.toMap
    val updated = affectedEntries.map { f =>
      val (name, n) = successor(f.stats.get(dvKey).map(_._1))
      f.copy(stats = f.stats + (dvKey -> (name, n.toString)))
    }
    (updated, written.toSeq)
  }

  def deleteMor(spark: SparkSession, dir: String, keys: DataFrame,
      keyCol: String, branch: String = ""): CowResult =
    withCommitRetry(dir, branch) { m =>
    requireIntegralKey(keys, keyCol)
    requireTableKey(m, keyCol)
    val affected = affectedFiles(spark, m, keys, keyCol).toSet
    if (affected.isEmpty) {
      CowResult(m.version, 0, m.files.size, 0)
    } else {
      val affectedEntries = m.files.filter(f => affected.contains(f.name))
      val (updated, written) =
        attachDvs(spark, dir, keyCol, affectedEntries, keys)
      try {
        beforeCommitHook()
        val v = ManifestTable.commitReplace(dir, m.version, affected,
          updated, branch, "mor-delete")
        CowResult(v, 0, m.files.size - affected.size, 0)
      } catch { case e: ManifestTable.ConcurrentCommitException =>
        written.foreach(n => FsMeta.deleteRecursive(s"$dir/data/$n"))
        throw e
      }
    }
  }

  /** MERGE (upsert), merge-on-read — the MOR story completed: the OLD
    * versions of updated keys are deletion-vectored onto the affected
    * entries ([[deleteMor]]'s sidecar machinery) and the update rows
    * land as NEW files in the SAME commit, so the upsert rewrites ZERO
    * existing data files (Iceberg v2's merge-on-read MERGE shape). Read
    * semantics equal [[merge]] exactly — whole-row replacement + insert
    * (CowSpec pins the equality); the read pays the dv binary search on
    * affected files until compaction materializes, the deliberate MOR
    * trade. DV'ing insert keys too is harmless (no row matches) and
    * keeps the affected-set logic identical to the COW path.
    */
  def mergeMor(spark: SparkSession, dir: String, updates: DataFrame,
      keyCol: String, branch: String = ""): CowResult =
    withCommitRetry(dir, branch) { m =>
    checkSchema(m, updates, "updates")
    requireIntegralKey(updates, keyCol)
    requireTableKey(m, keyCol)
    val affected = affectedFiles(spark, m, updates, keyCol).toSet
    val affectedEntries = m.files.filter(f => affected.contains(f.name))
    val (updated, written) =
      attachDvs(spark, dir, keyCol, affectedEntries, updates)
    val added = stageAndAdopt(spark, dir,
      reclustered(updates.select(m.schema.fieldNames.map(col).toSeq: _*),
        keyCol, math.max(1, affected.size)), m)
    try {
      beforeCommitHook()
      val v = ManifestTable.commitReplace(dir, m.version, affected,
        updated ++ added, branch, "mor-merge")
      CowResult(v, 0, m.files.size - affected.size, added.size)
    } catch { case e: ManifestTable.ConcurrentCommitException =>
      (written ++ added.map(_.name)).foreach(n =>
        FsMeta.deleteRecursive(s"$dir/data/$n"))
      throw e
    }
  }

  def delete(spark: SparkSession, dir: String, keys: DataFrame,
      keyCol: String, branch: String = ""): CowResult =
    withCommitRetry(dir, branch) { m =>
    requireIntegralKey(keys, keyCol)
    requireTableKey(m, keyCol)
    val affected = affectedFiles(spark, m, keys, keyCol)
    val kept = readOnly(spark, dir, affected, m.schema, branch)
      .join(broadcast(keys.select(col(keyCol).cast("long").as("__k"))
        .distinct()),
        col(keyCol).cast("long") === col("__k"), "left_anti")
      .select(m.schema.fieldNames.map(col).toSeq: _*)
    val added = if (kept.isEmpty) Seq.empty
      else stageAndAdopt(spark, dir,
        reclustered(kept, keyCol, affected.size), m)
    val v = commitOrCleanup(dir, m, affected, added, branch, "cow-delete")
    CowResult(v, affected.size, m.files.size - affected.size, added.size)
  }
}
