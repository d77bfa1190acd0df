package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{DataWriter, DeltaBatchWrite,
  DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory,
  LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation,
  WriterCommitMessage}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.hadoop.conf.Configuration

/** SQL `DELETE` / `UPDATE` / `MERGE INTO` as MERGE-ON-READ — Spark 4's
  * DELTA-BASED row-level operation API (`SupportsDelta`): instead of
  * rewriting every scanned file (the group-based COW shape,
  * [[GTabRowLevelOperation]]), the operation emits a ROW-LEVEL delta —
  * deletes identified by the connector's (`_file`, `_pos`) row ID,
  * inserts as ordinary new files — and the commit attaches POSITION
  * deletion vectors (`#dvp` sidecars, sorted line ordinals) to the
  * affected manifest entries. ZERO existing data files rewrite; the
  * read path subtracts marked ordinals row-level until a compaction
  * materializes the merge away (the same contract as the value-keyed
  * [[CowOps.deleteMor]] vectors, which this generalizes: positions
  * identify ANY row, so arbitrary SQL predicates work without a key
  * column).
  *
  * The row ID rides the line-oriented codec's one stable invariant:
  * rows are never reordered in place (deletes are sidecars, rewrites
  * produce NEW files), so the 0-based line ordinal plus the file name
  * is a durable identity. `representUpdateAsDeleteAndInsert` — Spark
  * splits UPDATE/MERGE-update rows into a position delete plus a plain
  * insert, so one writer shape covers all three commands.
  *
  * Strategy selection is per-command via TBLPROPERTIES
  * (`write.delete.mode` / `write.update.mode` / `write.merge.mode` =
  * `merge-on-read`); the default stays copy-on-write. The 100 TB
  * guidance the two strategies encode: COW localizes a sparse MERGE to
  * O(touched files) through runtime group filtering but rewrites them
  * whole — right for clustered tables and occasional wide updates; MOR
  * writes O(changed rows) regardless of layout — right for frequent
  * small upserts and deletes where rewrite amplification dominates.
  * (Spark's runtime group filtering applies only to group-based plans,
  * so a MOR MERGE's scan prunes statically; DELETE/UPDATE predicates
  * are literal and prune files exactly as any read does.)
  *
  * Concurrency is the COW path's verbatim: the scan records the
  * manifest version it planned against, the commit goes through
  * [[ManifestTable.commitReplace]]'s version CAS, and any interleaved
  * commit surfaces the typed conflict instead of merging over stale
  * reasoning.
  */
private[sources] class GTabMorOperation(path: String, cmd: Command)
    extends RowLevelOperation
    with org.apache.spark.sql.connector.write.SupportsDelta {

  /** Scan-to-commit handshake: the manifest version the scan planned
    * against (snapshot isolation for the commit CAS). Same discipline
    * as [[GTabRowLevelOperation.scanned]].
    */
  @volatile private[sources] var scanned: Option[(Long, Set[String])] = None

  override def command(): Command = cmd
  override def description(): String = s"GTabMorOperation $cmd $path"

  override def rowId()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(
      org.apache.spark.sql.connector.expressions.Expressions.column(
        ManifestTable.FileMetaCol),
      org.apache.spark.sql.connector.expressions.Expressions.column(
        ManifestTable.PosMetaCol))

  /** UPDATE (and MERGE's update action) arrives as delete + insert —
    * one writer shape for all three commands, and the position vector
    * never has to express "replaced in place".
    */
  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array.empty

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new GTabScanBuilder(path, None, None, GTabStreamOpts(None, false), "",
      onPlan = Some((v, names) => scanned = Some((v, names))))

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = {
        ManifestTable.checkSupported(info.schema())
        val m = ManifestTable.readManifest(path).getOrElse(
          throw new IllegalArgumentException(
            s"no committed manifest at $path"))
        // inserted files keep the table's bloom/NDV/partition layout —
        // the same preservation rule as every COW rewrite, declared
        // TBLPROPERTIES unioned in (the adoption path)
        val (bloomCols, bloomBits, ndvCols) =
          CowOps.effectiveSkipConfig(path, m)
        val partCols = ManifestTable.partitionColumnsOf(m)
        new DeltaWrite {
          override def toBatch: DeltaBatchWrite =
            new GTabDeltaBatchWrite(GTabMorOperation.this, path, info,
              bloomCols, bloomBits.getOrElse(GTabBloom.DefaultBits),
              partCols, ndvCols)
        }
      }
    }
}

/** One MOR DML commit: executors stream position deletes into per-file
  * ordinal sets and inserts through the connector's normal writer
  * stack; the driver unions the positions per file (merging any
  * existing `#dvp` sidecar — a file references exactly ONE position
  * sidecar, never a chain), writes the successor sidecars, and
  * publishes one atomic manifest version where affected entries gain
  * the vector and inserted files append. Deleted-row positions travel
  * in the commit messages — O(deleted rows) driver bytes, the same
  * documented trade as the value-DV path's key collect.
  */
private[sources] class GTabDeltaBatchWrite(op: GTabMorOperation,
    path: String, info: LogicalWriteInfo, bloomCols: Seq[String],
    bloomBits: Int, partCols: Seq[String], ndvCols: Seq[String])
    extends DeltaBatchWrite {

  override def createBatchWriterFactory(
      pinfo: PhysicalWriteInfo): DeltaWriterFactory =
    new GTabDeltaWriterFactory(path, info.schema(), info.queryId(),
      FsMeta.confAsMap(), bloomCols, bloomBits, partCols, ndvCols)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val all = messages.collect { case d: GTabDeltaCommit => d }
    val (inserted, empties) =
      all.flatMap(_.inserts).partition(_.rows > 0)
    empties.foreach(e => FsMeta.deleteRecursive(s"$path/data/${e.name}"))
    val posByFile: Map[String, Array[Long]] = all.flatMap(_.deletes)
      .groupBy(_._1).map { case (f, ps) =>
        f -> ps.flatMap(_._2).distinct.sorted
      }
    if (posByFile.isEmpty && inserted.isEmpty) return
    val ver = op.scanned.map(_._1).getOrElse(
      ManifestTable.readManifest(path).map(_.version).getOrElse(0L))
    val cur = ManifestTable.readManifest(path).getOrElse(
      throw new IllegalStateException(s"no committed manifest at $path"))
    val affectedEntries = cur.files.filter(f => posByFile.contains(f.name))
    val writtenSidecars =
      scala.collection.mutable.ListBuffer.empty[String]
    val updated = affectedEntries.map { f =>
      val existing = f.stats.get(ManifestTable.DvPosKey)
        .map(d => ManifestTable.readDv(FsMeta.hadoopConf(),
          s"$path/data/${d._1}"))
        .getOrElse(Array.emptyLongArray)
      val merged = (existing ++ posByFile(f.name)).distinct.sorted
      val name = s"dvp-${java.util.UUID.randomUUID}.gdv"
      ManifestTable.writeDv(path, name, merged)
      writtenSidecars += name
      f.copy(stats = f.stats +
        (ManifestTable.DvPosKey -> (name, merged.length.toString)))
    }
    // shared test seam with the COW paths: a spec can interleave a
    // competing commit deterministically right before the CAS
    CowOps.beforeCommitHook()
    try ManifestTable.commitReplace(path, ver,
      affectedEntries.map(_.name).toSet, updated ++ inserted)
    catch { case e: Throwable =>
      (writtenSidecars ++ inserted.map(_.name)).foreach(n =>
        FsMeta.deleteRecursive(s"$path/data/$n"))
      throw e
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case d: GTabDeltaCommit => d }
      .flatMap(_.inserts).foreach(e =>
        FsMeta.deleteRecursive(s"$path/data/${e.name}"))
}

/** (inserted data files, file name -> deleted line ordinals). */
private[sources] final case class GTabDeltaCommit(
    inserts: Seq[ManifestTable.FileEntry],
    deletes: Map[String, Array[Long]])
    extends WriterCommitMessage

private[sources] class GTabDeltaWriterFactory(path: String,
    schema: org.apache.spark.sql.types.StructType, queryId: String,
    confMap: Map[String, String], bloomCols: Seq[String], bloomBits: Int,
    partCols: Seq[String], ndvCols: Seq[String])
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DeltaWriter[InternalRow] = {
    val conf = new Configuration(false)
    confMap.foreach { case (k, v) => conf.set(k, v) }
    new GTabDeltaWriter(path, schema,
      s"delta-$queryId-$partitionId-$taskId", conf, bloomCols, bloomBits,
      partCols, ndvCols)
  }
}

/** Executor-side delta writer: deletes accumulate as (file → ordinal
  * buffer) — a few longs per deleted row, no I/O until commit — and
  * inserts stream through the ordinary [[GTabWriters]] stack (unique
  * names, invisible until the manifest lists them). The row-ID rows
  * Spark hands in are REUSED projections: values are extracted
  * immediately, never retained.
  */
private[sources] class GTabDeltaWriter(dir: String,
    schema: org.apache.spark.sql.types.StructType, stem: String,
    conf: Configuration, bloomCols: Seq[String], bloomBits: Int,
    partCols: Seq[String], ndvCols: Seq[String])
    extends DeltaWriter[InternalRow] {

  private var insertWriter: DataWriter[InternalRow] = _
  private val deletes =
    scala.collection.mutable.HashMap.empty[
      String, scala.collection.mutable.ArrayBuffer[Long]]

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    // row ID layout follows rowId(): (_file: string, _pos: long)
    val file = id.getUTF8String(0).toString
    val pos = id.getLong(1)
    val name = file.substring(file.lastIndexOf('/') + 1)
    deletes.getOrElseUpdate(name,
      scala.collection.mutable.ArrayBuffer.empty[Long]) += pos
  }

  override def update(meta: InternalRow, id: InternalRow,
      row: InternalRow): Unit =
    throw new IllegalStateException(
      "unreachable: updates are split into delete + insert " +
        "(representUpdateAsDeleteAndInsert)")

  override def insert(row: InternalRow): Unit = {
    if (insertWriter == null)
      insertWriter = GTabWriters.create(dir, schema, stem, conf,
        bloomCols, bloomBits, partCols, ndvCols)
    insertWriter.write(row)
  }

  override def commit(): WriterCommitMessage = {
    val ins =
      if (insertWriter == null) Seq.empty[ManifestTable.FileEntry]
      else GTabCommits.entriesOf(Array(insertWriter.commit()))
    GTabDeltaCommit(ins, deletes.map { case (f, ps) =>
      f -> ps.toArray
    }.toMap)
  }

  override def abort(): Unit =
    if (insertWriter != null) insertWriter.abort()
  override def close(): Unit =
    if (insertWriter != null) insertWriter.close()
}
