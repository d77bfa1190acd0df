package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

/** Small-file METADATA I/O (manifests, params, commit markers) through the
  * Hadoop [[FileSystem]] API, so the persistence operators ([[graft.streaming.MergeSink]],
  * [[graft.operators.IncrementalDedup]], [[graft.streaming.DedupIngest]]) run against any
  * Spark-reachable store — `file:/`, `hdfs://`, object stores — not just
  * the local POSIX filesystem `java.nio.file` is limited to. The DATA path
  * was always store-agnostic (Spark readers/writers); this closes the gap
  * for the sidecar files.
  *
  * Rename semantics by store (documented here once, relied on by callers):
  *   - HDFS / local: `FileContext.rename(OVERWRITE)` is atomic — a reader
  *     sees the old file or the new one, never a torn write (the
  *     tmp→rename commit of /root/reference/mr/coordinator.go:37-53).
  *   - Object stores (S3A, GCS): rename is copy+delete, NOT atomic. The
  *     manifest payload carries a CRC precisely for this case: a reader
  *     that catches a torn publish fails loudly instead of following a
  *     mangled pointer (see MergeSink.currentVersion).
  */
object FsMeta {

  /** Hadoop conf from the active session (so `spark.hadoop.*` settings and
    * store credentials apply); a bare Configuration outside a session.
    */
  def hadoopConf(): Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private def fsFor(p: String): (FileSystem, Path) = {
    val path = new Path(p)
    val fs = path.getFileSystem(hadoopConf())
    // Metadata payloads carry their OWN integrity check (MergeSink's
    // manifest CRC); Hadoop's client-side .crc sidecars (ChecksumFileSystem,
    // e.g. local file:/) would additionally fail reads after the documented
    // out-of-band operator repair ("re-point the manifest by hand"), so they
    // are disabled for metadata I/O. No-ops on filesystems without sidecars.
    fs.setVerifyChecksum(false)
    fs.setWriteChecksum(false)
    (fs, path)
  }

  def exists(p: String): Boolean = {
    val (fs, path) = fsFor(p); fs.exists(path)
  }

  def isDirectory(p: String): Boolean = {
    val (fs, path) = fsFor(p)
    fs.exists(path) && fs.getFileStatus(path).isDirectory
  }

  def mkdirs(p: String): Unit = {
    val (fs, path) = fsFor(p); fs.mkdirs(path): Unit
  }

  def readString(p: String): String = {
    val (fs, path) = fsFor(p)
    val in = fs.open(path)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Overwriting write — NOT atomic on its own; use [[publishAtomic]] for
    * pointer files readers race against.
    */
  def writeString(p: String, s: String): Unit = {
    val (fs, path) = fsFor(p)
    val out = fs.create(path, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Atomic-create of an empty marker file; false if it already exists —
    * the create-if-absent the reference's done-file protocol needs.
    */
  def createMarker(p: String): Boolean = {
    val (fs, path) = fsFor(p)
    try { fs.create(path, false).close(); true }
    catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
            case _: java.io.IOException if fs.exists(path) => false }
  }

  /** OBJECT-STORE COMMIT MODE (`spark.graft.commit.norename=true`):
    * every publish in the manifest-table commit stack avoids rename
    * entirely — data files are born at their final write-once names,
    * version snapshots publish by atomic create-no-overwrite (one
    * conditional PUT), and the pointer is a plain overwrite PUT whose
    * payload CRC catches any tear. For stores where rename is
    * copy+delete (S3A, GCS) this makes the manifest CAS the ONLY
    * publish point, as it should be; the default (rename) path stays
    * right for HDFS/local where rename is atomic O(1) metadata.
    */
  def noRenameCommits: Boolean =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .exists(_.conf.getOption("spark.graft.commit.norename")
        .contains("true"))

  /** Create-no-overwrite write of `payload` at `p` — the no-rename
    * snapshot CAS: exactly one writer creates a given name (Hadoop's
    * create(overwrite=false); conditional PUT on object stores). False
    * = the name exists (CAS lost). A crash mid-write can strand a torn
    * payload under a taken name on stores WITHOUT atomic PUT — the
    * payload CRC turns that into a loud read error, and object stores
    * (where this mode belongs) publish objects all-or-nothing.
    */
  def createExclusive(p: String, payload: String): Boolean = {
    val (fs, path) = fsFor(p)
    val out =
      try fs.create(path, false)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => return false
        case _: java.io.IOException if fs.exists(path) => return false
      }
    try out.write(payload.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    true
  }

  /** Publish `payload` at `finalP` via tmp-write + rename(OVERWRITE) — the
    * reference's tmp→rename commit (mr/coordinator.go:37-53) on the Hadoop
    * API. Atomic on HDFS; see the object-store caveat in the object
    * scaladoc. On the LOCAL scheme Hadoop's FileContext rename with
    * OVERWRITE is delete-then-rename — a concurrent reader can observe
    * the destination ABSENT mid-publish (found by StreamReadSpec:
    * latestOffset read version 0 during an append) — so local paths go
    * through java.nio ATOMIC_MOVE instead, which really is atomic.
    */
  def publishAtomic(tmpP: String, finalP: String, payload: String): Unit = {
    if (noRenameCommits) {
      // single overwrite PUT: atomic on object stores (readers see the
      // old object or the new one); the payload CRC guards the rest
      writeString(finalP, payload)
      return
    }
    writeString(tmpP, payload)
    val (fs, dst) = fsFor(finalP)
    val src = fs.makeQualified(new Path(tmpP))
    val qDst = fs.makeQualified(dst)
    if (qDst.toUri.getScheme == "file") {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(src.toUri.getPath),
        java.nio.file.Paths.get(qDst.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      val fc = FileContext.getFileContext(qDst.toUri, hadoopConf())
      fc.rename(src, qDst, Options.Rename.OVERWRITE)
    }
  }

  /** The active session's Hadoop conf flattened to a serializable map —
    * the executor side of a connector rebuilds a [[Configuration]] from it
    * so `spark.hadoop.*` settings and store credentials reach task-side
    * file I/O (driver-only: getActiveSession is unset on executors).
    */
  def confAsMap(): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    hadoopConf().iterator().asScala.map(e => e.getKey -> e.getValue).toMap
  }

  /** Rename `src` to `dst` ONLY if `dst` does not already exist; returns
    * whether this call performed the rename. The idempotent-publish
    * primitive of [[StagedAppend]]: destinations carry deterministic
    * names, so a replay that finds its destination occupied knows an
    * earlier attempt already published that file and skips it. The
    * exists-check + rename pair is not atomic, but the callers are
    * single-writer per (path, tag) by construction — a streaming sink's
    * serialized foreachBatch.
    *
    * `false` means exactly one thing: the destination already exists (a
    * replay skip). A rename FAILURE — Hadoop's `FileSystem.rename`
    * reports missing sources, crossed mount points, and many transient
    * store errors as `false`, not exceptions — must NOT be conflated
    * with that skip: callers delete the staging directory and write the
    * batch marker on return, so a swallowed failure would silently and
    * permanently drop the file's rows from an "exactly-once" table.
    * When the rename fails and the destination is still absent, this
    * throws instead.
    */
  def renameIfAbsent(src: String, dst: String): Boolean = {
    val (fs, s) = fsFor(src)
    val d = fs.makeQualified(new Path(dst))
    if (fs.exists(d)) false
    else if (fs.rename(fs.makeQualified(s), d)) true
    else if (fs.exists(d)) false // rename lost to a concurrent publish of dst
    else throw new java.io.IOException(
      s"rename $src -> $dst failed with no destination present; " +
        "refusing to treat a filesystem failure as a replay skip")
  }

  /** Every DATA file under `dir`, recursively, as (relative subdirectory
    * path — "" at the root — , file name); metadata names (leading `_`
    * or `.`: _SUCCESS, _temporary, checksums) are skipped at every
    * level, matching Spark's own leaf-file filter.
    */
  def listDataFilesRecursive(dir: String): Seq[(String, String)] = {
    val (fs, root) = fsFor(dir)
    if (!fs.exists(root)) return Seq.empty
    def hidden(name: String) = name.startsWith("_") || name.startsWith(".")
    def walk(p: Path, rel: String): Seq[(String, String)] =
      fs.listStatus(p).toSeq.filterNot(st => hidden(st.getPath.getName))
        .flatMap { st =>
          if (st.isFile) Seq((rel, st.getPath.getName))
          else walk(st.getPath,
            if (rel.isEmpty) st.getPath.getName else s"$rel/${st.getPath.getName}")
        }
    walk(root, "")
  }

  /** Names of plain files directly under `dir` (empty if `dir` absent). */
  def listFiles(dir: String): Seq[String] = {
    val (fs, path) = fsFor(dir)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).filter(_.isFile).map(_.getPath.getName).toSeq
  }

  /** Names of immediate subdirectories of `dir` (empty if `dir` absent). */
  def listSubdirs(dir: String): Seq[String] = {
    val (fs, path) = fsFor(dir)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).filter(_.isDirectory).map(_.getPath.getName).toSeq
  }

  def modificationTime(p: String): Long = {
    val (fs, path) = fsFor(p); fs.getFileStatus(path).getModificationTime
  }

  def deleteRecursive(p: String): Unit = {
    val (fs, path) = fsFor(p); fs.delete(path, true): Unit
  }
}
