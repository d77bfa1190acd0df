package graft.sources

/** EXACTLY-ONCE parquet appends for streaming ingest — the stage-then-
  * publish protocol that closes the at-least-once crash window a plain
  * `mode("append")` leaves open (a replay after a crash between the
  * append's job commit and the batch marker re-appends the same rows).
  *
  * Protocol, per (table, batch tag):
  *   1. STAGE: the batch's rows are written to a private staging
  *      directory with OVERWRITE — a replay rewrites the stage from
  *      scratch, so the staged file set is a deterministic function of
  *      the batch (foreachBatch replays the same data, the writes
  *      hash-partition on fixed keys, so file k holds the same rows on
  *      every attempt).
  *   2. PUBLISH: each staged part file is RENAMED into the live table
  *      directory under a DETERMINISTIC destination name derived from
  *      (task partition, tag) — not the attempt-unique UUID Spark
  *      embeds. A rename is O(1) metadata on HDFS/local (the
  *      reference's tmp→rename commit, mr/coordinator.go:37-53, at
  *      file granularity); a destination that already exists means an
  *      earlier attempt published that file, and the rename is SKIPPED.
  *   3. The staging directory is deleted.
  *
  * Crash anywhere → replay converges: mid-stage (staging garbage only,
  * live table untouched — Spark's own job commit keeps uncommitted
  * part files invisible), mid-publish (the already-renamed files'
  * destinations exist and are skipped; the rest are renamed), or
  * after publish before the caller's marker (every destination exists;
  * the whole publish is a no-op). Duplicate rows are impossible
  * because destination names are unique per (tag, task) and never
  * re-renamed. Object-store caveat: rename there is copy+delete, not
  * atomic — pair with a manifest commit ([[graft.sources.ManifestTable]])
  * on such stores.
  *
  * Bucketed destinations: for a bucketed table the published name must
  * carry the BUCKET ID where Spark's reader parses it (`_00007` before
  * the extension). The staged write repartitions by the bucket column
  * with the bucket count — the same hash-mod layout `bucketBy` uses —
  * so staged task partition k holds exactly bucket k's rows, and the
  * published name encodes k as both the task part and the bucket
  * suffix. This writes bucket-correct files WITHOUT saveAsTable, so
  * staging never touches the session catalog.
  */
object StagedAppend {

  private val PartFile = "^part-(\\d+)-.*$".r

  /** Publish every staged data file into `finalDir`; returns how many
    * renames this call actually performed (0 = complete replay no-op).
    * `tag` must be unique per logical batch and stable across replays
    * (e.g. the streaming batch id). `bucketed` switches the destination
    * naming to carry the bucket id (staged-by-repartition contract
    * above); partition subdirectories (`cell=3/...`) are preserved.
    *
    * Replay contract, ENFORCED: exactly-once holds only if a replay
    * stages the SAME file set (callers guarantee it by pinning the
    * staged write's partition count to an index parameter — p.nlist /
    * p.numBuckets). Rather than trusting that invariant, the first
    * publish records the planned destination list in a `_stage-<tag>`
    * sidecar (atomic tmp→rename publish, skipped by Spark's leaf-file
    * filter); every later publish under the same tag asserts its staged
    * set matches the recorded one and THROWS on divergence — a caller
    * that forgets the pinned repartition gets an error, not silent
    * duplicate rows.
    */
  def publish(stagingDir: String, finalDir: String, tag: String,
      bucketed: Boolean): Int = {
    require(tag.matches("[A-Za-z0-9=_-]+"),
      s"tag must be filesystem-safe, got '$tag'")
    val planned = FsMeta.listDataFilesRecursive(stagingDir).map { case (rel, name) =>
      val task = name match {
        case PartFile(t) => t
        case other => throw new IllegalStateException(
          s"unexpected staged file name '$other' under $stagingDir")
      }
      val destName =
        if (bucketed) s"part-$task-$tag-pub_$task.c000.snappy.parquet"
        else s"part-$task-$tag-pub.c000.snappy.parquet"
      val src = if (rel.isEmpty) s"$stagingDir/$name" else s"$stagingDir/$rel/$name"
      (src, if (rel.isEmpty) destName else s"$rel/$destName")
    }
    val manifest = planned.map(_._2).sorted.mkString("\n")
    val sidecar = s"$finalDir/_stage-$tag"
    FsMeta.mkdirs(finalDir)
    if (FsMeta.exists(sidecar)) {
      val recorded = FsMeta.readString(sidecar)
      if (recorded != manifest) throw new IllegalStateException(
        s"replay of stage tag '$tag' staged a different file set than the " +
          s"recorded publish (recorded ${recorded.linesIterator.size} files, " +
          s"staged ${planned.size}); the caller's staged partitioning is not " +
          "replay-stable — duplicates would result. Recorded:\n" + recorded +
          "\nStaged:\n" + manifest)
    } else {
      FsMeta.publishAtomic(s"$finalDir/._stage-$tag.tmp", sidecar, manifest)
    }
    var moved = 0
    planned.foreach { case (src, destRel) =>
      val dest = s"$finalDir/$destRel"
      val destDir = dest.substring(0, dest.lastIndexOf('/'))
      FsMeta.mkdirs(destDir)
      if (FsMeta.renameIfAbsent(src, dest)) moved += 1
    }
    moved
  }
}
