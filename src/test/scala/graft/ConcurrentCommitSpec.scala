package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{CowOps, ManifestTable}

/** Optimistic concurrency for manifest commits (round 12): the version
  * snapshot is a create-once CAS, a losing writer gets a typed
  * ConcurrentCommitException instead of silently overwriting the winner,
  * CowOps retries by recomputing its affected set, and a crashed
  * winner's lagging pointer heals on the next commit.
  */
class ConcurrentCommitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"
  private def tmp(): String =
    Files.createTempDirectory("graft_occ").toString

  /** 100 rows, key-clustered into 5 files of 20 (tight zone maps). */
  private def build(dir: String): Unit =
    spark.range(0, 100).select(col("id").as("k"),
        concat(lit("v"), col("id")).as("s"))
      .repartitionByRange(5, col("k")).sortWithinPartitions("k")
      .write.format(Fmt).option("path", dir).mode(SaveMode.Append).save()

  private def readAll(dir: String) =
    spark.read.format(Fmt).option("path", dir).load()
      .as[(Long, String)].collect().toMap

  test("two-writer race: one winner, typed conflict for the loser, CowOps retry lands both") {
    val dir = tmp()
    build(dir)
    val v0 = ManifestTable.readManifest(dir).get.version
    var conflictSeen = false
    var hookRan = false
    // deterministic interleaving: writer B (merge) stages its rewrite,
    // then — right before its commit — writer A (delete) wins the next
    // version. B's first commit must lose the CAS with the typed error,
    // then B recomputes against A's version and lands.
    CowOps.beforeCommitHook = () => {
      CowOps.beforeCommitHook = () => () // A commits hook-free
      hookRan = true
      CowOps.delete(spark, dir, Seq(90L).toDF("k"), "k")
    }
    try {
      val r = CowOps.merge(spark, dir, Seq((5L, "U5")).toDF("k", "s"), "k")
      assert(hookRan)
      assert(r.version == v0 + 2,
        s"loser must retry ON TOP of the winner: got ${r.version}")
    } catch { case e: ManifestTable.ConcurrentCommitException =>
      conflictSeen = true; throw e
    } finally CowOps.beforeCommitHook = () => ()
    assert(!conflictSeen, "retry should absorb the conflict")
    val got = readAll(dir)
    assert(got.size == 99 && got(5L) == "U5" && !got.contains(90L),
      "both writers' effects must land")
    // never a lost file reference: every manifest entry exists on disk,
    // in every retained version
    ManifestTable.snapshotVersions(dir).foreach { v =>
      ManifestTable.readManifestAsOf(dir, v).files.foreach { f =>
        assert(Files.exists(Paths.get(dir, "data", f.name)),
          s"version $v references missing file ${f.name}")
      }
    }
  }

  test("the loser's conflicted attempt leaves no debris in the data dir") {
    val dir = tmp()
    build(dir)
    CowOps.beforeCommitHook = () => {
      CowOps.beforeCommitHook = () => ()
      CowOps.delete(spark, dir, Seq(5L).toDF("k"), "k") // SAME file as B's merge
    }
    try CowOps.merge(spark, dir, Seq((6L, "U6")).toDF("k", "s"), "k")
    finally CowOps.beforeCommitHook = () => ()
    val referenced = ManifestTable.snapshotVersions(dir)
      .flatMap(v => ManifestTable.readManifestAsOf(dir, v).files.map(_.name))
      .toSet
    val onDisk = new java.io.File(s"$dir/data").list().toSet
    assert(onDisk == referenced,
      s"unreferenced debris: ${(onDisk -- referenced).mkString(",")}")
    val got = readAll(dir)
    assert(got.size == 99 && got(6L) == "U6" && !got.contains(5L))
  }

  test("default-mode concurrent-writer storm: linearizable versions, " +
      "exactly-once effects, zero debris after vacuum") {
    // the rename-CAS twin of NoRenameCommitSpec's storm: the hook-based
    // tests above pin DETERMINISTIC interleavings; this races 4 real
    // threads x 3 commits (3 appenders + a COW merger) through
    // renameIfAbsent snapshots + ATOMIC_MOVE pointer publishes
    val dir = tmp()
    (0 until 100).map(i => (i.toLong, 0L)).toDF("id", "v")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
      .write.format(Fmt).option("path", dir).mode(SaveMode.Append).save()
    val writers = 4
    val commitsEach = 3
    def attempt[A](n: Int)(body: => A): A =
      try body catch {
        case _: ManifestTable.ConcurrentCommitException if n > 1 =>
          attempt(n - 1)(body)
      }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until writers).map { w =>
      new Thread(() => {
        try {
          (0 until commitsEach).foreach { j =>
            if (w == 0)
              attempt(4)(CowOps.merge(spark, dir,
                Seq((j.toLong, (j + 1).toLong)).toDF("id", "v"), "id"))
            else
              attempt(4)((0 until 50)
                .map(i => (1000L * w + 100L * j + i, -1L)).toDF("id", "v")
                .write.format(Fmt).option("path", dir)
                .mode(SaveMode.Append).save())
          }
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errs.isEmpty, s"a writer failed: ${errs.peek()}")
    val total = 1 + writers * commitsEach
    val m = ManifestTable.readManifest(dir).get
    assert(m.version == total,
      s"expected $total linearized versions, head is ${m.version}")
    val versions = ManifestTable.snapshotVersions(dir)
    assert(versions == (1L to total.toLong),
      s"versions must be contiguous, got $versions")
    // every hop is one writer's whole commit — +50 (append) or 0 (merge)
    val counts = versions.map(v =>
      ManifestTable.readManifestAsOf(dir, v).nRows)
    val deltas = counts.zip(counts.tail).map { case (a, b) => b - a }
    assert(deltas.forall(d => d == 0L || d == 50L),
      s"non-atomic version hop: deltas $deltas")
    assert(deltas.count(_ == 50L) == (writers - 1) * commitsEach)
    val rows = spark.read.format(Fmt).option("path", dir).load()
      .as[(Long, Long)].collect().toMap
    assert(rows.size == 100 + (writers - 1) * commitsEach * 50)
    (0 until commitsEach).foreach(j =>
      assert(rows(j.toLong) == j + 1, s"merge of key $j lost"))
    // zero debris: after expiry + vacuum the data dir holds exactly the
    // final version's files — losers' staged rewrites all reclaimed
    ManifestTable.expireSnapshots(dir, keepLast = 1)
    ManifestTable.vacuum(dir, graceMs = 0L)
    val referenced = ManifestTable.readManifest(dir).get.files
      .map(_.name).toSet
    val onDisk = new java.io.File(s"$dir/data").list().toSet
    assert(onDisk == referenced,
      s"debris: ${(onDisk -- referenced).mkString(",")} / missing: " +
        (referenced -- onDisk).mkString(","))
  }

  test("crashed winner's lagging pointer heals: the next commit rolls forward and lands") {
    val dir = tmp()
    Seq((1L, "a")).toDF("id", "s")
      .write.format(Fmt).option("path", dir).mode(SaveMode.Append).save()
    Seq((2L, "b")).toDF("id", "s")
      .write.format(Fmt).option("path", dir).mode(SaveMode.Append).save()
    // simulate a winner that crashed between its snapshot and pointer
    // writes: v2's snapshot exists, but the pointer still shows v1
    Files.writeString(Paths.get(dir, "_MANIFEST"),
      Files.readString(Paths.get(dir, "_MANIFEST.v1")))
    assert(ManifestTable.readManifest(dir).get.version == 1)
    // next append: CAS on v2 fails against the orphan snapshot, the
    // pointer rolls forward, the bounded retry lands it as v3
    Seq((3L, "c")).toDF("id", "s")
      .write.format(Fmt).option("path", dir).mode(SaveMode.Append).save()
    val m = ManifestTable.readManifest(dir).get
    assert(m.version == 3, s"expected healed commit at v3, got ${m.version}")
    assert(spark.read.format(Fmt).option("path", dir).load().count() == 3)
  }
}
