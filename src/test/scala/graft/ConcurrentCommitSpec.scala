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
