package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ManifestTable

/** Branches / write-audit-publish: a branch is a second pointer+snapshot
  * namespace over the SAME data directory (zero-copy fork), written via
  * `.option("branch", name)`, invisible to main readers until
  * [[ManifestTable.fastForward]] publishes the head — which REFUSES when
  * main moved since the fork (typed BranchConflictException). Vacuum
  * protects live branches' files; dropBranch releases them.
  */
class BranchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"
  private def tmp(): String =
    Files.createTempDirectory("graft_branch").toString

  private def write(df: DataFrame, dir: String, branch: String = "",
      mode: SaveMode = SaveMode.Append): Unit = {
    val w = df.write.format(Fmt).option("path", dir).mode(mode)
    (if (branch.isEmpty) w else w.option("branch", branch)).save()
  }
  private def read(dir: String, branch: String = ""): DataFrame = {
    val r = spark.read.format(Fmt).option("path", dir)
    (if (branch.isEmpty) r else r.option("branch", branch)).load()
  }
  private def df(lo: Int, n: Int): DataFrame =
    (lo until lo + n).map(i => (i.toLong, s"r$i")).toDF("id", "s")

  test("write-audit-publish: branch writes are invisible until fastForward") {
    val dir = tmp()
    write(df(0, 50), dir)
    val fork = ManifestTable.createBranch(dir, "audit")
    assert(fork == ManifestTable.readManifest(dir).get.version)
    write(df(50, 30), dir, "audit")
    // audit: the branch sees the staged rows, main does not
    assert(read(dir, "audit").count() == 80)
    assert(read(dir).count() == 50)
    // publish
    val v = ManifestTable.fastForward(dir, "audit")
    assert(read(dir).count() == 80)
    assert(ManifestTable.readManifest(dir).get.version == v)
    // main's published history carries no base marker
    assert(ManifestTable.readManifest(dir).get.base == -1L)
    ManifestTable.dropBranch(dir, "audit")
    assert(ManifestTable.branches(dir).isEmpty)
  }

  test("fastForward refuses when main moved since the fork") {
    val dir = tmp()
    write(df(0, 20), dir)
    ManifestTable.createBranch(dir, "wip")
    write(df(20, 10), dir, "wip")
    // foreign main commit lands AFTER the fork
    write(df(100, 5), dir)
    val e = intercept[ManifestTable.BranchConflictException] {
      ManifestTable.fastForward(dir, "wip")
    }
    assert(e.branch == "wip")
    assert(e.mainVersion > e.base)
    // nothing was clobbered: main has its own 25 rows, branch its 30
    assert(read(dir).count() == 25)
    assert(read(dir, "wip").count() == 30)
  }

  test("branch overwrite stages a truncate without touching main") {
    val dir = tmp()
    write(df(0, 40), dir)
    ManifestTable.createBranch(dir, "rewrite")
    write(df(1000, 10), dir, "rewrite", SaveMode.Overwrite)
    assert(read(dir, "rewrite").count() == 10)
    assert(read(dir).count() == 40)
    ManifestTable.fastForward(dir, "rewrite")
    assert(read(dir).as[(Long, String)].collect().map(_._1).sorted.toSeq ==
      (1000L until 1010L).toSeq)
  }

  test("branch time travel reads the branch's own history") {
    val dir = tmp()
    write(df(0, 10), dir)
    ManifestTable.createBranch(dir, "b")
    val v1 = ManifestTable.readManifest(dir, "b").get.version
    write(df(10, 10), dir, "b")
    write(df(20, 10), dir, "b")
    assert(read(dir, "b").count() == 30)
    assert(spark.read.format(Fmt).option("path", dir)
      .option("branch", "b").option("versionAsOf", v1).load().count() == 10)
  }

  test("writing to an unknown branch fails instead of auto-creating") {
    val dir = tmp()
    write(df(0, 10), dir)
    val e = intercept[Exception] { write(df(10, 5), dir, "ghost") }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("createBranch")))
    assert(read(dir).count() == 10)
  }

  test("vacuum protects a live branch's files; dropBranch releases them") {
    val dir = tmp()
    write(df(0, 10), dir)
    ManifestTable.createBranch(dir, "keepme")
    write(df(10, 10), dir, "keepme")
    val branchOnly = ManifestTable.readManifest(dir, "keepme").get
      .files.map(_.name).toSet --
      ManifestTable.readManifest(dir).get.files.map(_.name).toSet
    assert(branchOnly.nonEmpty)
    val reclaimed = ManifestTable.vacuum(dir, graceMs = 0L)
    assert(reclaimed.toSet.intersect(branchOnly).isEmpty,
      s"vacuum must not reclaim live-branch files: $reclaimed")
    assert(read(dir, "keepme").count() == 20)
    ManifestTable.dropBranch(dir, "keepme")
    val reclaimed2 = ManifestTable.vacuum(dir, graceMs = 0L)
    assert(branchOnly.subsetOf(reclaimed2.toSet),
      s"dropped branch's files must be reclaimable, got $reclaimed2")
  }

  test("main snapshot expiry never touches branch snapshots") {
    val dir = tmp()
    (0 until 4).foreach(i => write(df(i * 10, 10), dir))
    ManifestTable.createBranch(dir, "keep")
    write(df(100, 10), dir, "keep")
    ManifestTable.expireSnapshots(dir, keepLast = 1)
    // branch still fully readable, including its history
    assert(read(dir, "keep").count() == 50)
    assert(ManifestTable.snapshotVersions(dir, "keep").size == 2)
  }

  test("dropBranch of a missing branch is a typed error, not a no-op") {
    val dir = tmp()
    write(df(0, 10), dir)
    ManifestTable.createBranch(dir, "real")
    val e = intercept[IllegalArgumentException] {
      ManifestTable.dropBranch(dir, "reel") // the typo scenario
    }
    assert(e.getMessage.contains("no branch 'reel'"))
    // the real branch is untouched
    assert(ManifestTable.branches(dir) == Seq("real"))
  }

  test("vacuum(keepLast=) expires branch snapshot chains too") {
    val dir = tmp()
    write(df(0, 10), dir)
    ManifestTable.createBranch(dir, "stream")
    // a long-lived branch accumulating versions: without branch-side
    // retention every branch snapshot would pin its files forever
    (0 until 4).foreach { i =>
      write(df(100 + i * 10, 10), dir, "stream",
        mode = SaveMode.Overwrite)
    }
    assert(ManifestTable.snapshotVersions(dir, "stream").size == 5)
    ManifestTable.vacuum(dir, graceMs = 0L, keepLast = 1)
    // only the branch HEAD's snapshot survives; the overwritten
    // versions' exclusive files became reclaimable and are gone
    assert(ManifestTable.snapshotVersions(dir, "stream").size == 1)
    assert(read(dir, "stream").count() == 10)
    assert(read(dir).count() == 10) // main untouched
    // a default vacuum (no keepLast) still retains everything
    val dir2 = tmp()
    write(df(0, 10), dir2)
    ManifestTable.createBranch(dir2, "b")
    write(df(10, 10), dir2, "b")
    ManifestTable.vacuum(dir2, graceMs = 0L)
    assert(ManifestTable.snapshotVersions(dir2, "b").size == 2)
  }

  test("COW merge stages on a branch; branchDiff audits it; publish lands it") {
    val dir = tmp()
    (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "s")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
      .write.format(Fmt).option("path", dir).mode(SaveMode.Append).save()
    ManifestTable.createBranch(dir, "audit")
    // keys 0,5,10,15,20 all land in the FIRST of the four range files
    val updates = (0 until 5).map(i => (i * 5L, s"UPD$i")).toDF("id", "s")
    val res = graft.sources.CowOps.merge(spark, dir, updates, "id",
      branch = "audit")
    assert(res.filesRewritten > 0 && res.filesUntouched > 0)
    // isolation: main sees no update
    assert(read(dir).filter(col("s").startsWith("UPD")).count() == 0)
    assert(read(dir, "audit").filter(col("s").startsWith("UPD"))
      .count() == 5)
    // the AUDIT: row-level what-would-publish-change
    val diff = ManifestTable.branchDiff(spark, dir, "audit")
      .select("_change_type", "id", "s").as[(String, Long, String)]
      .collect().toSet
    val expected = (0 until 5).flatMap { i =>
      Seq(("delete", i * 5L, s"v${i * 5}"), ("insert", i * 5L, s"UPD$i"))
    }.toSet
    assert(diff == expected)
    ManifestTable.fastForward(dir, "audit")
    assert(read(dir).filter(col("s").startsWith("UPD")).count() == 5)
    assert(read(dir).count() == 100)
  }

  test("MOR delete stages on a branch without touching main's read") {
    val dir = tmp()
    (0 until 60).map(i => (i.toLong, s"r$i")).toDF("id", "s")
      .repartitionByRange(3, col("id")).sortWithinPartitions("id")
      .write.format(Fmt).option("path", dir).mode(SaveMode.Append).save()
    ManifestTable.createBranch(dir, "gdpr")
    val res = graft.sources.CowOps.deleteMor(spark, dir,
      spark.range(0, 60, 5).select(col("id")), "id", branch = "gdpr")
    assert(res.filesRewritten == 0)
    assert(read(dir).count() == 60)
    assert(read(dir, "gdpr").count() == 48)
    ManifestTable.fastForward(dir, "gdpr")
    assert(read(dir).count() == 48)
  }

  test("branches list; names are validated; streaming a branch is refused") {
    val dir = tmp()
    write(df(0, 10), dir)
    ManifestTable.createBranch(dir, "a-1")
    ManifestTable.createBranch(dir, "b_2")
    assert(ManifestTable.branches(dir) == Seq("a-1", "b_2"))
    intercept[IllegalArgumentException] {
      ManifestTable.createBranch(dir, "bad.name")
    }
    // the refusal surfaces on the stream thread, not at start()
    val q = spark.readStream.format(Fmt).option("path", dir)
      .option("branch", "a-1").load()
      .writeStream.format("noop").start()
    val e = intercept[Exception] {
      try q.processAllAvailable() finally q.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("streaming reads follow MAIN")))
  }

  test("branch and main writers race independently: two namespaces " +
      "over one data dir, no cross-contamination, conflict-exact " +
      "fastForward") {
    // the namespace twin of the commit storms (round-17): real threads
    // committing to MAIN and to a BRANCH concurrently — each namespace
    // must linearize on its own, rows must never leak across, and the
    // moved-main fork point must still refuse the publish afterwards
    val dir = tmp()
    write(df(0, 50), dir)
    ManifestTable.createBranch(dir, "race")
    val commitsEach = 3
    def attempt[A](n: Int)(body: => A): A =
      try body catch {
        case _: ManifestTable.ConcurrentCommitException if n > 1 =>
          attempt(n - 1)(body)
      }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // 2 main appenders (ids 1000w..) + 2 branch appenders (ids 5000w..)
    val threads = (0 until 4).map { w =>
      new Thread(() => {
        try (0 until commitsEach).foreach { j =>
          if (w < 2)
            attempt(4)(write(df(1000 * (w + 1) + 100 * j, 20), dir))
          else
            attempt(4)(write(df(5000 * (w - 1) + 100 * j, 20), dir, "race"))
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errs.isEmpty, s"a writer failed: ${errs.peek()}")
    // each namespace linearized independently: fork base 1, so the
    // branch head is 1 + its 6 commits; main is 1 + its 6
    assert(ManifestTable.readManifest(dir).get.version == 1 + 2 * commitsEach)
    assert(ManifestTable.readManifest(dir, "race").get.version
      == 1 + 2 * commitsEach)
    assert(ManifestTable.snapshotVersions(dir)
      == (1L to (1 + 2 * commitsEach).toLong))
    assert(ManifestTable.snapshotVersions(dir, "race")
      == (1L to (1 + 2 * commitsEach).toLong))
    // no cross-contamination: main never sees branch ids, and both see
    // exactly their own appends over the shared base
    val mainIds = read(dir).select("id").as[Long].collect().toSet
    val branchIds = read(dir, "race").select("id").as[Long].collect().toSet
    assert(mainIds.size == 50 + 2 * commitsEach * 20)
    assert(branchIds.size == 50 + 2 * commitsEach * 20)
    assert(!mainIds.exists(_ >= 5000), "branch rows leaked into main")
    assert(!branchIds.exists(id => id >= 1000 && id < 5000),
      "main rows leaked into the branch")
    // main moved since the fork → publishing the branch must refuse
    intercept[ManifestTable.BranchConflictException] {
      ManifestTable.fastForward(dir, "race")
    }
    // vacuum protects BOTH namespaces' files while the branch lives
    ManifestTable.vacuum(dir, graceMs = 0L)
    assert(read(dir, "race").count() == 50 + 2 * commitsEach * 20)
    assert(read(dir).count() == 50 + 2 * commitsEach * 20)
  }
}
