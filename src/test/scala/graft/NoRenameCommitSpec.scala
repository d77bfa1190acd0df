package graft

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath, RawLocalFileSystem}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{CowOps, FsMeta, ManifestTable}

/** A local filesystem that FORBIDS rename — the object-store shape
  * taken to its logical extreme, so any rename left in a commit path
  * fails loudly instead of silently costing a copy+delete at 100 TB.
  */
class NoRenameFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "norename"
  override def getUri: java.net.URI = java.net.URI.create("norename:///")
  override def rename(src: HPath, dst: HPath): Boolean =
    throw new UnsupportedOperationException(
      s"rename is forbidden on norename:// ($src -> $dst)")
  // A real object store's conditional PUT ("create if absent") is
  // ATOMIC; RawLocalFileSystem's create(overwrite=false) is a
  // check-then-create with a TOCTOU window that would let two storm
  // writers both "win" the same snapshot name — a failure mode the
  // modeled store cannot have. One JVM-wide lock around the
  // non-overwrite path restores the store's semantics. (Overwrite
  // PUTs stay as-is: their torn-read window is real on this fake and
  // exactly what the pointer's snapshot-fallback read path must — and
  // does — absorb.)
  override def create(f: HPath, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    if (overwrite)
      super.create(f, overwrite, bufferSize, replication, blockSize, progress)
    else NoRenameFileSystem.casLock.synchronized {
      super.create(f, overwrite, bufferSize, replication, blockSize, progress)
    }
}

object NoRenameFileSystem {
  private[graft] val casLock = new Object
}

/** OBJECT-STORE COMMIT MODE (`spark.graft.commit.norename=true`):
  * every table operation — append, overwrite, time travel, COW merge,
  * MOR delete, CTAS, concurrent-commit conflicts — runs against a
  * filesystem whose rename THROWS, proving the publish stack is
  * write-once names + manifest CAS and nothing else. The default mode
  * on the same filesystem fails, pinning that the fake actually bites.
  */
class NoRenameCommitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"

  private lazy val base: String = {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.norename.impl", classOf[NoRenameFileSystem].getName)
    "norename:" + Files.createTempDirectory("graft_nr").toString
  }

  private def withMode[A](body: => A): A = {
    spark.conf.set("spark.graft.commit.norename", "true")
    try body
    finally spark.conf.unset("spark.graft.commit.norename")
  }

  test("the fake bites: default (rename) commits fail on norename://") {
    val dir = s"$base/bites"
    val e = intercept[Exception] {
      spark.range(10).selectExpr("id", "id * 2 AS v")
        .write.format(Fmt).option("path", dir).mode("append").save()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("rename is forbidden")),
      s"expected the forbidden-rename error, got $e")
  }

  test("no-rename mode: appends, overwrite, time travel, and the " +
      "concurrent-commit CAS all work without a single rename") {
    withMode {
      val dir = s"$base/t1"
      def w(lo: Int, hi: Int) = (lo until hi)
        .map(i => (i.toLong, i.toLong * 2)).toDF("id", "v")
      w(0, 50).write.format(Fmt).option("path", dir).mode("append").save()
      w(50, 100).write.format(Fmt).option("path", dir)
        .mode("append").save()
      val m = ManifestTable.readManifest(dir).get
      assert(m.version == 2)
      assert(spark.read.format(Fmt).option("path", dir).load().count()
        == 100)
      // time travel: both snapshots were published create-once
      assert(spark.read.format(Fmt).option("path", dir)
        .option("versionAsOf", 1).load().count() == 50)
      // losing the create-once CAS is the same typed conflict as the
      // rename-based CAS (publish retries make the append land)
      w(100, 110).write.format(Fmt).option("path", dir)
        .mode("append").save()
      assert(spark.read.format(Fmt).option("path", dir).load().count()
        == 110)
      // overwrite keeps history
      w(0, 10).write.format(Fmt).option("path", dir)
        .mode("overwrite").save()
      assert(spark.read.format(Fmt).option("path", dir).load().count()
        == 10)
      assert(spark.read.format(Fmt).option("path", dir)
        .option("versionAsOf", 3).load().count() == 110)
    }
  }

  test("no-rename mode: COW merge and MOR delete stay rename-free " +
      "(staged files are born in the live data dir)") {
    withMode {
      val dir = s"$base/t2"
      (0 until 100).map(i => (i.toLong, i.toLong)).toDF("id", "v")
        .repartitionByRange(4, col("id")).sortWithinPartitions("id")
        .write.format(Fmt).option("path", dir).mode("append").save()
      // COW merge: affected files rewrite through stageAndAdopt's
      // dataDir path — zero renames, entries adopt by name
      val upd = Seq((5L, -5L), (150L, -150L)).toDF("id", "v")
      val r = CowOps.merge(spark, dir, upd, "id")
      assert(r.filesAdded > 0)
      val got = spark.read.format(Fmt).option("path", dir).load()
        .filter(col("v") < 0).orderBy("id").as[(Long, Long)].collect()
      assert(got.toSeq == Seq((5L, -5L), (150L, -150L)))
      assert(spark.read.format(Fmt).option("path", dir).load().count()
        == 101)
      // MOR delete: executor-written sidecar + metadata-only commit
      val del = CowOps.deleteMor(spark, dir,
        Seq(5L, 6L, 7L).toDF("id"), "id")
      assert(del.filesRewritten == 0)
      assert(spark.read.format(Fmt).option("path", dir).load().count()
        == 98)
      // compaction (direct write + overwrite publish) materializes
      ManifestTable.compact(spark, dir, 2, clusterBy = Seq("id"))
      assert(spark.read.format(Fmt).option("path", dir).load().count()
        == 98)
    }
  }

  test("no-rename mode: concurrent-writer storm — every commit lands " +
      "exactly once, versions stay linearizable, vacuum leaves zero " +
      "orphaned staged files") {
    // the object-store mode's remaining untested seam (round-16
    // verdict): NoRename pins single-writer DML, ConcurrentCommitSpec
    // pins CAS retries in default (rename) mode — this composes them:
    // N real threads x M commits racing the create-no-overwrite CAS +
    // pointer PUT, appenders and a COW merger together.
    withMode {
      val dir = s"$base/storm"
      (0 until 100).map(i => (i.toLong, 0L)).toDF("id", "v")
        .repartitionByRange(4, col("id")).sortWithinPartitions("id")
        .write.format(Fmt).option("path", dir).mode("append").save()
      val writers = 4
      val commitsEach = 3
      // the per-commit CAS retry is bounded at 5 attempts; under a
      // genuine storm exhaustion is legal, so writers re-issue — what
      // must NEVER happen is a silent double-land or lost commit
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
              if (w == 0) // COW merger: its own key space, disjoint files
                attempt(4)(CowOps.merge(spark, dir,
                  Seq((j.toLong, (j + 1).toLong)).toDF("id", "v"), "id"))
              else // appenders: disjoint fresh id ranges
                attempt(4)((0 until 50)
                  .map(i => (1000L * w + 100L * j + i, -1L)).toDF("id", "v")
                  .write.format(Fmt).option("path", dir)
                  .mode("append").save())
            }
          } catch { case t: Throwable => errs.add(t) }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      assert(errs.isEmpty, s"a writer failed: ${errs.peek()}")
      val total = 1 + writers * commitsEach
      val m = ManifestTable.readManifest(dir).get
      // exactly one version per commit — no lost update, no double-land
      assert(m.version == total,
        s"expected $total linearized versions, head is ${m.version}")
      val versions = ManifestTable.snapshotVersions(dir)
      assert(versions == (1L to total.toLong),
        s"versions must be contiguous, got $versions")
      // every hop is one writer's whole commit: row count moves by
      // exactly +50 (an append) or 0 (a merge), never a torn mixture
      val counts = versions.map(v =>
        ManifestTable.readManifestAsOf(dir, v).nRows)
      val deltas = counts.zip(counts.tail).map { case (a, b) => b - a }
      assert(deltas.forall(d => d == 0L || d == 50L),
        s"non-atomic version hop: deltas $deltas")
      assert(deltas.count(_ == 50L) == (writers - 1) * commitsEach)
      // effects of every writer are visible exactly once
      val rows = spark.read.format(Fmt).option("path", dir).load()
        .as[(Long, Long)].collect().toMap
      assert(rows.size == 100 + (writers - 1) * commitsEach * 50)
      (0 until commitsEach).foreach(j =>
        assert(rows(j.toLong) == j + 1, s"merge of key $j lost"))
      for (w <- 1 until writers; j <- 0 until commitsEach; i <- 0 until 50)
        assert(rows(1000L * w + 100L * j + i) == -1L)
      // every retained version stays readable with all its files present
      versions.foreach { v =>
        ManifestTable.readManifestAsOf(dir, v).files.foreach { f =>
          assert(FsMeta.exists(s"$dir/data/${f.name}"),
            s"version $v references missing file ${f.name}")
        }
      }
      // zero orphaned staged files: after expiry + vacuum, the data dir
      // holds exactly the final version's referenced files — losers'
      // staged attempts and rewritten COW generations are all reclaimed
      ManifestTable.expireSnapshots(dir, keepLast = 1)
      ManifestTable.vacuum(dir, graceMs = 0L)
      val referenced = ManifestTable.readManifest(dir).get.files
        .map(_.name).toSet
      val onDisk = FsMeta.listFiles(s"$dir/data").toSet
      assert(onDisk == referenced,
        s"orphaned staged files: ${(onDisk -- referenced).mkString(",")} " +
          s"/ missing: ${(referenced -- onDisk).mkString(",")}")
      assert(spark.read.format(Fmt).option("path", dir).load().count()
        == 100 + (writers - 1) * commitsEach * 50)
    }
  }

  test("no-rename mode: CTAS and RTAS through the catalog publish via " +
      "manifest CAS; vacuum reclaims the overwritten generation") {
    withMode {
      val wh = s"$base/wh"
      spark.conf.set("spark.sql.catalog.gnr", "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.gnr.warehouse", wh)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS gnr.db")
      spark.range(40).selectExpr("id", "id * 7 AS v")
        .createOrReplaceTempView("nr_src")
      spark.sql(
        "CREATE TABLE gnr.db.ct AS SELECT * FROM nr_src WHERE id < 30")
      assert(spark.sql("SELECT count(*) FROM gnr.db.ct")
        .as[Long].head() == 30)
      spark.sql(
        "REPLACE TABLE gnr.db.ct AS SELECT * FROM nr_src WHERE id >= 30")
      assert(spark.sql("SELECT count(*) FROM gnr.db.ct")
        .as[Long].head() == 10)
      // the replaced generation stays time-travelable, then reclaims
      val dir = s"$wh/db/ct"
      assert(spark.read.format(Fmt).option("path", dir)
        .option("versionAsOf", 1).load().count() == 30)
      ManifestTable.expireSnapshots(dir, keepLast = 1)
      val reclaimed = ManifestTable.vacuum(dir, graceMs = 0L)
      assert(reclaimed.nonEmpty,
        "vacuum must reclaim the replaced generation's files")
      assert(spark.sql("SELECT count(*) FROM gnr.db.ct")
        .as[Long].head() == 10)
    }
  }
}

/** ALTER TABLE RENAME is a DIRECTORY rename (the catalog is the
  * layout): legal where rename is O(1) metadata, a silent
  * whole-table copy on an object store — the no-rename mode refuses
  * it with a typed error naming the alternatives.
  */
class NoRenameRenameTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("no-rename mode refuses ALTER TABLE RENAME with a typed error; " +
      "default mode renames") {
    val wh = Files.createTempDirectory("graft_nr_rt").toString
    spark.conf.set("spark.sql.catalog.gnrt", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gnrt.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gnrt.db")
    spark.sql("CREATE TABLE gnrt.db.rt_src AS SELECT 1 AS a")
    spark.conf.set("spark.graft.commit.norename", "true")
    try {
      val e = intercept[Exception] {
        spark.sql("ALTER TABLE gnrt.db.rt_src RENAME TO db.rt_dst")
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(m => m.contains("norename") &&
          m.contains("copy")),
        s"expected the typed norename refusal, got $e")
      // nothing moved
      assert(spark.sql("SELECT a FROM gnrt.db.rt_src").count() == 1)
    } finally spark.conf.unset("spark.graft.commit.norename")
    // default mode: the rename is legal and atomic where rename is O(1)
    spark.sql("ALTER TABLE gnrt.db.rt_src RENAME TO db.rt_dst")
    assert(spark.sql("SELECT a FROM gnrt.db.rt_dst").count() == 1)
  }
}
