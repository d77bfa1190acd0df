package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{CowOps, ManifestTable}

/** Operation provenance in the manifest header (`op=`): every commit
  * path labels what made its version, and history() surfaces the
  * label — DESCRIBE HISTORY's audit column on the gtab ledger. A
  * 100 TB table's "what was version 37?" must be answerable from
  * metadata alone.
  */
class OpProvenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"

  private def ops(dir: String): Seq[(Long, String)] =
    ManifestTable.history(dir).map(h => (h._1, h._6))

  test("append, overwrite, COW/MOR DML, compaction, and analyze label " +
      "their commits; history surfaces the op column") {
    val dir = Files.createTempDirectory("graft_opprov").toString + "/t"
    def df(n: Int) = (0 until n).map(i => (i.toLong, s"r$i"))
      .toDF("id", "s").repartition(2)
    df(8).write.format(Fmt).option("path", dir).mode(SaveMode.Append).save()
    df(4).write.format(Fmt).option("path", dir).mode(SaveMode.Append).save()
    assert(ops(dir) == Seq((1L, "append"), (2L, "append")))
    df(6).write.format(Fmt).option("path", dir)
      .mode(SaveMode.Overwrite).save()
    assert(ops(dir).last == (3L, "overwrite"))
    CowOps.merge(spark, dir,
      Seq((1L, "upd")).toDF("id", "s"), "id")
    assert(ops(dir).last._2 == "cow-merge")
    CowOps.deleteMor(spark, dir, Seq(Tuple1(2L)).toDF("id"), "id")
    assert(ops(dir).last._2 == "mor-delete")
    ManifestTable.compact(spark, dir, targetFiles = 1)
    assert(ops(dir).last._2 == "compact")
    graft.sources.AnalyzeNdv.run(spark, dir, Seq("id"))
    assert(ops(dir).last._2 == "analyze-stats")
    // every retained version answers from root metadata — no decode,
    // no data file opened, and no version is unlabeled
    assert(ops(dir).forall(_._2.nonEmpty))
  }

  test("branch create and fast-forward label their publishes; SQL DML " +
      "labels through the catalog") {
    val wh = Files.createTempDirectory("graft_opprov_sql").toString
    val cat = "gop"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t AS " +
      "SELECT id, id * 2 AS v FROM range(20)")
    val dir = s"$wh/db/t"
    // staged CTAS: v1 is the stage's empty create, v2 the labeled
    // AS-SELECT payload — both carry over at adoption
    assert(ops(dir) == Seq((1L, "create"), (2L, "ctas")))
    spark.sql(s"DELETE FROM $cat.db.t WHERE id = 7")
    assert(ops(dir).last._2 == "delete")
    spark.sql(s"UPDATE $cat.db.t SET v = 0 WHERE id = 3")
    assert(ops(dir).last._2 == "cow-update")
    spark.sql(s"ALTER TABLE $cat.db.t " +
      s"SET TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    // non-translatable predicate: forces the row-level (MOR) path —
    // a translatable one stays on GTabDelete's metadata-first route
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 2 = 1 AND id > 9")
    assert(ops(dir).last._2 == "mor-delete")
    spark.sql(s"ALTER TABLE $cat.db.t ADD COLUMN w INT")
    assert(ops(dir).last._2 == "alter-schema")
    val base = ManifestTable.createBranch(dir, "audit")
    spark.range(5).selectExpr("id", "id AS v", "CAST(id AS INT) AS w")
      .write.format(Fmt).option("path", dir).option("branch", "audit")
      .mode(SaveMode.Append).save()
    assert(ManifestTable.history(dir).map(_._6)
      .count(_ == "branch-create") == 0,
      "branch publishes live in the branch namespace, not main's")
    ManifestTable.fastForward(dir, "audit")
    assert(ops(dir).last._2 == "fast-forward")
    ManifestTable.rollback(dir, 1L)
    assert(ops(dir).last._2 == "rollback")
    // the SQL history procedure exposes the same column
    val hist = spark.sql(s"CALL $cat.system.history(table => 'db.t')")
    assert(hist.columns.contains("operation"))
    assert(hist.collect().map(_.getString(5)).toSeq == ops(dir).map(_._2))
    assert(base >= 1L)
  }
}

/** The provenance override surface is restricted and validated early:
  * a writer claiming an arbitrary commitOp is rejected at
  * write-builder construction (before any executor writes a file),
  * and the no-rename CTAS — which collapses to ONE commit — labels it
  * "ctas", matching the default mode's payload label.
  */
class OpProvenanceGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a forged commitOp is rejected before the write runs") {
    val dir = Files.createTempDirectory("graft_opguard").toString + "/t"
    val e = intercept[Exception] {
      Seq((1L, "a")).toDF("id", "s").write
        .format("graft.sources.ManifestTable").option("path", dir)
        .option("commitOp", "rollback").mode(SaveMode.Append).save()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("not an internal maintenance label")))
    assert(!graft.sources.FsMeta.exists(
      graft.sources.ManifestTable.manifestPath(dir)),
      "the rejected write must not have committed anything")
  }

  test("no-rename CTAS labels its single commit 'ctas'") {
    val wh = Files.createTempDirectory("graft_opguard_nr").toString
    spark.conf.set("spark.sql.catalog.gopnr", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gopnr.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gopnr.db")
    spark.conf.set("spark.graft.commit.norename", "true")
    try spark.sql(
      "CREATE TABLE gopnr.db.ct AS SELECT id FROM range(10)")
    finally spark.conf.unset("spark.graft.commit.norename")
    assert(ManifestTable.history(s"$wh/db/ct").map(h => (h._1, h._6)) ==
      Seq((1L, "ctas")))
  }

  test("streamed feed replication: a 2M-copy multiplicity delta counts " +
      "exactly, through the lazy iterator") {
    val dir = Files.createTempDirectory("graft_opguard_rep").toString + "/t"
    def write(n: Long, mode: SaveMode): Unit =
      spark.range(n).selectExpr("'x' AS s", "0L AS v").repartition(1)
        .write.format("graft.sources.ManifestTable")
        .option("path", dir).mode(mode).save()
    write(1L, SaveMode.Append)          // v1: 1 copy of the constant row
    write(2000001L, SaveMode.Overwrite) // v2: 2,000,001 copies
    val feed = ManifestTable.changeFeed(spark, dir, 1L, 2L)
    assert(feed.groupBy("_change_type").count()
      .as[(String, Long)].collect().toSet == Set(("insert", 2000000L)))
  }
}
