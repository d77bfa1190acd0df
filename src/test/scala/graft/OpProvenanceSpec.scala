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
