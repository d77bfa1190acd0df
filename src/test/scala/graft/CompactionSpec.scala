package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Compaction

class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("compaction collapses small files, preserves data, and plans no shuffle") {
    val in = java.nio.file.Files.createTempDirectory("graft-compact-in").toString
    val out = java.nio.file.Files.createTempDirectory("graft-compact-out").toString
    val src = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    src.repartition(32).write.mode("overwrite").parquet(in) // simulate sink litter
    val stats = Compaction.compact(spark, in, out, targetBytes = 512L * 1024)
    assert(stats.filesBefore >= 30, stats.toString)
    assert(stats.filesAfter < stats.filesBefore / 4, stats.toString)
    // data survives exactly
    val a = spark.read.parquet(out).orderBy("doc_id").collect().toSeq
    val b = src.orderBy("doc_id").collect().toSeq
    assert(a == b)
    // and the rewrite is shuffle-free: coalesce, not repartition
    val plan = spark.read.parquet(in).coalesce(2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("compaction sizes the output from input bytes") {
    val in = java.nio.file.Files.createTempDirectory("graft-compact-in2").toString
    val out = java.nio.file.Files.createTempDirectory("graft-compact-out2").toString
    spark.range(1000).toDF("id").repartition(8)
      .write.mode("overwrite").parquet(in)
    // a huge target collapses everything into one file
    val stats = Compaction.compact(spark, in, out, targetBytes = 1L << 30)
    assert(stats.filesAfter == 1, stats.toString)
    assert(spark.read.parquet(out).count() == 1000)
  }

  test("compaction finds data files under hive-partition subdirectories") {
    val in = java.nio.file.Files.createTempDirectory("graft-compact-in3").toString
    val out = java.nio.file.Files.createTempDirectory("graft-compact-out3").toString
    spark.range(300).selectExpr("id", "id % 3 AS part")
      .repartition(6).write.mode("overwrite")
      .partitionBy("part").parquet(in)
    // data files live in part=N/ subdirs — the recursive walk must see
    // them (a flat listing saw zero files and failed spuriously)
    val stats = Compaction.compact(spark, in, out, targetBytes = 1L << 30)
    assert(stats.filesBefore >= 3, stats.toString)
    assert(spark.read.parquet(out).count() == 300)
  }

  test("compaction refuses outDir == inDir (overwrite would destroy the input)") {
    val in = java.nio.file.Files.createTempDirectory("graft-compact-in4").toString
    spark.range(10).toDF("id").write.mode("overwrite").parquet(in)
    val e = intercept[IllegalArgumentException] {
      Compaction.compact(spark, in, in + "/", targetBytes = 1L << 20)
    }
    assert(e.getMessage.contains("outDir"), e.getMessage)
  }
}
