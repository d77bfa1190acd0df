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

  test("compaction refuses overlapping outDir: ancestor (deletes input) and descendant (nests output)") {
    val root = java.nio.file.Files.createTempDirectory("graft-compact-in5").toString
    val in = root + "/input"
    spark.range(10).toDF("id").write.mode("overwrite").parquet(in)
    // ancestor: overwrite of root would recursively delete root/input
    val up = intercept[IllegalArgumentException] {
      Compaction.compact(spark, in, root, targetBytes = 1L << 20)
    }
    assert(up.getMessage.contains("overlap"), up.getMessage)
    // descendant: output inside the input double-counts on the next read
    val down = intercept[IllegalArgumentException] {
      Compaction.compact(spark, in, in + "/compacted", targetBytes = 1L << 20)
    }
    assert(down.getMessage.contains("overlap"), down.getMessage)
  }

  test("compaction ignores hidden/temporary entries, like Spark's own read path filter") {
    val in = java.nio.file.Files.createTempDirectory("graft-compact-in6").toString
    val out = java.nio.file.Files.createTempDirectory("graft-compact-out6").toString
    spark.range(100).toDF("id").coalesce(1).write.mode("overwrite").parquet(in)
    // plant crashed-write litter Spark's reader would skip
    val tmp = java.nio.file.Paths.get(in, "_temporary", "0")
    java.nio.file.Files.createDirectories(tmp)
    java.nio.file.Files.write(tmp.resolve("part-junk.parquet"),
      Array.fill[Byte](1 << 20)(7))
    val stats = Compaction.compact(spark, in, out, targetBytes = 1L << 30)
    // the 1 MB of junk must not inflate the byte stats (real data ~ KBs)
    assert(stats.bytesBefore < (1 << 19), stats.toString)
    assert(spark.read.parquet(out).count() == 100)
  }
}
