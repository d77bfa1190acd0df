package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.MapReduce

/** Reference-parity: tokenizer semantics and golden word counts over the
  * reference's own Project Gutenberg corpus
  * (/root/reference/main/pg-*.txt, read-only fixtures).
  */
class CoreParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val pgGlob = "/root/reference/main/pg-*.txt"

  test("tokenizer: split on any non-letter, case preserved, empties dropped") {
    // semantics of /root/reference/mrapps/wc.go:21-31
    val got = Seq("don't stop-me 123abc456def  Ünïcode!")
      .toDF("text")
      .select(explode(split($"text", MapReduce.tokenSeparator)).as("w"))
      .filter(length($"w") > 0)
      .as[String].collect().toSeq
    assert(got == Seq("don", "t", "stop", "me", "abc", "def", "Ünïcode"))
  }

  test("word count over the pg corpus matches an independent in-JVM oracle") {
    val docs = MapReduce.wholeTextFiles(spark, pgGlob)
    val wc = MapReduce.wordCount(docs, "contents")
      .as[(String, Long)].collect().toMap
    // independent oracle: plain-Scala tokenization of the same bytes
    val expected = new java.io.File("/root/reference/main").listFiles()
      .filter(_.getName.matches("pg-.*\\.txt")).sortBy(_.getName)
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
      .flatMap(_.split("[^\\p{L}]+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    assert(wc.size == expected.size)
    assert(wc("the") == expected("the"))
    assert(wc("Huckleberry") == expected("Huckleberry"))
    expected.take(2000).foreach { case (w, n) => assert(wc(w) == n, s"word $w") }
  }

  test("typed mapReduce path equals the declarative wordCount") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val declarative = MapReduce.wordCount(docs, "text")
      .as[(String, Long)].collect().toMap
    val typed = MapReduce.mapReduce[String, String, Int, Long](
      docs.select("text").as[String],
      (t: String) => t.split(MapReduce.tokenSeparator).iterator
        .filter(_.nonEmpty).map(w => (w, 1)),
      (_: String, vs: Iterator[Int]) => vs.map(_.toLong).sum)
      .collect().toMap
    assert(declarative == typed)
  }

  test("ReduceAggregator (UDAF surface) reproduces the wc reducer incrementally") {
    import graft.core.ReduceAggregator
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val words = docs.select(explode(split($"text", MapReduce.tokenSeparator)).as("w"))
      .filter(length($"w") > 0).as[String]
    val viaAggregator = words.groupByKey(identity)
      .agg(ReduceAggregator.countValues.asInstanceOf[
        org.apache.spark.sql.expressions.Aggregator[String, Long, Long]].toColumn)
      .collect().toMap
    val viaGroupBy = MapReduce.wordCount(docs, "text")
      .as[(String, Long)].collect().toMap
    assert(viaAggregator == viaGroupBy)
  }

  test("RDD-flavored mapReduce equals the DataFrame wordCount on the pg corpus") {
    val viaRdd = MapReduce.mapReduceRdd[String, Long](
      spark, pgGlob,
      (_, contents) => contents.split(MapReduce.tokenSeparator)
        .filter(_.nonEmpty).map(w => (w, 1L)).toSeq,
      _ + _, numPartitions = 10)
      .collect().toMap
    val viaDf = MapReduce.wordCount(
      MapReduce.wholeTextFiles(spark, pgGlob), "contents")
      .as[(String, Long)].collect().toMap
    assert(viaRdd == viaDf)
  }

  test("inverted index: ndocs equals distinct docs containing the word") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val idx = MapReduce.invertedIndex(docs, "text", "doc_id")
    val row = idx.filter($"word" === "the").head()
    val doclist = row.getAs[String]("doclist").split(",")
    assert(row.getAs[Long]("ndocs") == doclist.length)
    assert(doclist.toSeq == doclist.sorted.toSeq)
  }
}
