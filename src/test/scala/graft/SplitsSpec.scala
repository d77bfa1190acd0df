package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Splits}

/** Leakage-safe splits (p81): ZERO near-dup pairs cross a split
  * boundary (including transitive closures), fractions land near the
  * cut points, determinism, and guards.
  */
class SplitsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
  private lazy val pairs = Dedup.minhashNearDupPairs(docs, "doc_id",
    "text", shingleSize = 3, numHashes = 128, bands = 32, threshold = 0.8)

  test("no near-dup pair crosses a split boundary — the leakage guarantee") {
    val asg = Splits.leakageSafe(docs, "doc_id", pairs)
    assert(pairs.count() > 0, "fixture must plant near-dups")
    val crossing = pairs
      .join(asg.select($"doc_id".as("id_a"), $"split".as("sa")), Seq("id_a"))
      .join(asg.select($"doc_id".as("id_b"), $"split".as("sb")), Seq("id_b"))
      .filter($"sa" =!= $"sb")
    assert(crossing.count() == 0,
      s"near-dup pairs split across sets:\n${crossing.collect().toSeq}")
    // and transitively: every GROUP maps to exactly one split
    val multi = asg.groupBy("group_id")
      .agg(countDistinct("split").as("k")).filter($"k" > 1)
    assert(multi.count() == 0)
  }

  test("fractions land near the cut points; every doc is assigned once") {
    val asg = Splits.leakageSafe(docs, "doc_id", pairs)
    val n = docs.count().toDouble
    val frac = asg.groupBy("split").count()
      .as[(String, Long)].collect().toMap.view.mapValues(_ / n).toMap
    assert(asg.count() == n.toLong)
    assert(frac("train") > 0.6 && frac("train") < 0.95, frac.toString)
    assert(frac.getOrElse("val", 0.0) + frac.getOrElse("test", 0.0) > 0.03,
      frac.toString)
    // deterministic rerun
    val again = Splits.leakageSafe(docs, "doc_id", pairs)
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    assert(again == asg.orderBy("doc_id")
      .as[(Long, Long, String)].collect().toSeq)
  }

  test("degenerate fractions rejected") {
    intercept[IllegalArgumentException] {
      Splits.leakageSafe(docs, "doc_id", pairs, trainPct = 95, valPct = 10)
    }
    intercept[IllegalArgumentException] {
      Splits.leakageSafe(docs, "doc_id", pairs, trainPct = 0)
    }
  }
}
