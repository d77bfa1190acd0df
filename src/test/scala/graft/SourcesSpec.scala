package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink surface: csv and json round-trips, and the reference's
  * text sink format ("key value\n" lines, /root/reference/mr/worker.go:152).
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val tmp = Files.createTempDirectory("graft-sources").toString

  test("csv round-trip preserves nation table") {
    val nation = spark.read.parquet(s"${TestSpark.sf0001}/nation.parquet")
    nation.write.mode("overwrite").option("header", "true").csv(s"$tmp/nation_csv")
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$tmp/nation_csv")
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("orc round-trip preserves customer table (schema and values)") {
    val customer = spark.read.parquet(s"${TestSpark.sf0001}/customer.parquet")
    customer.write.mode("overwrite").orc(s"$tmp/customer_orc")
    val back = spark.read.orc(s"$tmp/customer_orc")
    assert(back.schema == customer.schema) // orc keeps types, unlike csv
    assert(back.orderBy("c_custkey").collect().toSeq ==
      customer.orderBy("c_custkey").collect().toSeq)
  }

  test("json round-trip preserves region table") {
    val region = spark.read.parquet(s"${TestSpark.sf0001}/region.parquet")
    region.write.mode("overwrite").json(s"$tmp/region_json")
    val back = spark.read.json(s"$tmp/region_json")
      .select(col("r_regionkey").cast("int"), col("r_name"))
    assert(back.orderBy("r_regionkey").collect().toSeq ==
      region.orderBy("r_regionkey").collect().toSeq)
  }

  test("xml round-trip preserves region table (Spark 4 built-in source)") {
    val region = spark.read.parquet(s"${TestSpark.sf0001}/region.parquet")
    region.write.mode("overwrite").option("rootTag", "regions")
      .option("rowTag", "region").xml(s"$tmp/region_xml")
    val back = spark.read.option("rowTag", "region")
      .xml(s"$tmp/region_xml")
      .select(region.columns.map(org.apache.spark.sql.functions.col): _*)
    assert(back.orderBy("r_regionkey").collect().toSeq ==
      region.orderBy("r_regionkey").collect().toSeq)
  }

  test("partitionBy write lays out hive dirs and reads prune partitions") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    docs.write.mode("overwrite").partitionBy("lang").parquet(s"$tmp/docs_by_lang")
    // data-lake layout: one directory per partition value
    val langDirs = new java.io.File(s"$tmp/docs_by_lang").listFiles()
      .filter(_.getName.startsWith("lang=")).map(_.getName).toSet
    val langs = docs.select("lang").distinct().as[String].collect().toSet
    assert(langDirs == langs.map(l => s"lang=$l"))
    // partition pruning: the filter must become a PartitionFilter on the
    // scan (no data files outside lang=en are touched), not a row filter
    val pruned = spark.read.parquet(s"$tmp/docs_by_lang").filter(col("lang") === "en")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      s"expected partition pruning in:\n$scan")
    assert(pruned.count() == docs.filter(col("lang") === "en").count())
  }

  test("dynamic partition overwrite replaces only the touched partitions") {
    // the incremental-backfill write at 100 TB: re-running one day/lang
    // must not wipe the rest of the table (STATIC overwrite — the
    // default — drops ALL partitions first)
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    val dir = s"$tmp/docs_dyn_overwrite"
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val before = spark.read.parquet(dir).filter(col("lang") =!= "en").count()
    // rewrite ONLY lang=en with halved payload under dynamic mode
    val enPatch = docs.filter(col("lang") === "en")
      .withColumn("n_chars", (col("n_chars") / 2).cast("long")) // keep the partition schema
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try enPatch.write.mode("overwrite").partitionBy("lang").parquet(dir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val after = spark.read.parquet(dir)
    // untouched partitions survive byte-for-byte in row count...
    assert(after.filter(col("lang") =!= "en").count() == before)
    // ...and the touched partition carries the new payload
    assert(after.filter(col("lang") === "en").agg(sum("n_chars")).head().getLong(0) ==
      enPatch.agg(sum("n_chars")).head().getLong(0))
  }

  test("stratified sampling (sampleBy) is seed-deterministic and per-stratum sized") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val fractions = Map("en" -> 0.5, "de" -> 0.1) // other langs -> 0.0
    val a = docs.stat.sampleBy("lang", fractions, 42L)
      .select("doc_id").as[Long].collect().toSeq
    val b = docs.stat.sampleBy("lang", fractions, 42L)
      .select("doc_id").as[Long].collect().toSeq
    assert(a == b)
    val sampled = docs.stat.sampleBy("lang", fractions, 42L)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val full = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(!sampled.contains("fr") && !sampled.contains("zh"),
      "strata with no fraction must be excluded")
    val enRatio = sampled("en").toDouble / full("en")
    assert(math.abs(enRatio - 0.5) < 0.15, s"en stratum ratio $enRatio")
  }

  test("committed output is atomic: _SUCCESS present, no _temporary (early_exit parity)") {
    // the reference's early_exit test asserts no partial results are ever
    // visible (test-mr.sh:226-281); Spark's FileOutputCommitter gives the
    // same guarantee via tmp-dir + rename
    val dir = s"$tmp/commit_check"
    spark.read.parquet(s"${TestSpark.sf0001}/region.parquet")
      .write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.contains("_SUCCESS"))
    assert(!files.exists(_.startsWith("_temporary")))
    assert(spark.read.parquet(dir).count() == 5)
  }

  test("text sink emits the reference's 'key value' line format") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    graft.core.MapReduce.wordCount(docs, "text")
      .select(concat_ws(" ", $"word", $"cnt").as("value"))
      .write.mode("overwrite").text(s"$tmp/wc_out")
    val lines = spark.read.text(s"$tmp/wc_out").as[String].collect()
    assert(lines.nonEmpty)
    assert(lines.forall(_.matches("\\S+ \\d+")))
  }
}
