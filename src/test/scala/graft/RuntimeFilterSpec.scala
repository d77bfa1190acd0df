package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.GTabScan

/** RUNTIME (dim-driven) file pruning on the manifest table
  * (SupportsRuntimeV2Filtering): Spark executes a selective join's
  * broadcast side first and pushes its values back into the scan as IN
  * predicates BEFORE input partitions are planned — the DPP mechanism,
  * here pruning manifest files through the same conservative
  * zone-map/bloom skipping static pushdown uses. The prune happens
  * between optimization and execution, so the spec observes it through
  * the scan instance's own record (fished out of the executed plan —
  * per-scan by construction, so concurrent queries can't clobber it)
  * plus exact results.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"
  private def tmp(): String =
    Files.createTempDirectory("graft_rtf").toString

  private def withConf[A](kvs: (String, String)*)(body: => A): A = {
    val prev = kvs.map { case (k, _) =>
      k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** The gtab scans of an EXECUTED query — unwraps the final adaptive
    * plan (runtime filtering mutates the very scan instances the plan
    * holds, so the record must be read off those instances).
    */
  private def gtabScans(df: DataFrame): Seq[GTabScan] = {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def collect(p: SparkPlan): Seq[GTabScan] = p match {
      // AQE hides executed subtrees behind leaf wrappers — unwrap them
      case a: AdaptiveSparkPlanExec => collect(a.executedPlan)
      case q: QueryStageExec => collect(q.plan)
      case r: ReusedExchangeExec => collect(r.child)
      case b: BatchScanExec => b.scan match {
        case g: GTabScan => Seq(g)
        case _ => Nil
      }
      case other =>
        other.children.flatMap(collect) ++ other.subqueries.flatMap(collect)
    }
    collect(df.queryExecution.executedPlan)
  }

  test("a filtered dim join prunes fact files at runtime via zone maps") {
    val dir = tmp()
    // 8 range-clustered files over ids 0..999: disjoint [min,max] ranges
    (0 until 1000).map(i => (i.toLong, s"r$i")).toDF("id", "s")
      .repartitionByRange(8, col("id")).sortWithinPartitions("id")
      .write.format(Fmt).option("path", dir).mode(SaveMode.Append).save()
    assert(graft.sources.ManifestTable.readManifest(dir).get.files.size == 8)
    val dim = spark.range(0, 1000).filter(col("id") < 60)
      .select(col("id").as("k"))
    withConf(
      // make the DPP benefit estimate deterministic at unit-test sizes
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio"
        -> "10") {
      val fact = spark.read.format(Fmt).option("path", dir).load()
      val j = fact.join(broadcast(dim), col("id") === col("k"))
        .agg(count(lit(1)).as("n"), sum("id").as("sid"))
      // execute THIS Dataset (count()/as[] would plan a fresh
      // QueryExecution with different scan instances)
      val row = j.collect().head
      assert((row.getLong(0), row.getLong(1)) ==
        ((60L, (0 until 60).sum.toLong)))
      // under AQE the materialized IN-literals may ALSO be re-pushed as
      // static filters before filter() runs (kept already pruned); either
      // path must leave the scan reading only the matching file(s)
      val recs = gtabScans(j).map(_.lastPruneRecord)
      assert(recs.exists(_ != ((0, 0))), "runtime filter() must be invoked")
      val (before, after) = recs.find(_ != ((0, 0))).get
      assert(after <= 2,
        s"a 0..59 key set must reduce 8 range-disjoint files to the " +
          s"matching one(s), got ($before, $after)")
    }
  }

  test("runtime pruning composes with per-file blooms on scattered data") {
    val dir = tmp()
    // hash-scattered: every file's [min,max] spans the table — only the
    // blooms can prune a point-lookup set
    (0 until 1000).map(i => (i.toLong, s"r$i")).toDF("id", "s")
      .repartition(8, col("id"))
      .write.format(Fmt).option("path", dir)
      .option("bloomColumns", "id").mode(SaveMode.Append).save()
    val dim = spark.range(0, 1000).filter(col("id").isin(3L, 707L))
      .select(col("id").as("k"))
    withConf(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio"
        -> "10") {
      val fact = spark.read.format(Fmt).option("path", dir).load()
      val j = fact.join(broadcast(dim), col("id") === col("k"))
        .select("id")
      assert(j.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 707L))
      val recs = gtabScans(j).map(_.lastPruneRecord)
      assert(recs.exists(_ != ((0, 0))), "runtime filter() must be invoked")
      val (before, after) = recs.find(_ != ((0, 0))).get
      assert(after <= 3,
        s"blooms must prune a 2-value runtime IN to the touched files, " +
          s"got ($before, $after)")
    }
  }

  test("partitioned scans keep their layout: no runtime filter attributes") {
    val dir = tmp()
    (0 until 200).map(i => (i.toLong, i % 4)).toDF("id", "g")
      .write.format(Fmt).option("path", dir)
      .option("partitionColumn", "g").mode(SaveMode.Append).save()
    val dim = spark.range(0, 2).select(col("id").cast("int").as("k"))
    val fact = spark.read.format(Fmt).option("path", dir).load()
    val j = fact.join(broadcast(dim), col("g") === col("k"))
    assert(j.collect().length == 100)
    // the grouped layout never runtime-prunes (the SPJ report must stay
    // stable through planning); static partition pruning still applies
    // to literal predicates, just not to runtime ones
    assert(gtabScans(j).forall(_.lastPruneRecord == ((0, 0))))
  }
}
