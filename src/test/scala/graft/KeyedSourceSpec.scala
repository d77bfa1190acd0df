package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.GenSource

/** Storage-partitioned join over the key-grouped source (q85): the
  * reported layout removes every exchange from the join AND the
  * grouped aggregate; a layout mismatch falls back to the shuffle
  * join without changing answers; the partition report matches the
  * physical layout.
  */
class KeyedSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // v2.bucketing.enabled is set once in TestSpark's builder (the same
  // harness-level home Verify/Bench use) — no per-call session mutation
  private def keyed(rows: Long, buckets: Int = 16) =
    spark.read.format("graft.sources.GenKeyedSource")
      .option("rows", rows).option("buckets", buckets).load()

  private def expected(aRows: Long, bRows: Long, buckets: Int) = {
    def bucket(id: Long) = (GenSource.h(id) % buckets).toInt
    val a = (0L until aRows).groupBy(bucket)
    val b = (0L until bRows).groupBy(bucket)
    a.keySet.intersect(b.keySet).map { k =>
      val pairs = for (x <- a(k); y <- b(k)) yield x + y
      k -> ((pairs.size.toLong, pairs.sum))
    }.toMap
  }

  test("co-partitioned join plans with ZERO shuffle exchanges and exact answers") {
    val j = keyed(2000).as("a").join(keyed(1000).as("b"), "bucket")
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(col("a.id") + col("b.id")).as("sid"))
    val got = j.collect().map(r =>
      r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected(2000, 1000, 16))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"storage-partitioned join must not shuffle either side:\n$plan")
    assert(plan.contains("Join"), s"join node expected:\n$plan")
  }

  test("bucket-grouped aggregation rides the reported layout exchange-free") {
    val df = keyed(3000).groupBy("bucket").agg(count(lit(1)).as("n"))
    val got = df.as[(Int, Long)].collect().toMap
    val exp = (0L until 3000L).groupBy(id => (GenSource.h(id) % 16).toInt)
      .view.mapValues(_.size.toLong).toMap
    assert(got == exp)
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("mismatched bucket counts cannot co-partition: falls back, stays exact") {
    val j = keyed(1000, 16).as("a")
      .join(keyed(500, 8).as("b"), col("a.id") === col("b.id"))
      .select(count(lit(1)))
    // join is on id (not the partition key) across DIFFERENT layouts —
    // the planner must shuffle and the answer must be exact
    assert(j.as[Long].head() == 500L)
    assert(j.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("the partition report matches the physical layout") {
    val df = keyed(1000, 8)
    assert(df.rdd.getNumPartitions == 8)
    // every row sits in the partition carrying its key
    val rows = df.select("bucket").rdd
      .mapPartitionsWithIndex { (pi, it) =>
        it.map(r => (pi, r.getInt(0))) }
      .collect()
    // partition indexes correspond to key-grouped partitions; each
    // partition holds exactly one bucket value
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._2).distinct.length == 1)
    }
    assert(df.count() == 1000)
  }
}
