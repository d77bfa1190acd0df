package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IdAssign

class IdAssignSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = (1L to 1000L).map(i => (i * 7 % 1000, s"v$i"))
    .toDF("k", "v")

  test("ids are contiguous 0..n-1 and aligned with global key order") {
    val got = IdAssign.contiguousIds(df, col("k"), "gid")
      .orderBy("gid").select("k", "gid").as[(Long, Long)].collect().toSeq
    assert(got.map(_._2) == (0L until 1000L))
    assert(got.map(_._1) == got.map(_._1).sorted)
    // equal to the naive single-reducer formulation
    val naive = IdAssign.contiguousIdsNaive(df, col("k"), "gid")
      .orderBy("gid").select("k", "gid").as[(Long, Long)].collect().toSeq
    assert(got.map(_._1).sorted == naive.map(_._1).sorted)
  }

  test("layout-invariant: same ids under different input partitionings") {
    def run(d: org.apache.spark.sql.DataFrame) =
      IdAssign.contiguousIds(d, col("k"), "gid")
        .orderBy("k").select("k", "gid").as[(Long, Long)].collect().toSeq
    assert(run(df.repartition(7)) == run(df.repartition(3, col("v"))))
  }

  test("no single-partition stage (the naive plan's failure mode)") {
    val out = IdAssign.contiguousIds(df, col("k"), "gid")
    // the data flows through all range partitions, never one reducer
    assert(out.rdd.getNumPartitions ==
      spark.sessionState.conf.numShufflePartitions)
    // ...and the range sort is in the lineage
    assert(out.rdd.toDebugString.contains("ShuffledRowRDD"),
      out.rdd.toDebugString)
    val naive = IdAssign.contiguousIdsNaive(df, col("k"), "gid")
      .queryExecution.executedPlan.toString
    assert(naive.contains("Exchange SinglePartition"), naive)
  }

  test("random inputs: contiguity and order alignment hold (seeded property)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 1 + rnd.nextInt(2000)
      val data = Seq.fill(n)(rnd.nextLong()).distinct.map(k => (k, trial))
      val got = IdAssign.contiguousIds(
          data.toDF("k", "t").repartition(1 + rnd.nextInt(8)), col("k"), "gid")
        .orderBy("gid").select("k", "gid").as[(Long, Long)].collect().toSeq
      assert(got.map(_._2) == (0L until data.size.toLong), s"trial $trial")
      assert(got.map(_._1) == data.map(_._1).sorted, s"trial $trial")
    }
  }

  test("empty input and reserved-column guard") {
    val empty = df.filter(col("k") < 0)
    assert(IdAssign.contiguousIds(empty, col("k"), "gid").count() == 0)
    intercept[IllegalArgumentException] {
      IdAssign.contiguousIds(df, col("k"), "v")
    }
  }
}
