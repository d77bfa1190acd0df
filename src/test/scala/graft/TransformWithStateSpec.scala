package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{EventStreams, TransformWithStateOps}

class TransformWithStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("transformWithState user profiles converge to the batch aggregate") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val streamed = EventStreams.runToMemory(spark, TestSpark.sf0001,
        "t_tws", "update")(df => TransformWithStateOps.userProfiles(df).toDF())
      // update mode emits one row per key per micro-batch; the row with
      // the highest n_events per user is the converged state
      val last = streamed.groupBy("user_id")
        .agg(max(struct($"n_events", $"n_types", $"max_value")).as("s"))
        .select($"user_id", $"s.n_types", $"s.n_events",
          round($"s.max_value", 6).as("mx"))
        .as[(Long, Long, Long, Double)].collect().toSet
      val batch = graft.api.Tables.t(spark, TestSpark.sf0001, "events")
        .groupBy("user_id")
        .agg(countDistinct("event_type").as("nt"), count(lit(1)).as("n"),
          round(max("value"), 6).as("mx"))
        .select($"user_id", $"nt", $"n", $"mx")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(streamed.count() >= batch.size)
      assert(last == batch)
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
