package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{EventStreams, TransformWithStateOps}

class TransformWithStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("transformWithState funnel converges to the batch window-cascade funnel") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // multi-batch stream (4 files, 1 per trigger) so incremental state
      // maintenance — including cross-batch ordering — actually runs
      val src = graft.api.Tables.t(spark, TestSpark.sf0001, "events")
        .select("user_id", "ts", "event_type", "event_id", "value", "props")
      val staged = java.nio.file.Files
        .createTempDirectory("graft-funnel-src").toString
      src.repartitionByRange(4, $"ts").write.mode("overwrite").parquet(staged)
      val q = graft.streaming.FunnelStateOps.userFunnels(
          spark.readStream.schema(src.schema)
            .option("maxFilesPerTrigger", "1").parquet(staged))
        .toDF()
        .writeStream.outputMode("update").format("memory")
        .queryName("t_funnel").start()
      try q.processAllAvailable() finally q.stop()
      // converged row per user = the one with the highest n_seen
      val got = spark.table("t_funnel").groupBy("user_id")
        .agg(max(struct($"n_seen", $"t1", $"t2", $"t3")).as("s"))
        .select($"user_id", $"s.t1", $"s.t2", $"s.t3")
        .as[(Long, Long, Long, Long)].collect().toSet
      // batch twin: q68's window cascade, reduced to per-user (t1,t2,t3)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts")
      val marked = graft.api.Tables.t(spark, TestSpark.sf0001, "events")
        .select($"user_id", unix_micros($"ts").as("ts"), $"event_type")
        .withColumn("t1r", min(when($"event_type" === "view", $"ts")).over(w))
        .withColumn("t2c", when($"event_type" === "click" && $"ts" > $"t1r", $"ts"))
        .withColumn("t2r", min($"t2c").over(w))
        .withColumn("t3c", when($"event_type" === "purchase" && $"ts" > $"t2r", $"ts"))
      val batch = marked.groupBy("user_id")
        .agg(coalesce(min(when($"event_type" === "view", $"ts")), lit(-1L)).as("t1"),
          coalesce(min($"t2c"), lit(-1L)).as("t2"),
          coalesce(min($"t3c"), lit(-1L)).as("t3"))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == batch)
      assert(batch.exists(_._4 >= 0), "fixture reaches the purchase stage")
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

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
