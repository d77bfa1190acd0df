package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** Streaming exactly-once restart semantics: a checkpointed query stopped
  * mid-stream and restarted over a grown source directory must converge
  * to the same result as a batch query over all the data — the
  * early_exit/crash guarantees of the reference harness, at the streaming
  * level (checkpoint + source offsets + idempotent state store).
  */
class StreamingRestartSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("checkpointed aggregation survives stop/restart and matches batch") {
    val work = Files.createTempDirectory("graft-restart")
    val srcDir = work.resolve("src"); Files.createDirectories(srcDir)
    val ckpt = work.resolve("ckpt").toString

    // split events into two parquet files
    val events = graft.api.Tables.t(spark, TestSpark.sf0001, "events")
    val half1 = events.filter($"event_id" % 2 === 0)
    val half2 = events.filter($"event_id" % 2 === 1)
    half1.coalesce(1).write.mode("overwrite").parquet(srcDir.resolve("h1").toString)

    def startQuery() = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString + "/*")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("restart_q").start()

    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    val afterHalf = spark.table("restart_q").as[(String, Long, Double)]
      .collect().map(r => r._1 -> r._2).toMap

    half2.coalesce(1).write.mode("overwrite").parquet(srcDir.resolve("h2").toString)
    val q2 = startQuery() // same checkpoint: resumes from committed offsets
    q2.processAllAvailable(); q2.stop()
    val streamed = spark.table("restart_q").as[(String, Long, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap

    val batch = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    assert(streamed.view.mapValues(_._1).toMap != afterHalf ||
      afterHalf.values.sum < streamed.values.map(_._1).sum) // progress happened
    assert(streamed.view.mapValues(_._1).toMap ==
      batch.view.mapValues(_._1).toMap) // exact counts after restart
    assert(streamed == batch) // sums too
  }
}
