package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.Registry
import graft.operators.Multimodal
import graft.streaming.EventStreams

class MultimodalStreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("multimodal: stub decode preserves ids, byte counts, checksums") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val feats = Multimodal.mediaFeatures(spark, docs).cache()
    assert(feats.count() == docs.count())
    val sample = feats.filter($"doc_id" === 0).head()
    val text = docs.filter($"doc_id" === 0).select("text").as[String].head()
    assert(sample.getAs[Long]("n_bytes") == text.getBytes("UTF-8").length.toLong)
    assert(sample.getAs[Int]("width") == (text.head & 0xff))
    assert(sample.getAs[Long]("checksum") ==
      graft.functions.Fnv1a32.hash(text.getBytes("UTF-8")))
    assert(sample.getAs[String]("kind") == "image")
  }

  test("multimodal: resize stub preserves aspect ratio and respects maxDim") {
    import graft.operators.Multimodal._
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val resized = resizeStub(
      decodeStub(mediaFromDocuments(docs).as[MediaRow]), maxDim = 64).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      assert(r.out_w <= 64 && r.out_h <= 64)
      val inAspect = r.width.toDouble / r.height
      val outAspect = r.out_w.toDouble / r.out_h
      assert(math.abs(inAspect - outAspect) / inAspect < 0.1, r)
    }
  }

  test("multimodal: frame sampling emits every 2nd frame of video payloads") {
    import graft.operators.Multimodal._
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val media = mediaFromDocuments(docs).as[MediaRow]
    val frames = frameSampleStub(media, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 2 == 0))
    val feats = decodeStub(media).filter(_.kind == "video").collect()
      .map(f => f.doc_id -> f.n_frames).toMap
    frames.groupBy(_.doc_id).foreach { case (id, fs) =>
      assert(fs.length == (feats(id) + 1) / 2, s"doc $id")
    }
  }

  test("streaming tumbling window equals oracle-checked batch twin (q23)") {
    val streamed = EventStreams.runToMemory(spark, TestSpark.sf0001, "t_tumbling")(
      EventStreams.tumblingCounts)
      .orderBy("win_start", "event_type")
      .as[(Long, String, Long, Double)].collect().toSeq
    val batch = Registry.byName("q23_tumbling_window")
      .run(spark, TestSpark.sf0001)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(streamed == batch)
  }

  test("streaming sliding window equals batch twin (q24)") {
    val streamed = EventStreams.runToMemory(spark, TestSpark.sf0001, "t_sliding")(
      EventStreams.slidingStats)
      .orderBy("win_start")
      .as[(Long, Long, Double)].collect().toSeq
    val batch = Registry.byName("q24_sliding_window")
      .run(spark, TestSpark.sf0001)
      .as[(Long, Long, Double)].collect().toSeq
    assert(streamed == batch)
  }

  test("streaming dedup within watermark emits one row per (user, type)") {
    val deduped = EventStreams.runToMemory(spark, TestSpark.sf0001, "t_dedup", "append")(
      EventStreams.dedupedEvents)
    val n = deduped.select("user_id", "event_type").distinct().count()
    assert(deduped.count() == n)
    assert(n > 0)
  }

  test("stream-stream interval join equals the batch range join (q21's join stage)") {
    import org.apache.spark.sql.functions._
    val streamed = EventStreams.runToMemory(
      spark, TestSpark.sf0001, "t_ssjoin", "append")(
      EventStreams.errorClickJoinStream)
      .as[(Long, Long, Long)].collect().toSet
    val e = graft.api.Tables.t(spark, TestSpark.sf0001, "events")
    val errs = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("err_id"), col("ts").as("err_ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val batch = errs.join(clicks,
      col("user_id") === col("c_user") &&
        col("click_ts") > col("err_ts") &&
        col("click_ts") <= col("err_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("user_id"), col("err_id"), col("click_id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty, "fixtures contain error→click funnels")
  }

  test("stream-stream LEFT OUTER join: matches + watermark-proven nulls == batch left join") {
    import org.apache.spark.sql.functions._
    val streamed = EventStreams.runToMemory(
      spark, TestSpark.sf0001, "t_ssljoin", "append")(
      EventStreams.errorClickLeftJoinStream)
      .as[(Long, Long, Option[Long])].collect()
    val e = graft.api.Tables.t(spark, TestSpark.sf0001, "events")
    val errs = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("err_id"), col("ts").as("err_ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val batch = errs.join(clicks,
      col("user_id") === col("c_user") &&
        col("click_ts") > col("err_ts") &&
        col("click_ts") <= col("err_ts") + expr("INTERVAL 10 MINUTES"),
      "left_outer")
      .select(col("user_id"), col("err_id"), col("click_id"))
      .as[(Long, Long, Option[Long])].collect()
    // matched rows must agree exactly; null-extended rows may be withheld
    // by the final watermark for errors near the stream's end, so the
    // streamed nulls must be a SUBSET of the batch nulls — and some must
    // actually have been emitted (state eviction fired)
    val (sMatched, sNulls) = streamed.partition(_._3.isDefined)
    val (bMatched, bNulls) = batch.partition(_._3.isDefined)
    assert(sMatched.toSet == bMatched.toSet)
    assert(sNulls.toSet.subsetOf(bNulls.toSet))
    assert(sNulls.nonEmpty, "watermark should have closed some unmatched errors")
    assert(bNulls.nonEmpty, "fixtures contain errors with no follow-up click")
  }
}
