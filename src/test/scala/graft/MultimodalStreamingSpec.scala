package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.Registry
import graft.operators.Multimodal
import graft.streaming.EventStreams

class MultimodalStreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("multimodal: dispatching decode recovers every kind's synth params") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val feats = Multimodal.mediaFeatures(spark, docs).cache()
    assert(feats.count() == docs.count())

    // image doc 0: 4x4 grayscale PNG, pixel(i) = (0*31 + i) % 256 = i
    val img = feats.filter($"doc_id" === 0).head()
    assert(img.getAs[String]("kind") == "image")
    assert(img.getAs[Int]("width") == 4 && img.getAs[Int]("height") == 4)
    assert(img.getAs[Int]("n_frames") == 1)
    assert(img.getAs[Int]("sample_rate") == -1 && img.getAs[Long]("n_samples") == -1L)
    assert(math.abs(img.getAs[Double]("feat_mean") - (0 until 16).sum / 16.0) < 1e-9)

    // audio doc 1: 8 kHz WAV with 101 samples, sample(i) = (31+i)%65536-32768
    val aud = feats.filter($"doc_id" === 1).head()
    assert(aud.getAs[String]("kind") == "audio")
    assert(aud.getAs[Int]("sample_rate") == 8000)
    assert(aud.getAs[Long]("n_samples") == 101L)
    assert(aud.getAs[Int]("width") == -1 && aud.getAs[Int]("n_frames") == -1)
    val audMean = (0 until 101).map(i => (31 + i) % 65536 - 32768).sum / 101.0
    assert(math.abs(aud.getAs[Double]("feat_mean") - audMean) < 1e-9)

    // video doc 2: 16x8 GIF with 2 + 2%4 = 4 frames,
    // frame f pixel i = (2*31 + f*17 + i) % 256
    val vid = feats.filter($"doc_id" === 2).head()
    assert(vid.getAs[String]("kind") == "video")
    assert(vid.getAs[Int]("width") == 16 && vid.getAs[Int]("height") == 8)
    assert(vid.getAs[Int]("n_frames") == 4)
    val vidMean = (for (f <- 0 until 4; i <- 0 until 128)
      yield (62 + f * 17 + i) % 256).sum.toDouble / (4 * 128)
    assert(math.abs(vid.getAs[Double]("feat_mean") - vidMean) < 1e-9)
  }

  test("multimodal: WAV round trip is lossless (real RIFF encode/decode)") {
    import graft.operators.Multimodal._
    val rows = spark.createDataset(Seq(
      WavRow(7L, synthWav(7L, 8000, 120)),
      WavRow(8L, synthWav(8L, 16000, 64))))
    val feats = decodeWav(rows).collect().map(f => f.doc_id -> f).toMap
    val f7 = feats(7L)
    assert(f7.sample_rate == 8000 && f7.channels == 1 && f7.n_samples == 120L)
    assert(math.abs(f7.duration_s - 120.0 / 8000) < 1e-12)
    val exp7 = (0 until 120).map(i => ((7L * 31 + i) % 65536 - 32768).toInt)
    assert(f7.pcm_min == exp7.min && f7.pcm_max == exp7.max)
    assert(math.abs(f7.pcm_mean - exp7.sum.toDouble / 120) < 1e-9)
    val f8 = feats(8L)
    assert(f8.sample_rate == 16000 && f8.n_samples == 64L)
    // RIFF header is real: magic bytes say RIFF....WAVE
    val wav = synthWav(7L, 8000, 120)
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
  }

  test("multimodal: WAV quarantine decode survives corrupt payloads") {
    import graft.operators.Multimodal._
    val good = synthWav(1L, 8000, 50)
    val rows = spark.createDataset(Seq(
      WavRow(1L, good),
      WavRow(2L, Array[Byte](1, 2, 3, 4)),            // not a RIFF container
      WavRow(3L, good.take(good.length / 2))))        // truncated container
    val got = decodeWavSafe(rows).collect().map(f => f.doc_id -> f).toMap
    assert(got(1L).decode_error == null && got(1L).n_samples == 50L)
    assert(got(2L).decode_error != null && got(2L).sample_rate == -1)
    // a truncated WAV either errors or decodes fewer samples — it must
    // NOT kill the task either way
    assert(got(3L).decode_error != null || got(3L).n_samples < 50L)
  }

  test("multimodal: framed audio features match hand-computed RMS/ZCR") {
    import graft.operators.Multimodal._
    val rows = spark.createDataset(Seq(WavRow(3L, synthWav(3L, 8000, 100))))
    val frames = frameAudio(rows, frameLen = 40).collect()
      .sortBy(_.frame_idx)
    assert(frames.length == 2) // 100 samples -> 2 full 40-sample frames
    // recompute from the synth formula: sample(i) = (3*31 + i) % 65536 - 32768
    def sample(i: Int) = ((3L * 31 + i) % 65536 - 32768).toInt
    frames.foreach { fr =>
      val idx = (fr.frame_idx * 40) until ((fr.frame_idx + 1) * 40)
      val rms = math.sqrt(idx.map(i => sample(i).toDouble * sample(i)).sum / 40)
      val zcr = idx.init.count(i => (sample(i) < 0) != (sample(i + 1) < 0))
      assert(math.abs(fr.rms - rms) < 1e-9, s"frame ${fr.frame_idx}")
      assert(fr.zcr == zcr.toLong, s"frame ${fr.frame_idx}")
    }
  }

  test("multimodal: frameAudio rejects non-mono PCM (interleaved framing would be garbage)") {
    import graft.operators.Multimodal._
    // hand-build a stereo 16-bit WAV: framing its interleaved stream
    // would count a bogus zero crossing at every L/R sign difference
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val pcm = Array.fill(200 * 4)(0.toByte)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 200L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val rows = spark.createDataset(Seq(WavRow(9L, bos.toByteArray)))
    val e = intercept[org.apache.spark.SparkException] {
      frameAudio(rows, frameLen = 40).collect()
    }
    assert(e.getMessage.contains("mono") ||
      Option(e.getCause).exists(_.getMessage.contains("mono")), e.toString)
  }

  test("multimodal: frame sampling decodes every 2nd real GIF frame") {
    import graft.operators.Multimodal._
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val media = mediaFromDocuments(docs)
    val frames = frameSample(media, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 2 == 0))
    assert(frames.forall(f => f.width == 16 && f.height == 8))
    // each video doc has 2 + id%4 frames; stride 2 keeps ceil(nf/2)
    frames.groupBy(_.doc_id).foreach { case (id, fs) =>
      val nf = 2 + (id % 4).toInt
      assert(fs.length == (nf + 1) / 2, s"doc $id")
    }
    // decoded pixel means match the synth arithmetic exactly (lossless)
    val f0 = frames.filter(_.doc_id == 2L).minBy(_.frame_idx)
    val exp = (0 until 128).map(i => (2L * 31 + i) % 256).sum.toDouble / 128
    assert(math.abs(f0.px_mean - exp) < 1e-9, s"got ${f0.px_mean}, want $exp")
  }

  test("multimodal: keyframes rank frames by hand-computed inter-frame pixel change") {
    import graft.operators.Multimodal._
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val media = mediaFromDocuments(docs)
    val got = keyFrames(media, k = 2)
      .as[(Long, Int, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    assert(got.nonEmpty)
    // recompute from the synth rule: pixel i of frame f is
    // (id*31 + f*17 + i) % 256 — diff vs f-1 is 17 or 239 by wraparound
    def diff(id: Long, f: Int): Double =
      (0 until 128).map { i =>
        math.abs((id * 31 + f * 17 + i) % 256 - (id * 31 + (f - 1) * 17 + i) % 256)
      }.sum.toDouble / 128
    got.foreach { case (id, frames) =>
      val nf = 2 + (id % 4).toInt
      val exp = (1 until nf).map(f => f -> (math.rint(diff(id, f) * 1e6) / 1e6))
        .sortBy { case (f, d) => (-d, f) }.take(2).toSet
      assert(frames == exp, s"doc $id: got $frames want $exp")
    }
    // the ranking is genuinely discriminative: some doc has unequal diffs
    assert(got.exists { case (_, fs) => fs.map(_._2).size > 1 })
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
