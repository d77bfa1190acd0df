package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.{AudioHash, WavRow}

/** Audio perceptual fingerprint (p84): hand-reasoned bit properties on
  * constructed PCM, family recall on the noise fixture, and guards.
  */
class AudioHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def wavOf(samples: Array[Int]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def fp(rows: (Long, Array[Int])*): Map[Long, Long] =
    Multimodal.audioFingerprint(
        spark.createDataset(rows.map { case (id, s) => WavRow(id, wavOf(s)) }),
        frames = 16)
      .collect().map(h => h.doc_id -> h.afp).toMap

  test("flat signal hashes to 0 (no frame is strictly above the mean); one loud frame sets exactly its bit") {
    val flat = Array.fill(64)(1000)
    assert(fp((1L, flat))(1L) == 0L)
    // frame 5 = samples 20..23 at 64 samples / 16 frames
    val loud = Array.tabulate(64)(i => if (i / 4 == 5) 30000 else 10)
    assert(fp((2L, loud))(2L) == (1L << 5))
  }

  test("family members of the noise fixture stay within hamming 2; decode is deterministic") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val rows = (0L until 30L).map(id => WavRow(id,
      Multimodal.synthWavNoise(id, 8000, 64 + (id / 3 % 17).toInt * 4)))
    val h = Multimodal.audioFingerprint(spark.createDataset(rows), 48)
      .collect().map(x => x.doc_id -> x.afp).toMap
    (0L until 30L by 3L).foreach { base =>
      assert(ham(h(base), h(base + 1)) <= 2 && ham(h(base), h(base + 2)) <= 2,
        s"family ${base / 3} members drifted beyond hamming 2")
    }
    val h2 = Multimodal.audioFingerprint(spark.createDataset(rows), 48)
      .collect().map(x => x.doc_id -> x.afp).toMap
    assert(h == h2)
  }

  test("48-bit fingerprint spreads the banded join: band-bucket cardinality >> 64, buckets stay small") {
    // The r10 16-bit form saturated at <= 64 band-key values, making the
    // banded hamming join quasi-all-pairs at scale (2.19M result pairs
    // at sf0.1). At 48 bits / 3 bands of 16 the sf0.01-scale corpus
    // (500 docs, 167 families) must spread over hundreds of buckets
    // with no bucket above family-noise size — the join's scale
    // contract: per-bucket work tracks family size, not corpus size.
    val rows = (0L until 500L).map(id => WavRow(id,
      Multimodal.synthWavNoise(id, 8000, 64 + (id / 3 % 17).toInt * 4)))
    val hs = Multimodal.audioFingerprint(spark.createDataset(rows), 48)
      .collect().map(_.afp)
    val buckets = scala.collection.mutable.Map.empty[(Int, Long), Int]
    hs.foreach { sig =>
      (0 until 3).foreach { b =>
        val start = b * 16
        val key = (sig >> start) & 0xffffL
        buckets((b, key)) = buckets.getOrElse((b, key), 0) + 1
      }
    }
    assert(buckets.size >= 400,
      s"expected >=400 distinct (band, key) buckets, got ${buckets.size}")
    assert(buckets.values.max <= 10,
      s"expected max bucket <= 10 members, got ${buckets.values.max}")
  }

  test("guards: sub-frame clips and out-of-range frame counts fail fast") {
    intercept[Exception] { fp((1L, Array.fill(7)(5))) } // 7 samples < 16 frames
    intercept[IllegalArgumentException] {
      Multimodal.audioFingerprint(
        spark.createDataset(Seq(WavRow(1L, wavOf(Array.fill(64)(1))))),
        frames = 64)
    }
  }
}
