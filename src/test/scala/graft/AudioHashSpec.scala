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
    val h = Multimodal.audioFingerprint(spark.createDataset(rows), 16)
      .collect().map(x => x.doc_id -> x.afp).toMap
    (0L until 30L by 3L).foreach { base =>
      assert(ham(h(base), h(base + 1)) <= 2 && ham(h(base), h(base + 2)) <= 2,
        s"family ${base / 3} members drifted beyond hamming 2")
    }
    val h2 = Multimodal.audioFingerprint(spark.createDataset(rows), 16)
      .collect().map(x => x.doc_id -> x.afp).toMap
    assert(h == h2)
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
