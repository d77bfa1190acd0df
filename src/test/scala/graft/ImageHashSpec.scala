package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Multimodal}

/** Perceptual image hashing (p63): aHash exact-integer bit rule over
  * real decoded rasters, re-encode invariance (the perceptual property),
  * the generalized banded hamming join's pigeonhole completeness at
  * non-32-bit widths, and parameter guards.
  */
class ImageHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hashOf(rows: Seq[Multimodal.PngRow]): Map[Long, Long] =
    Multimodal.aHash(rows.toDS(), grid = 4).collect()
      .map(r => r.doc_id -> r.ahash).toMap

  test("aHash matches the arithmetic definition on a hand image") {
    // 4x4 image, grid 4: each block is one pixel; bit i set iff
    // pixel i * 16 > sum of all pixels (cross-multiplied mean rule)
    val vals = Array(0, 0, 0, 0, 0, 0, 0, 0, 255, 255, 255, 255, 255,
      255, 255, 255)
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    vals.zipWithIndex.foreach { case (v, p) =>
      img.getRaster.setSample(p % 4, p / 4, 0, v) }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val h = hashOf(Seq(Multimodal.PngRow(1L, bos.toByteArray)))(1L)
    val sum = vals.map(_.toLong).sum
    val expected = vals.zipWithIndex.collect {
      case (v, i) if v * 16L > sum => 1L << i }.sum
    assert(h == expected)
    assert(h == 0xFF00L, "bottom half bright -> bits 8..15")
  }

  test("re-encoding the same raster leaves the hash unchanged (perceptual property)") {
    val png = Multimodal.synthPngNoise(7L, 12, 9)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos) // different container
    val m = hashOf(Seq(Multimodal.PngRow(1L, png),
      Multimodal.PngRow(2L, bos.toByteArray)))
    assert(m(1L) == m(2L),
      "lossless re-encode must hash identically — the hash sees the " +
        "raster, not the container")
  }

  test("banded hamming join at 16 bits equals exact all-pairs popcount") {
    val hashes = (0L until 200L)
      .map(i => (i, ((i * 2654435761L) >>> 7) & 0xFFFFL))
      .toDF("id", "ahash")
    val banded = Dedup.hammingNearDupPairs(hashes, "ahash", 16, maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    val rows = hashes.as[(Long, Long)].collect()
    val exact = (for {
      (a, ha) <- rows; (b, hb) <- rows if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 2
    } yield (a, b, d)).toSet
    assert(banded == exact, "pigeonhole banding must be complete — the " +
      "remainder bits belong to the last band")
    assert(exact.nonEmpty)
  }

  test("remainder-bit completeness: pairs differing ONLY past the last even band boundary") {
    // 16 bits, maxDist 2 -> bands of 5,5,6: craft pairs whose diffs sit
    // entirely in bits 10..15 (the widened last band) and verify they
    // are still found via the equal first two bands
    val hashes = Seq(
      (1L, 0x0000L), (2L, 0x8400L), // differ in bits 10 and 15 only
      (3L, 0xFC00L)).toDF("id", "ahash") // differs from 1 in all 6 high bits
    val got = Dedup.hammingNearDupPairs(hashes, "ahash", 16, maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 2)))
  }

  test("undecodable payloads and undersized images fail loudly") {
    val bad = intercept[org.apache.spark.SparkException] {
      Multimodal.aHash(Seq(Multimodal.PngRow(1L,
        Array[Byte](1, 2, 3))).toDS()).collect()
    }
    assert(bad.getMessage.contains("decodable") ||
      bad.getCause != null)
    val small = intercept[org.apache.spark.SparkException] {
      Multimodal.aHash(Seq(Multimodal.PngRow(1L,
        Multimodal.synthPngNoise(1L, 2, 2))).toDS()).collect()
    }
    assert(small.getMessage.contains("grid") || small.getCause != null)
  }

  test("degenerate hamming parameters are rejected") {
    val df = Seq((1L, 0L)).toDF("id", "ahash")
    intercept[IllegalArgumentException] {
      Dedup.hammingNearDupPairs(df, "ahash", 64, 2)
    }
    intercept[IllegalArgumentException] {
      Dedup.hammingNearDupPairs(df, "ahash", 16, -1)
    }
  }
}
