package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.{PngRow, PngFeatures}

/** REAL image codec coverage: these tests push genuine PNG bytes through
  * javax.imageio inside Spark tasks — no stubs. synthPng's pixels are a
  * known arithmetic function, and PNG is lossless, so every decoded
  * statistic is independently recomputable.
  */
class PngCodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("synthPng emits genuine PNG bytes (magic + real ImageIO parse)") {
    val bytes = Multimodal.synthPng(42L, 10, 6)
    // PNG signature: 89 50 4E 47 0D 0A 1A 0A
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G')
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth == 10 && img.getHeight == 6)
  }

  test("decodePng recovers the exact written samples (lossless roundtrip)") {
    val rows = Seq(1L, 7L, 300L).map { id =>
      PngRow(id, Multimodal.synthPng(id, 4 + (id % 13).toInt, 4 + (id % 7).toInt))
    }
    val got = Multimodal.decodePng(spark.createDataset(rows).repartition(2))
      .collect().sortBy(_.doc_id)
    got.foreach { f =>
      val w = 4 + (f.doc_id % 13).toInt; val h = 4 + (f.doc_id % 7).toInt
      val px = (0 until w * h).map(i => ((f.doc_id * 31 + i) % 256).toInt)
      assert(f.width == w && f.height == h && f.channels == 1, f.toString)
      assert(f.px_min == px.min && f.px_max == px.max, f.toString)
      assert(math.abs(f.px_mean - px.sum.toDouble / px.size) < 1e-9, f.toString)
    }
  }

  test("decodePng reports 3 channels and per-band stats for an RGB image") {
    val img = new java.awt.image.BufferedImage(
      5, 4, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 4; x <- 0 until 5) {
      val r = (x * 50) % 256; val g = (y * 60) % 256; val b = 200
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val f = Multimodal.decodePng(
      spark.createDataset(Seq(PngRow(1L, bos.toByteArray)))).head()
    assert(f.channels == 3 && f.width == 5 && f.height == 4)
    val samples = for {
      y <- 0 until 4; x <- 0 until 5
      v <- Seq((x * 50) % 256, (y * 60) % 256, 200)
    } yield v
    assert(f.px_min == samples.min && f.px_max == samples.max)
    assert(math.abs(f.px_mean - samples.sum.toDouble / samples.size) < 1e-9)
  }

  test("resizePng rescales real pixels: fit-in dims, constant image stays constant") {
    // 100x60 fit into 50 -> 50x30; a constant-gray image must stay
    // exactly that gray through bilinear resampling (real pixel check)
    val img = new java.awt.image.BufferedImage(
      100, 60, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    for (y <- 0 until 60; x <- 0 until 100) raster.setSample(x, y, 0, 137)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val r = Multimodal.resizePng(
      spark.createDataset(Seq(PngRow(9L, bos.toByteArray))), 50).head()
    assert(r.in_w == 100 && r.in_h == 60 && r.out_w == 50 && r.out_h == 30)
    val out = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.png))
    assert(out.getWidth == 50 && out.getHeight == 30)
    for (y <- 0 until 30; x <- 0 until 50)
      assert(out.getRaster.getSample(x, y, 0) == 137, s"pixel ($x,$y)")
  }

  test("decode path is format-agnostic: BMP and GIF bytes decode through the same codec plumbing") {
    // ImageIO sniffs the container from the bytes, so the SAME operator
    // ingests any JDK-supported format — the binary column doesn't care
    // 16x8, not smaller: the JDK GIF WRITER corrupts tiny images (6x3
    // came back with a shifted row) — at 16x8+ the roundtrip is exact
    def encode(fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        16, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 8; x <- 0 until 16)
        img.getRaster.setSample(x, y, 0, (x * 7 + y * 3) % 256)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val rows = Seq(PngRow(1L, encode("bmp")), PngRow(2L, encode("gif")))
    val got = Multimodal.decodePng(spark.createDataset(rows))
      .collect().sortBy(_.doc_id)
    val px = for (y <- 0 until 8; x <- 0 until 16) yield (x * 7 + y * 3) % 256
    got.foreach { f =>
      assert(f.width == 16 && f.height == 8, f.toString)
      // BMP decodes direct-gray (1 band); GIF decodes INDEXED and the
      // operator resolves the palette into direct RGB (3 equal gray
      // bands — without the resolve, stats would be over palette
      // indices). Either way the color statistics are exact.
      assert(f.channels == (if (f.doc_id == 1L) 1 else 3), f.toString)
      assert(f.px_min == px.min && f.px_max == px.max, f.toString)
      assert(math.abs(f.px_mean - px.sum.toDouble / px.size) < 1e-9, f.toString)
    }
  }

  test("decodePngSafe quarantines corrupt payloads instead of failing the task") {
    val good = Multimodal.synthPng(5L, 6, 4)
    val truncated = good.take(20) // valid magic, torn body
    val garbage = Array.fill[Byte](64)(0x5a)
    val rows = Seq(PngRow(1L, good), PngRow(2L, truncated), PngRow(3L, garbage))
    val got = Multimodal.decodePngSafe(spark.createDataset(rows))
      .collect().sortBy(_.doc_id)
    assert(got(0).decode_error == null &&
      got(0).width == 6 && got(0).height == 4)
    // both bad payloads survive as quarantine rows, not exceptions
    assert(got(1).decode_error != null && got(1).width == -1, got(1).toString)
    assert(got(2).decode_error != null, got(2).toString)
    // and the clean/quarantine split is a plain filter
    val clean = Multimodal.decodePngSafe(spark.createDataset(rows))
      .filter(_.decode_error == null).count()
    assert(clean == 1)
  }

  test("resizePng never upscales (scale clamps at 1.0)") {
    val r = Multimodal.resizePng(
      spark.createDataset(Seq(PngRow(2L, Multimodal.synthPng(2L, 8, 5)))), 64).head()
    assert(r.out_w == 8 && r.out_h == 5)
    // and the bytes still decode to the identical samples (lossless copy)
    val out = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.png))
    for (y <- 0 until 5; x <- 0 until 8)
      assert(out.getRaster.getSample(x, y, 0) == ((2L * 31 + y * 8 + x) % 256).toInt)
  }
}
