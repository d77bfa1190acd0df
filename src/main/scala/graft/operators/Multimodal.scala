package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fnv1a32

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted per partition.
  *
  * PNG is decoded FOR REAL (`decodePng`/`resizePng` below): `javax.imageio`
  * ships in the JDK, so genuine PNG bytes round-trip through an actual
  * codec — dimensions, channel count and pixel statistics come from the
  * decoded raster, and resize rescales real pixels through Graphics2D.
  * Audio/video codecs are NOT in this container, so `decodeStub`/
  * `frameSampleStub` remain clearly-marked deterministic FAKES for those
  * kinds; everything around them — the schema, the typed Dataset
  * boundary, the batch-shaped mapPartitions (one decoder init per
  * partition, not per row), the binary column transport — is the real
  * Spark plumbing a production pipeline would keep, swapping only the
  * stub body for the codec call.
  *
  * Scale notes: decode is per-row compute with no shuffle; binary payloads
  * stay columnar in parquet and are never collected. Feature extraction
  * emits small fixed-width rows, so downstream joins/aggregations operate
  * on features, never on the raw bytes.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])

  /** Fake frame count of a payload — single source for decode + sampling. */
  def nFrames(media: Array[Byte]): Int = (media.length % 7).toInt
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, checksum: Long)

  /** Synthesize a media table from `documents` (UTF-8 bytes as payload):
    * the fixtures ship no real media, but the column shapes are what a
    * real ingest would produce.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("media"))

  /** STUB decode — deterministic fake in place of the codec call.
    * A real implementation would open the payload with e.g. libjpeg /
    * ffmpeg here (per-partition init, per-row decode). Marked clearly:
    * everything derived from the first bytes + length is FAKE.
    */
  def decodeStub(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // (real pipeline: initialize the decoder once per partition here)
      rows.map { r =>
        val n = r.media.length.toLong
        val b0 = if (n > 0) r.media(0) & 0xff else 0
        val b1 = if (n > 1) r.media(1) & 0xff else 0
        MediaFeatures(r.doc_id, r.kind, n,
          width = b0, height = b1, n_frames = Multimodal.nFrames(r.media),
          checksum = Fnv1a32.hash(r.media))
      }
    }
  }

  /** End-to-end: documents -> binary media -> stub decode -> features. */
  def mediaFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    decodeStub(mediaFromDocuments(docs).as[MediaRow]).toDF()
  }

  case class ResizedMedia(doc_id: Long, kind: String, width: Int, height: Int,
      out_w: Int, out_h: Int, scale: Double)

  /** STUB resize — aspect-preserving fit into maxDim×maxDim. A real
    * implementation rescales pixels here; the FAKE part is only that no
    * pixel buffer exists, the dimension arithmetic and batch shape are
    * what production code keeps.
    */
  def resizeStub(features: Dataset[MediaFeatures], maxDim: Int): Dataset[ResizedMedia] = {
    import features.sparkSession.implicits._
    features.mapPartitions { rows =>
      rows.map { f =>
        val w = math.max(f.width, 1); val h = math.max(f.height, 1)
        val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
        ResizedMedia(f.doc_id, f.kind, w, h,
          math.max(1, math.round(w * scale).toInt),
          math.max(1, math.round(h * scale).toInt), scale)
      }
    }
  }

  case class FrameSample(doc_id: Long, frame_idx: Int, frame_checksum: Long)

  // ------------------------------------------------------------------
  // REAL PNG path (javax.imageio — in the JDK, no external codec needed)
  // ------------------------------------------------------------------

  case class PngRow(doc_id: Long, png: Array[Byte])
  case class PngFeatures(doc_id: Long, width: Long, height: Long,
      channels: Int, px_min: Long, px_max: Long, px_mean: Double)

  /** Deterministic synthetic PNG: a w×h 8-bit grayscale image whose
    * pixel at index i = y*w + x equals (docId*31 + i) % 256, encoded
    * through the REAL `javax.imageio` PNG writer. The fixtures ship no
    * media, but because PNG is lossless the decode below recovers these
    * exact samples — which makes the whole encode→decode round trip
    * verifiable by plain SQL arithmetic in the DuckDB oracle (p31).
    */
  def synthPng(docId: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((docId * 31 + y.toLong * w + x) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Palette-indexed rasters (GIF, indexed PNG/BMP) store palette
    * INDICES in their samples — raw `getSample` over them would compute
    * statistics of indices, not colors. Resolve through the palette by
    * redrawing into a direct-color image. Caught by the format-agnostic
    * decode spec: a grayscale GIF's "mean" came out 67 instead of 101.
    */
  private def resolveIndexed(img: java.awt.image.BufferedImage)
      : java.awt.image.BufferedImage =
    if (img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]) {
      val out = new java.awt.image.BufferedImage(
        img.getWidth, img.getHeight,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val g = out.createGraphics()
      g.drawImage(img, 0, 0, null)
      g.dispose()
      out
    } else img

  /** REAL decode: `javax.imageio` parses the image bytes (format sniffed
    * from the container — PNG, BMP, GIF, JPEG all ride the same path)
    * and the features come from the decoded raster — width, height,
    * channel count, and min/max/mean over every sample of every band.
    * mapPartitions keeps the decoder-init-once-per-partition shape
    * (ImageIO's in-memory mode is switched on per task, not per row).
    */
  def decodePng(ds: Dataset[PngRow]): Dataset[PngFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // pure in-memory decode
      rows.map { r =>
        val img0 = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.png))
        require(img0 != null, s"doc ${r.doc_id}: payload is not a decodable image")
        val img = resolveIndexed(img0)
        val raster = img.getRaster
        val w = img.getWidth; val h = img.getHeight
        val bands = raster.getNumBands
        var mn = Int.MaxValue; var mx = Int.MinValue; var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < bands) {
              val v = raster.getSample(x, y, b)
              if (v < mn) mn = v
              if (v > mx) mx = v
              sum += v
              b += 1
            }
            x += 1
          }
          y += 1
        }
        PngFeatures(r.doc_id, w, h, bands, mn, mx,
          sum.toDouble / (w.toLong * h * bands))
      }
    }
  }

  case class PngFeaturesSafe(doc_id: Long, width: Long, height: Long,
      channels: Int, px_min: Long, px_max: Long, px_mean: Double,
      decode_error: String)

  /** Quarantine variant of [[decodePng]] (q56's resilient-ingest shape
    * applied to media): a corrupt payload yields a row with
    * `decode_error` set and null-ish features instead of failing the
    * task — at 100 TB a single bad crawl byte must not kill a stage.
    * Filter `decode_error IS NULL` for the clean side, the rest is the
    * quarantine.
    */
  def decodePngSafe(ds: Dataset[PngRow]): Dataset[PngFeaturesSafe] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        try {
          val img0 = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.png))
          if (img0 == null)
            PngFeaturesSafe(r.doc_id, -1L, -1L, -1, -1L, -1L, -1.0,
              "not a decodable image")
          else {
            val img = resolveIndexed(img0)
            val raster = img.getRaster
            val w = img.getWidth; val h = img.getHeight
            val bands = raster.getNumBands
            var mn = Int.MaxValue; var mx = Int.MinValue; var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                var b = 0
                while (b < bands) {
                  val v = raster.getSample(x, y, b)
                  if (v < mn) mn = v
                  if (v > mx) mx = v
                  sum += v
                  b += 1
                }
                x += 1
              }
              y += 1
            }
            PngFeaturesSafe(r.doc_id, w, h, bands, mn, mx,
              sum.toDouble / (w.toLong * h * bands), null)
          }
        } catch {
          case e: Exception =>
            PngFeaturesSafe(r.doc_id, -1L, -1L, -1, -1L, -1L, -1.0,
              s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}".take(200))
        }
      }
    }
  }

  case class ResizedPng(doc_id: Long, in_w: Int, in_h: Int,
      out_w: Int, out_h: Int, png: Array[Byte])

  /** REAL aspect-preserving resize: decode the PNG, rescale the actual
    * pixels through a bilinear Graphics2D draw into a fit-in
    * maxDim×maxDim target (never upscaling), and re-encode as PNG.
    */
  def resizePng(ds: Dataset[PngRow], maxDim: Int): Dataset[ResizedPng] = {
    require(maxDim >= 1, s"maxDim must be >= 1, got $maxDim")
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val img0 = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.png))
        require(img0 != null, s"doc ${r.doc_id}: payload is not a decodable image")
        // indexed inputs resolve through their palette before resampling:
        // bilinear interpolation over palette INDICES is meaningless, and
        // a fresh indexed target would remap to the default 256 palette
        val img = resolveIndexed(img0)
        val w = img.getWidth; val h = img.getHeight
        val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
        val ow = math.max(1, math.round(w * scale).toInt)
        val oh = math.max(1, math.round(h * scale).toInt)
        val imgType =
          if (img.getType == java.awt.image.BufferedImage.TYPE_CUSTOM)
            java.awt.image.BufferedImage.TYPE_INT_ARGB
          else img.getType
        val out = new java.awt.image.BufferedImage(ow, oh, imgType)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, ow, oh, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        ResizedPng(r.doc_id, w, h, ow, oh, bos.toByteArray)
      }
    }
  }

  /** STUB frame sampling — every `stride`-th frame of a video payload.
    * A real implementation seeks+decodes frames here; the deterministic
    * fake hashes the byte range each frame would occupy, keeping the
    * 1-row-to-N-frames generator shape (flatMap) real.
    */
  def frameSampleStub(ds: Dataset[MediaRow], stride: Int): Dataset[FrameSample] = {
    import ds.sparkSession.implicits._
    ds.filter(_.kind == "video").flatMap { r =>
      val frames = Multimodal.nFrames(r.media)
      (0 until frames by stride).map { i =>
        // Long arithmetic: i * length overflows Int for payloads > ~300 MB
        val from = (i.toLong * r.media.length / math.max(frames, 1)).toInt
        val until = ((i + 1).toLong * r.media.length / math.max(frames, 1)).toInt
        FrameSample(r.doc_id, i,
          graft.functions.Fnv1a32.hash(r.media.slice(from, until)))
      }
    }
  }
}
