package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted per partition.
  *
  * Every kind is decoded FOR REAL with codecs that ship in the JDK:
  *  - images through `javax.imageio` (PNG/BMP/GIF/JPEG — [[decodePng]],
  *    [[resizePng]]), with palette-indexed rasters resolved through
  *    their palette before statistics;
  *  - audio through `javax.sound.sampled` (WAV/PCM — [[decodeWav]]),
  *    reading genuine RIFF containers back to 16-bit samples;
  *  - video stand-in through ImageIO's animated-GIF reader
  *    ([[frameSample]]): multi-frame payloads decode to real per-frame
  *    rasters, keeping the 1-row-to-N-frames generator shape honest.
  *
  * [[decodeMedia]] dispatches on the `kind` column so one pass over a
  * mixed media table lands every row in a single union-schema feature
  * row — the multimodal-table shape a training pipeline materializes.
  *
  * Scale notes: decode is per-row compute with no shuffle; binary payloads
  * stay columnar in parquet and are never collected. Feature extraction
  * emits small fixed-width rows, so downstream joins/aggregations operate
  * on features, never on the raw bytes. Decoder setup (ImageIO's
  * in-memory mode) happens once per partition inside `mapPartitions`,
  * not per row.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])

  /** Union feature schema across kinds: visual fields (`width`/`height`/
    * `n_frames`) are −1 for audio; audio fields (`sample_rate`/
    * `n_samples`) are −1 for visuals. `feat_mean` is the pixel mean for
    * visual kinds and the PCM sample mean for audio.
    */
  case class MediaFeatures(doc_id: Long, kind: String, width: Int,
      height: Int, n_frames: Int, sample_rate: Int, n_samples: Long,
      feat_mean: Double)

  /** Synthesize a REAL media table from `documents`: the fixtures ship no
    * media, so each doc gets a deterministic payload encoded through the
    * actual JDK codec for its kind — a grayscale PNG, a 16-bit PCM WAV,
    * or a multi-frame animated GIF. Downstream decode is then a genuine
    * codec round trip, not a byte-peek.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      (id % 3) match {
        case 0 => MediaRow(id, "image",
          synthPng(id, 4 + (id % 13).toInt, 4 + (id % 7).toInt))
        case 1 => MediaRow(id, "audio",
          synthWav(id, 8000, 100 + (id % 50).toInt))
        case _ => MediaRow(id, "video",
          synthGif(id, 16, 8, 2 + (id % 4).toInt))
      }
    })
  }

  /** REAL kind-dispatching decode: one pass over a mixed media table,
    * each row routed to the JDK codec for its kind (ImageIO for
    * image/video, AudioSystem for audio) and landed in the union
    * [[MediaFeatures]] schema. Per-row compute, zero shuffle.
    */
  def decodeMedia(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // pure in-memory decode
      rows.map { r =>
        r.kind match {
          case "image" =>
            val img0 = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.media))
            require(img0 != null, s"doc ${r.doc_id}: payload is not a decodable image")
            val s = rasterStats(resolveIndexed(img0))
            MediaFeatures(r.doc_id, r.kind, s.w, s.h, 1, -1, -1L, s.mean)
          case "audio" =>
            val wf = decodeWavBytes(r.doc_id, r.media)
            MediaFeatures(r.doc_id, r.kind, -1, -1, -1,
              wf.sample_rate, wf.n_samples, wf.pcm_mean)
          case "video" =>
            val frames = gifFrameStats(r.media, stride = 1)
            require(frames.nonEmpty, s"doc ${r.doc_id}: no decodable frames")
            val px = frames.map(f => f.w.toLong * f.h * f.bands).sum
            val sum = frames.map(_.sum).sum
            MediaFeatures(r.doc_id, r.kind, frames.head.w, frames.head.h,
              frames.length, -1, -1L, sum.toDouble / px)
          case other =>
            throw new IllegalArgumentException(
              s"doc ${r.doc_id}: unknown media kind '$other'")
        }
      }
    }
  }

  /** End-to-end: documents -> real binary media -> real decode -> features. */
  def mediaFeatures(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeMedia(mediaFromDocuments(docs)).toDF()

  // ------------------------------------------------------------------
  // REAL WAV path (javax.sound.sampled — in the JDK, like javax.imageio)
  // ------------------------------------------------------------------

  case class WavRow(doc_id: Long, wav: Array[Byte])
  case class WavFeatures(doc_id: Long, sample_rate: Int, channels: Int,
      n_samples: Long, duration_s: Double, pcm_min: Int, pcm_max: Int,
      pcm_mean: Double)

  /** Deterministic synthetic WAV: mono 16-bit signed PCM where sample
    * i = (docId*31 + i) % 65536 − 32768, encoded through the REAL
    * `javax.sound.sampled` WAV writer (RIFF container, little-endian
    * frames). PCM is lossless, so [[decodeWav]] recovers these exact
    * samples — the whole encode→decode round trip is verifiable by
    * plain SQL arithmetic in the DuckDB oracle (p39), exactly like
    * [[synthPng]]/[[decodePng]] for p31.
    */
  def synthWav(docId: Long, sampleRate: Int, nSamples: Int): Array[Byte] = {
    require(sampleRate >= 1 && nSamples >= 1,
      s"need positive rate/samples, got $sampleRate/$nSamples")
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = ((docId * 31 + i) % 65536 - 32768).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false) // 16-bit signed mono LE
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Near-dup WAV fixture — [[synthPngNoise]]'s trick for audio: docs in
    * the same FAMILY (id/3) share one base signal plus a tiny per-doc
    * perturbation (±2 on ~10k-amplitude samples), so family members are
    * perceptual near-duplicates while families differ. The base mixes a
    * NONLINEAR term (x² mod a prime, x = fam·31+i) so distinct families
    * produce decorrelated energy profiles — a pure sawtooth here (the
    * pre-round-12 form) collapsed 5000 docs onto 43 distinct 16-bit
    * fingerprints and made the banded hamming join quasi-all-pairs.
    * All-integer arithmetic, no clamping (base stays in [−10000, 9999],
    * noise ±2), so the DuckDB oracle recomputes every sample exactly
    * (p63's never-decode-a-byte contract).
    */
  def synthWavNoise(docId: Long, sampleRate: Int, nSamples: Int): Array[Byte] = {
    require(sampleRate >= 1 && nSamples >= 1,
      s"need positive rate/samples, got $sampleRate/$nSamples")
    val fam = docId / 3
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val x = fam * 31 + i
      val base = (x * x % 99991 * 7919 + x * 104729) % 20000 - 10000
      val noise = (docId * 7 + i.toLong * 13) % 5 - 2
      val v = (base + noise).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  case class AudioHash(doc_id: Long, n_samples: Long, afp: Long)

  /** Perceptual audio fingerprint — [[aHash]]'s construction on the 1-D
    * signal: the decoded PCM splits into `frames` contiguous frames
    * (sample i lands in frame i·frames/nSamples, integer floor), the
    * per-frame ENERGY is the sum of |sample| (no division, no floats),
    * and bit f compares the frame's mean energy against the clip's by
    * exact cross-multiplication: frameSum · n > clipSum · frameCount.
    * Small perturbations move energies a little and flip few bits, so
    * near-duplicate clips land within a small hamming distance — feed
    * [[graft.operators.Dedup.hammingNearDupPairs]], the same banded
    * join the image hashes ride (p63). Per-row mapPartitions decode
    * (JDK codec — the legitimate mapPartitions use), zero shuffles.
    */
  def audioFingerprint(ds: Dataset[WavRow], frames: Int = 16)
      : Dataset[AudioHash] = {
    require(frames >= 1 && frames <= 63,
      s"need 1 <= frames <= 63 hash bits, got $frames")
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val (_, samples) = wavSamples(r.doc_id, r.wav)
      val n = samples.length
      require(n >= frames,
        s"doc ${r.doc_id}: $n samples below the $frames-frame grid")
      val sums = new Array[Long](frames)
      val cnts = new Array[Long](frames)
      var total = 0L
      var i = 0
      while (i < n) {
        val f = (i.toLong * frames / n).toInt
        val e = math.abs(samples(i)).toLong
        sums(f) += e
        cnts(f) += 1
        total += e
        i += 1
      }
      var hash = 0L
      var f = 0
      while (f < frames) {
        if (sums(f) * n > total * cnts(f)) hash |= 1L << f
        f += 1
      }
      AudioHash(r.doc_id, n.toLong, hash)
    })
  }

  /** Parse a WAV container through the real `AudioSystem` and return its
    * format plus the decoded 16-bit samples — the shared front end of
    * [[decodeWav]] and [[frameAudio]].
    */
  private def wavSamples(docId: Long, wav: Array[Byte])
      : (javax.sound.sampled.AudioFormat, Array[Int]) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    try {
      val fmt = ais.getFormat
      require(fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
        s"doc $docId: expected 16-bit signed little-endian PCM, got $fmt")
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      require(n > 0, s"doc $docId: empty PCM payload")
      val samples = new Array[Int](n)
      var i = 0
      while (i < n) {
        samples(i) =
          ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1).toInt << 8)).toShort.toInt
        i += 1
      }
      (fmt, samples)
    } finally ais.close()
  }

  /** Decode one WAV payload through the real `AudioSystem` parser:
    * sample rate / channel count come from the parsed RIFF header, and
    * the PCM statistics from the decoded 16-bit samples. `n_samples`
    * counts frames (all channels of one instant = one frame);
    * min/max/mean run over every sample of every channel.
    */
  private[graft] def decodeWavBytes(docId: Long, wav: Array[Byte]): WavFeatures = {
    val (fmt, samples) = wavSamples(docId, wav)
    var mn = Int.MaxValue; var mx = Int.MinValue; var sum = 0L
    var i = 0
    while (i < samples.length) {
      val v = samples(i)
      if (v < mn) mn = v
      if (v > mx) mx = v
      sum += v
      i += 1
    }
    val frames = samples.length.toLong / fmt.getChannels
    WavFeatures(docId, fmt.getSampleRate.toInt, fmt.getChannels, frames,
      frames.toDouble / fmt.getSampleRate, mn, mx,
      sum.toDouble / samples.length)
  }

  /** REAL audio decode over a Dataset of WAV payloads (p39). */
  def decodeWav(ds: Dataset[WavRow]): Dataset[WavFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(r => decodeWavBytes(r.doc_id, r.wav)))
  }

  case class WavFeaturesSafe(doc_id: Long, sample_rate: Int, channels: Int,
      n_samples: Long, duration_s: Double, pcm_min: Int, pcm_max: Int,
      pcm_mean: Double, decode_error: String)

  /** Quarantine variant of [[decodeWav]] — [[decodePngSafe]]'s
    * resilient-ingest shape for audio: a corrupt or non-PCM payload
    * yields a row with `decode_error` set and −1 features instead of
    * failing the task. Filter `decode_error IS NULL` for the clean
    * side.
    */
  def decodeWavSafe(ds: Dataset[WavRow]): Dataset[WavFeaturesSafe] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      try {
        val f = decodeWavBytes(r.doc_id, r.wav)
        WavFeaturesSafe(f.doc_id, f.sample_rate, f.channels, f.n_samples,
          f.duration_s, f.pcm_min, f.pcm_max, f.pcm_mean, null)
      } catch {
        case e: Exception =>
          WavFeaturesSafe(r.doc_id, -1, -1, -1L, -1.0, -1, -1, -1.0,
            s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}".take(200))
      }
    })
  }

  case class AudioFrame(doc_id: Long, frame_idx: Int, rms: Double, zcr: Long)

  /** Framed speech features over REAL decoded audio (p41): the PCM
    * stream splits into fixed non-overlapping `frameLen`-sample frames
    * (trailing partial frame dropped), and each frame reports RMS
    * energy and the zero-crossing count (sign changes between
    * consecutive samples within the frame) — the front end of every
    * speech pipeline (VAD, energy gating, voicing estimates). flatMap
    * keeps the 1-row-to-N-frames generator shape; per-row compute, no
    * shuffle. Sample values are integers, so sum-of-squares is exact in
    * a double at any summation order — the oracle recomputes RMS/ZCR
    * bit-identically in SQL.
    */
  def frameAudio(ds: Dataset[WavRow], frameLen: Int): Dataset[AudioFrame] = {
    require(frameLen >= 2, s"frameLen must be >= 2, got $frameLen")
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val (fmt, samples) = wavSamples(r.doc_id, r.wav)
      // mono only: the sample stream is channel-interleaved, so framing
      // a stereo payload would mix channels and count a bogus zero
      // crossing at every L/R sign difference — de-interleave upstream
      require(fmt.getChannels == 1,
        s"doc ${r.doc_id}: frameAudio needs mono PCM, got ${fmt.getChannels} channels")
      val nf = samples.length / frameLen
      (0 until nf).map { f =>
        var sumSq = 0.0
        var zc = 0L
        var i = f * frameLen
        val end = (f + 1) * frameLen
        while (i < end) {
          val v = samples(i)
          sumSq += v.toDouble * v
          if (i + 1 < end && ((v < 0) != (samples(i + 1) < 0))) zc += 1
          i += 1
        }
        AudioFrame(r.doc_id, f, math.sqrt(sumSq / frameLen), zc)
      }
    }
  }

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

  private case class RasterStats(w: Int, h: Int, bands: Int,
      mn: Int, mx: Int, sum: Long) {
    def mean: Double = sum.toDouble / (w.toLong * h * bands)
  }

  private def rasterStats(img: java.awt.image.BufferedImage): RasterStats = {
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
    RasterStats(w, h, bands, mn, mx, sum)
  }

  /** Noise-textured synthetic grayscale PNG for SIMILARITY fixtures:
    * [[synthPng]]'s linear ramp makes every image the same gradient
    * (degenerate for a near-dup fixture — all hashes collide), so this
    * variant scrambles the value per pixel: v = ((docId·31 + p)·161 +
    * (p·p) mod 251) mod 256 at linear index p = y·w + x. Still pure
    * integer arithmetic, so an SQL oracle recomputes any pixel statistic
    * without decoding (the p31/p41 fixture trick).
    */
  def synthPngNoise(docId: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var p = 0
    while (p < w * h) {
      val v = (((docId * 31 + p) * 161 + (p.toLong * p) % 251) % 256).toInt
      raster.setSample(p % w, p / w, 0, v)
      p += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** One image's perceptual average-hash: grid² bits, bit (by, bx) set
    * iff that block's pixel mean exceeds the whole image's pixel mean.
    */
  case class ImageHash(doc_id: Long, width: Int, height: Int, ahash: Long)

  /** Perceptual average-hash (aHash) over REAL decoded images — the
    * image-modality member of the signature-dedup family: visually-
    * similar images (rescaled, re-encoded, lightly edited copies) land
    * within small hamming distance, so image near-dup detection becomes
    * [[Dedup.hammingNearDupPairs]] over this column — the same banded
    * pigeonhole join text SimHash rides, no pixels ever shuffled.
    *
    * The hash is defined in EXACT integer arithmetic so it is
    * bit-reproducible across engines and summation orders: block
    * (bx, by) covers pixels with x·grid/width == bx (integer floor;
    * width >= grid makes every block non-empty), the per-pixel value is
    * the SUM of channel samples (no division), and bit = blockSum ·
    * (width·height) > imageSum · blockPixelCount — the block-mean vs
    * image-mean comparison cross-multiplied into integers, immune to
    * the float-tie flips a mean-of-means formulation invites. Layout:
    * bit index by·grid + bx, grid² <= 63 bits total.
    */
  def aHash(ds: Dataset[PngRow], grid: Int = 4): Dataset[ImageHash] = {
    require(grid >= 1 && grid * grid <= 63,
      s"need 1 <= grid and grid^2 <= 63 hash bits, got $grid")
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val img0 = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.png))
        require(img0 != null,
          s"doc ${r.doc_id}: payload is not a decodable image")
        val img = resolveIndexed(img0)
        val raster = img.getRaster
        val w = img.getWidth; val h = img.getHeight
        require(w >= grid && h >= grid,
          s"doc ${r.doc_id}: ${w}x$h image below the ${grid}x$grid grid")
        val bands = raster.getNumBands
        val sums = new Array[Long](grid * grid)
        val cnts = new Array[Long](grid * grid)
        var imageSum = 0L
        var y = 0
        while (y < h) {
          val by = y * grid / h
          var x = 0
          while (x < w) {
            val bx = x * grid / w
            var px = 0L
            var b = 0
            while (b < bands) { px += raster.getSample(x, y, b); b += 1 }
            sums(by * grid + bx) += px
            cnts(by * grid + bx) += 1
            imageSum += px
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        var hash = 0L
        var i = 0
        while (i < grid * grid) {
          if (sums(i) * n > imageSum * cnts(i)) hash |= 1L << i
          i += 1
        }
        ImageHash(r.doc_id, w, h, hash)
      }
    }
  }

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
        val s = rasterStats(resolveIndexed(img0))
        PngFeatures(r.doc_id, s.w, s.h, s.bands, s.mn, s.mx, s.mean)
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
            val s = rasterStats(resolveIndexed(img0))
            PngFeaturesSafe(r.doc_id, s.w, s.h, s.bands, s.mn, s.mx,
              s.mean, null)
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

  // ------------------------------------------------------------------
  // REAL multi-frame path (ImageIO's animated-GIF reader — the JDK's
  // only multi-frame container, standing in for video frame sampling)
  // ------------------------------------------------------------------

  case class FrameSample(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, px_mean: Double)

  /** Deterministic synthetic animated GIF: `nFrames` full w×h 8-bit
    * grayscale frames where frame f's pixel i = (docId*31 + f*17 + i)
    * % 256, written through the REAL ImageIO GIF sequence writer
    * (`prepareWriteSequence`/`writeToSequence`). GIF's palette encoding
    * is lossless for 8-bit gray, so [[frameSample]] recovers the exact
    * values — SQL-arithmetic-verifiable like p31/p39. The JDK GIF
    * WRITER corrupts tiny images, hence the ≥16×8 floor.
    */
  def synthGif(docId: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    require(w >= 16 && h >= 8, s"JDK GIF writer corrupts tiny images; got ${w}x$h")
    require(nFrames >= 1, s"need at least one frame, got $nFrames")
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nFrames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var i = 0
      while (i < w * h) {
        raster.setSample(i % w, i / w, 0,
          ((docId * 31 + f.toLong * 17 + i) % 256).toInt)
        i += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  private case class FrameStats(idx: Int, w: Int, h: Int, bands: Int,
      mn: Int, mx: Int, sum: Long)

  /** Decode every `stride`-th stored frame of a multi-frame container
    * through the real ImageIO reader (`getNumImages(true)` / `read(i)`),
    * resolving each frame's palette before statistics (the p31
    * indexed-raster lesson applies per frame). Note `read(i)` returns
    * the RAW STORED frame: [[synthGif]] writes full frames, so stored =
    * rendered here; wild GIFs with partial-frame optimization + disposal
    * would need compositing onto the logical screen first — a renderer
    * concern, not a plumbing one.
    */
  private def gifFrameStats(bytes: Array[Byte], stride: Int): Seq[FrameStats] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    require(readers.hasNext, "payload is not a decodable image container")
    val reader = readers.next()
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      (0 until n by stride).map { f =>
        val s = rasterStats(resolveIndexed(reader.read(f)))
        FrameStats(f, s.w, s.h, s.bands, s.mn, s.mx, s.sum)
      }
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** REAL frame sampling (p40): every `stride`-th frame of each video
    * payload, decoded to its actual raster. flatMap keeps the
    * 1-row-to-N-frames generator shape; per-row compute, no shuffle.
    */
  def frameSample(ds: Dataset[MediaRow], stride: Int): Dataset[FrameSample] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import ds.sparkSession.implicits._
    ds.filter(_.kind == "video").flatMap { r =>
      gifFrameStats(r.media, stride).map { s =>
        FrameSample(r.doc_id, s.idx, s.w, s.h,
          s.sum.toDouble / (s.w.toLong * s.h * s.bands))
      }
    }
  }

  case class FrameDiff(doc_id: Long, frame_idx: Int, diff_mean: Double)

  /** Mean |pixel delta| of each frame vs its predecessor, decoded
    * through the real reader with ONE previous-raster buffer held per
    * video (sequential decode, O(frame) memory — never all frames at
    * once). Frame 0 has no predecessor and is not emitted.
    */
  private def gifFrameDiffs(bytes: Array[Byte]): Seq[(Int, Double)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    require(readers.hasNext, "payload is not a decodable image container")
    val reader = readers.next()
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      var prev: Array[Int] = null
      (0 until n).flatMap { f =>
        val img = resolveIndexed(reader.read(f))
        val r = img.getRaster
        val (w, h, bands) = (img.getWidth, img.getHeight, r.getNumBands)
        val cur = new Array[Int](w * h * bands)
        var i = 0; var b = 0
        while (b < bands) {
          var p = 0
          while (p < w * h) {
            cur(i) = r.getSample(p % w, p / w, b); i += 1; p += 1
          }
          b += 1
        }
        val out = if (prev == null || prev.length != cur.length) None
        else {
          var sum = 0L; var j = 0
          while (j < cur.length) { sum += math.abs(cur(j) - prev(j)); j += 1 }
          Some(f -> sum.toDouble / cur.length)
        }
        prev = cur
        out
      }
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** Keyframe selection — the video-pipeline sampling step that beats
    * fixed-stride frame grabs: the `k` frames per video with the LARGEST
    * mean absolute pixel change from their predecessor (scene cuts and
    * high-motion moments), ranked on the 6dp-ROUNDED diff (ties by frame
    * index) so the cut is engine-invariant. Decode is per-row flatMap
    * with one previous-frame buffer (no shuffle, bytes never leave the
    * task); ranking rides TopKPerGroup (map-side k-row partials, no
    * WindowExec) — at 100 TB the exchange carries ≤ k diff rows per
    * video × partition, never pixels.
    */
  def keyFrames(ds: Dataset[MediaRow], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import ds.sparkSession.implicits._
    val diffs = ds.filter(_.kind == "video").flatMap { r =>
      gifFrameDiffs(r.media).map { case (f, d) => FrameDiff(r.doc_id, f, d) }
    }.toDF().withColumn("diff_mean", round(col("diff_mean"), 6))
    graft.plans.TopKPerGroup.topK(diffs, Seq("doc_id"),
      Seq(col("diff_mean").desc, col("frame_idx").asc), k)
  }
}
