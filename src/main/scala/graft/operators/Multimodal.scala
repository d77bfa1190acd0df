package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fnv1a32

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic FAKE decode; everything around it — the
  * schema, the typed Dataset boundary, the batch-shaped mapPartitions
  * (one decoder init per partition, not per row), the binary column
  * transport — is the real Spark plumbing a production pipeline would
  * keep, swapping only the stub body for the codec call.
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
