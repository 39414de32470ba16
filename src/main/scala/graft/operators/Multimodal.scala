package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media (image/audio/video) carried as opaque
  * `binary` columns beside typed metadata, with per-partition batch decode.
  *
  * The Spark-side plumbing is real and tested — schema, partition-parallel
  * decode via `Dataset.mapPartitions` (the Scala analog of `mapInPandas`
  * batch UDFs), typed output records. The actual media decode is STUBBED
  * (`decodeStub`): the container has no image/audio codecs, so the stub
  * derives deterministic fake features from the raw bytes. Swapping in a
  * real decoder (JavaCV, TwelveMonkeys, ffmpeg-pipe) only replaces the body
  * of `decodeStub`; nothing about the distributed shape changes.
  */
object Multimodal {

  /** A media blob + metadata row (what a 100 TB multimodal table's columns
    * look like: ids and metadata columnar, payload opaque binary). */
  case class MediaRecord(doc_id: Long, mime: String, payload: Array[Byte])

  /** Decoded feature row. */
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Int,
      first_byte: Int, last_byte: Int, byte_mean: Double)

  /** STUB decoder — stands in for image/audio decode + feature extraction.
    * Deterministic pure function of the payload bytes, so tests and the
    * rows-only driver check are stable. Replace with a real codec to
    * productionize; the mapPartitions batching below is the real shape. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val b = r.payload
    val mean =
      if (b.isEmpty) 0.0
      else {
        var s = 0L; var i = 0
        while (i < b.length) { s += (b(i) & 0xff); i += 1 }
        s.toDouble / b.length
      }
    MediaFeatures(r.doc_id, r.mime, b.length,
      if (b.isEmpty) -1 else b(0) & 0xff,
      if (b.isEmpty) -1 else b(b.length - 1) & 0xff,
      math.round(mean * 1e6) / 1e6)
  }

  /** Wrap the documents fixture as a multimodal table: payload = UTF-8
    * bytes of the text (stand-in for media bytes), mime tag alongside. */
  def asMediaTable(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select($"doc_id", lit("text/plain").as("mime"),
      encode($"text", "UTF-8").as("payload")).as[MediaRecord]
  }

  /** Partition-parallel batch decode: one decoder instantiation per
    * partition (where a real codec would set up its native context once),
    * then a streaming map over the partition's rows. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // real impl: initialize codec/native context here, once per partition
      it.map(decodeStub)
    }
  }

  /** One sampled frame: index + slice stats (a real video pipeline would
    * carry the frame bytes/tensor; the boundary-byte stats keep the stub
    * oracle-checkable). */
  case class MediaFrame(doc_id: Long, frame_idx: Int, f_len: Int,
      f_first: Int, f_last: Int)

  /** Frame sampling — the video-analog UDTF shape: one media row fans out
    * to `nFrames` evenly-spaced payload slices (frame i covers byte range
    * [⌊iL/n⌋, ⌊(i+1)L/n⌋); short payloads yield fewer frames). flatMap is
    * the typed one-to-many operator, so the fan-out happens partition-
    * parallel with no shuffle; a real decoder would seek per frame inside
    * the same loop. */
  def frameSample(media: Dataset[MediaRecord], nFrames: Int)
      : Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val L = r.payload.length
      (0 until nFrames).iterator.flatMap { i =>
        val lo = (i.toLong * L / nFrames).toInt
        val hi = ((i + 1).toLong * L / nFrames).toInt
        if (hi > lo)
          Some(MediaFrame(r.doc_id, i, hi - lo,
            r.payload(lo) & 0xff, r.payload(hi - 1) & 0xff))
        else None
      }
    }
  }

  /** A fixed-width "thumbnail" of the payload. */
  case class MediaThumb(doc_id: Long, thumb: Array[Float])

  /** Resize — the image-analog: variable-size payload → fixed-width
    * normalized vector (here a `bins`-bucket byte histogram; a real
    * pipeline would emit a downsampled pixel tensor or model embedding).
    * The fixed shape is the contract that matters: the output feeds the
    * similarity/ANN operators directly. */
  def resizeStub(media: Dataset[MediaRecord], bins: Int = 16)
      : Dataset[MediaThumb] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val h = new Array[Float](bins)
        var i = 0
        while (i < r.payload.length) {
          h(((r.payload(i) & 0xff) * bins) / 256) += 1f
          i += 1
        }
        if (r.payload.nonEmpty) {
          var b = 0
          while (b < bins) { h(b) /= r.payload.length; b += 1 }
        }
        MediaThumb(r.doc_id, h)
      }
    }
  }
}
