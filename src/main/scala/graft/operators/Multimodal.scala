package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media
  * payloads are opaque `binary` columns with typed metadata, processed
  * with `mapPartitions` (streaming per partition — payloads never
  * collect to the driver, and the binary column is projected away
  * before any shuffle).
  *
  * ==== STUB BOUNDARY ====
  * This container has no image/audio codecs, so the DECODE step inside
  * [[decode]] / [[resize]] is a deterministic fake (byte histogram +
  * checksum standing in for pixel/sample access). Everything around it
  * — the schema, the Dataset encoders, the partition-streaming
  * iterator shape, the frame-sampling explode — is the real Spark
  * plumbing a production decoder drops into: replace the marked
  * function bodies with a javacv/libjpeg call and nothing else moves.
  *
  * Scale notes: payload bytes ride only map-side (scan → mapPartitions
  * → project); features/metadata (small, fixed-width) are what shuffle.
  * Size `spark.sql.files.maxPartitionBytes` so a partition of payloads
  * fits in executor memory; each partition is processed as a lazy
  * iterator, never materialized wholesale.
  */
object Multimodal {

  /** Typed media metadata carried alongside the opaque payload. */
  final case class MediaMeta(format: String, width: Int, height: Int,
                             sampleRateHz: Int, durationMs: Long)

  /** One media object: opaque bytes + typed metadata. */
  final case class MediaItem(media_id: Long, media_type: String,
                             payload: Array[Byte], meta: MediaMeta)

  /** Decoded per-item features (fixed-width — safe to shuffle). */
  final case class MediaFeatures(media_id: Long, media_type: String,
                                 n_bytes: Long, checksum: Long,
                                 histogram: Array[Double])

  /** One sampled frame of a payload (video frame / audio window). */
  final case class Frame(media_id: Long, frame_no: Int, offset: Long,
                         frame_bytes: Array[Byte])

  val HistogramBins = 16

  /** Deterministic media table derived from `documents`: the UTF-8
    * bytes of `text` stand in for an encoded payload; type and metadata
    * are synthesized from the id (driver testdata has no binary column;
    * payload CONTENT is opaque to every operator below, which is the
    * point). */
  def fromDocuments(docs: DataFrame): Dataset[MediaItem] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val payload = text.getBytes("UTF-8")
        val (tpe, meta) = (id % 3) match {
          case 0 => ("image", MediaMeta("fake/png", (nChars % 640).toInt + 1,
            (nChars % 480).toInt + 1, 0, 0L))
          case 1 => ("audio", MediaMeta("fake/wav", 0, 0, 16000,
            nChars * 10))
          case _ => ("video", MediaMeta("fake/mp4", 320, 240, 0,
            nChars * 40))
        }
        MediaItem(id, tpe, payload, meta)
      }
  }

  /** Decode + feature-extract, streaming each partition. The inner
    * `decodeOneStub` is the STUB: a real build decodes pixels/samples
    * there; its per-item contract (bytes in, fixed-width features out)
    * and everything outside it are production-shaped. */
  def decode(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it: Iterator[MediaItem] =>
      // lazy per-partition stream: one item in flight at a time
      it.map(decodeOneStub)
    }
  }

  /** STUB decode ??? — deterministic fake: byte histogram + rolling
    * checksum in place of pixel/sample decoding. Replace this body
    * with the real codec call. */
  private def decodeOneStub(m: MediaItem): MediaFeatures = {
    val hist = new Array[Double](HistogramBins)
    var checksum = 0L
    var i = 0
    while (i < m.payload.length) {
      val b = m.payload(i) & 0xff
      hist(b % HistogramBins) += 1.0
      checksum = (checksum * 31 + b) % 1000000007L
      i += 1
    }
    val n = math.max(m.payload.length, 1)
    var j = 0
    while (j < HistogramBins) { hist(j) /= n; j += 1 }
    MediaFeatures(m.media_id, m.media_type, m.payload.length.toLong,
      checksum, hist)
  }

  /** Sample every `every`-th fixed-size frame from each payload —
    * the explode-shaped op (1 row → n rows) of the media pipeline.
    * Frame boundaries are byte offsets here (STUB: a real demuxer
    * yields codec frames); the flatMap plumbing is real. */
  def frameSample(items: Dataset[MediaItem], frameSize: Int = 256,
                  every: Int = 4): Dataset[Frame] = {
    require(frameSize > 0 && every > 0)
    val spark = items.sparkSession
    import spark.implicits._
    items.flatMap { m =>
      val nFrames = (m.payload.length + frameSize - 1) / frameSize
      (0 until nFrames by every).iterator.map { f =>
        val off = f.toLong * frameSize
        val end = math.min(m.payload.length, (f + 1) * frameSize)
        Frame(m.media_id, f, off,
          java.util.Arrays.copyOfRange(m.payload, off.toInt, end))
      }
    }
  }

  /** Metadata-level resize: clamp the longer image side to `maxDim`,
    * keeping aspect ratio. STUB: payload passes through untouched (a
    * real build re-encodes); the metadata contract is real. */
  def resize(items: Dataset[MediaItem], maxDim: Int): Dataset[MediaItem] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.map { m =>
      if (m.media_type != "image" || math.max(m.meta.width, m.meta.height) <= maxDim) m
      else {
        val scale = maxDim.toDouble / math.max(m.meta.width, m.meta.height)
        m.copy(meta = m.meta.copy(
          width = math.max(1, math.round(m.meta.width * scale).toInt),
          height = math.max(1, math.round(m.meta.height * scale).toInt)))
      }
    }
  }
}
