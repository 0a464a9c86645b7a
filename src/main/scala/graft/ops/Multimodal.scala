package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque media payload + typed metadata. In a production pipeline
  * `payload` holds encoded image/audio/video bytes; here it is derived
  * deterministically from `documents.text` (always UTF-8/ASCII bytes). */
case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

case class DecodedMedia(media_id: Long, kind: String, n_bytes: Long,
                        width: Int, height: Int, channels: Int)

case class MediaFeature(media_id: Long, n_bytes: Long, feature: Array[Long])

/**
 * Multimodal-column operators: decode / resize / frame-sample /
 * feature-extract over opaque `binary` payload columns.
 *
 * The Spark-side plumbing is real and tested — typed `Dataset[MediaRow]`
 * schema, per-partition batched processing via `mapPartitions` (the Scala
 * analogue of an Arrow-batched `mapInPandas` decode stage), and
 * explode-based frame sampling. The *decoder itself* is a clearly-marked
 * deterministic STUB (this container has no image/audio codecs): metadata
 * and features are pure functions of the payload bytes, so every stage is
 * oracle-checkable byte-for-byte.
 *
 * Scale notes: decode/featurize are narrow per-partition maps (no
 * shuffle); frame sampling is a generator expression (`sequence` +
 * `explode`), also narrow. Partition sizing is inherited from the
 * upstream scan — at 100 TB keep `spark.sql.files.maxPartitionBytes`
 * small enough that a batch of decoded frames fits in executor memory.
 */
object Multimodal {

  val FrameBytes = 256
  val FrameStride = 4
  val FeatureChunks = 8

  /** Derive the media table: payload = UTF-8 bytes of the text column;
    * kind round-robins image/audio/video by id. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"))

  /** STUB decode (batched, per-partition): fake header parse producing
    * (width, height, channels) as pure functions of the first bytes.
    * A real build would replace `decodeOne` with the codec call; the
    * mapPartitions batch shape, schema, and downstream contract stay. */
  def decodeMeta(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val ds: Dataset[MediaRow] = media.as[MediaRow]
    ds.mapPartitions { rows =>
      // process in fixed-size batches, as a vectorized decoder would
      rows.grouped(64).flatMap { batch => batch.map(decodeOne) }
    }.toDF()
  }

  /** STUB: deterministic fake of an image/audio header parse. */
  private def decodeOne(m: MediaRow): DecodedMedia = {
    val b = m.payload
    val n = b.length.toLong
    val w = 16 + (if (n > 0) (b(0) & 0xffL).toInt % 64 else 0)
    val h = 16 + (if (n > 1) (b(1) & 0xffL).toInt % 64 else 0)
    DecodedMedia(m.media_id, m.kind, n, w, h, 1 + (n % 3).toInt)
  }

  /** STUB resize: halve both dimensions (min 1), keep every other byte.
    * Emits the post-resize metadata contract. */
  def resize(decoded: DataFrame): DataFrame =
    decoded.select(
      col("media_id"),
      greatest(floor(col("width") / 2), lit(1)).cast("int").as("width"),
      greatest(floor(col("height") / 2), lit(1)).cast("int").as("height"),
      col("channels"),
      floor((col("n_bytes") + 1) / 2).cast("long").as("n_bytes"))

  /** Frame sampling for video-kind payloads: frames are fixed
    * [[FrameBytes]]-sized byte windows; emit every [[FrameStride]]-th
    * frame's (frame_no, offset, length). Narrow generator — no shuffle. */
  def frameSample(media: DataFrame): DataFrame = {
    val nBytes = octet_length(col("payload")).cast("long")
    val nFrames = ceil(nBytes / lit(FrameBytes.toDouble)).cast("long")
    media.filter(col("kind") === "video")
      .select(col("media_id"), nBytes.as("n_bytes"), nFrames.as("n_frames"))
      .select(col("media_id"), col("n_bytes"),
        explode(sequence(lit(0L), col("n_frames") - 1,
          lit(FrameStride.toLong))).as("frame_no"))
      .select(col("media_id"), col("frame_no"),
        (col("frame_no") * FrameBytes).as("frame_offset"),
        least(lit(FrameBytes.toLong),
          col("n_bytes") - col("frame_no") * FrameBytes).as("frame_len"))
  }

  /** STUB featurize (batched, per-partition): [[FeatureChunks]] summed
    * byte-chunks per payload — stand-in for an embedding model forward
    * pass; the batch shape and ARRAY<LONG> feature contract are real. */
  def featurize(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.grouped(64).flatMap(_.map { m =>
        val n = m.payload.length
        val cs = math.max(1, (n + FeatureChunks - 1) / FeatureChunks)
        val f = Array.tabulate(FeatureChunks) { j =>
          var s = 0L
          var i = j * cs
          val end = math.min(n, (j + 1) * cs)
          while (i < end) { s += (m.payload(i) & 0xff); i += 1 }
          s
        }
        MediaFeature(m.media_id, n.toLong, f)
      })
    }.toDF()
  }
}
