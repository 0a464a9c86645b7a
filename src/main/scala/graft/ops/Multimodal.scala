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
 * explode-based frame sampling. Image AND audio decode are REAL:
 * image-kind payloads are encoded as actual BMP files ([[encodeImages]])
 * and parsed back through the `javax.imageio` codec (PNG payloads
 * decode too); audio-kind payloads are encoded as actual 16-bit PCM
 * RIFF/WAVE files ([[encodeAudio]]) and parsed back through
 * `javax.sound.sampled` (a pure header parse — headless-safe). Video
 * decode remains a clearly-marked deterministic STUB (this container
 * has no video codecs): metadata and features are pure functions of the
 * payload bytes, so every stage stays oracle-checkable byte-for-byte.
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

  /** Deterministic (w, h) used by both the image encoder and the stub
    * header parse — dims derive from the first payload bytes. */
  private def stubDims(b: Array[Byte]): (Int, Int) = (
    16 + (if (b.length > 0) (b(0) & 0xff) % 64 else 0),
    16 + (if (b.length > 1) (b(1) & 0xff) % 64 else 0))

  /** Encoded byte size of a 24bpp bottom-up BI_RGB BMP: 14-byte file
    * header + 40-byte info header + h rows padded to 4-byte multiples. */
  def bmpSize(w: Int, h: Int): Long = 54L + h.toLong * ((3 * w + 3) / 4 * 4)

  /** Re-encode image-kind payloads as REAL image files (narrow
    * per-partition map, no shuffle): every other image (media_id % 6
    * == 0) becomes a baseline JFIF/JPEG, the rest 24bpp BMPs — so the
    * decode stage exercises BOTH `javax.imageio` codec families. Dims
    * from [[stubDims]]; hand-rolled writers so the byte layout (and so
    * `n_bytes`) is exact and engine-independent; the matching decode
    * side goes through the actual `javax.imageio` codecs. */
  def encodeImages(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.grouped(64).flatMap(_.map { m =>
        if (m.kind == "image" && m.payload.nonEmpty)
          m.copy(payload =
            if (m.media_id % 6 == 0) encodeJpeg(m.payload)
            else encodeBmp(m.payload))
        else m
      })
    }.toDF()
  }

  /** 24bpp bottom-up BI_RGB BMP of the deterministic grayscale render. */
  private def encodeBmp(src: Array[Byte]): Array[Byte] = {
    val (w, h) = stubDims(src)
    val rowSize = (3 * w + 3) / 4 * 4
    val out = new Array[Byte](bmpSize(w, h).toInt)
    def putInt(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putInt(2, out.length); putInt(10, 54)           // file size, pixel offset
    putInt(14, 40); putInt(18, w); putInt(22, h)    // info header, dims
    out(26) = 1; out(28) = 24                       // planes=1, bpp=24
    putInt(34, h * rowSize)                         // image size (BI_RGB)
    var y = 0
    while (y < h) {
      val rowOff = 54 + (h - 1 - y) * rowSize       // bottom-up row order
      var x = 0
      while (x < w) {
        val v = src((y * w + x) % src.length)
        val p = rowOff + 3 * x
        out(p) = v; out(p + 1) = v; out(p + 2) = v  // B = G = R
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- minimal baseline JPEG writer -------------------------------
  // Standard Huffman tables from the JPEG spec (ITU-T T.81 Annex K.3),
  // the public tables every baseline encoder ships.
  private val JpegDcBits =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val JpegDcVals = Array.range(0, 12)
  private val JpegAcBits =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val JpegAcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)

  /** Fixed marker-segment overhead of [[encodeJpeg]]'s layout: SOI(2) +
    * JFIF APP0(18) + DQT(69) + SOF0(13) + DHT DC(33) + DHT AC(183) +
    * SOS(10) + EOI(2). */
  val JpegOverheadBytes = 330L

  /** Encoded size of [[encodeJpeg]]'s output: every 8×8 block of the
    * uniform-gray image emits DC-category-0 ("00") + EOB ("1010") —
    * 6 bits — so the entropy-coded scan is ⌈6·blocks/8⌉ bytes (the
    * repeating 001010 bit stream never forms an 0xFF byte, so no
    * byte-stuffing ever applies) on top of the fixed marker overhead. */
  def jpegSize(w: Int, h: Int): Long = {
    val blocks = ((w + 7) / 8).toLong * ((h + 7) / 8)
    JpegOverheadBytes + (6 * blocks + 7) / 8
  }

  /** Minimal REAL baseline JFIF/JPEG: grayscale, dims from
    * [[stubDims]], every pixel mid-gray 128. The level shift zeroes
    * every DCT coefficient, so each block's entropy coding is exactly
    * (DC diff 0, EOB) under the spec's standard Huffman tables —
    * a fully deterministic byte layout ([[jpegSize]]) that the actual
    * `javax.imageio` JPEG codec parses back to (w, h, 1 band). */
  private def encodeJpeg(src: Array[Byte]): Array[Byte] = {
    val (w, h) = stubDims(src)
    val out = new java.io.ByteArrayOutputStream(jpegSize(w, h).toInt)
    def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
    def marker(m: Int, payload: Int*): Unit = {
      b(0xFF, m, (payload.length + 2) >> 8, (payload.length + 2) & 0xff)
      b(payload: _*)
    }
    b(0xFF, 0xD8)                                    // SOI
    marker(0xE0, "JFIF".map(_.toInt) ++ Seq(0, 1, 1, 0, 0, 1, 0, 1, 0, 0): _*)
    marker(0xDB, 0 +: Seq.fill(64)(1): _*)           // DQT 0: all ones
    marker(0xC0, 8, h >> 8, h & 0xff, w >> 8, w & 0xff, 1, 1, 0x11, 0) // SOF0
    marker(0xC4, 0x00 +: (JpegDcBits ++ JpegDcVals).toSeq: _*)  // DHT DC 0
    marker(0xC4, 0x10 +: (JpegAcBits ++ JpegAcVals).toSeq: _*)  // DHT AC 0
    marker(0xDA, 1, 1, 0x00, 0, 63, 0)               // SOS
    // scan: 6 bits per block (00 + 1010), MSB-first, 1-padded tail
    val blocks = ((w + 7) / 8) * ((h + 7) / 8)
    var acc = 0L
    var nBits = 0
    var i = 0
    while (i < blocks) {
      acc = (acc << 6) | 0x0A                        // 001010
      nBits += 6
      while (nBits >= 8) {
        out.write(((acc >> (nBits - 8)) & 0xff).toInt)
        nBits -= 8
      }
      i += 1
    }
    if (nBits > 0)
      out.write((((acc << (8 - nBits)) | ((1 << (8 - nBits)) - 1)) & 0xff).toInt)
    b(0xFF, 0xD9)                                    // EOI
    out.toByteArray
  }

  /** Audio sample rate used by the WAV encoder (and so reported back by
    * the real decode). */
  val WavSampleRate = 8000

  /** Re-encode audio-kind payloads as REAL 16-bit PCM RIFF/WAVE files
    * (narrow per-partition map, no shuffle): channel count from the
    * first payload byte's parity, one sample frame per source byte.
    * Hand-rolled canonical 44-byte-header writer so the byte layout
    * (and so `n_bytes = 44 + frames·channels·2`) is exact and
    * engine-independent; the matching decode side goes through the
    * actual `javax.sound.sampled` WAV parser. */
  def encodeAudio(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.grouped(64).flatMap(_.map { m =>
        if (m.kind == "audio" && m.payload.nonEmpty)
          m.copy(payload = encodeWav(m.payload))
        else m
      })
    }.toDF()
  }

  /** Canonical-layout (44-byte header) 16-bit PCM WAV: channels =
    * 1 + (first byte & 1), one frame per source byte, sample value =
    * byte << 8 on every channel. */
  private def encodeWav(src: Array[Byte]): Array[Byte] = {
    val c = 1 + (src(0) & 1)
    val frames = src.length
    val dataSize = frames * c * 2
    val out = new Array[Byte](44 + dataSize)
    def putInt(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    def putShort(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
    }
    def putTag(off: Int, s: String): Unit =
      s.indices.foreach(i => out(off + i) = s.charAt(i).toByte)
    putTag(0, "RIFF"); putInt(4, 36 + dataSize); putTag(8, "WAVE")
    putTag(12, "fmt "); putInt(16, 16)
    putShort(20, 1)                                  // PCM
    putShort(22, c)
    putInt(24, WavSampleRate)
    putInt(28, WavSampleRate * c * 2)                // byte rate
    putShort(32, c * 2)                              // block align
    putShort(34, 16)                                 // bits per sample
    putTag(36, "data"); putInt(40, dataSize)
    var i = 0
    while (i < frames) {
      val v = (src(i) & 0xff) << 8
      var ch = 0
      while (ch < c) {
        putShort(44 + (i * c + ch) * 2, v)
        ch += 1
      }
      i += 1
    }
    out
  }

  /** Decode (batched, per-partition): REAL codec for encoded images —
    * BMP/PNG payloads are detected by magic bytes and parsed with
    * `javax.imageio.ImageIO` (dependency-free; works headless) — and a
    * clearly-marked deterministic STUB header parse for the audio/video
    * kinds (this container has no audio/video codecs). The mapPartitions
    * batch shape, schema, and downstream contract are shared by both. */
  def decodeMeta(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val ds: Dataset[MediaRow] = media.as[MediaRow]
    ds.mapPartitions { rows =>
      // process in fixed-size batches, as a vectorized decoder would
      rows.grouped(64).flatMap { batch => batch.map(decodeOne) }
    }.toDF()
  }

  private def isBmp(b: Array[Byte]): Boolean =
    b.length > 54 && b(0) == 'B' && b(1) == 'M'
  private def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G'
  /** SOI + next-marker prefix shared by JFIF and EXIF JPEG payloads. */
  private def isJpeg(b: Array[Byte]): Boolean =
    b.length > 4 && (b(0) & 0xff) == 0xFF && (b(1) & 0xff) == 0xD8 &&
      (b(2) & 0xff) == 0xFF
  private def isWav(b: Array[Byte]): Boolean =
    b.length > 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
      b(11) == 'E'

  /** Real codec decode for BMP/PNG/JPEG (`javax.imageio`) and RIFF/WAVE
    * (`javax.sound.sampled` — a header parse, no audio device needed)
    * payloads; deterministic stub header parse otherwise (including on
    * a corrupt magic-prefixed payload, so the map is total either
    * way). Audio metadata maps onto the shared schema as
    * width = sample frames, height = sample rate, channels = channels. */
  private def decodeOne(m: MediaRow): DecodedMedia = {
    val b = m.payload
    val n = b.length.toLong
    if (isBmp(b) || isPng(b) || isJpeg(b)) {
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(b))
        if (img != null)
          return DecodedMedia(m.media_id, m.kind, n, img.getWidth,
            img.getHeight, img.getRaster.getNumBands)
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    if (isWav(b)) {
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(b))
        val fmt = aff.getFormat
        return DecodedMedia(m.media_id, m.kind, n, aff.getFrameLength,
          fmt.getSampleRate.toInt, fmt.getChannels)
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    val (w, h) = stubDims(b)
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
