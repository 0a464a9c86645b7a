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

case class FrameRow(media_id: Long, frame_no: Long, frame_offset: Long,
                    frame_len: Long)

case class AudioWindow(media_id: Long, window_no: Long, frame_start: Long,
                       n_frames: Long, byte_offset: Long)

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
 * payloads are REAL containers ([[encodeVideo]]) in BOTH mainstream
 * families: canonical RIFF AVI/MJPEG files — hdrl LIST (avih main
 * header, strl with 'vids'/MJPG strh + BITMAPINFOHEADER strf), movi
 * LIST of '00dc' frame chunks each holding a real baseline JPEG, and a
 * trailing idx1 index — and canonical ISO-BMFF MP4 files
 * ([[encodeMp4]]: ftyp + a full moov box tree down to stsd/stts/stsc/
 * stsz/stco sample tables + mdat, big-endian where RIFF is
 * little-endian). The decode/frame-sample stages parse the container
 * structure back from the actual bytes (avih header walk / tkhd+stsd
 * box walk for dims, movi chunk walk / stsz+stco table read for frame
 * offsets). Only the frame PIXEL content is synthetic (the
 * deterministic uniform-gray JPEG — this container ships no camera);
 * every byte offset and length the operators report is read from a
 * real container parse, so every stage stays oracle-checkable
 * byte-for-byte.
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
  private[ops] def stubDims(b: Array[Byte]): (Int, Int) = (
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
  private[ops] def encodeJpeg(src: Array[Byte]): Array[Byte] = {
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

  // ---- minimal canonical AVI/MJPEG writer -------------------------

  /** Nominal frame rate declared in the AVI headers. */
  val AviFps = 25

  /** Fixed byte offset of the first '00dc' frame chunk id: RIFF(12) +
    * hdrl LIST hdr(12) + avih(8+56) + strl LIST hdr(12) + strh(8+56) +
    * strf(8+40) + movi LIST hdr(12). */
  val AviHeaderBytes = 224L

  /** Byte offset of the first frame's DATA (first ckid + 8). */
  val AviFrameDataOffset: Long = AviHeaderBytes + 8

  /** Per-frame JPEG byte length for a (w, h) video — every frame of the
    * uniform-gray MJPEG stream is the identical [[jpegSize]] bytes. */
  def aviFrameLen(w: Int, h: Int): Long = jpegSize(w, h)

  /** Total container size: fixed headers + nFrames word-aligned '00dc'
    * chunks + the idx1 index (8-byte chunk header + 16 bytes/frame). */
  def aviSize(w: Int, h: Int, nFrames: Long): Long = {
    val l = aviFrameLen(w, h)
    AviHeaderBytes + nFrames * (8 + l + (l & 1)) + 8 + 16 * nFrames
  }

  /** Re-encode video-kind payloads as REAL containers (narrow
    * per-partition map, no shuffle): one frame per [[FrameBytes]]-sized
    * window of the source payload, stream dims from [[stubDims]] of the
    * full payload, every frame the real baseline JPEG [[encodeJpeg]]
    * emits for those dims. Every other video (media_id % 6 == 5)
    * becomes an ISO-BMFF MP4 ([[encodeMp4]]), the rest RIFF AVI/MJPEG
    * ([[encodeAvi]]) — so the decode/frame-sample stages exercise BOTH
    * container families (big-endian box tree with stsz/stco sample
    * tables vs little-endian chunk walk), mirroring the image side's
    * JPEG/BMP split. Hand-rolled canonical writers so the byte layout
    * (and so every offset/length the decode side reports) is exact and
    * engine-independent; the matching decode side walks the actual
    * container structure. */
  def encodeVideo(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.grouped(64).flatMap(_.map { m =>
        if (m.kind == "video" && m.payload.nonEmpty)
          m.copy(payload =
            if (m.media_id % 6 == 5) encodeMp4(m.payload)
            else encodeAvi(m.payload))
        else m
      })
    }.toDF()
  }

  /** Canonical minimal AVI: RIFF('AVI ') → LIST hdrl [avih, LIST strl
    * [strh 'vids'/'MJPG', strf BITMAPINFOHEADER biCompression='MJPG']]
    * → LIST movi ['00dc' JPEG]×n → idx1. All sizes little-endian;
    * odd-length frame chunks pad to word alignment per the RIFF spec. */
  private[ops] def encodeAvi(src: Array[Byte]): Array[Byte] = {
    val (w, h) = stubDims(src)
    val nFrames = (src.length + FrameBytes - 1) / FrameBytes
    val frame = encodeJpeg(src)                     // identical every frame
    val l = frame.length
    val pad = l & 1
    val total = aviSize(w, h, nFrames.toLong).toInt
    val out = new Array[Byte](total)
    var p = 0
    def putInt(v: Int): Unit = {
      out(p) = v.toByte; out(p + 1) = (v >>> 8).toByte
      out(p + 2) = (v >>> 16).toByte; out(p + 3) = (v >>> 24).toByte
      p += 4
    }
    def putShort(v: Int): Unit = {
      out(p) = v.toByte; out(p + 1) = (v >>> 8).toByte; p += 2
    }
    def putTag(s: String): Unit =
      s.foreach { c => out(p) = c.toByte; p += 1 }
    putTag("RIFF"); putInt(total - 8); putTag("AVI ")
    putTag("LIST"); putInt(192); putTag("hdrl")
    putTag("avih"); putInt(56)
    putInt(1000000 / AviFps)                        // dwMicroSecPerFrame
    putInt(0); putInt(0)                            // maxBytesPerSec, padding
    putInt(0x10)                                    // dwFlags: HASINDEX
    putInt(nFrames)                                 // dwTotalFrames
    putInt(0); putInt(1)                            // initialFrames, streams
    putInt(l)                                       // suggestedBufferSize
    putInt(w); putInt(h)
    putInt(0); putInt(0); putInt(0); putInt(0)      // dwReserved[4]
    putTag("LIST"); putInt(116); putTag("strl")
    putTag("strh"); putInt(56)
    putTag("vids"); putTag("MJPG")                  // fccType, fccHandler
    putInt(0); putShort(0); putShort(0)             // flags, prio, language
    putInt(0)                                       // initialFrames
    putInt(1); putInt(AviFps)                       // dwScale, dwRate
    putInt(0)                                       // dwStart
    putInt(nFrames)                                 // dwLength (frames)
    putInt(l)                                       // suggestedBufferSize
    putInt(0); putInt(0)                            // quality, sampleSize
    putShort(0); putShort(0); putShort(w); putShort(h) // rcFrame
    putTag("strf"); putInt(40)
    putInt(40); putInt(w); putInt(h)                // biSize, biWidth, biHeight
    putShort(1); putShort(24)                       // biPlanes, biBitCount
    putTag("MJPG")                                  // biCompression
    putInt(l)                                       // biSizeImage
    putInt(0); putInt(0); putInt(0); putInt(0)      // ppm, clrUsed, clrImp
    putTag("LIST"); putInt(4 + nFrames * (8 + l + pad)); putTag("movi")
    var i = 0
    while (i < nFrames) {
      putTag("00dc"); putInt(l)
      System.arraycopy(frame, 0, out, p, l); p += l
      if (pad == 1) { out(p) = 0; p += 1 }
      i += 1
    }
    putTag("idx1"); putInt(16 * nFrames)
    i = 0
    while (i < nFrames) {
      putTag("00dc"); putInt(0x10)                  // AVIIF_KEYFRAME
      putInt(4 + i * (8 + l + pad))                 // offset from 'movi' tag
      putInt(l)
      i += 1
    }
    out
  }

  // ---- minimal canonical ISO-BMFF (MP4) writer --------------------

  /** Movie-header timescale (units/second) declared in mvhd/mdhd. */
  val Mp4Timescale = 1000
  /** Nominal frame rate declared in the stts sample durations. */
  val Mp4Fps = 25

  /** Fixed byte overhead of the MP4 container excluding the per-frame
    * stsz/stco table entries and frame data: ftyp(20) + moov(8) with
    * mvhd(108) + trak(8) with tkhd(92) + mdia(8) with mdhd(32),
    * hdlr(33) + minf(8) with vmhd(20), dinf(36) + stbl(8) with
    * stsd(102), stts(24), stsc(28), stsz fixed part(20), stco fixed
    * part(16) — plus the mdat box header(8). */
  val Mp4FixedBytes = 579L

  /** Byte offset of frame 0's data: the whole box tree, including the
    * 8 bytes/frame of stsz+stco table entries, precedes the mdat
    * payload (no word-alignment padding in ISO-BMFF). */
  def mp4FrameDataOffset(nFrames: Long): Long = Mp4FixedBytes + 8 * nFrames

  /** Total container size: fixed boxes + per-frame (8-byte stsz+stco
    * entries + JPEG data). */
  def mp4Size(w: Int, h: Int, nFrames: Long): Long =
    Mp4FixedBytes + nFrames * (8 + jpegSize(w, h))

  /** Canonical minimal ISO-BMFF MP4: ftyp('isom') → moov [mvhd, trak
    * [tkhd(16.16 dims), mdia [mdhd, hdlr 'vide', minf [vmhd, dinf,
    * stbl [stsd('jpeg' VisualSampleEntry), stts, stsc(1 sample/chunk),
    * stsz(per-sample sizes), stco(per-chunk absolute offsets)]]]]] →
    * mdat [JPEG]×n. All sizes big-endian (ISO-BMFF), vs the AVI
    * writer's little-endian RIFF — the parse-back exercises both byte
    * orders. One sample per chunk so every stco entry is a REAL
    * absolute frame offset the decode side reads, not a closed form. */
  private[ops] def encodeMp4(src: Array[Byte]): Array[Byte] = {
    val (w, h) = stubDims(src)
    val nFrames = (src.length + FrameBytes - 1) / FrameBytes
    val frame = encodeJpeg(src)                     // identical every frame
    val l = frame.length
    val out = new Array[Byte](mp4Size(w, h, nFrames.toLong).toInt)
    var p = 0
    def putInt(v: Int): Unit = {
      out(p) = (v >>> 24).toByte; out(p + 1) = (v >>> 16).toByte
      out(p + 2) = (v >>> 8).toByte; out(p + 3) = v.toByte
      p += 4
    }
    def putShort(v: Int): Unit = {
      out(p) = (v >>> 8).toByte; out(p + 1) = v.toByte; p += 2
    }
    def putTag(s: String): Unit =
      s.foreach { c => out(p) = c.toByte; p += 1 }
    def zero(n: Int): Unit = p += n                 // array pre-zeroed
    def unityMatrix(): Unit = {
      putInt(0x00010000); putInt(0); putInt(0)
      putInt(0); putInt(0x00010000); putInt(0)
      putInt(0); putInt(0); putInt(0x40000000)
    }
    val duration = nFrames * Mp4Timescale / Mp4Fps
    putInt(20); putTag("ftyp")
    putTag("isom"); putInt(0); putTag("isom")       // major, minor, compat
    putInt(551 + 8 * nFrames); putTag("moov")
    putInt(108); putTag("mvhd"); putInt(0)          // version/flags
    putInt(0); putInt(0)                            // ctime, mtime
    putInt(Mp4Timescale); putInt(duration)
    putInt(0x00010000)                              // rate 1.0
    putShort(0x0100)                                // volume 1.0
    zero(10)                                        // reserved
    unityMatrix()
    zero(24)                                        // pre_defined[6]
    putInt(2)                                       // next_track_ID
    putInt(435 + 8 * nFrames); putTag("trak")
    putInt(92); putTag("tkhd"); putInt(3)           // flags: enabled|in-movie
    putInt(0); putInt(0)                            // ctime, mtime
    putInt(1); putInt(0)                            // track_ID, reserved
    putInt(duration)
    zero(8)                                         // reserved
    putShort(0); putShort(0); putShort(0); putShort(0) // layer/alt/vol/res
    unityMatrix()
    putInt(w << 16); putInt(h << 16)                // 16.16 fixed dims
    putInt(335 + 8 * nFrames); putTag("mdia")
    putInt(32); putTag("mdhd"); putInt(0)
    putInt(0); putInt(0)                            // ctime, mtime
    putInt(Mp4Timescale); putInt(duration)
    putShort(0x55c4); putShort(0)                   // language 'und', predef
    putInt(33); putTag("hdlr"); putInt(0)
    putInt(0); putTag("vide")                       // pre_defined, handler
    zero(12)                                        // reserved
    zero(1)                                         // empty name (NUL)
    putInt(262 + 8 * nFrames); putTag("minf")
    putInt(20); putTag("vmhd"); putInt(1)           // flags=1 per spec
    putShort(0); zero(6)                            // graphicsmode, opcolor
    putInt(36); putTag("dinf")
    putInt(28); putTag("dref"); putInt(0); putInt(1)
    putInt(12); putTag("url "); putInt(1)           // self-contained
    putInt(198 + 8 * nFrames); putTag("stbl")
    putInt(102); putTag("stsd"); putInt(0); putInt(1)
    putInt(86); putTag("jpeg")                      // VisualSampleEntry
    zero(6); putShort(1)                            // reserved, data_ref_idx
    putShort(0); putShort(0); zero(12)              // pre_defined/reserved
    putShort(w); putShort(h)
    putInt(0x00480000); putInt(0x00480000)          // 72 dpi
    putInt(0); putShort(1)                          // reserved, frame_count
    zero(32)                                        // compressorname
    putShort(24); putShort(0xffff)                  // depth, pre_defined -1
    putInt(24); putTag("stts"); putInt(0); putInt(1)
    putInt(nFrames); putInt(Mp4Timescale / Mp4Fps)
    putInt(28); putTag("stsc"); putInt(0); putInt(1)
    putInt(1); putInt(1); putInt(1)                 // from chunk 1: 1 sample
    putInt(20 + 4 * nFrames); putTag("stsz")
    putInt(0); putInt(0); putInt(nFrames)           // per-sample sizes follow
    var i = 0
    while (i < nFrames) { putInt(l); i += 1 }
    putInt(16 + 4 * nFrames); putTag("stco")
    putInt(0); putInt(nFrames)
    val d0 = mp4FrameDataOffset(nFrames.toLong).toInt
    i = 0
    while (i < nFrames) { putInt(d0 + i * l); i += 1 }
    putInt(8 + nFrames * l); putTag("mdat")
    i = 0
    while (i < nFrames) {
      System.arraycopy(frame, 0, out, p, l); p += l
      i += 1
    }
    out
  }

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
  private def isAvi(b: Array[Byte]): Boolean =
    b.length > 24 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'A' && b(9) == 'V' && b(10) == 'I' &&
      b(11) == ' '

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def tagAt(b: Array[Byte], off: Int, tag: String): Boolean =
    off + 4 <= b.length && (0 until 4).forall(i => b(off + i) == tag(i).toByte)

  /** Walk the top-level RIFF chunks of an AVI and return the byte
    * offset of the LIST with the given list-type's DATA (just past the
    * 4-byte list type) and its remaining size, or -1 if absent. */
  private def findList(b: Array[Byte], listType: String): (Int, Int) = {
    var p = 12
    while (p + 12 <= b.length) {
      val size = leInt(b, p + 4)
      // corrupt size field (negative, or larger than the whole payload
      // — the advance below would overflow Int and walk negative)
      if (size < 0 || size > b.length) return (-1, 0)
      if (tagAt(b, p, "LIST") && tagAt(b, p + 8, listType))
        return (p + 12, size - 4)
      p += 8 + size + (size & 1)
    }
    (-1, 0)
  }

  /** Parse the avih main header + strf bitmap header out of a real AVI
    * byte stream: (width, height, channels, totalFrames). A header
    * walk, not fixed offsets — chunk sizes are read from the bytes. */
  private[ops] def parseAviHeader(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    val (hdrl, hdrlSize) = findList(b, "hdrl")
    if (hdrl < 0) return None
    var w = 0; var h = 0; var frames = 0; var channels = 3
    var p = hdrl
    val end = math.min(b.length, hdrl + math.max(hdrlSize, 0))
    while (p + 8 <= end) {
      val size = leInt(b, p + 4)
      if (size < 0 || size > b.length) return None   // corrupt size field
      if (tagAt(b, p, "avih") && size >= 40 && p + 8 + size <= b.length) {
        frames = leInt(b, p + 8 + 16)               // dwTotalFrames
        w = leInt(b, p + 8 + 32)                    // dwWidth
        h = leInt(b, p + 8 + 36)                    // dwHeight
        p += 8 + size + (size & 1)
      } else if (tagAt(b, p, "LIST") && tagAt(b, p + 8, "strl")) {
        // descend into the stream list for the strf bitmap header
        var q = p + 12
        val qEnd = math.min(end, p + 8 + size)
        while (q + 8 <= qEnd) {
          val qSize = leInt(b, q + 4)
          if (qSize < 0 || qSize > b.length) return None // corrupt size
          if (tagAt(b, q, "strf") && qSize >= 16 && q + 8 + qSize <= b.length) {
            val bitCount = (b(q + 8 + 14) & 0xff) | ((b(q + 8 + 15) & 0xff) << 8)
            if (bitCount > 0) channels = bitCount / 8
          }
          q += 8 + qSize + (qSize & 1)
        }
        p += 8 + size + (size & 1)
      } else p += 8 + size + (size & 1)
    }
    if (w > 0 && h > 0) Some((w, h, channels, frames)) else None
  }

  /** Walk the movi LIST's chunks and return every video frame's
    * (data offset, data length) in stream order — the real byte
    * positions a player would seek to. */
  private[ops] def walkMoviFrames(b: Array[Byte]): Seq[(Long, Long)] = {
    val (movi, moviSize) = findList(b, "movi")
    if (movi < 0) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var p = movi
    val end = math.min(b.length, movi + math.max(moviSize, 0))
    while (p + 8 <= end) {
      val size = leInt(b, p + 4)
      if (size < 0 || size > b.length) return out.toSeq // corrupt size
      // ##dc (compressed) / ##db (uncompressed) video frame chunks —
      // only frames whose DATA fully fits the byte bound (a truncated
      // container must not report a seek target past its end)
      if (b(p + 2) == 'd' && (b(p + 3) == 'c' || b(p + 3) == 'b') &&
          p + 8 + size <= end)
        out += ((p + 8L, size.toLong))
      p += 8 + size + (size & 1)
    }
    out.toSeq
  }

  // ---- ISO-BMFF (MP4) parse-back ----------------------------------

  private def isMp4(b: Array[Byte]): Boolean =
    b.length > 16 && tagAt(b, 4, "ftyp")

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def beShort(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** Walk sibling boxes in [start, end) and return the first box of
    * the given type as (content offset, content size), or -1. Stops on
    * a corrupt size field (< 8) or a box overrunning the byte bound —
    * a truncated container must degrade, never read out of bounds. */
  private def findBox(b: Array[Byte], start: Int, end: Int,
                      typ: String): (Int, Int) = {
    var p = start
    while (p + 8 <= end) {
      // box sizes are unsigned 32-bit; widen before the bound check so
      // a huge field can't overflow Int and walk a negative offset
      val size = beInt(b, p).toLong & 0xffffffffL
      if (size < 8 || p + size > end) return (-1, 0)
      if (tagAt(b, p + 4, typ)) return (p + 8, size.toInt - 8)
      p += size.toInt
    }
    (-1, 0)
  }

  /** Descend a box path (e.g. moov → trak → ... → stbl) from the top
    * level; (content offset, content size) of the last box, or -1. */
  private def findBoxPath(b: Array[Byte], path: Seq[String]): (Int, Int) = {
    var off = 0
    var size = b.length
    for (t <- path) {
      val r = findBox(b, off, off + size, t)
      if (r._1 < 0) return (-1, 0)
      off = r._1; size = r._2
    }
    (off, size)
  }

  /** Parse (width, height, channels, totalFrames) out of a real MP4
    * box tree: dims from tkhd's 16.16 fixed-point width/height fields,
    * channel count from the stsd sample entry's depth, frame count
    * from the stsz sample-count — a box walk, not fixed offsets. */
  private[ops] def parseMp4Header(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    val (tkhd, tkhdSize) = findBoxPath(b, Seq("moov", "trak", "tkhd"))
    if (tkhd < 0 || tkhdSize < 84) return None
    val w = beInt(b, tkhd + 76) >>> 16
    val h = beInt(b, tkhd + 80) >>> 16
    val (stbl, stblSize) =
      findBoxPath(b, Seq("moov", "trak", "mdia", "minf", "stbl"))
    if (stbl < 0) return None
    var channels = 3
    val (stsd, stsdSize) = findBox(b, stbl, stbl + stblSize, "stsd")
    if (stsd >= 0 && stsdSize >= 8 + 86) {
      val depth = beShort(b, stsd + 8 + 82)         // first sample entry
      if (depth > 0) channels = depth / 8
    }
    val (stsz, stszSize) = findBox(b, stbl, stbl + stblSize, "stsz")
    val frames = if (stsz >= 0 && stszSize >= 12) beInt(b, stsz + 8) else 0
    if (w > 0 && h > 0) Some((w, h, channels, frames)) else None
  }

  /** Read every frame's (data offset, length) from the REAL stsz/stco
    * sample tables — the byte positions a player would seek to. Only
    * frames whose data fully fits the payload are reported (a
    * truncated container must not yield a seek target past its end). */
  private[ops] def walkMp4Frames(b: Array[Byte]): Seq[(Long, Long)] = {
    val (stbl, stblSize) =
      findBoxPath(b, Seq("moov", "trak", "mdia", "minf", "stbl"))
    if (stbl < 0) return Nil
    val (stsz, stszSize) = findBox(b, stbl, stbl + stblSize, "stsz")
    val (stco, stcoSize) = findBox(b, stbl, stbl + stblSize, "stco")
    if (stsz < 0 || stco < 0 || stszSize < 12 || stcoSize < 8) return Nil
    val fixedSize = beInt(b, stsz + 4)              // 0 = per-sample table
    val n = math.min(beInt(b, stsz + 8), beInt(b, stco + 4))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var i = 0
    while (i < n) {
      val len =
        if (fixedSize != 0) fixedSize
        else if (12 + 4 * i + 4 <= stszSize) beInt(b, stsz + 12 + 4 * i)
        else -1
      val off =
        if (8 + 4 * i + 4 <= stcoSize) beInt(b, stco + 8 + 4 * i) else -1
      if (len >= 0 && off >= 0 && off.toLong + len <= b.length)
        out += ((off.toLong, len.toLong))
      i += 1
    }
    out.toSeq
  }

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
    if (isAvi(b)) {
      parseAviHeader(b) match {
        case Some((w, h, c, _)) =>
          return DecodedMedia(m.media_id, m.kind, n, w, h, c)
        case None => ()
      }
    }
    if (isMp4(b)) {
      parseMp4Header(b) match {
        case Some((w, h, c, _)) =>
          return DecodedMedia(m.media_id, m.kind, n, w, h, c)
        case None => ()
      }
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

  /** Frame sampling for video-kind payloads: walk the REAL container
    * structure — the AVI movi chunk list ([[walkMoviFrames]]) or the
    * MP4 stsz/stco sample tables ([[walkMp4Frames]]) — and emit every
    * [[FrameStride]]-th frame's (frame_no, data offset, data length):
    * the byte positions a player would seek to, read from the
    * container bytes, not a closed form. Batched narrow per-partition
    * map, no shuffle; an unrecognized video payload contributes no
    * frames (total map). */
  def frameSample(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.grouped(64).flatMap(_.flatMap { m =>
        val frames =
          if (m.kind != "video") Nil
          else if (isAvi(m.payload)) walkMoviFrames(m.payload)
          else if (isMp4(m.payload)) walkMp4Frames(m.payload)
          else Nil
        frames.zipWithIndex.collect {
          case ((off, len), i) if i % FrameStride == 0 =>
            FrameRow(m.media_id, i.toLong, off, len)
        }
      })
    }.toDF()
  }

  /** Window length / hop, in sample frames, for [[audioWindows]]. */
  val AudioWindowFrames = 1024
  val AudioStrideFrames = 512

  /** Walk a RIFF file's top-level chunks (non-LIST form, as in WAVE)
    * and return the first chunk with the given id as (data offset,
    * declared data size), or -1. A declared size past the byte bound is
    * NOT treated as corrupt — that is the truncated-file case, and the
    * caller clamps to the payload length; only a negative size field
    * aborts the walk. Long cursor arithmetic so an absurd size field
    * ends the walk instead of overflowing. */
  private def findRiffChunk(b: Array[Byte], id: String): (Int, Int) = {
    var p = 12L
    while (p + 8 <= b.length) {
      val pi = p.toInt
      val size = leInt(b, pi + 4)
      if (size < 0) return (-1, 0) // corrupt size field
      if (tagAt(b, pi, id)) return (pi + 8, size)
      p += 8L + size + (size & 1)
    }
    (-1, 0)
  }

  /** Windowed audio sampling for audio-kind payloads — the audio
    * counterpart of video [[frameSample]]: walk the REAL RIFF chunk
    * list to the fmt (channel count, block align) and data chunks,
    * then emit overlapping [[AudioWindowFrames]]-frame windows every
    * [[AudioStrideFrames]] frames with their REAL byte offsets into
    * the data chunk — the seek positions a streaming feature extractor
    * (VAD, fbank, wav2vec-style encoder) would use. Frame counts are
    * derived from the parsed data-chunk size and block align, clamped
    * to the payload's byte bound (a truncated file yields fewer
    * windows, never an out-of-range seek). Batched narrow
    * per-partition map, no shuffle; a non-WAV audio payload
    * contributes no windows (total map). */
  def audioWindows(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.grouped(64).flatMap(_.flatMap { m =>
        if (m.kind == "audio" && isWav(m.payload)) {
          val b = m.payload
          val (fmt, fmtSize) = findRiffChunk(b, "fmt ")
          val (data, dataSize) = findRiffChunk(b, "data")
          if (fmt < 0 || data < 0 || fmtSize < 16 || fmt + 16 > b.length) Nil
          else {
            val blockAlign = (b(fmt + 12) & 0xff) | ((b(fmt + 13) & 0xff) << 8)
            val safeData = math.min(dataSize.toLong, (b.length - data).toLong)
            if (blockAlign <= 0) Nil
            else {
              val nFrames = safeData / blockAlign
              (0L until nFrames by AudioStrideFrames.toLong)
                .zipWithIndex.map { case (st, w) =>
                  AudioWindow(m.media_id, w.toLong, st,
                    math.min(AudioWindowFrames.toLong, nFrames - st),
                    data + st * blockAlign)
                }
            }
          }
        } else Nil
      })
    }.toDF()
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
