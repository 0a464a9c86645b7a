package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Engine-independent container conformance for the AVI and MP4 hand
  * codecs — the two families where BOTH the writer and the parser are
  * hand-rolled, so a symmetric bug could cancel and every end-to-end
  * oracle would still pass. (WAV and the image formats are already
  * cross-library pairs in the main path: hand-written WAV parsed by
  * `javax.sound.sampled`, hand-written JPEG parsed by `javax.imageio`.)
  *
  * Two symmetry breakers per family:
  *  1. FOREIGN FIXTURES: container bytes assembled HERE, byte by byte
  *     from the published layout (RIFF/AVI: the 'avih'/'strf' header
  *     offsets; ISO-BMFF: box-size walk, tkhd 16.16 dims, stsz/stco
  *     sample tables), with structural choices the writer never makes —
  *     a JUNK chunk, a 'free' box, missing idx1, per-frame sizes that
  *     differ, 8-bit depth. The hand parsers must read them correctly.
  *  2. GOLDEN BYTE PINS + MUTATION KILLS on the writers: header fields
  *     asserted at spec-derived absolute offsets computed independently
  *     in this file, and a 1-byte header mutation must CHANGE what the
  *     parser reports — proving the parser reads the header bytes, not
  *     a closed form shared with the writer.
  */
class ContainerConformanceSpec extends AnyFunSuite with graft.SparkSpec {

  // ---- 0. library-authored WAV through the hand RIFF walk ------------
  // The main path already cross-checks the other direction (hand-written
  // WAV parsed by javax.sound); this closes the loop: a WAV authored by
  // javax.sound.sampled itself must walk correctly through the hand
  // chunk parser that audioWindows uses, with the byte offsets pointing
  // at the exact PCM samples the library wrote.
  test("javax.sound-authored WAV: hand chunk walk finds the real PCM offsets") {
    val s = spark; import s.implicits._
    val nFrames = 1500 // 16-bit mono -> blockAlign 2
    val pcm = Array.tabulate(nFrames * 2)(i => ((i * 31) & 0xff).toByte)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    val media = Seq((1L, "audio", wav)).toDF("media_id", "kind", "payload")
    val wins = Multimodal.audioWindows(spark, media)
      .as[AudioWindow].collect().sortBy(_.window_no)
    // stride 512 over 1500 frames -> windows at 0, 512, 1024
    assert(wins.map(_.frame_start).toSeq === Seq(0L, 512L, 1024L))
    assert(wins.map(_.n_frames).toSeq === Seq(1024L, 988L, 476L))
    // the byte offsets must point at the LIBRARY's PCM bytes: window 1
    // starts at sample frame 512 = pcm byte 1024
    val w1 = wins(1)
    val got = wav.slice(w1.byte_offset.toInt, w1.byte_offset.toInt + 8)
    assert(got.toSeq === pcm.slice(1024, 1032).toSeq,
      "hand-parsed data-chunk offset must land on the exact PCM bytes")
  }

  // ---- little/big-endian builders, independent of the codecs' own ----
  private final class Buf {
    val b = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def le32(v: Int): Unit = { b += v.toByte; b += (v >>> 8).toByte
      b += (v >>> 16).toByte; b += (v >>> 24).toByte }
    def be32(v: Int): Unit = { b += (v >>> 24).toByte; b += (v >>> 16).toByte
      b += (v >>> 8).toByte; b += v.toByte }
    def le16(v: Int): Unit = { b += v.toByte; b += (v >>> 8).toByte }
    def be16(v: Int): Unit = { b += (v >>> 8).toByte; b += v.toByte }
    def tag(s: String): Unit = s.foreach(c => b += c.toByte)
    def bytes(n: Int, v: Byte = 0): Unit = (0 until n).foreach(_ => b += v)
    def raw(a: Array[Byte]): Unit = b ++= a
    def out: Array[Byte] = b.toArray
  }

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def tagAt(b: Array[Byte], off: Int, t: String): Boolean =
    (0 until 4).forall(i => b(off + i) == t(i).toByte)

  // ---- 1. foreign AVI fixture ---------------------------------------
  // RIFF('AVI ') / JUNK / LIST hdrl [avih, LIST strl [strh, strf 8-bit]]
  // / LIST movi ['00dc' 5 B (odd -> pad), '00db' 6 B]; NO idx1.
  private def foreignAvi(): Array[Byte] = {
    val f = new Buf
    f.tag("RIFF"); f.le32(256); f.tag("AVI ")
    f.tag("JUNK"); f.le32(4); f.bytes(4)            // writer never emits JUNK
    f.tag("LIST"); f.le32(192); f.tag("hdrl")
    f.tag("avih"); f.le32(56)
    f.le32(40000); f.le32(0); f.le32(0); f.le32(0)  // usec/frame, max, pad, flags
    f.le32(2)                                       // dwTotalFrames = 2
    f.le32(0); f.le32(1); f.le32(6)                 // initial, streams, sugg
    f.le32(9); f.le32(7)                            // dwWidth=9, dwHeight=7
    f.bytes(16)                                     // dwReserved[4]
    f.tag("LIST"); f.le32(116); f.tag("strl")
    f.tag("strh"); f.le32(56)
    f.tag("vids"); f.tag("MJPG"); f.bytes(48)       // rest zero is legal
    f.tag("strf"); f.le32(40)
    f.le32(40); f.le32(9); f.le32(7)                // biSize, biWidth, biHeight
    f.le16(1); f.le16(8)                            // biPlanes, biBitCount=8
    f.tag("MJPG"); f.le32(6); f.bytes(16)
    f.tag("LIST"); f.le32(32); f.tag("movi")
    f.tag("00dc"); f.le32(5); f.raw("ABCDE".getBytes); f.bytes(1) // word pad
    f.tag("00db"); f.le32(6); f.raw("FGHIJK".getBytes)
    val out = f.out
    assert(out.length === 264, "fixture arithmetic")
    out
  }

  test("foreign AVI fixture: hand parser reads planted headers and frames") {
    val avi = foreignAvi()
    assert(Multimodal.parseAviHeader(avi) === Some((9, 7, 1, 2)))
    // JUNK(12) shifts everything: hdrl LIST at 24, movi LIST at 224,
    // frame data at 244 (len 5) and 258 (len 6) — offsets a real player
    // would seek to
    assert(Multimodal.walkMoviFrames(avi) === Seq((244L, 5L), (258L, 6L)))
    assert(new String(avi.slice(244, 249)) === "ABCDE")
  }

  // ---- 2. foreign MP4 fixture ---------------------------------------
  // ftyp(16) / free(12) / moov [mvhd, trak [tkhd 11x5, mdia [mdhd, hdlr,
  // minf [vmhd, dinf, stbl [stsd depth 8, stts, stsc, stsz {7,9},
  // stco]]]]] / mdat. Two frames of DIFFERENT sizes (the writer's are
  // always uniform).
  private def foreignMp4(): Array[Byte] = {
    val f = new Buf
    def unity(): Unit = { f.be32(0x00010000); f.be32(0); f.be32(0)
      f.be32(0); f.be32(0x00010000); f.be32(0)
      f.be32(0); f.be32(0); f.be32(0x40000000) }
    f.be32(16); f.tag("ftyp"); f.tag("isom"); f.be32(0)
    f.be32(12); f.tag("free"); f.bytes(4)           // writer never emits free
    f.be32(567); f.tag("moov")
    f.be32(108); f.tag("mvhd"); f.be32(0)
    f.be32(0); f.be32(0); f.be32(1000); f.be32(80)
    f.be32(0x00010000); f.be16(0x0100); f.bytes(10)
    unity(); f.bytes(24); f.be32(2)
    f.be32(451); f.tag("trak")
    f.be32(92); f.tag("tkhd"); f.be32(3)
    f.be32(0); f.be32(0); f.be32(1); f.be32(0); f.be32(80)
    f.bytes(8); f.be16(0); f.be16(0); f.be16(0); f.be16(0)
    unity()
    f.be32(11 << 16); f.be32(5 << 16)               // width 11, height 5
    f.be32(351); f.tag("mdia")
    f.be32(32); f.tag("mdhd"); f.be32(0)
    f.be32(0); f.be32(0); f.be32(1000); f.be32(80)
    f.be16(0x55c4); f.be16(0)
    f.be32(33); f.tag("hdlr"); f.be32(0)
    f.be32(0); f.tag("vide"); f.bytes(12); f.bytes(1)
    f.be32(278); f.tag("minf")
    f.be32(20); f.tag("vmhd"); f.be32(1); f.be16(0); f.bytes(6)
    f.be32(36); f.tag("dinf")
    f.be32(28); f.tag("dref"); f.be32(0); f.be32(1)
    f.be32(12); f.tag("url "); f.be32(1)
    f.be32(214); f.tag("stbl")
    f.be32(102); f.tag("stsd"); f.be32(0); f.be32(1)
    f.be32(86); f.tag("jpeg")
    f.bytes(6); f.be16(1)
    f.be16(0); f.be16(0); f.bytes(12)
    f.be16(11); f.be16(5)
    f.be32(0x00480000); f.be32(0x00480000)
    f.be32(0); f.be16(1); f.bytes(32)
    f.be16(8); f.be16(0xffff)                       // depth 8 -> 1 channel
    f.be32(24); f.tag("stts"); f.be32(0); f.be32(1); f.be32(2); f.be32(40)
    f.be32(28); f.tag("stsc"); f.be32(0); f.be32(1)
    f.be32(1); f.be32(1); f.be32(1)
    f.be32(28); f.tag("stsz"); f.be32(0); f.be32(0); f.be32(2)
    f.be32(7); f.be32(9)                            // per-sample sizes differ
    f.be32(24); f.tag("stco"); f.be32(0); f.be32(2)
    f.be32(603); f.be32(610)                        // absolute frame offsets
    f.be32(24); f.tag("mdat")
    f.raw("0123456".getBytes); f.raw("789abcdef".getBytes)
    val out = f.out
    assert(out.length === 619, "fixture arithmetic")
    out
  }

  test("foreign MP4 fixture: hand parser reads planted boxes and sample tables") {
    val mp4 = foreignMp4()
    assert(Multimodal.parseMp4Header(mp4) === Some((11, 5, 1, 2)))
    assert(Multimodal.walkMp4Frames(mp4) === Seq((603L, 7L), (610L, 9L)))
    assert(new String(mp4.slice(603, 610)) === "0123456")
  }

  // ---- 3. golden byte pins + mutation kills on the writers ----------

  private val payload = Array.tabulate(600)(i => (i * 7).toByte)

  test("AVI writer golden pins at spec offsets; header mutation changes the parse") {
    val out = Multimodal.encodeAvi(payload)
    val (w, h) = Multimodal.stubDims(payload)
    val n = (payload.length + Multimodal.FrameBytes - 1) / Multimodal.FrameBytes
    // offsets computed here from the RIFF/AVI layout, not from the writer:
    // RIFF(12) + LIST hdr(12) + 'avih'+size(8) = avih data at 32;
    // dwTotalFrames at 32+16, dwWidth at 32+32, dwHeight at 32+36;
    // strf data at 12+12+8+56 + 12 + 8+56 + 8 = 172, biCompression +16.
    assert(tagAt(out, 0, "RIFF") && tagAt(out, 8, "AVI "))
    assert(leInt(out, 4) === out.length - 8, "RIFF size = file length - 8")
    assert(leInt(out, 48) === n)
    assert(leInt(out, 64) === w && leInt(out, 68) === h)
    assert(tagAt(out, 188, "MJPG"), "strf biCompression")
    assert(tagAt(out, Multimodal.AviHeaderBytes.toInt, "00dc"))
    assert(out.length === Multimodal.aviSize(w, h, n.toLong))
    // parser round-trip of the golden bytes
    assert(Multimodal.parseAviHeader(out) === Some((w, h, 3, n)))
    // 1-byte width mutation MUST change the parsed width (the parser
    // reads the header, it does not share a closed form with the writer)
    val mut = out.clone(); mut(64) = (mut(64) ^ 0x01).toByte
    assert(Multimodal.parseAviHeader(mut) !== Some((w, h, 3, n)))
  }

  test("MP4 writer golden pins at spec offsets; header mutation changes the parse") {
    val out = Multimodal.encodeMp4(payload)
    val (w, h) = Multimodal.stubDims(payload)
    val n = (payload.length + Multimodal.FrameBytes - 1) / Multimodal.FrameBytes
    val l = Multimodal.jpegSize(w, h).toInt
    // offsets computed here from the ISO-BMFF layout: ftyp(20), moov hdr
    // (8) at 20, mvhd(108) at 28, trak hdr(8) at 136, tkhd(92) at 144 ->
    // tkhd 16.16 width at 144+8+76 = 228, height at 232.
    assert(beInt(out, 0) === 20 && tagAt(out, 4, "ftyp"))
    assert(tagAt(out, 24, "moov"))
    val moovSize = beInt(out, 20)
    assert(tagAt(out, 20 + moovSize + 4, "mdat"))
    assert(20 + moovSize + beInt(out, 20 + moovSize) === out.length,
      "ftyp + moov + mdat exactly fill the file")
    assert((beInt(out, 228) >>> 16) === w && (beInt(out, 232) >>> 16) === h)
    assert(out.length === Multimodal.mp4Size(w, h, n.toLong))
    assert(Multimodal.parseMp4Header(out) === Some((w, h, 3, n)))
    assert(Multimodal.walkMp4Frames(out) ===
      (0 until n).map(i =>
        (Multimodal.mp4FrameDataOffset(n.toLong) + i.toLong * l, l.toLong)))
    // flip one bit of the tkhd width: parsed dims must change
    val mut = out.clone(); mut(229) = (mut(229) ^ 0x01).toByte
    assert(Multimodal.parseMp4Header(mut) !== Some((w, h, 3, n)))
  }
}
