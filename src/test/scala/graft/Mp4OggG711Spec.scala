package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Round-8 container walks + G.711: hand-assembled ISO-BMFF box trees
  * and CRC-correct Ogg page sequences (the page builder carries its
  * OWN independently-written CRC — the spec and the decoder agreeing
  * is itself a check), plus ITU-T G.711 expansion against the known
  * anchor codewords.
  */
class Mp4OggG711Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // ---- ISO-BMFF box builder ----

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(8L + body.length) ++ typ.getBytes("US-ASCII") ++ body
  }

  /** mvhd/mdhd v0: fullbox(4) + times(8) + timescale + duration + tail. */
  private def headerBox(typ: String, timescale: Long, duration: Long) =
    box(typ, new Array[Byte](12), be32(timescale), be32(duration),
      new Array[Byte](8))

  private def tkhd(width: Int, height: Int) =
    // v0: fullbox(4)+times(8)+id(4)+res(4)+dur(4)+res(8)+layer/alt/
    // vol/res(8)+matrix(36) = 76 bytes before width/height (16.16)
    box("tkhd", new Array[Byte](76), be32(width.toLong << 16),
      be32(height.toLong << 16))

  private def hdlr(handler: String) =
    box("hdlr", new Array[Byte](8), handler.getBytes("US-ASCII"),
      new Array[Byte](12))

  /** stsd with one AudioSampleEntry: channels at entry+24, 16.16 rate
    * at entry+32 (ISO 14496-12 §12.2.3). */
  private def stsdAudio(channels: Int, rate: Int) = {
    val entry = be32(36L) ++ "mp4a".getBytes("US-ASCII") ++
      new Array[Byte](8) ++ new Array[Byte](8) ++
      be16(channels) ++ be16(16) ++ new Array[Byte](4) ++
      be32(rate.toLong << 16)
    box("stsd", new Array[Byte](4), be32(1L), entry)
  }

  private def videoTrak(w: Int, h: Int) =
    box("trak", tkhd(w, h),
      box("mdia", headerBox("mdhd", 30000L, 150000L), hdlr("vide")))

  private def audioTrak(channels: Int, rate: Int, nSamples: Long) =
    box("trak", tkhd(0, 0),
      box("mdia", headerBox("mdhd", rate.toLong, nSamples), hdlr("soun"),
        box("minf", box("stbl", stsdAudio(channels, rate)))))

  private def mp4File(): Array[Byte] =
    box("ftyp", "isom".getBytes("US-ASCII"), new Array[Byte](8)) ++
      box("moov", headerBox("mvhd", 1000L, 5500L),
        videoTrak(640, 360), audioTrak(2, 48000, 96000L)) ++
      box("mdat", new Array[Byte](64))

  test("mp4 walk: exact duration, dimensions, audio shape from the box tree") {
    val info = Mp4Codec.parse(mp4File()).getOrElse(fail("parse failed"))
    assert(info.nTracks == 2L)
    assert(info.durationMs == 5500L) // 5500 units at timescale 1000
    assert(info.width == 640L && info.height == 360L)
    assert(info.channels == 2L && info.sampleRate == 48000L)
    assert(info.nSamples == 96000L) // mdhd duration at timescale=rate
  }

  test("mp4 walk: 64-bit largesize boxes and v1 headers parse") {
    // moov with a largesize mvhd v1 (64-bit duration)
    val mvhdV1 = {
      val payload = Array[Byte](1, 0, 0, 0) ++ new Array[Byte](16) ++
        be32(90000L) ++ be32(0L) ++ be32(450000L) ++ new Array[Byte](8)
      payload
    }
    val inner = box("mvhd", mvhdV1)
    // wrap moov as a largesize box: size=1, type, 64-bit size
    val moovBody = inner
    val moov = be32(1L) ++ "moov".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0) ++ be32(16L + moovBody.length) ++ moovBody
    val f = box("ftyp", "isom".getBytes("US-ASCII")) ++ moov
    val info = Mp4Codec.parse(f).getOrElse(fail("parse failed"))
    assert(info.durationMs == 5000L) // 450000 / 90000 s
    assert(info.nTracks == 0L)
  }

  test("mp4 walk rejects hostile payloads instead of looping or throwing") {
    val good = mp4File()
    // no ftyp lead-in: random bytes that happen to shape like boxes
    assert(Mp4Codec.parse(good.drop(24)).isEmpty)
    // truncated mid-moov: the moov box overruns the buffer
    assert(Mp4Codec.parse(good.take(good.length / 2)).isEmpty)
    // size field that wraps negative
    val neg = good.clone()
    neg(0) = 0xff.toByte; neg(1) = 0xff.toByte
    neg(2) = 0xff.toByte; neg(3) = 0xf8.toByte
    assert(Mp4Codec.parse(neg).isEmpty)
    assert(Mp4Codec.parse(Array[Byte](1, 2, 3)).isEmpty)
    assert(Mp4Codec.parse(Array.empty[Byte]).isEmpty)
  }

  // ---- Ogg page builder (independent CRC implementation) ----

  /** Spec CRC-32, written independently of OggCodec's table form:
    * bitwise MSB-first, poly 0x04c11db7, zero init/xorout. */
  private def oggCrc(b: Array[Byte]): Int = {
    var crc = 0
    b.foreach { byte =>
      crc ^= (byte & 0xff) << 24
      var j = 0
      while (j < 8) {
        crc = if ((crc & 0x80000000) != 0) (crc << 1) ^ 0x04c11db7
        else crc << 1
        j += 1
      }
    }
    crc
  }

  private def le(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray

  private def oggPage(headerType: Int, granule: Long, serial: Long,
      seq: Long, body: Array[Byte], corruptCrc: Boolean = false): Array[Byte] = {
    val segs =
      if (body.isEmpty) Array[Byte](0)
      else {
        val full = body.length / 255
        val rem = body.length % 255
        (Array.fill(full)(255.toByte) :+ rem.toByte)
      }
    val header = "OggS".getBytes("US-ASCII") ++ Array[Byte](0,
      headerType.toByte) ++ le(granule, 8) ++ le(serial, 4) ++
      le(seq, 4) ++ le(0L, 4) ++ Array(segs.length.toByte) ++ segs
    val page = header ++ body
    val crc = oggCrc(page)
    val out = page.clone()
    val fixed = if (corruptCrc) crc ^ 0x1 else crc
    System.arraycopy(le(fixed.toLong & 0xffffffffL, 4), 0, out, 22, 4)
    out
  }

  private def opusHead(channels: Int, preSkip: Int): Array[Byte] =
    "OpusHead".getBytes("US-ASCII") ++ Array[Byte](1, channels.toByte) ++
      le(preSkip.toLong, 2) ++ le(48000L, 4) ++ le(0L, 2) ++ Array[Byte](0)

  private def opusFile(channels: Int, preSkip: Int,
      granules: Seq[Long]): Array[Byte] = {
    val bos = oggPage(0x02, -1L, 777L, 0L, opusHead(channels, preSkip))
    val tags = oggPage(0x00, -1L, 777L, 1L,
      "OpusTags".getBytes("US-ASCII") ++ le(0L, 4) ++ le(0L, 4))
    val audio = granules.zipWithIndex.map { case (g, i) =>
      oggPage(if (i == granules.length - 1) 0x04 else 0x00, g, 777L,
        2L + i, Array.fill(40)((i + 1).toByte))
    }
    (Seq(bos, tags) ++ audio).flatten.toArray
  }

  test("ogg/opus walk: channels from OpusHead, samples from the last granule minus pre-skip") {
    val f = opusFile(channels = 2, preSkip = 312,
      granules = Seq(960L, 1920L, 2880L))
    assert(OggCodec.parse(f).contains((2L, 48000L, 2880L - 312L)))
    // mono, no pre-skip
    val m = opusFile(1, 0, Seq(960L))
    assert(OggCodec.parse(m).contains((1L, 48000L, 960L)))
  }

  test("ogg/vorbis walk: id header channels + rate, samples = last granule") {
    val id = Array[Byte](1) ++ "vorbis".getBytes("US-ASCII") ++
      le(0L, 4) ++ Array[Byte](2) ++ le(44100L, 4) ++
      new Array[Byte](12) ++ Array[Byte](0x66, 1)
    val bos = oggPage(0x02, -1L, 42L, 0L, id)
    val last = oggPage(0x04, 22050L, 42L, 1L, Array.fill(10)(7.toByte))
    assert(OggCodec.parse(bos ++ last).contains((2L, 44100L, 22050L)))
  }

  test("ogg walk: CRC corruption ends the walk; multiplexed serials are ignored") {
    val goodTail = oggPage(0x00, 5760L, 777L, 2L, Array.fill(10)(1.toByte))
    val bos = oggPage(0x02, -1L, 777L, 0L, opusHead(2, 0))
    val mid = oggPage(0x00, 1920L, 777L, 1L, Array.fill(10)(2.toByte))
    val corrupt = oggPage(0x00, 9999L, 777L, 3L,
      Array.fill(10)(3.toByte), corruptCrc = true)
    // corrupted page ends the walk: granule stops at the last good page
    assert(OggCodec.parse(bos ++ mid ++ corrupt ++ goodTail)
      .contains((2L, 48000L, 1920L)))
    // a second bitstream's pages don't contribute granules
    val other = oggPage(0x00, 777777L, 888L, 0L, Array.fill(10)(4.toByte))
    assert(OggCodec.parse(bos ++ mid ++ other)
      .contains((2L, 48000L, 1920L)))
    // BOS page missing: not a stream start
    assert(OggCodec.parse(mid ++ goodTail).isEmpty)
    assert(OggCodec.parse(Array[Byte](1, 2, 3)).isEmpty)
  }

  // ---- G.711 ----

  test("g711 anchors: spec codewords expand to the known extreme values") {
    // µ-law: 0xFF/0x7F are ±0; 0x00/0x80 are the ±32124 extremes
    assert(Multimodal.ulawToLinear(0xff.toByte) == 0)
    assert(Multimodal.ulawToLinear(0x7f.toByte) == 0)
    assert(Multimodal.ulawToLinear(0x00.toByte) == -32124)
    assert(Multimodal.ulawToLinear(0x80.toByte) == 32124)
    // A-law: 0x55/0xD5 are ∓8 (the smallest magnitudes); 0x2A/0xAA ±32256
    assert(Multimodal.alawToLinear(0x55.toByte) == -8)
    assert(Multimodal.alawToLinear(0xd5.toByte) == 8)
    assert(Multimodal.alawToLinear(0x2a.toByte) == -32256)
    assert(Multimodal.alawToLinear(0xaa.toByte) == 32256)
    // G.711 decode must be an odd-ish symmetric map: u-law mirror bit
    (0 to 127).foreach { i =>
      assert(Multimodal.ulawToLinear(i.toByte) ==
        -Multimodal.ulawToLinear((i | 0x80).toByte))
      assert(Multimodal.alawToLinear(i.toByte) ==
        -Multimodal.alawToLinear((i | 0x80).toByte))
    }
  }

  /** Minimal WAV container around raw codec bytes. */
  private def wav(fmtTag: Int, channels: Int, rate: Int, bits: Int,
      data: Array[Byte]): Array[Byte] = {
    val blockAlign = math.max(1, channels * bits / 8)
    val fmt = le(fmtTag.toLong, 2) ++ le(channels.toLong, 2) ++
      le(rate.toLong, 4) ++ le(rate.toLong * blockAlign, 4) ++
      le(blockAlign.toLong, 2) ++ le(bits.toLong, 2)
    "RIFF".getBytes("US-ASCII") ++ le(36L + data.length, 4) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le(16L, 4) ++ fmt ++
      "data".getBytes("US-ASCII") ++ le(data.length.toLong, 4) ++ data
  }

  test("g711 WAV: µ-law and A-law payloads really decode with exact stats") {
    import spark.implicits._
    // µ-law anchors: |values| = 0, 32124, 32124, 0 -> mean 16062
    val mu = wav(7, 1, 8000, 8,
      Array(0xff.toByte, 0x00.toByte, 0x80.toByte, 0x7f.toByte))
    // A-law anchors: |values| = 8, 8, 32256, 32256 -> mean 16132
    val al = wav(6, 2, 16000, 8,
      Array(0x55.toByte, 0xd5.toByte, 0x2a.toByte, 0xaa.toByte))
    val rows = Multimodal.decodeMedia(Seq(
      Multimodal.MediaRow(1L, "wav", mu),
      Multimodal.MediaRow(2L, "wav", al)).toDS()).collect()
      .map(d => d.media_id -> d).toMap
    assert(rows(1L).decoded && rows(1L).channels == 1L &&
      rows(1L).sample_rate == 8000L && rows(1L).n_samples == 4L &&
      rows(1L).mean_value == 16062L)
    assert(rows(2L).decoded && rows(2L).channels == 2L &&
      rows(2L).sample_rate == 16000L && rows(2L).n_samples == 2L &&
      rows(2L).mean_value == 16132L)
  }

  test("decodeMedia mp4/ogg: real container metadata, content honestly stubbed") {
    import spark.implicits._
    val rows = Multimodal.decodeMedia(Seq(
      Multimodal.MediaRow(1L, "mp4", mp4File()),
      Multimodal.MediaRow(2L, "ogg", opusFile(2, 312, Seq(960L, 4800L))),
      Multimodal.MediaRow(3L, "mp4", Array[Byte](1, 2, 3, 4)),
      Multimodal.MediaRow(4L, "ogg", Array[Byte](1, 2, 3, 4))).toDS())
      .collect().map(d => d.media_id -> d).toMap
    val v = rows(1L)
    assert(!v.decoded && v.width == 640L && v.height == 360L &&
      v.channels == 2L && v.sample_rate == 48000L && v.n_samples == 96000L)
    val o = rows(2L)
    assert(!o.decoded && o.channels == 2L && o.sample_rate == 48000L &&
      o.n_samples == 4800L - 312L)
    assert(!rows(3L).decoded && rows(3L).width == 0L)
    assert(!rows(4L).decoded && rows(4L).sample_rate == 0L)
  }
}
