package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Round-trip and hostile-input tests for the round-8 audio codecs:
  * IMA ADPCM (full real decode — the in-test encoder advances its
  * state through the decoder update, so the expected reconstruction
  * statistics are EXACT, not approximate) and the MP3 frame-header
  * walk (exact stream metadata from hand-assembled frame sequences).
  */
class AdpcmMp3Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // ---- in-test IMA ADPCM encoder (WAV container, format tag 0x11) ----

  /** Encode `samples` (interleaved if stereo) into a complete WAV and
    * return (wavBytes, reconstructed samples as the decoder will
    * produce them, in decode order: per block, headers first then
    * nibble words). */
  private def encodeAdpcmWav(samples: Array[Short], channels: Int,
      rate: Int, samplesPerBlock: Int): (Array[Byte], Array[Int]) = {
    require((samplesPerBlock - 1) % 8 == 0, "nibbles must pack whole words")
    val bytesPerChanPerBlock = (samplesPerBlock - 1) / 2
    val blockAlign = 4 * channels + bytesPerChanPerBlock * channels
    val nPerChannel = samples.length / channels
    val nBlocks = (nPerChannel + samplesPerBlock - 1) / samplesPerBlock
    val data = new java.io.ByteArrayOutputStream()
    val recon = scala.collection.mutable.ArrayBuffer[Int]()
    val states = Array.fill(channels)(new AdpcmCodec.State(0, 0))
    for (blk <- 0 until nBlocks) {
      val base = blk * samplesPerBlock
      // per-channel 4-byte headers; sample 0 of the block rides here
      for (c <- 0 until channels) {
        val s0: Int =
          if (base < nPerChannel) samples((base * channels) + c).toInt else 0
        states(c).pred = s0
        data.write(s0 & 0xff); data.write((s0 >> 8) & 0xff)
        data.write(states(c).index); data.write(0)
        recon += s0
      }
      // nibble words: 4 bytes per channel, channel-interleaved
      val nibbles = Array.fill(channels)(
        scala.collection.mutable.ArrayBuffer[Int]())
      for (i <- 1 until samplesPerBlock; c <- 0 until channels) {
        val idx = base + i
        val s: Int =
          if (idx < nPerChannel) samples(idx * channels + c).toInt else 0
        nibbles(c) += AdpcmCodec.encodeNibble(states(c), s)
      }
      for (c <- 0 until channels) {
        var i = 0
        while (i < nibbles(c).length) {
          data.write((nibbles(c)(i) & 0xf) | ((nibbles(c)(i + 1) & 0xf) << 4))
          i += 2
        }
      }
    }
    // Replay the produced stream through the decoder primitives to get
    // the exact reconstruction in decode order (simpler than tracking
    // interleave order inside the encoder loop above).
    val bytes = data.toByteArray
    recon.clear()
    val rs = Array.fill(channels)(new AdpcmCodec.State(0, 0))
    var off = 0
    while (off + 4 * channels <= bytes.length) {
      val blockEnd = math.min(off + blockAlign, bytes.length)
      for (c <- 0 until channels) {
        val h = off + 4 * c
        rs(c).pred = ((bytes(h) & 0xff) | ((bytes(h + 1) & 0xff) << 8)).toShort.toInt
        rs(c).index = bytes(h + 2) & 0xff
        recon += rs(c).pred
      }
      var p = off + 4 * channels
      while (p + 4 * channels <= blockEnd) {
        for (c <- 0 until channels; i <- 0 until 4) {
          val byte = bytes(p + 4 * c + i) & 0xff
          recon += AdpcmCodec.decodeNibble(rs(c), byte & 0xf)
          recon += AdpcmCodec.decodeNibble(rs(c), byte >> 4)
        }
        p += 4 * channels
      }
      off += blockAlign
    }

    val buf = java.nio.ByteBuffer
      .allocate(44 + 2 + bytes.length + (bytes.length & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(38 + bytes.length).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(18)
    buf.putShort(0x11).putShort(channels.toShort).putInt(rate)
      .putInt(rate * blockAlign / samplesPerBlock) // nominal byte rate
      .putShort(blockAlign.toShort).putShort(4) // bits per sample
      .putShort(2) // cbSize
    // NOTE: samplesPerBlock extra field omitted from cbSize payload on
    // purpose — the decoder derives it from blockAlign, per the format
    buf.put("data".getBytes).putInt(bytes.length).put(bytes)
    (java.util.Arrays.copyOf(buf.array(), buf.position()), recon.toArray)
  }

  private def sine(n: Int, channels: Int, amp: Int, period: Double)
      : Array[Short] =
    Array.tabulate(n * channels) { i =>
      val t = i / channels
      (amp * math.sin(2 * math.Pi * t / period)).toShort
    }

  test("IMA ADPCM mono round-trip: decoder stats match the encoder's exact reconstruction") {
    val samples = sine(3 * 33, 1, 8000, 50.0) // 3 full blocks
    val (wav, recon) = encodeAdpcmWav(samples, 1, 16000, 33)
    val got = Multimodal.decodeWav(wav)
    assert(got.isDefined, "ADPCM wav must really decode")
    val (chans, rate, nSamp, mean) = got.get
    assert(chans == 1L && rate == 16000L)
    assert(nSamp == recon.length.toLong)
    val expMean = Math.floorDiv(recon.map(v => math.abs(v.toLong)).sum,
      recon.length.toLong)
    assert(mean == expMean, s"decoder mean $mean vs encoder-exact $expMean")
  }

  test("IMA ADPCM stereo round-trip with block-index carry-over") {
    val samples = sine(4 * 17, 2, 12000, 23.0) // 17 = 8*2+1 nibble pack
    val (wav, recon) = encodeAdpcmWav(samples, 2, 44100, 17)
    val (chans, rate, nSamp, mean) = Multimodal.decodeWav(wav).get
    assert(chans == 2L && rate == 44100L)
    assert(nSamp * 2 == recon.length.toLong) // nSamp is per channel
    val expMean = Math.floorDiv(recon.map(v => math.abs(v.toLong)).sum,
      recon.length.toLong)
    assert(mean == expMean)
  }

  test("IMA ADPCM tracks the source signal, not just itself") {
    // fidelity sanity: reconstruction of a smooth mid-amplitude sine
    // stays close to the source (ADPCM adapts its step within a few
    // samples) — guards against a decoder that is self-consistent with
    // the encoder but decodes garbage
    val samples = sine(2 * 65, 1, 8000, 40.0)
    val (_, recon) = encodeAdpcmWav(samples, 1, 8000, 65)
    val errs = samples.indices.map(i => math.abs(recon(i) - samples(i)))
    val meanErr = errs.sum.toDouble / errs.length
    assert(meanErr < 800, s"mean |recon - source| = $meanErr too high")
  }

  test("hostile ADPCM degrades: bad step index, truncated block, bad align") {
    import spark.implicits._
    val (good, _) = encodeAdpcmWav(sine(33, 1, 5000, 30.0), 1, 8000, 33)
    val badIdx = good.clone()
    // step index byte of the first block header (data starts at 46:
    // 12 RIFF + 26 fmt chunk + 8 data header); index 200 > 88
    badIdx(46 + 2) = 200.toByte
    val truncated = java.util.Arrays.copyOf(good, good.length - 7)
    val media = Seq(
      Multimodal.MediaRow(1L, "wav", badIdx),
      Multimodal.MediaRow(3L, "wav", good)).toDS()
    val byId = Multimodal.decodeMedia(media).collect()
      .map(d => d.media_id -> d).toMap
    assert(!byId(1L).decoded, "index > 88 must reject")
    assert(byId(3L).decoded, "the control payload still decodes")
    // truncation mid-block: the partial tail decodes only whole words —
    // still a real decode, shorter stream
    val t = Multimodal.decodeWav(truncated)
    assert(t.isDefined && t.get._3 < 33L)
  }

  // ---- MP3 frame-header walk ----

  /** Hand-assemble an MPEG frame: 4-byte header + zero payload. */
  private def mp3Frame(header: Int, frameBytes: Int): Array[Byte] = {
    val f = new Array[Byte](frameBytes)
    f(0) = ((header >> 24) & 0xff).toByte
    f(1) = ((header >> 16) & 0xff).toByte
    f(2) = ((header >> 8) & 0xff).toByte
    f(3) = (header & 0xff).toByte
    f
  }

  // MPEG-1 Layer III, 128 kbps, 44100 Hz, no padding, joint stereo:
  // frame = floor(144 * 128000 / 44100) = 417 bytes, 1152 samples
  private val V1L3Stereo = 0xFFFB9040
  // same but mono (mode 11)
  private val V1L3Mono = 0xFFFB90C0
  // MPEG-2 Layer III, 32 kbps, 22050 Hz: floor(72*32000/22050) = 104
  // bytes, 576 samples (bitrate index 4 in the V2 L2/L3 table)
  private val V2L3Mono = 0xFFF340C0

  test("mp3 walk: exact samples / rate / channels over a frame sequence") {
    val b = (1 to 5).flatMap(_ => mp3Frame(V1L3Stereo, 417)).toArray
    assert(Mp3Codec.walkFrames(b).contains((2L, 44100L, 5L * 1152)))
    val mono = (1 to 3).flatMap(_ => mp3Frame(V1L3Mono, 417)).toArray
    assert(Mp3Codec.walkFrames(mono).contains((1L, 44100L, 3L * 1152)))
    val v2 = (1 to 7).flatMap(_ => mp3Frame(V2L3Mono, 104)).toArray
    assert(Mp3Codec.walkFrames(v2).contains((1L, 22050L, 7L * 576)))
  }

  test("mp3 walk: per-frame padding bit changes that frame's length") {
    val padded = mp3Frame(V1L3Stereo | 0x200, 418) // padding bit set
    val b = (mp3Frame(V1L3Stereo, 417) ++ padded ++
      mp3Frame(V1L3Stereo, 417)).toArray
    assert(Mp3Codec.walkFrames(b).contains((2L, 44100L, 3L * 1152)))
  }

  test("mp3 walk: ID3v2 prefix skipped, ID3v1 trailer tolerated") {
    val id3v2 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 20) ++
      new Array[Byte](20) // syncsafe size 20
    val id3v1 = ("TAG" + "x" * 125).getBytes("US-ASCII")
    val b = id3v2 ++ mp3Frame(V1L3Stereo, 417) ++
      mp3Frame(V1L3Stereo, 417) ++ id3v1
    assert(Mp3Codec.walkFrames(b).contains((2L, 44100L, 2L * 1152)))
  }

  test("mp3 walk rejects inconsistent and degenerate streams") {
    // frames disagreeing on sample rate: not one stream
    val mixed = mp3Frame(V1L3Stereo, 417) ++ mp3Frame(V2L3Mono, 104)
    assert(Mp3Codec.walkFrames(mixed).isEmpty)
    // free-format bitrate (index 0): undefined frame length
    assert(Mp3Codec.walkFrames(mp3Frame(0xFFFB0040, 417)).isEmpty)
    // a sync word inside random bytes, but truncated before one whole
    // frame fits
    assert(Mp3Codec.walkFrames(mp3Frame(V1L3Stereo, 100)).isEmpty)
    assert(Mp3Codec.walkFrames(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("decode fuzz: seeded random payloads never throw on ANY kind") {
    import spark.implicits._
    // deterministic fuzz sweep across every dispatch branch: random
    // bytes, random prefixes of valid magic numbers, and truncations.
    // The contract under test: a hostile payload NEVER kills the task —
    // it decodes for real or degrades to a stub row (one row in, one
    // row out, decoded flag set accordingly).
    val rnd = new scala.util.Random(0x5eed)
    val kinds = Seq("bmp", "ppm", "wav", "flac", "mp3", "png", "jpg",
      "gif", "mp4", "ogg", "bin")
    val magics = Seq("BM", "P6", "RIFF", "fLaC", "ID3",
      "ÿû", "PNG", "OggS", "ftyp").map(_.getBytes("ISO-8859-1"))
    val payloads = (0 until 300).map { i =>
      val len = rnd.nextInt(200)
      val b = new Array[Byte](len)
      rnd.nextBytes(b)
      if (i % 3 == 0 && len > 8) { // graft a real-looking magic on front
        val m = magics(rnd.nextInt(magics.length))
        System.arraycopy(m, 0, b, 0, math.min(m.length, len))
      }
      Multimodal.MediaRow(i.toLong, kinds(i % kinds.length), b)
    }
    val out = Multimodal.decodeMedia(payloads.toDS()).collect()
    assert(out.length == payloads.length, "every payload must yield a row")
    assert(out.forall(_.n_bytes >= 0))
    // the perceptual paths share the same never-throw contract
    val ph = Multimodal.perceptualHash(payloads.toDS()).collect()
    assert(ph.length == payloads.length)
    val ah = Multimodal.audioFingerprint(payloads.toDS()).collect()
    assert(ah.length == payloads.length)
  }

  test("decodeMedia mp3: real header metadata, content honestly stubbed") {
    import spark.implicits._
    val b = (1 to 4).flatMap(_ => mp3Frame(V1L3Stereo, 417)).toArray
    val media = Seq(
      Multimodal.MediaRow(1L, "mp3", b),
      Multimodal.MediaRow(2L, "mp3", Array[Byte](9, 9, 9, 9))).toDS()
    val byId = Multimodal.decodeMedia(media).collect()
      .map(d => d.media_id -> d).toMap
    val ok = byId(1L)
    assert(!ok.decoded, "content is not decoded — flag must stay false")
    assert(ok.channels == 2L && ok.sample_rate == 44100L &&
      ok.n_samples == 4L * 1152, "header metadata must be real")
    val junk = byId(2L)
    assert(!junk.decoded && junk.sample_rate == 0L,
      "non-mp3 bytes take the plain stub path")
  }
}
