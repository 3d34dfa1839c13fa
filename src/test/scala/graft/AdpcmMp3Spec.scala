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

  // ---- in-test MPEG-1 Layer I encoder ----
  // Analysis is the decoder's own orthogonal matrixing kernel at gain
  // 1/16 (orthogonality pinned below), then spec quantization onto
  // the (2^nb - 1)-step grid with per-subband scalefactors — a fully
  // legal Layer I bitstream whose exact reconstruction is replayed
  // through the product's dequant/synthesis primitives, the
  // AdpcmCodec validation protocol.

  private class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nBits = 0
    def write(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        nBits += 1
        if (nBits == 8) { buf += cur.toByte; cur = 0; nBits = 0 }
        i -= 1
      }
    }
    def padToBytes(total: Int): Unit = {
      if (nBits > 0) { buf += (cur << (8 - nBits)).toByte; cur = 0; nBits = 0 }
      while (buf.length < total) buf += 0
    }
    def toArray: Array[Byte] = buf.toArray
  }

  /** Encode per-channel PCM (doubles in [-1,1), length a multiple of
    * 384) as MPEG-1 Layer I @ 32 kHz / 448 kbps with a uniform
    * allocation in every subband. Returns (bytes, expected decoder
    * stats (nSamplesPerChannel, mean |16-bit amplitude|) replayed
    * through the product primitives). */
  private def encodeLayer1(pcm: Array[Array[Double]], alloc: Int)
      : (Array[Byte], (Long, Long)) = {
    val nch = pcm.length
    val nb = alloc + 1
    require(pcm.forall(_.length == pcm(0).length))
    require(pcm(0).length % 384 == 0)
    val nFrames = pcm(0).length / 384
    val frameBytes = (12 * 448000 / 32000) * 4 // 672
    val q = math.pow(2.0, 1 - nb)
    val steps = (1 << nb) - 1
    val out = new scala.collection.mutable.ArrayBuffer[Byte]
    var absSum = 0L
    var nOut = 0L
    for (f <- 0 until nFrames) {
      val w = new BitWriter
      w.write(0xFF, 8); w.write(0xFF, 8) // sync+V1+L1+no-CRC
      w.write(14, 4); w.write(2, 2); w.write(0, 2) // 448k, 32kHz, no pad
      w.write(if (nch == 1) 3 else 0, 2); w.write(0, 6) // mode + rest
      // analysis: 12 granules x 32 subbands per channel
      val sub = Array.tabulate(nch, 12, 32) { (ch, g, k) =>
        var acc = 0.0
        var j = 0
        while (j < 32) {
          acc += pcm(ch)(f * 384 + g * 32 + j) * Mp3Codec.SynthCos(j)(k)
          j += 1
        }
        acc / 16.0
      }
      val scfIdx = Array.tabulate(32, nch) { (sb, ch) =>
        val mx = (0 until 12).map(g => math.abs(sub(ch)(g)(sb))).max
        if (mx == 0.0) 62
        else (0 to 62).filter(i => Mp3Codec.scalefactorL12(i) >= mx).max
      }
      def quantize(v: Double, scf: Double): Int = {
        val t = v / scf // in [-1, 1]
        val code = math.round(
          ((t * steps / (1 << nb)) + 1 - q) / q).toInt
        math.max(0, math.min(steps - 1, code))
      }
      for (sb <- 0 until 32; ch <- 0 until nch) w.write(alloc, 4)
      for (sb <- 0 until 32; ch <- 0 until nch) w.write(scfIdx(sb)(ch), 6)
      val codes = Array.ofDim[Int](nch, 12, 32)
      for (s <- 0 until 12; sb <- 0 until 32; ch <- 0 until nch) {
        codes(ch)(s)(sb) = quantize(sub(ch)(s)(sb),
          Mp3Codec.scalefactorL12(scfIdx(sb)(ch)))
        w.write(codes(ch)(s)(sb), nb)
      }
      w.padToBytes(frameBytes)
      out ++= w.toArray
      // expected reconstruction through the PRODUCT primitives
      for (s <- 0 until 12; ch <- 0 until nch) {
        val g = Array.tabulate(32)(sb =>
          Mp3Codec.scalefactorL12(scfIdx(sb)(ch)) *
            Mp3Codec.dequantL1(codes(ch)(s)(sb), nb))
        for (x <- Mp3Codec.synthGranule(g)) {
          val v = math.max(-32768L, math.min(32767L,
            math.round(x * 32767.0)))
          absSum += math.abs(v)
          nOut += 1
        }
      }
    }
    (out.toArray, (nFrames * 384L,
      if (nOut == 0) 0L else Math.floorDiv(absSum, nOut)))
  }

  test("layer I dequantization grid and scalefactor table are the spec's") {
    // nb=2: the 3-step grid {-2/3, 0, +2/3}; all-ones code is off-grid
    assert(math.abs(Mp3Codec.dequantL1(0, 2) + 2.0 / 3) < 1e-12)
    assert(math.abs(Mp3Codec.dequantL1(1, 2)) < 1e-12)
    assert(math.abs(Mp3Codec.dequantL1(2, 2) - 2.0 / 3) < 1e-12)
    // grid is symmetric midrise and strictly inside (-1, 1) for all nb
    for (nb <- 2 to 15) {
      val lo = Mp3Codec.dequantL1(0, nb)
      val hi = Mp3Codec.dequantL1((1 << nb) - 2, nb)
      assert(math.abs(lo + hi) < 1e-12, s"nb=$nb grid not symmetric")
      assert(hi < 1.0 && lo > -1.0)
    }
    assert(Mp3Codec.scalefactorL12(0) == 2.0)
    assert(math.abs(Mp3Codec.scalefactorL12(3) - 1.0) < 1e-12)
    assert(Mp3Codec.scalefactorL12(62) < 1e-5)
  }

  test("layer I synthesis kernel is orthogonal (kernel x kernel = 16I)") {
    for (a <- 0 until 32; b <- 0 until 32) {
      var acc = 0.0
      for (k <- 0 until 32) acc += Mp3Codec.SynthCos(a)(k) * Mp3Codec.SynthCos(b)(k)
      assert(math.abs(acc - (if (a == b) 16.0 else 0.0)) < 1e-9,
        s"kernel not orthogonal at ($a, $b): $acc")
    }
  }

  test("layer I mono round-trip: decoder matches the exact replayed reconstruction and tracks the source") {
    val n = 3 * 384
    val pcm = Array(Array.tabulate(n)(i =>
      0.5 * math.sin(2 * math.Pi * i / 49.0)))
    val (bytes, (expN, expMean)) = encodeLayer1(pcm, alloc = 12) // nb=13
    assert(Mp3Codec.decodeLayer1(bytes)
      .contains((1L, 32000L, expN, expMean)))
    // and the reconstruction tracks the SOURCE, not just itself:
    // nb=13 quantization error is far under 16-bit resolution x32
    val srcMean = Math.floorDiv(
      pcm(0).map(x => math.abs(math.round(x * 32767.0))).sum, n.toLong)
    assert(math.abs(expMean - srcMean) <= 150,
      s"decoded mean $expMean drifted from source $srcMean")
  }

  test("layer I stereo round-trip with distinct channels") {
    val n = 2 * 384
    val pcm = Array(
      Array.tabulate(n)(i => 0.7 * math.sin(2 * math.Pi * i / 31.0)),
      Array.tabulate(n)(i => 0.2 * math.sin(2 * math.Pi * i / 97.0)))
    val (bytes, (expN, expMean)) = encodeLayer1(pcm, alloc = 5) // nb=6
    assert(Mp3Codec.decodeLayer1(bytes)
      .contains((2L, 32000L, expN, expMean)))
  }

  test("layer I decode degrades honestly: joint stereo, bad alloc, short frame") {
    // joint stereo (mode 01): intensity bound handling out of scope
    val (mono, _) = encodeLayer1(
      Array(Array.fill(384)(0.1)), alloc = 12)
    val joint = mono.clone()
    joint(3) = 0x40.toByte // mode 01
    assert(Mp3Codec.decodeLayer1(joint).isEmpty)
    assert(Mp3Codec.walkFrames(joint).isDefined, "metadata walk still works")
    // forbidden allocation 15 in the first subband
    val badAlloc = mono.clone()
    badAlloc(4) = (badAlloc(4) | 0xF0).toByte
    assert(Mp3Codec.decodeLayer1(badAlloc).isEmpty)
    // Layer III streams never reach the Layer I decoder
    val l3 = (1 to 3).flatMap(_ => mp3Frame(V1L3Stereo, 417)).toArray
    assert(Mp3Codec.decodeLayer1(l3).isEmpty)
  }

  test("layer I bitstream fuzz: corrupted payloads never throw, only degrade") {
    val (good, _) = encodeLayer1(
      Array(Array.tabulate(2 * 384)(i => 0.3 * math.sin(i / 9.0))),
      alloc = 12)
    val rnd = new scala.util.Random(0xf00d)
    for (trial <- 0 until 200) {
      val b = good.clone()
      // corrupt 1-8 bytes anywhere past the first header
      for (_ <- 0 to rnd.nextInt(8))
        b(4 + rnd.nextInt(b.length - 4)) = rnd.nextInt(256).toByte
      // must not throw; any Some must carry sane stream metadata
      Mp3Codec.decodeLayer1(b).foreach { case (c, rate, ns, mean) =>
        assert(c == 1L && rate == 32000L && ns % 384 == 0 && mean >= 0,
          s"trial $trial produced insane metadata")
      }
      Mp3Codec.walkFrames(b) // the metadata walk shares the guarantee
    }
    // truncation sweep: every prefix length is safe
    for (len <- 0 to good.length by 41)
      Mp3Codec.decodeLayer1(java.util.Arrays.copyOf(good, len))
  }

  test("decodeMedia mp3 layer I: decoded=true with real content stats") {
    import spark.implicits._
    val pcm = Array(Array.tabulate(2 * 384)(i =>
      0.4 * math.sin(2 * math.Pi * i / 40.0)))
    val (bytes, (expN, expMean)) = encodeLayer1(pcm, alloc = 12)
    val media = Seq(Multimodal.MediaRow(1L, "mp3", bytes)).toDS()
    val d = Multimodal.decodeMedia(media).collect().head
    assert(d.decoded, "layer I content decode must set decoded=true")
    assert(d.channels == 1L && d.sample_rate == 32000L &&
      d.n_samples == expN && d.mean_value == expMean)
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
