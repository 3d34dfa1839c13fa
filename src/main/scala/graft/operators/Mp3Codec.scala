package graft.operators

/** Pure-JVM MPEG audio frame-header walker (public format: ISO/IEC
  * 11172-3 / 13818-3 frame headers; no reference-repo analog — the
  * reference pipeline has no audio code). Walks the full frame
  * sequence of an MP3 (or any MPEG-1/2/2.5 Layer I-III) payload and
  * computes the EXACT stream metadata — channels, sample rate, and
  * total per-channel sample count — from the headers alone:
  * every frame contributes a fixed, layer-determined sample count
  * (Layer I: 384; Layer II: 1152; Layer III: 1152 for MPEG-1, 576 for
  * MPEG-2/2.5), and each frame's byte length follows from its header's
  * bitrate/samplerate/padding fields, so the walk needs no entropy
  * decoding.
  *
  * SCOPE, per layer: LAYER I payloads get a real content decode
  * ([[decodeLayer1]] — its whole bitstream layer is formulaic, zero
  * transcribed constants; synthesis scope documented at the decode
  * section). Layer II needs the ISO Table B.2a-d allocation maps and
  * Layer III the Table B.7 huffman set plus the Table B.3 synthesis
  * window — thousands of published numeric constants with no
  * generating formula. Embedding them from memory risks a
  * silently-wrong decoder, which is worse than a correct partial one;
  * [[Multimodal.decodeMedia]] therefore reports Layer II/III payloads
  * with REAL channels/sample_rate/n_samples but keeps `decoded=false`
  * (content statistics stay stub-derived) until a verified table
  * source is available. [[FlacCodec]] and [[AdpcmCodec]] are the
  * other full-decode compressed-audio paths.
  *
  * The input is UNTRUSTED: the walk skips a leading ID3v2 tag by its
  * syncsafe declared size (bounds-checked), requires every frame to
  * start on a valid sync word with non-reserved version/layer fields
  * and a non-free, non-reserved bitrate, rejects streams whose frames
  * disagree on version/layer/samplerate/mode (random bytes that
  * happen to contain one sync pattern do not pass), and bounds the
  * frame count by the payload length — frame lengths are >= 24 bytes,
  * so the loop strictly advances and terminates. Trailing garbage
  * after the last whole frame (e.g. an ID3v1 tag) is tolerated;
  * a payload with no complete valid frame returns None.
  */
object Mp3Codec {

  // bitrate tables in kbit/s, indexed [bitrateIndex 1..14];
  // index 0 = "free format" (rejected: frame length is then undefined
  // without parsing ahead), index 15 = reserved (rejected)
  private val BitrateV1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224,
    256, 288, 320, 352, 384, 416, 448)
  private val BitrateV1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320, 384)
  private val BitrateV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96,
    112, 128, 160, 192, 224, 256, 320)
  private val BitrateV2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112,
    128, 144, 160, 176, 192, 224, 256)
  private val BitrateV2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56,
    64, 80, 96, 112, 128, 144, 160)

  // sample-rate tables indexed by the header's 2-bit field (3 = reserved)
  private val RateV1 = Array(44100, 48000, 32000)
  private val RateV2 = Array(22050, 24000, 16000)
  private val RateV25 = Array(11025, 12000, 8000)

  /** One parsed frame header. */
  private final case class Header(version: Int, layer: Int,
      sampleRate: Int, channels: Int, samplesPerFrame: Int,
      frameBytes: Int, mode: Int, crc: Boolean)

  /** Parse the 4-byte header at `off`; None unless it is a fully valid,
    * non-free-format frame start. */
  private def parseHeader(b: Array[Byte], off: Int): Option[Header] = {
    if (off + 4 > b.length) return None
    if ((b(off) & 0xff) != 0xff || (b(off + 1) & 0xe0) != 0xe0) return None
    val versionBits = (b(off + 1) >> 3) & 0x3 // 0=2.5, 1=reserved, 2=V2, 3=V1
    val layerBits = (b(off + 1) >> 1) & 0x3 // 0=reserved, 1=L3, 2=L2, 3=L1
    if (versionBits == 1 || layerBits == 0) return None
    val bitrateIdx = (b(off + 2) >> 4) & 0xf
    if (bitrateIdx == 0 || bitrateIdx == 15) return None
    val rateIdx = (b(off + 2) >> 2) & 0x3
    if (rateIdx == 3) return None
    val padding = (b(off + 2) >> 1) & 0x1
    val mode = (b(off + 3) >> 6) & 0x3 // 3 = single channel
    val layer = 4 - layerBits // 1, 2, 3
    val isV1 = versionBits == 3
    val sampleRate = versionBits match {
      case 3 => RateV1(rateIdx)
      case 2 => RateV2(rateIdx)
      case _ => RateV25(rateIdx)
    }
    val bitrate = 1000 * ((layer, isV1) match {
      case (1, true) => BitrateV1L1(bitrateIdx)
      case (2, true) => BitrateV1L2(bitrateIdx)
      case (_, true) => BitrateV1L3(bitrateIdx)
      case (1, false) => BitrateV2L1(bitrateIdx)
      case (_, false) => BitrateV2L23(bitrateIdx)
    })
    val samplesPerFrame = layer match {
      case 1 => 384
      case 2 => 1152
      case 3 => if (isV1) 1152 else 576
    }
    // Layer I frames are 4-byte-slot aligned; II/III are byte-sized:
    // floor(samplesPerFrame/8 * bitrate / rate) + padding slots
    val frameBytes =
      if (layer == 1) (12 * bitrate / sampleRate + padding) * 4
      else samplesPerFrame / 8 * bitrate / sampleRate + padding
    if (frameBytes < 24) return None // smaller than any legal frame
    Some(Header(versionBits, layer, sampleRate,
      if (mode == 3) 1 else 2, samplesPerFrame, frameBytes, mode,
      crc = (b(off + 1) & 0x1) == 0))
  }

  /** Skip a leading ID3v2 tag ("ID3" + version + flags + 4-byte
    * syncsafe size), bounds-checked. */
  private def skipId3v2(b: Array[Byte]): Int = {
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      val end = 10L + size
      if (end < b.length) end.toInt else b.length
    } else 0
  }

  /** Walk every frame. Returns (channels, sample_rate, total samples
    * per channel) iff the payload contains at least one complete valid
    * frame and all frames agree on version/layer/samplerate/channel
    * mode. */
  def walkFrames(b: Array[Byte]): Option[(Long, Long, Long)] = {
    var pos = skipId3v2(b)
    // tolerate up to one small run of leading garbage before first sync
    // (common: encoder lead-in); scan at most 4 KiB for the first header
    val scanEnd = math.min(b.length, pos + 4096)
    var first: Option[Header] = None
    while (first.isEmpty && pos < scanEnd) {
      first = parseHeader(b, pos).filter(h => pos + h.frameBytes <= b.length)
      if (first.isEmpty) pos += 1
    }
    val h0 = first.getOrElse(return None)
    var frames = 0L
    var samples = 0L
    var cur: Option[Header] = first
    while (cur.isDefined) {
      val h = cur.get
      // stream-consistency gate: every frame must agree with the first
      if (h.version != h0.version || h.layer != h0.layer ||
        h.sampleRate != h0.sampleRate || h.channels != h0.channels)
        return None
      frames += 1
      samples += h.samplesPerFrame
      pos += h.frameBytes
      cur = parseHeader(b, pos)
      // after the last whole frame: EOF or trailing non-frame bytes
      // (ID3v1 etc.) both end the walk; a valid-looking header whose
      // frame would overrun the buffer counts as truncated trailing
      // data, not a stream error
      if (cur.exists(h2 => pos + h2.frameBytes > b.length)) cur = None
    }
    if (frames == 0) None
    else Some((h0.channels.toLong, h0.sampleRate.toLong, samples))
  }

  // ---- Layer I content decode --------------------------------------
  //
  // Layer I is the one MPEG-audio layer whose ENTIRE bitstream layer
  // is formulaic — 4-bit allocations (nb = alloc+1 bits/sample), the
  // 63-entry scalefactor table 2^(1 - idx/3), and the midrise
  // (2^nb - 1)-step requantization below — so it can be decoded with
  // ZERO transcribed constants. Layer II additionally needs the
  // ISO Table B.2a-d allocation maps and Layer III the Table B.7
  // huffman set: transcribed-only, so both stay on the header-walk +
  // decoded=false path (a from-memory table risks a silently-wrong
  // decoder, which is worse than a correct partial one).
  //
  // Synthesis scope, stated plainly: subband samples are dequantized
  // BIT-EXACTLY per the spec formulas; PCM then comes from the ISO
  // matrixing cosine kernel as its orthogonal 32-point core (the
  // filterbank with a rectangular prototype) because Table B.3's
  // 512-tap interpolation window is ALSO transcribed-only. The
  // approximation affects only the smoothing window over exact
  // subband content — amplitude statistics track the real signal
  // (AdpcmMp3Spec round-trips an in-test encoder through it), which
  // is precisely what the `decoded` flag guards: perceptual features
  // must come from real content, never md5 noise.

  /** ISO 11172-3 Layer I requantization: an nb-bit code onto the
    * (2^nb - 1)-step midrise grid in (-1, 1) —
    * (2^nb/(2^nb-1)) * (code*2^(1-nb) - 1 + 2^(1-nb)); the all-ones
    * code is outside the grid (the spec's "number of steps" column)
    * and never emitted by an encoder. */
  private[operators] def dequantL1(code: Int, nb: Int): Double = {
    val q = math.pow(2.0, 1 - nb)
    ((1 << nb).toDouble / ((1 << nb) - 1)) * (code * q - 1 + q)
  }

  /** Layer I/II scalefactor table, generated: entry idx = 2^(1-idx/3)
    * for idx in [0, 62] (63 is reserved). */
  private[operators] def scalefactorL12(idx: Int): Double =
    math.pow(2.0, 1.0 - idx / 3.0)

  /** 32-point synthesis matrixing kernel cos((2j+1)(2k+1)*pi/128) —
    * the orthogonal core of the ISO filterbank (kernel * kernel =
    * 16*I, pinned in spec), so analysis at gain 1/16 inverts it
    * exactly. */
  private[operators] val SynthCos: Array[Array[Double]] =
    Array.tabulate(32, 32)((j, k) =>
      math.cos((2 * j + 1) * (2 * k + 1) * math.Pi / 128))

  /** One granule of 32 subband samples -> 32 PCM samples. */
  private[operators] def synthGranule(s: Array[Double]): Array[Double] = {
    val out = new Array[Double](32)
    var j = 0
    while (j < 32) {
      var acc = 0.0
      var k = 0
      while (k < 32) { acc += SynthCos(j)(k) * s(k); k += 1 }
      out(j) = acc
      j += 1
    }
    out
  }

  /** MSB-first bounded bit reader; overruns latch `ok = false`. */
  private final class BitReader(b: Array[Byte], startBit: Long,
      val endBit: Long) {
    private var pos = startBit
    var ok = true
    def read(n: Int): Int = {
      if (pos + n > endBit) { ok = false; return 0 }
      var v = 0
      var i = 0
      while (i < n) {
        val byte = (pos >> 3).toInt
        val bit = 7 - (pos & 7).toInt
        v = (v << 1) | ((b(byte) >> bit) & 1)
        pos += 1
        i += 1
      }
      v
    }
  }

  /** Full Layer I content decode: walks every frame, dequantizes the
    * subband samples exactly per spec, synthesizes PCM (see the
    * section comment for the documented rectangular-prototype scope),
    * and returns (channels, sample_rate, samples per channel, mean
    * |16-bit amplitude|) in [[Multimodal.decodeWav]]'s stat
    * convention. None — degrade to the metadata walk — unless the
    * payload is a consistent all-Layer-I stream in single/stereo/dual
    * mode (joint-stereo intensity bound handling is out of scope) with
    * every frame's data fitting its declared length. */
  def decodeLayer1(b: Array[Byte]): Option[(Long, Long, Long, Long)] = {
    var pos = skipId3v2(b)
    val scanEnd = math.min(b.length, pos + 4096)
    var first: Option[Header] = None
    while (first.isEmpty && pos < scanEnd) {
      first = parseHeader(b, pos).filter(h => pos + h.frameBytes <= b.length)
      if (first.isEmpty) pos += 1
    }
    val h0 = first.getOrElse(return None)
    if (h0.layer != 1 || h0.mode == 1) return None
    var frames = 0L
    var absSum = 0L
    var nOut = 0L
    var cur: Option[Header] = first
    while (cur.isDefined) {
      val h = cur.get
      if (h.version != h0.version || h.layer != h0.layer ||
        h.sampleRate != h0.sampleRate || h.channels != h0.channels ||
        h.mode == 1) return None
      val nch = h.channels
      val br = new BitReader(b,
        (pos + 4 + (if (h.crc) 2 else 0)).toLong * 8,
        math.min(pos + h.frameBytes, b.length).toLong * 8)
      val alloc = Array.ofDim[Int](32, nch)
      for (sb <- 0 until 32; ch <- 0 until nch) {
        val a = br.read(4)
        if (a == 15) return None // forbidden allocation
        alloc(sb)(ch) = a
      }
      val scf = Array.ofDim[Double](32, nch)
      for (sb <- 0 until 32; ch <- 0 until nch; if alloc(sb)(ch) != 0) {
        val idx = br.read(6)
        if (idx == 63) return None // reserved scalefactor
        scf(sb)(ch) = scalefactorL12(idx)
      }
      val gran = Array.ofDim[Double](nch, 32)
      for (s <- 0 until 12) {
        for (ch <- 0 until nch) java.util.Arrays.fill(gran(ch), 0.0)
        for (sb <- 0 until 32; ch <- 0 until nch; if alloc(sb)(ch) != 0) {
          val nb = alloc(sb)(ch) + 1
          gran(ch)(sb) = scf(sb)(ch) * dequantL1(br.read(nb), nb)
        }
        if (!br.ok) return None // frame data overran its declared length
        for (ch <- 0 until nch) {
          val x = synthGranule(gran(ch))
          var j = 0
          while (j < 32) {
            val v = math.max(-32768L, math.min(32767L,
              math.round(x(j) * 32767.0)))
            absSum += math.abs(v)
            nOut += 1
            j += 1
          }
        }
      }
      frames += 1
      pos += h.frameBytes
      cur = parseHeader(b, pos)
      if (cur.exists(h2 => pos + h2.frameBytes > b.length)) cur = None
    }
    if (frames == 0) None
    else Some((h0.channels.toLong, h0.sampleRate.toLong,
      frames * 384L, if (nOut == 0) 0L else Math.floorDiv(absSum, nOut)))
  }
}
