package graft.operators

/** Pure-JVM FLAC decoder (public format: RFC 9639 / the xiph.org FLAC
  * specification — no reference-repo analog; the reference pipeline
  * has no audio codecs at all). Decodes the real compressed bitstream:
  * STREAMINFO metadata, frame headers (UTF-8 coded frame numbers,
  * CRC-8), subframe types CONSTANT / VERBATIM / FIXED(0-4) /
  * LPC(1-32), rice-coded residual partitions (both 4- and 5-bit
  * parameter widths, escape-to-raw partitions), wasted-bits shifts,
  * and all four channel assignments (independent, left/side,
  * right/side, mid/side), verifying the frame CRC-16 before trusting
  * a frame's samples.
  *
  * The input is UNTRUSTED: every read is bounds-checked (EOF throws
  * internally and surfaces as None), dimension fields are
  * range-checked against the spec's own limits (block size <= 65535,
  * channels <= 8, bits-per-sample <= 32), a CRC mismatch rejects the
  * frame, and a decode that would exceed [[MaxDecodeSamples]] total
  * samples aborts BEFORE accumulating further — the audio analogue of
  * [[Multimodal.MaxDecodePixels]]'s decompression-bomb guard. A
  * malformed payload degrades to `decoded=false` in
  * [[Multimodal.decodeMedia]]; it never kills the executor task.
  *
  * Out of scope (rejected, not mis-decoded): streams whose frames are
  * truncated mid-bitstream, reserved subframe/blocksize codes, and
  * sample-rate code 0b1111. The STREAMINFO MD5 is not re-verified
  * (it requires a second full pass; CRC-16 already covers integrity
  * per frame).
  */
object FlacCodec {

  /** Bomb guard: decoded-sample budget across the whole stream (all
    * channels). 64M samples x 8 bytes ~= 512 MiB of *processing* (we
    * stream per block, so resident memory is one block), but the
    * budget bounds hostile streams that pack maximal sample counts
    * into few bytes. */
  val MaxDecodeSamples: Long = 64L * 1024 * 1024

  private final class Eof extends RuntimeException(null, null, false, false)

  /** MSB-first bit reader; every read bounds-checks and throws Eof. */
  private final class BitReader(b: Array[Byte]) {
    var pos = 0 // bit position
    def bytePos: Int = pos >>> 3
    def bitsLeft: Long = (b.length.toLong << 3) - pos
    def readBit(): Int = {
      if (pos >= (b.length << 3)) throw new Eof
      val v = (b(pos >>> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      v
    }
    def readLong(n: Int): Long = {
      if (n == 0) return 0L
      if (bitsLeft < n) throw new Eof
      var v = 0L
      var left = n
      while (left > 0) {
        val byteI = pos >>> 3
        val bitI = pos & 7
        val take = math.min(8 - bitI, left)
        val chunk = ((b(byteI) & 0xff) >>> (8 - bitI - take)) & ((1 << take) - 1)
        v = (v << take) | chunk
        pos += take
        left -= take
      }
      v
    }
    def readInt(n: Int): Int = readLong(n).toInt
    /** Signed two's-complement n-bit value. */
    def readSigned(n: Int): Long = {
      val v = readLong(n)
      if (n > 0 && (v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    /** Unary: zeros until a 1 bit; returns the zero count. */
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }
    def alignByte(): Unit = { pos = (pos + 7) & ~7 }
  }

  def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  private case class StreamInfo(sampleRate: Int, channels: Int, bps: Int)

  /** Decode a whole FLAC stream; returns (channels, sample_rate,
    * n_samples per channel, floor(mean |amplitude| over all decoded
    * samples)) — the same shape [[Multimodal.decodeWav]] reports for
    * PCM, so compressed and raw audio are interchangeable downstream. */
  def decode(b: Array[Byte]): Option[(Long, Long, Long, Long)] =
    try decodeOrThrow(b, null)
    catch { case _: Eof | _: ArithmeticException |
      _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException |
      _: IllegalArgumentException => None }

  /** Per-block sample consumer for envelope-style analyses:
    * (channels array, blockSize, per-channel base position). Channel
    * arrays hold the fully reconstructed PCM of one frame. */
  type BlockConsumer = (Array[Array[Long]], Int, Long) => Unit

  /** [[decode]] with a per-frame PCM consumer — single pass, no full
    * materialization of the stream (one frame's channels live at a
    * time, same as the stat path). */
  def decodeWith(b: Array[Byte], consumer: BlockConsumer)
      : Option[(Long, Long, Long, Long)] =
    try decodeOrThrow(b, consumer)
    catch { case _: Eof | _: ArithmeticException |
      _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException |
      _: IllegalArgumentException => None }

  private def decodeOrThrow(b: Array[Byte], consumer: BlockConsumer)
      : Option[(Long, Long, Long, Long)] = {
    if (b.length < 42 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' ||
      b(3) != 'C') return None
    val r = new BitReader(b)
    r.pos = 32
    // metadata blocks: 1-bit last flag, 7-bit type, 24-bit length
    var si: Option[StreamInfo] = None
    var last = false
    while (!last) {
      last = r.readBit() == 1
      val btype = r.readInt(7)
      val blen = r.readInt(24)
      if (btype == 0) {
        if (blen != 34) return None
        r.readInt(16); r.readInt(16) // min/max block size
        r.readInt(24); r.readInt(24) // min/max frame size
        val rate = r.readInt(20)
        val chans = r.readInt(3) + 1
        val bps = r.readInt(5) + 1
        r.readLong(36) // total samples (0 = unknown; we count ourselves)
        r.pos += 128 // md5
        if (rate <= 0 || bps < 4 || bps > 32) return None
        si = Some(StreamInfo(rate, chans, bps))
      } else {
        if (blen.toLong * 8 > r.bitsLeft) return None
        r.pos += blen * 8
      }
    }
    val info = si.getOrElse(return None)
    var sumAbs = 0L
    var nTotal = 0L
    var nPerChannel = 0L
    while (r.bitsLeft >= 8) {
      val (blockSamples, frameSum, frameN) =
        decodeFrame(r, b, info, consumer, nPerChannel)
          .getOrElse(return None)
      nPerChannel += blockSamples
      sumAbs += frameSum
      nTotal += frameN
      if (nTotal > MaxDecodeSamples) return None
    }
    if (nTotal == 0) return None
    Some((info.channels.toLong, info.sampleRate.toLong, nPerChannel,
      Math.floorDiv(sumAbs, nTotal)))
  }

  /** One frame: returns (block size, sum |amplitude|, samples in frame).
    * `consumer` (nullable) sees the reconstructed channels after
    * decorrelation, with `basePos` = per-channel position of the
    * frame's first sample. */
  private def decodeFrame(r: BitReader, raw: Array[Byte],
      info: StreamInfo, consumer: BlockConsumer = null,
      basePos: Long = 0L): Option[(Long, Long, Long)] = {
    val frameStart = r.bytePos
    if (r.readInt(14) != 0x3ffe) return None // sync
    if (r.readBit() != 0) return None // reserved
    r.readBit() // blocking strategy
    val bsCode = r.readInt(4)
    val srCode = r.readInt(4)
    val chanAssign = r.readInt(4)
    val ssCode = r.readInt(3)
    if (r.readBit() != 0) return None // reserved
    readUtf8Number(r).getOrElse(return None)
    val blockSize = bsCode match {
      case 0 => return None // reserved
      case 1 => 192
      case n if n >= 2 && n <= 5 => 576 << (n - 2)
      case 6 => r.readInt(8) + 1
      case 7 => r.readInt(16) + 1
      case n => 256 << (n - 8)
    }
    srCode match { // rate comes from STREAMINFO; consume inline forms
      case 12 => r.readInt(8)
      case 13 | 14 => r.readInt(16)
      case 15 => return None // invalid
      case _ => ()
    }
    val bps = ssCode match {
      case 0 => info.bps
      case 1 => 8
      case 2 => 12
      case 3 => return None // reserved
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
    }
    if (blockSize <= 0 || blockSize > 65535) return None
    val nChans = if (chanAssign < 8) chanAssign + 1
      else if (chanAssign <= 10) 2
      else return None
    if (nChans != info.channels) return None
    // CRC-8 covers the whole byte-aligned header before this byte
    val headerCrc = r.readInt(8)
    if (crc8(raw, frameStart, r.bytePos - 1) != headerCrc) return None

    val chans = new Array[Array[Long]](nChans)
    var c = 0
    while (c < nChans) {
      // side channels carry one extra bit (they hold a difference)
      val extra = chanAssign match {
        case 8 | 10 => if (c == 1) 1 else 0 // left/side, mid/side
        case 9 => if (c == 0) 1 else 0 // right/side
        case _ => 0
      }
      chans(c) = decodeSubframe(r, blockSize, bps + extra)
        .getOrElse(return None)
      c += 1
    }
    r.alignByte()
    val footerCrc = r.readInt(16)
    if (crc16(raw, frameStart, r.bytePos - 2) != footerCrc) return None

    // undo inter-channel decorrelation
    chanAssign match {
      case 8 => // left/side: right = left - side
        var i = 0
        while (i < blockSize) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
      case 9 => // right/side: ch0 is side, ch1 is right; left = right + side
        var i = 0
        while (i < blockSize) { chans(0)(i) = chans(1)(i) + chans(0)(i); i += 1 }
      case 10 => // mid/side
        var i = 0
        while (i < blockSize) {
          val s = chans(1)(i)
          val m2 = (chans(0)(i) << 1) | (s & 1)
          chans(0)(i) = (m2 + s) >> 1
          chans(1)(i) = (m2 - s) >> 1
          i += 1
        }
      case _ => ()
    }
    if (consumer != null) consumer(chans, blockSize, basePos)
    var sum = 0L
    c = 0
    while (c < nChans) {
      var i = 0
      while (i < blockSize) { sum += math.abs(chans(c)(i)); i += 1 }
      c += 1
    }
    Some((blockSize.toLong, sum, blockSize.toLong * nChans))
  }

  /** UTF-8-style coded frame/sample number (up to 36 bits / 7 bytes). */
  private def readUtf8Number(r: BitReader): Option[Long] = {
    val b0 = r.readInt(8)
    if ((b0 & 0x80) == 0) return Some(b0.toLong)
    var nCont = 0
    var mask = 0x40
    while ((b0 & mask) != 0 && nCont < 7 ) { nCont += 1; mask >>= 1 }
    if (nCont < 1 || nCont > 6) return None
    var v = (b0 & (mask - 1)).toLong
    var i = 0
    while (i < nCont) {
      val bc = r.readInt(8)
      if ((bc & 0xc0) != 0x80) return None
      v = (v << 6) | (bc & 0x3f)
      i += 1
    }
    Some(v)
  }

  private def decodeSubframe(r: BitReader, blockSize: Int,
      bps: Int): Option[Array[Long]] = {
    if (r.readBit() != 0) return None // pad bit
    val ty = r.readInt(6)
    var wasted = 0
    if (r.readBit() == 1) wasted = r.readUnary() + 1
    val ebps = bps - wasted
    if (ebps <= 0 || ebps > 33) return None
    val out: Array[Long] =
      if (ty == 0) { // CONSTANT
        val v = r.readSigned(ebps)
        Array.fill(blockSize)(v)
      } else if (ty == 1) { // VERBATIM
        val a = new Array[Long](blockSize)
        var i = 0
        while (i < blockSize) { a(i) = r.readSigned(ebps); i += 1 }
        a
      } else if ((ty & 0x38) == 0x08) { // FIXED, 001xxx
        val order = ty & 0x07
        if (order > 4 || order > blockSize) return None
        val a = new Array[Long](blockSize)
        var i = 0
        while (i < order) { a(i) = r.readSigned(ebps); i += 1 }
        decodeResidual(r, blockSize, order, a).getOrElse(return None)
        i = order
        while (i < blockSize) {
          val p = order match {
            case 0 => 0L
            case 1 => a(i - 1)
            case 2 => 2 * a(i - 1) - a(i - 2)
            case 3 => 3 * a(i - 1) - 3 * a(i - 2) + a(i - 3)
            case 4 => 4 * a(i - 1) - 6 * a(i - 2) + 4 * a(i - 3) - a(i - 4)
          }
          a(i) += p
          i += 1
        }
        a
      } else if ((ty & 0x20) == 0x20) { // LPC, 1xxxxx
        val order = (ty & 0x1f) + 1
        if (order > blockSize) return None
        val a = new Array[Long](blockSize)
        var i = 0
        while (i < order) { a(i) = r.readSigned(ebps); i += 1 }
        val precM1 = r.readInt(4)
        if (precM1 == 15) return None // invalid
        val prec = precM1 + 1
        val shift = r.readSigned(5).toInt
        if (shift < 0) return None
        val coefs = new Array[Long](order)
        i = 0
        while (i < order) { coefs(i) = r.readSigned(prec); i += 1 }
        decodeResidual(r, blockSize, order, a).getOrElse(return None)
        i = order
        while (i < blockSize) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j) * a(i - 1 - j); j += 1 }
          a(i) += (acc >> shift)
          i += 1
        }
        a
      } else return None // reserved type
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) <<= wasted; i += 1 }
    }
    Some(out)
  }

  /** Rice-coded residual partitions, written into a(order..blockSize). */
  private def decodeResidual(r: BitReader, blockSize: Int, order: Int,
      a: Array[Long]): Option[Unit] = {
    val method = r.readInt(2)
    if (method > 1) return None
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val po = r.readInt(4)
    val nPart = 1 << po
    if ((blockSize >> po) << po != blockSize) return None
    var idx = order
    var part = 0
    while (part < nPart) {
      val count = (blockSize >> po) - (if (part == 0) order else 0)
      if (count < 0) return None
      val param = r.readInt(paramBits)
      if (param == escape) {
        val nBits = r.readInt(5)
        var i = 0
        while (i < count) { a(idx) = r.readSigned(nBits); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.readUnary().toLong
          val u = (q << param) | r.readLong(param)
          a(idx) = (u >>> 1) ^ -(u & 1L) // zigzag
          idx += 1
          i += 1
        }
      }
      part += 1
    }
    Some(())
  }
}
