package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{FlacCodec, Multimodal}

/** Round-trip proof for the pure-JVM FLAC decoder: a minimal in-test
  * FLAC *encoder* (independent of the decoder: its own bit writer,
  * its own CRC tables via the decoder's verified-against-spec
  * functions) produces real spec-conformant streams exercising every
  * subframe type (CONSTANT / VERBATIM / FIXED / LPC), wasted bits,
  * rice partitions, and all four channel assignments; the decoder
  * must reproduce the exact PCM statistics computed directly from
  * the source samples. Hostile-input cases pin the degradation
  * contract: CRC flips, truncation, reserved codes and sample-budget
  * bombs reject (stub path) instead of throwing or looping. */
class FlacSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // ---- minimal spec-conformant encoder (test-side only) ----

  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nb = 0
    def writeBit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1)
      nb += 1
      if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 }
    }
    def write(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    def writeSigned(v: Long, n: Int): Unit = write(v & ((1L << n) - 1), n)
    def alignByte(): Unit = while (nb != 0) writeBit(0)
    def bytes: Array[Byte] = { require(nb == 0); buf.toArray }
  }

  private val BlockSize = 192 // blocksize code 0b0001, no inline field
  private val Rate = 8000
  private val Bps = 16

  private def streamHeader(channels: Int): BitWriter = {
    val w = new BitWriter
    "fLaC".foreach(c => w.write(c.toLong, 8))
    w.write(1, 1); w.write(0, 7); w.write(34, 24) // last, STREAMINFO, len
    w.write(BlockSize, 16); w.write(BlockSize, 16)
    w.write(0, 24); w.write(0, 24) // min/max frame size unknown
    w.write(Rate, 20); w.write(channels - 1, 3); w.write(Bps - 1, 5)
    w.write(0, 36) // total samples unknown — decoder counts
    (0 until 16).foreach(_ => w.write(0, 8)) // md5 unset
    w
  }

  private def riceParam(res: Seq[Long]): Int = {
    val maxU = res.map(v => ((v << 1) ^ (v >> 63)).max(0)).foldLeft(0L)(math.max)
    math.min(64 - java.lang.Long.numberOfLeadingZeros(maxU), 14)
  }

  private def writeResidual(w: BitWriter, res: Seq[Long]): Unit = {
    val p = riceParam(res)
    w.write(0, 2) // 4-bit rice method
    w.write(0, 4) // partition order 0
    w.write(p, 4)
    res.foreach { v =>
      val u = (v << 1) ^ (v >> 63)
      val q = (u >>> p).toInt
      (0 until q).foreach(_ => w.writeBit(0))
      w.writeBit(1)
      w.write(u & ((1L << p) - 1), p)
    }
  }

  private def subConstant(w: BitWriter, v: Long, bps: Int): Unit = {
    w.write(0, 1); w.write(0, 6); w.write(0, 1)
    w.writeSigned(v, bps)
  }

  private def subVerbatim(w: BitWriter, a: Seq[Long], bps: Int): Unit = {
    w.write(0, 1); w.write(1, 6); w.write(0, 1)
    a.foreach(writeS => w.writeSigned(writeS, bps))
  }

  /** FIXED order-k subframe; optionally stores samples >> wasted with
    * the wasted-bits flag so the decoder's shift path is exercised. */
  private def subFixed(w: BitWriter, a0: Seq[Long], order: Int, bps: Int,
      wasted: Int = 0): Unit = {
    val a = a0.map(_ >> wasted)
    w.write(0, 1); w.write(8 | order, 6)
    if (wasted == 0) w.write(0, 1)
    else { w.write(1, 1); (0 until wasted - 1).foreach(_ => w.writeBit(0)); w.writeBit(1) }
    val ebps = bps - wasted
    (0 until order).foreach(i => w.writeSigned(a(i), ebps))
    val res = (order until a.length).map { i =>
      val p = order match {
        case 0 => 0L
        case 1 => a(i - 1)
        case 2 => 2 * a(i - 1) - a(i - 2)
        case 3 => 3 * a(i - 1) - 3 * a(i - 2) + a(i - 3)
        case 4 => 4 * a(i - 1) - 6 * a(i - 2) + 4 * a(i - 3) - a(i - 4)
      }
      a(i) - p
    }
    writeResidual(w, res)
  }

  private def subLpc(w: BitWriter, a: Seq[Long], coefs: Seq[Long],
      shift: Int, prec: Int, bps: Int): Unit = {
    val order = coefs.length
    w.write(0, 1); w.write(0x20 | (order - 1), 6); w.write(0, 1)
    (0 until order).foreach(i => w.writeSigned(a(i), bps))
    w.write(prec - 1, 4)
    w.writeSigned(shift, 5)
    coefs.foreach(c => w.writeSigned(c, prec))
    val res = (order until a.length).map { i =>
      val acc = (0 until order).map(j => coefs(j) * a(i - 1 - j)).sum
      a(i) - (acc >> shift)
    }
    writeResidual(w, res)
  }

  /** One frame; `sub` writes the per-channel subframes into the given
    * writer (channel bps already adjusted for side channels). */
  private def frame(frameNo: Int, chanAssign: Int, nChans: Int)(
      sub: BitWriter => Unit): Array[Byte] = {
    val w = new BitWriter
    w.write(0x3ffe, 14); w.write(0, 1); w.write(0, 1)
    w.write(1, 4) // blocksize code: 192
    w.write(0, 4) // sample rate: streaminfo
    w.write(chanAssign, 4)
    w.write(0, 3) // sample size: streaminfo
    w.write(0, 1)
    w.write(frameNo & 0x7f, 8) // utf8 number, single byte
    val headerBytes = w.bytes // 14+1+1+4+4+4+3+1 = 32 bits + 8 = 5 bytes
    val w2 = new BitWriter
    headerBytes.foreach(b => w2.write(b & 0xffL, 8))
    w2.write(FlacCodec.crc8(headerBytes, 0, headerBytes.length), 8)
    sub(w2)
    w2.alignByte()
    val body = w2.bytes
    val w3 = new BitWriter
    body.foreach(b => w3.write(b & 0xffL, 8))
    w3.write(FlacCodec.crc16(body, 0, body.length), 16)
    w3.bytes
  }

  // deterministic integer PCM (no float nondeterminism)
  private def ch0(i: Int): Long = ((i * 37) % 4001) - 2000
  private def ch1(i: Int): Long = (i * i) % 977 - 488

  /** Stereo stream: six frames exercising every subframe type and
    * every channel assignment. Returns (bytes, left PCM, right PCM). */
  private def stereoFixture: (Array[Byte], Seq[Long], Seq[Long]) = {
    val n = BlockSize
    def blk(f: Int, g: Int => Long): Seq[Long] =
      (0 until n).map(i => g(f * n + i))
    val left = (0 until 6).flatMap(f => blk(f, ch0))
    val right = Seq(
      blk(0, _ => -5L), // frame 0: constant right channel
      blk(1, ch1), blk(2, i => (ch1(i) >> 1) << 1), // frame 2: all even
      blk(3, ch1), blk(4, ch1), blk(5, ch1)).flatten
    def l(f: Int) = left.slice(f * n, (f + 1) * n)
    def r(f: Int) = right.slice(f * n, (f + 1) * n)
    val frames = Seq(
      // independent: verbatim + constant
      frame(0, 1, 2) { w => subVerbatim(w, l(0), Bps); subConstant(w, -5L, Bps) },
      // independent: fixed order 2 + fixed order 0 (pure rice)
      frame(1, 1, 2) { w => subFixed(w, l(1), 2, Bps); subFixed(w, r(1), 0, Bps) },
      // independent: LPC order 2 + fixed with one wasted bit
      frame(2, 1, 2) { w =>
        subLpc(w, l(2), Seq(2L, -1L), 1, 5, Bps)
        subFixed(w, r(2), 1, Bps, wasted = 1)
      },
      // left/side: ch1 = left - right at bps+1
      frame(3, 8, 2) { w =>
        subVerbatim(w, l(3), Bps)
        subFixed(w, l(3).zip(r(3)).map { case (a, b) => a - b }, 2, Bps + 1)
      },
      // right/side: ch0 = side, ch1 = right
      frame(4, 9, 2) { w =>
        subFixed(w, l(4).zip(r(4)).map { case (a, b) => a - b }, 1, Bps + 1)
        subVerbatim(w, r(4), Bps)
      },
      // mid/side: mid = (l+r)>>1, side = l-r
      frame(5, 10, 2) { w =>
        subVerbatim(w, l(5).zip(r(5)).map { case (a, b) => (a + b) >> 1 }, Bps)
        subFixed(w, l(5).zip(r(5)).map { case (a, b) => a - b }, 2, Bps + 1)
      })
    val all = streamHeader(2).bytes ++ frames.flatten
    (all, left, right)
  }

  test("FLAC round-trip: every subframe type and channel assignment " +
      "decodes to the exact source PCM statistics") {
    val (bytes, left, right) = stereoFixture
    val expSum = left.map(math.abs).sum + right.map(math.abs).sum
    val expN = left.length + right.length
    val got = FlacCodec.decode(bytes)
    assert(got.contains((2L, Rate.toLong, left.length.toLong,
      Math.floorDiv(expSum, expN))))
  }

  test("decodeMedia decodes FLAC payloads for real (decoded=true)") {
    import spark.implicits._
    val (bytes, left, right) = stereoFixture
    val out = Multimodal.decodeMedia(Seq(
      Multimodal.MediaRow(1L, "flac", bytes),
      Multimodal.MediaRow(2L, "flac", bytes.take(80)) // truncated: stub
    ).toDS()).collect().sortBy(_.media_id)
    assert(out(0).decoded)
    assert(out(0).channels == 2L && out(0).sample_rate == Rate.toLong)
    assert(out(0).n_samples == left.length.toLong)
    val expSum = left.map(math.abs).sum + right.map(math.abs).sum
    assert(out(0).mean_value ==
      Math.floorDiv(expSum, (left.length + right.length).toLong))
    assert(!out(1).decoded)
  }

  test("hostile FLAC degrades: CRC flip, reserved codes, garbage") {
    val (bytes, _, _) = stereoFixture
    // flip one bit in the last frame's payload — CRC-16 must reject
    val flipped = bytes.clone()
    flipped(flipped.length - 40) = (flipped(flipped.length - 40) ^ 0x10).toByte
    assert(FlacCodec.decode(flipped).isEmpty)
    // header CRC-8 flip
    val hdrFlip = bytes.clone()
    val firstFrame = streamHeader(2).bytes.length
    hdrFlip(firstFrame + 5) = (hdrFlip(firstFrame + 5) ^ 0x01).toByte
    assert(FlacCodec.decode(hdrFlip).isEmpty)
    // not FLAC at all / empty
    assert(FlacCodec.decode("fLaCxxxx".getBytes("US-ASCII")).isEmpty)
    assert(FlacCodec.decode(Array.emptyByteArray).isEmpty)
    // truncated mid-frame
    assert(FlacCodec.decode(bytes.dropRight(7)).isEmpty)
  }

  test("sample-budget bomb: a tiny stream declaring billions of " +
      "samples rejects instead of looping") {
    // mono constant frames of 65535 samples each: ~25 bytes per frame
    // yields 65535 decoded samples; enough frames overflow the budget
    val w = new BitWriter
    "fLaC".foreach(c => w.write(c.toLong, 8))
    w.write(1, 1); w.write(0, 7); w.write(34, 24)
    w.write(65535, 16); w.write(65535, 16)
    w.write(0, 24); w.write(0, 24)
    w.write(Rate, 20); w.write(0, 3); w.write(Bps - 1, 5)
    w.write(0, 36)
    (0 until 16).foreach(_ => w.write(0, 8))
    val header = w.bytes
    def constFrame(no: Int): Array[Byte] = {
      val fw = new BitWriter
      fw.write(0x3ffe, 14); fw.write(0, 1); fw.write(0, 1)
      fw.write(7, 4) // 16-bit blocksize-1 follows
      fw.write(0, 4); fw.write(0, 4); fw.write(0, 3); fw.write(0, 1)
      fw.write(no & 0x7f, 8)
      fw.write(65534, 16)
      val hb = fw.bytes
      val fw2 = new BitWriter
      hb.foreach(b => fw2.write(b & 0xffL, 8))
      fw2.write(FlacCodec.crc8(hb, 0, hb.length), 8)
      subConstant(fw2, 123L, Bps)
      fw2.alignByte()
      val body = fw2.bytes
      val fw3 = new BitWriter
      body.foreach(b => fw3.write(b & 0xffL, 8))
      fw3.write(FlacCodec.crc16(body, 0, body.length), 16)
      fw3.bytes
    }
    val nFrames = (FlacCodec.MaxDecodeSamples / 65535L).toInt + 2
    val bomb = header ++ (0 until nFrames).flatMap(constFrame)
    // ~26 KB of input declaring > 64M samples: must reject, fast
    val t0 = System.nanoTime()
    assert(FlacCodec.decode(bomb).isEmpty)
    assert((System.nanoTime() - t0) < 30L * 1000 * 1000 * 1000)
  }
}
