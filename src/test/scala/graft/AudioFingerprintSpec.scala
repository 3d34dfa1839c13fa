package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** Audio envelope fingerprint: container invariance (the same PCM as
  * WAV and FLAC hashes identically — byte-level dedup sees two
  * unrelated files), lossy-transcode locality (G.711 keeps the
  * loudness contour), and the banded pair join. The FLAC side uses an
  * in-test VERBATIM-subframe encoder whose CRCs come from the
  * decoder's public crc8/crc16 — the decoder must accept its own
  * spec-conformant stream. */
class AudioFingerprintSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nb = 0
    def writeBit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1); nb += 1
      if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 }
    }
    def write(v: Long, n: Int): Unit =
      (n - 1 to 0 by -1).foreach(i => writeBit(((v >> i) & 1L).toInt))
    def alignByte(): Unit = while (nb != 0) writeBit(0)
    def bytes: Array[Byte] = { require(nb == 0); buf.toArray }
  }

  private val Rate = 8000
  private val Bps = 16
  private val Block = 256

  /** Mono FLAC, one VERBATIM frame per block (blocksize code 8 = 256). */
  private def flacMono256(samples: Array[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    val h = new BitWriter
    h.write(1, 1); h.write(0, 7); h.write(34, 24)
    h.write(Block, 16); h.write(Block, 16)
    h.write(0, 24); h.write(0, 24)
    h.write(Rate, 20); h.write(0, 3)
    h.write(Bps - 1, 5); h.write(0, 36)
    h.write(0, 64); h.write(0, 64)
    out.write(h.bytes)
    samples.grouped(Block).zipWithIndex.foreach { case (blk0, no) =>
      val blk = blk0.padTo(Block, 0)
      val w = new BitWriter
      w.write(0x3ffe, 14); w.write(0, 1); w.write(0, 1)
      w.write(8, 4) // blocksize code 8 = 256
      w.write(0, 4) // sample rate from STREAMINFO
      w.write(0, 4) // channel assignment: 1 channel
      w.write(0, 3); w.write(0, 1) // bps from STREAMINFO, reserved
      require(no < 128)
      w.write(no, 8) // UTF8 frame number, single byte
      w.alignByte()
      val headerBytes = w.bytes
      val crc8 = FlacCodec.crc8(headerBytes, 0, headerBytes.length)
      val f = new BitWriter
      headerBytes.foreach(b => f.write(b & 0xffL, 8))
      f.write(crc8, 8)
      f.write(0, 1); f.write(1, 6); f.write(0, 1) // VERBATIM subframe
      blk.foreach(s => f.write(s.toLong & 0xffffL, Bps))
      f.alignByte()
      val frameBytes = f.bytes
      val crc16 = FlacCodec.crc16(frameBytes, 0, frameBytes.length)
      val g = new BitWriter
      frameBytes.foreach(b => g.write(b & 0xffL, 8))
      g.write(crc16, 16)
      out.write(g.bytes)
    }
    out.toByteArray
  }

  private def le(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray

  private def wavBytes(fmtTag: Int, chans: Int, bits: Int,
      data: Array[Byte]): Array[Byte] = {
    val blockAlign = math.max(1, chans * bits / 8)
    "RIFF".getBytes("US-ASCII") ++ le(36L + data.length, 4) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le(16L, 4) ++
      le(fmtTag.toLong, 2) ++ le(chans.toLong, 2) ++ le(Rate.toLong, 4) ++
      le(Rate.toLong * blockAlign, 4) ++ le(blockAlign.toLong, 2) ++
      le(bits.toLong, 2) ++
      "data".getBytes("US-ASCII") ++ le(data.length.toLong, 4) ++ data
  }

  private def wav16Mono(samples: Array[Int]): Array[Byte] =
    wavBytes(1, 1, 16, samples.flatMap(s => le(s.toLong & 0xffffL, 2)))

  /** Brute-force µ-law compressor: the nearest codeword under the
    * decoder's own expansion — uses only the decoder, so the pair is
    * exact by construction. */
  private def ulawEncode(x: Int): Byte =
    (0 to 255).minBy(c => math.abs(Multimodal.ulawToLinear(c.toByte) - x))
      .toByte

  // amplitude-stepped test signal: strong, unambiguous envelope shape
  private def signal(n: Int): Array[Int] =
    Array.tabulate(n) { i =>
      val carrier = ((i * 37) % 4001) - 2000
      val gain = Array(1, 3, 0, 2, 4)((i / 256) % 5)
      carrier * gain / 4
    }

  test("same PCM as WAV and FLAC fingerprints identically") {
    import spark.implicits._
    val pcm = signal(2048)
    val media = Seq(
      Multimodal.MediaRow(1L, "wav", wav16Mono(pcm)),
      Multimodal.MediaRow(2L, "flac", flacMono256(pcm))).toDS()
    val rows = Multimodal.audioFingerprint(media, chunkSize = 16)
      .collect().map(a => a.media_id -> a).toMap
    assert(rows(1L).decoded && rows(2L).decoded)
    assert(rows(1L).ahash == rows(2L).ahash,
      "lossless containers of one recording must hash identically")
  }

  test("lossy G.711 transcode stays within a small hamming distance") {
    import spark.implicits._
    val pcm = signal(2048)
    val mu = wavBytes(7, 1, 8, pcm.map(ulawEncode))
    val media = Seq(
      Multimodal.MediaRow(1L, "wav", wav16Mono(pcm)),
      Multimodal.MediaRow(2L, "wav", mu)).toDS()
    val rows = Multimodal.audioFingerprint(media, chunkSize = 16)
      .collect().map(a => a.media_id -> a).toMap
    assert(rows.values.forall(_.decoded))
    val ham = java.lang.Long.bitCount(rows(1L).ahash ^ rows(2L).ahash)
    assert(ham <= 6, s"u-law transcode drifted hamming $ham")
  }

  test("near-dup pairs: transcodes pair up, different recordings do not, stubs excluded") {
    import spark.implicits._
    val a = signal(2048)
    val b = Array.tabulate(2048)(i => signal(2048)(2047 - i)) // reversed
    val media = Seq(
      Multimodal.MediaRow(1L, "wav", wav16Mono(a)),
      Multimodal.MediaRow(2L, "flac", flacMono256(a)),
      Multimodal.MediaRow(3L, "wav", wav16Mono(b)),
      Multimodal.MediaRow(4L, "mp3", Array[Byte](1, 2, 3))).toDS()
    val hashes = Multimodal.audioFingerprint(media, chunkSize = 16).toDF()
    val pairs = Multimodal.audioNearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 2L)) == 0L)
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
    // reversal: a genuinely different recording — allow banding to
    // surface it as a candidate but never inside the hamming gate
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("too-short clips and junk degrade to flagged stubs") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "wav", wav16Mono(signal(256))), // 16 chunks < 65
      Multimodal.MediaRow(2L, "flac", Array[Byte]('f', 'L', 'a', 'C', 0)),
      Multimodal.MediaRow(3L, "wav", Array[Byte](1, 2, 3))).toDS()
    val rows = Multimodal.audioFingerprint(media, chunkSize = 16).collect()
    assert(rows.length == 3 && rows.forall(!_.decoded))
  }
}
