package graft.operators

/** Pure-JVM Ogg container page walker with Opus / Vorbis stream
  * identification (public formats: RFC 3533 Ogg framing, RFC 7845
  * Ogg-Opus mapping, Vorbis I spec; no reference-repo analog). Walks
  * every page of the payload's FIRST logical bitstream, verifies each
  * page's CRC, reads the codec identification packet off the BOS page,
  * and computes EXACT stream metadata:
  *
  *  - Opus: channel count and pre-skip from `OpusHead`; granule
  *    positions count 48 kHz PCM samples, so per-channel samples =
  *    last page granule − pre-skip (RFC 7845 §4.2); rate reported is
  *    the fixed 48 kHz decode rate.
  *  - Vorbis: channels and rate from the `\x01vorbis` id header;
  *    granule counts samples at the stream rate, so samples = last
  *    granule.
  *
  * The page CRC is the spec's CRC-32 (polynomial 0x04c11db7, no
  * reflection, zero init/xorout) computed with the crc field zeroed —
  * derived from the polynomial at class init, no literal table to get
  * wrong. A page whose CRC mismatches ends the walk (truncated /
  * corrupted tail tolerated up to that point); a payload with no valid
  * BOS page returns None.
  *
  * SCOPE — metadata only: the packet payloads are Opus/Vorbis
  * bitstreams (CELT/SILK, MDCT) whose decode is out of scope;
  * [[Multimodal.decodeMedia]] reports ogg payloads with REAL
  * channels/rate/sample counts but `decoded=false` content stats,
  * the same honest contract as the MP3/MP4 walks.
  *
  * The input is UNTRUSTED: all segment-table arithmetic is
  * bounds-checked, the walk strictly advances (a page is ≥ 27 bytes),
  * and multiplexed streams simply ignore pages of other serials.
  */
object OggCodec {

  /** Ogg CRC-32 table, generated from the polynomial (RFC 3533
    * appendix: x^32+x^26+x^23+x^22+x^16+x^12+x^11+x^10+x^8+x^7+x^5+
    * x^4+x^2+x+1, MSB-first, no reflection). */
  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var j = 0
      while (j < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        j += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  private[operators] def crc32(b: Array[Byte], off: Int, len: Int,
      zeroFrom: Int = -1, zeroLen: Int = 0): Int = {
    var crc = 0
    var i = 0
    while (i < len) {
      val v =
        if (zeroFrom >= 0 && i >= zeroFrom && i < zeroFrom + zeroLen) 0
        else b(off + i) & 0xff
      crc = (crc << 8) ^ CrcTable(((crc >>> 24) ^ v) & 0xff)
      i += 1
    }
    crc
  }

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def le64(b: Array[Byte], o: Int): Long =
    le32(b, o) | (le32(b, o + 4) << 32)

  /** One parsed page. `bodyStart/bodyLen` delimit the concatenated
    * segment payload. */
  private final case class Page(headerType: Int, granule: Long,
      serial: Long, bodyStart: Int, bodyLen: Int, pageEnd: Int)

  /** Parse + CRC-verify the page at `off`. */
  private def pageAt(b: Array[Byte], off: Int): Option[Page] = {
    if (off + 27 > b.length) return None
    if (b(off) != 'O' || b(off + 1) != 'g' || b(off + 2) != 'g' ||
      b(off + 3) != 'S' || b(off + 4) != 0) return None
    val headerType = b(off + 5) & 0xff
    val granule = le64(b, off + 6)
    val serial = le32(b, off + 14)
    val crcStored = le32(b, off + 22)
    val nSegs = b(off + 26) & 0xff
    val headerLen = 27 + nSegs
    if (off + headerLen > b.length) return None
    var bodyLen = 0
    var i = 0
    while (i < nSegs) { bodyLen += b(off + 27 + i) & 0xff; i += 1 }
    val pageLen = headerLen + bodyLen
    if (off + pageLen > b.length) return None
    // CRC over the whole page with the 4 crc bytes zeroed
    val crc = crc32(b, off, pageLen, zeroFrom = 22, zeroLen = 4)
    if ((crc & 0xffffffffL) != crcStored) return None
    Some(Page(headerType, granule, serial, off + headerLen, bodyLen,
      off + pageLen))
  }

  /** (channels, rate, samplesPerChannel) for the first logical
    * bitstream, or None if no valid Opus/Vorbis BOS page leads it. */
  def parse(b: Array[Byte]): Option[(Long, Long, Long)] = {
    val bos = pageAt(b, 0).getOrElse(return None)
    if ((bos.headerType & 0x02) == 0) return None // first page must be BOS
    val body = bos
    def bodyHasAt(at: Int, prefix: String): Boolean =
      body.bodyLen >= at + prefix.length &&
        (0 until prefix.length).forall(i =>
          b(body.bodyStart + at + i) == prefix.charAt(i).toByte)
    val id: Option[(Long, Long, Long)] =
      if (bodyHasAt(0, "OpusHead") && body.bodyLen >= 19) {
        val channels = (b(body.bodyStart + 9) & 0xff).toLong
        val preSkip = le16(b, body.bodyStart + 10).toLong
        Some((channels, 48000L, preSkip))
      } else if (body.bodyLen >= 30 && b(body.bodyStart) == 1 &&
        bodyHasAt(1, "vorbis")) {
        // id packet: [0]=0x01 [1..6]="vorbis" [7..10]=version
        // [11]=channels [12..15]=rate (LE)
        val channels = (b(body.bodyStart + 11) & 0xff).toLong
        val rate = le32(b, body.bodyStart + 12)
        if (rate <= 0) return None
        Some((channels, rate, 0L))
      } else None
    val (channels, rate, preSkip) = id.getOrElse(return None)
    if (channels <= 0) return None
    // walk this serial's pages; the stream's last valid page carries
    // the final granule position (-1 granules mark header/partial
    // pages and are skipped per RFC 3533)
    var lastGranule = 0L
    var pos = body.pageEnd
    var cur = pageAt(b, pos)
    while (cur.isDefined) {
      val p = cur.get
      if (p.serial == bos.serial && p.granule >= 0) lastGranule = p.granule
      pos = p.pageEnd
      cur = pageAt(b, pos)
    }
    Some((channels, rate, math.max(0L, lastGranule - preSkip)))
  }
}
