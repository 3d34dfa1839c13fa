package graft.operators

/** Pure-JVM ISO Base Media File Format (MP4/M4A/MOV) box walker
  * (public format: ISO/IEC 14496-12; no reference-repo analog — the
  * reference pipeline has no video code). Parses the container's box
  * tree and extracts EXACT structural metadata — movie duration,
  * track count, video frame dimensions, audio channel count / sample
  * rate / per-channel sample count — without touching a codec: every
  * field comes from `moov` child boxes (`mvhd`, `tkhd`, `mdhd`,
  * `hdlr`, `stsd`), which the spec defines byte-exactly.
  *
  * SCOPE — metadata only, and honestly so: the sample payloads are
  * H.264/AAC/etc. bitstreams whose decode needs full codec
  * implementations; [[Multimodal.decodeMedia]] reports mp4 payloads
  * with REAL dimensions/channels/rate/sample counts but keeps
  * `decoded=false` (content statistics stay stub-derived), the same
  * contract as the MP3 frame walk.
  *
  * The input is UNTRUSTED: box sizes are bounds-checked (a hostile
  * 32-bit size that wraps negative, a largesize past the buffer, or a
  * child overrunning its parent all terminate the walk instead of
  * looping or throwing), recursion is limited to the fixed `moov`
  * paths, and every loop strictly advances.
  */
object Mp4Codec {

  /** Exact structural metadata from the box tree. All counts are from
    * header fields, nothing is estimated:
    *  - durationMs: movie duration, `mvhd.duration * 1000 /
    *    mvhd.timescale` (integer floor);
    *  - width/height: first video track's `tkhd` 16.16 fixed-point
    *    presentation size, integer part;
    *  - channels/sampleRate: first audio track's `stsd` sample-entry
    *    fields (rate is the 16.16 integer part);
    *  - nSamples: first audio track's `mdhd.duration`, which counts
    *    media-timescale units — for audio tracks the timescale is the
    *    sample rate, so this is the per-channel PCM sample count. */
  final case class Mp4Info(nTracks: Long, durationMs: Long,
      width: Long, height: Long, channels: Long, sampleRate: Long,
      nSamples: Long)

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  /** One box: (type, payload start, payload end). None = malformed at
    * `off` (or truncated); the walker stops there. */
  private def boxAt(b: Array[Byte], off: Int, limit: Int)
      : Option[(String, Int, Int)] = {
    if (off + 8 > limit) return None
    val size32 = be32(b, off)
    val typ = new String(b, off + 4, 4, "US-ASCII")
    // size 1 => 64-bit largesize follows; size 0 => box runs to limit
    val (payloadStart, end) =
      if (size32 == 1L) {
        if (off + 16 > limit) return None
        val sz = be64(b, off + 8)
        if (sz < 16 || sz > limit - off) return None
        (off + 16, off + sz.toInt)
      } else if (size32 == 0L) (off + 8, limit)
      else {
        if (size32 < 8 || size32 > limit - off) return None
        (off + 8, off + size32.toInt)
      }
    Some((typ, payloadStart, end))
  }

  /** Children of a container box payload, in order. */
  private def children(b: Array[Byte], start: Int, end: Int)
      : Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var pos = start
    var ok = true
    while (ok && pos + 8 <= end) {
      boxAt(b, pos, end) match {
        case Some(box @ (_, _, boxEnd)) if boxEnd > pos =>
          out += box; pos = boxEnd
        case _ => ok = false // malformed child: keep what parsed so far
      }
    }
    out.result()
  }

  private def find(boxes: Seq[(String, Int, Int)], typ: String)
      : Option[(Int, Int)] =
    boxes.collectFirst { case (t, s, e) if t == typ => (s, e) }

  /** mvhd: (timescale, duration) — version 0 (32-bit) or 1 (64-bit). */
  private def parseMvhd(b: Array[Byte], s: Int, e: Int): Option[(Long, Long)] = {
    if (s + 4 > e) return None
    val version = b(s) & 0xff
    if (version == 1) {
      if (s + 28 > e) return None
      Some((be32(b, s + 20), be64(b, s + 24)))
    } else {
      if (s + 20 > e) return None
      Some((be32(b, s + 12), be32(b, s + 16)))
    }
  }

  /** tkhd: (width, height) — 16.16 fixed point at the tail of the box. */
  private def parseTkhd(b: Array[Byte], s: Int, e: Int): Option[(Long, Long)] = {
    if (s + 4 > e) return None
    val version = b(s) & 0xff
    val off = if (version == 1) s + 88 else s + 76
    if (off + 8 > e) return None
    Some((be32(b, off) >> 16, be32(b, off + 4) >> 16))
  }

  /** mdhd: (timescale, duration) — same versioning as mvhd. */
  private def parseMdhd(b: Array[Byte], s: Int, e: Int): Option[(Long, Long)] = {
    if (s + 4 > e) return None
    val version = b(s) & 0xff
    if (version == 1) {
      if (s + 28 > e) return None
      Some((be32(b, s + 20), be64(b, s + 24)))
    } else {
      if (s + 20 > e) return None
      Some((be32(b, s + 12), be32(b, s + 16)))
    }
  }

  /** hdlr handler type ("vide" / "soun" / ...). */
  private def parseHdlr(b: Array[Byte], s: Int, e: Int): Option[String] = {
    if (s + 12 > e) return None
    Some(new String(b, s + 8, 4, "US-ASCII"))
  }

  /** Audio stsd sample entry: (channels, sampleRate). Entry layout
    * (ISO 14496-12 AudioSampleEntry): 4 fullbox header + 4
    * entry_count, then the first SampleEntry — 8 (size+format) + 6
    * reserved + 2 data_ref_index + 8 reserved + 2 channelcount + 2
    * samplesize + 2 pre_defined + 2 reserved + 4 samplerate (16.16),
    * so channelcount sits at entry+24 and samplerate at entry+32. */
  private def parseStsdAudio(b: Array[Byte], s: Int, e: Int)
      : Option[(Long, Long)] = {
    if (s + 8 > e) return None
    val entryStart = s + 8
    if (entryStart + 36 > e) return None
    val channels = be16(b, entryStart + 24)
    val rate = be32(b, entryStart + 32) >> 16
    Some((channels.toLong, rate))
  }

  /** Walk the box tree. None when there is no parsable `moov` with an
    * `mvhd` (the minimum for any ISO-BMFF file worth reporting). */
  def parse(b: Array[Byte]): Option[Mp4Info] = {
    val top = children(b, 0, b.length)
    // sanity: a real ISO-BMFF file leads with ftyp (or styp for
    // segments); random bytes that happen to parse as boxes do not
    if (!top.headOption.exists(t => t._1 == "ftyp" || t._1 == "styp"))
      return None
    val (moovS, moovE) = find(top, "moov").getOrElse(return None)
    val moov = children(b, moovS, moovE)
    val (timescale, duration) = find(moov, "mvhd")
      .flatMap { case (s, e) => parseMvhd(b, s, e) }
      .getOrElse(return None)
    // hostile 64-bit duration: negative after the long read, or big
    // enough to overflow the *1000 — reject rather than report garbage
    if (timescale <= 0 || duration < 0 ||
      duration > Long.MaxValue / 1000L) return None
    val traks = moov.filter(_._1 == "trak")
    var width = 0L; var height = 0L
    var channels = 0L; var rate = 0L; var nSamples = 0L
    traks.foreach { case (_, ts, te) =>
      val trak = children(b, ts, te)
      val mdia = find(trak, "mdia").map { case (s, e) => children(b, s, e) }
        .getOrElse(Seq.empty)
      val handler = find(mdia, "hdlr")
        .flatMap { case (s, e) => parseHdlr(b, s, e) }
      handler match {
        case Some("vide") if width == 0L =>
          find(trak, "tkhd").flatMap { case (s, e) => parseTkhd(b, s, e) }
            .foreach { case (w, h) => width = w; height = h }
        case Some("soun") if channels == 0L =>
          val minf = find(mdia, "minf").map { case (s, e) => children(b, s, e) }
            .getOrElse(Seq.empty)
          val stbl = find(minf, "stbl").map { case (s, e) => children(b, s, e) }
            .getOrElse(Seq.empty)
          find(stbl, "stsd").flatMap { case (s, e) => parseStsdAudio(b, s, e) }
            .foreach { case (c, r) => channels = c; rate = r }
          find(mdia, "mdhd").flatMap { case (s, e) => parseMdhd(b, s, e) }
            .foreach { case (_, d) => nSamples = math.max(0L, d) }
        case _ => ()
      }
    }
    Some(Mp4Info(traks.length.toLong,
      duration * 1000L / timescale, width, height, channels, rate, nSamples))
  }
}
