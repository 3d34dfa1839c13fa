package graft.util

import java.time.{Instant, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import scala.util.Try

/** String / geo / time scalar utilities (SURVEY.md §2.7).
  * Pure functions; the Column equivalents live in graft.functions.
  */
object StringDistance {

  /** Classic two-row Levenshtein DP (ref s/StringDistance.java:40-63). */
  def levenshtein(a: String, b: String): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    var prev = Array.tabulate(b.length + 1)(identity)
    var cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      var j = 1
      while (j <= b.length) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(b.length)
  }

  /** distance / max(len) — 0.0 for two empty strings
    * (ref s/StringDistance.java:23-31). */
  def ratio(a: String, b: String): Double = {
    val m = math.max(a.length, b.length)
    if (m == 0) 0.0 else levenshtein(a, b).toDouble / m
  }
}

object GeoUtil {
  /** Earth radius the reference uses (ref s/GeoUtil.java:35-50 — R=6378,
    * not the 6371 mean; kept for result parity). */
  val EarthRadiusKm = 6378.0

  /** Great-circle distance between two lat/lon points, km. */
  def haversineKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * EarthRadiusKm * math.asin(math.sqrt(a))
  }
}

object MiscUtil {

  /** Strip a plus-extension from the local part:
    * "user+tag@host" → "user@host" (ref MiscUtil.normalizeEmailPlus:
    * 31-50 — splice from the FIRST '+' to the first '@' after it;
    * unchanged when the '+' leads the string, no '@' follows it, or
    * that '@' ends the string). */
  def normalizeEmailPlus(email: String): String = {
    val p = email.indexOf('+')
    if (p <= 0) return email // absent or leading '+'
    val q = email.indexOf('@', p)
    if (q == -1 || q == email.length - 1) return email
    email.substring(0, p) + email.substring(q)
  }

  /** Plus-strip and remove dots from the local part (gmail-style):
    * "u.s.e.r+t@host" → "user@host"; a local part that strips to
    * nothing keeps the plus-normalized form (ref MiscUtil
    * .normalizeEmailPlusDotStrip:61-76). */
  def normalizeEmailPlusDotStrip(email: String): String = {
    val e = normalizeEmailPlus(email)
    e.indexOf('@') match {
      case -1 => e
      case at =>
        val local = e.substring(0, at).replace(".", "")
        if (local.isEmpty) e else local + e.substring(at)
    }
  }

  def emailDomain(email: String): Option[String] = email.lastIndexOf('@') match {
    case -1 => None
    case at => Some(email.substring(at + 1))
  }
}

/** Timestamp extraction: ISO8601, syslog (no year), epoch s/ms/ns —
  * the reference's parser probes these in order
  * (ref s/parser/Parser.java:101-153, Event.java:127-135). */
object TimeUtil {

  private val syslogFmt = DateTimeFormatter.ofPattern("MMM [ ]d HH:mm:ss")

  def parseIso8601(s: String): Option[Instant] =
    Try(Instant.parse(s)).toOption
      .orElse(Try(java.time.OffsetDateTime.parse(s).toInstant).toOption)

  /** Syslog timestamps carry no year: assume the reference year, then
    * correct ±1 year if that lands the event more than ~3 days in the
    * future relative to `now` (ref Parser.java:131-153). */
  def parseSyslog(s: String, now: Instant): Option[Instant] = Try {
    val year = LocalDateTime.ofInstant(now, ZoneOffset.UTC).getYear
    val parsed = java.time.MonthDay.from(syslogFmt.parse(s.trim))
    val time = java.time.LocalTime.from(syslogFmt.parse(s.trim))
    def at(y: Int) = LocalDateTime.of(y, parsed.getMonth, parsed.getDayOfMonth,
      time.getHour, time.getMinute, time.getSecond).toInstant(ZoneOffset.UTC)
    val guess = at(year)
    if (guess.isAfter(now.plusSeconds(3L * 86400))) at(year - 1) else guess
  }.toOption

  /** Epoch magnitude heuristic: seconds / millis / micros / nanos. */
  def parseEpoch(v: Long): Instant = {
    if (v > 100000000000000000L) Instant.ofEpochSecond(v / 1000000000L, v % 1000000000L)
    else if (v > 100000000000000L) Instant.ofEpochSecond(v / 1000000L, (v % 1000000L) * 1000)
    else if (v > 100000000000L) Instant.ofEpochMilli(v)
    else Instant.ofEpochSecond(v)
  }

  /** Mozlog envelope `Timestamp` is ALWAYS nanoseconds — the
    * reference divides by 10⁶ unconditionally (Event.setMozlog,
    * s/parser/Event.java:131-134), so small values mean small times
    * (64000000000 = 64 s past the epoch in its test fixtures), and
    * the magnitude heuristic of [[parseEpoch]] must not apply. */
  def parseEpochNanos(v: Long): Instant =
    Instant.ofEpochSecond(Math.floorDiv(v, 1000000000L),
      Math.floorMod(v, 1000000000L))
}
