package graft

import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite
import graft.util._

class UtilSpec extends AnyFunSuite {

  test("levenshtein matches known distances") {
    assert(StringDistance.levenshtein("kitten", "sitting") == 3)
    assert(StringDistance.levenshtein("", "abc") == 3)
    assert(StringDistance.levenshtein("abc", "") == 3)
    assert(StringDistance.levenshtein("abc", "abc") == 0)
    assert(StringDistance.levenshtein("flaw", "lawn") == 2)
  }

  test("levenshtein ratio: 0 for equal/empty, dist/maxlen otherwise") {
    assert(StringDistance.ratio("", "") == 0.0)
    assert(StringDistance.ratio("abc", "abc") == 0.0)
    assert(StringDistance.ratio("abcd", "abce") == 0.25)
  }

  test("haversine: zero distance, known pair, uses R=6378") {
    assert(GeoUtil.haversineKm(10, 20, 10, 20) == 0.0)
    // London->Paris ~ 344 km with R=6378
    val d = GeoUtil.haversineKm(51.5074, -0.1278, 48.8566, 2.3522)
    assert(d > 330 && d < 350)
  }

  test("ipToLong round-trips and rejects malformed") {
    assert(CidrUtil.ipToLong("0.0.0.0").contains(0L))
    assert(CidrUtil.ipToLong("255.255.255.255").contains(0xffffffffL))
    assert(CidrUtil.ipToLong("10.1.2.3").map(CidrUtil.longToIp).contains("10.1.2.3"))
    assert(CidrUtil.ipToLong("256.1.1.1").isEmpty)
    assert(CidrUtil.ipToLong("1.2.3").isEmpty)
    assert(CidrUtil.ipToLong("a.b.c.d").isEmpty)
    assert(CidrUtil.ipToLong(null).isEmpty)
  }

  test("cidrContains basic membership") {
    assert(CidrUtil.cidrContains("10.0.0.0/8", "10.255.0.1"))
    assert(!CidrUtil.cidrContains("10.0.0.0/8", "11.0.0.1"))
    assert(CidrUtil.cidrContains("192.168.1.0/24", "192.168.1.200"))
    assert(!CidrUtil.cidrContains("192.168.1.0/24", "192.168.2.1"))
    assert(CidrUtil.cidrContains("1.2.3.4", "1.2.3.4")) // bare ip = /32
    assert(CidrUtil.cidrContains("0.0.0.0/0", "8.8.8.8"))
  }

  test("InetRadix: membership across multiple CIDRs, nesting, /32, empty") {
    val t = InetRadix(Seq("10.0.0.0/8", "192.168.1.0/24", "8.8.8.8"))
    assert(t.contains("10.1.2.3"))
    assert(t.contains("192.168.1.55"))
    assert(t.contains("8.8.8.8"))
    assert(!t.contains("8.8.8.9"))
    assert(!t.contains("172.16.0.1"))
    assert(!t.contains("not-an-ip"))
    assert(new InetRadix().isEmpty)
    // nested: broader range added after narrower still matches both
    val n = InetRadix(Seq("10.1.0.0/16", "10.0.0.0/8"))
    assert(n.contains("10.200.0.1") && n.contains("10.1.1.1"))
  }

  test("InetRadix: the reference's own lookup vectors (ref TestInetRadix#testLookup)") {
    val r = InetRadix(Seq("192.168.0.0/24", "10.10.10.10/32",
      "1.0.0.0/8", "192.168.10.0/28"))
    for (miss <- Seq("10.0.0.1", "192.168.1.1", "10.10.10.9",
        "10.10.10.11", "255.255.255.255", "0.0.0.0", "192.168.10.16"))
      assert(!r.contains(miss), miss)
    for (hit <- Seq("192.168.0.10", "10.10.10.10", "1.0.0.1",
        "1.255.255.255", "192.168.10.1", "192.168.10.15"))
      assert(r.contains(hit), hit)
    // incremental widening: /32 then the covering /30
    val r2a = InetRadix(Seq("1.2.3.4/32"))
    assert(r2a.contains("1.2.3.4"))
    assert(!r2a.contains("1.2.3.3") && !r2a.contains("1.2.3.5"))
    val r2b = InetRadix(Seq("1.2.3.4/32", "1.2.3.4/30", "1.2.4.4/30"))
    for (hit <- Seq("1.2.3.4", "1.2.3.5", "1.2.3.6", "1.2.3.7",
        "1.2.4.4", "1.2.4.5", "1.2.4.6", "1.2.4.7"))
      assert(r2b.contains(hit), hit)
    for (miss <- Seq("1.2.3.3", "1.2.3.8", "1.2.4.3"))
      assert(!r2b.contains(miss), miss)
  }

  test("StringDistance ratio: the reference's exact values (ref TestStringDistance)") {
    assert(StringDistance.levenshtein("a", "a") == 0)
    assert(StringDistance.levenshtein("test", "test1") == 1)
    assert(StringDistance.levenshtein("test", "test10") == 2)
    assert(StringDistance.levenshtein("test", "abcd") == 4)
    assert(StringDistance.ratio("test", "test") == 0.0)
    assert(StringDistance.ratio("aaaa", "bbbb") == 1.0)
    assert(math.abs(StringDistance.ratio("test100", "test102") - 0.142)
      < 0.001)
  }

  test("email plus/dot normalization: the reference's exact vectors incl. malformed inputs (ref TestMiscUtil)") {
    import graft.util.MiscUtil
    assert(MiscUtil.normalizeEmailPlus("test@mozilla.com") == "test@mozilla.com")
    assert(MiscUtil.normalizeEmailPlus("test+x@mozilla.com") == "test@mozilla.com")
    assert(MiscUtil.normalizeEmailPlus("test+x+x@mozilla.com") == "test@mozilla.com")
    assert(MiscUtil.normalizeEmailPlus("test+@mozilla.com") == "test@mozilla.com")
    assert(MiscUtil.normalizeEmailPlus("+@mozilla.com") == "+@mozilla.com")
    assert(MiscUtil.normalizeEmailPlus("test") == "test")
    assert(MiscUtil.normalizeEmailPlus("test@") == "test@")
    assert(MiscUtil.normalizeEmailPlus("test+x@") == "test+x@")
    assert(MiscUtil.normalizeEmailPlus("+") == "+")
    assert(MiscUtil.normalizeEmailPlus("") == "")
    assert(MiscUtil.normalizeEmailPlusDotStrip("test@mozilla.com") == "test@mozilla.com")
    assert(MiscUtil.normalizeEmailPlusDotStrip("test.@mozilla.com") == "test@mozilla.com")
    assert(MiscUtil.normalizeEmailPlusDotStrip("test.+x@mozilla.com") == "test@mozilla.com")
    assert(MiscUtil.normalizeEmailPlusDotStrip("test.+@mozilla.com") == "test@mozilla.com")
    assert(MiscUtil.normalizeEmailPlusDotStrip("test+test.test@mozilla.com") == "test@mozilla.com")
    assert(MiscUtil.normalizeEmailPlusDotStrip(".@mozilla.com") == ".@mozilla.com")
    assert(MiscUtil.normalizeEmailPlusDotStrip("..@mozilla.com") == "..@mozilla.com")
  }

  test("privateTrie covers RFC1918 + loopback + link-local") {
    assert(CidrUtil.isPrivate("10.0.0.1"))
    assert(CidrUtil.isPrivate("172.16.5.5"))
    assert(!CidrUtil.isPrivate("172.32.0.1"))
    assert(CidrUtil.isPrivate("192.168.0.1"))
    assert(CidrUtil.isPrivate("127.0.0.1"))
    assert(CidrUtil.isPrivate("169.254.1.1"))
    assert(!CidrUtil.isPrivate("8.8.8.8"))
  }

  test("email normalization") {
    assert(MiscUtil.normalizeEmailPlus("user+tag@host.com") == "user@host.com")
    assert(MiscUtil.normalizeEmailPlus("user@host.com") == "user@host.com")
    assert(MiscUtil.normalizeEmailPlus("no-at-sign") == "no-at-sign")
    assert(MiscUtil.normalizeEmailPlusDotStrip("u.s.e.r+t@host.com") == "user@host.com")
    assert(MiscUtil.emailDomain("a@b.c").contains("b.c"))
    assert(MiscUtil.emailDomain("nope").isEmpty)
  }

  test("timestamp parsing: iso8601, epoch magnitudes, syslog year correction") {
    assert(TimeUtil.parseIso8601("2024-03-01T12:00:00Z").contains(
      Instant.parse("2024-03-01T12:00:00Z")))
    assert(TimeUtil.parseIso8601("2024-03-01T12:00:00+01:00").contains(
      Instant.parse("2024-03-01T11:00:00Z")))
    assert(TimeUtil.parseIso8601("garbage").isEmpty)
    assert(TimeUtil.parseEpoch(1700000000L) == Instant.ofEpochSecond(1700000000L))
    assert(TimeUtil.parseEpoch(1700000000000L) == Instant.ofEpochMilli(1700000000000L))
    assert(TimeUtil.parseEpoch(1700000000000000000L) ==
      Instant.ofEpochSecond(1700000000L))
    val now = Instant.parse("2024-01-05T00:00:00Z")
    // Dec 31 with a January "now" must resolve to the previous year
    val dec = TimeUtil.parseSyslog("Dec 31 23:59:59", now)
    assert(dec.exists(_.toString.startsWith("2023-12-31")))
    val jan = TimeUtil.parseSyslog("Jan  3 10:00:00", now)
    assert(jan.exists(_.toString.startsWith("2024-01-03")))
  }
}
