package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.InetRadix

/** Column-level scalar functions (SURVEY.md §2.7). Everything here is a
  * composition of built-in, codegen'd expressions except CIDR matching,
  * which needs the broadcast radix trie and is the one deliberate UDF
  * (a 32-step pointer chase; still cheap and fully distributed).
  */
object Functions {

  /** levenshtein(a,b) / max(len(a), len(b)); 0.0 when both empty
    * (ref s/StringDistance.java:23-31). Built-in levenshtein is
    * codegen'd — no UDF. */
  def levenshteinRatio(a: Column, b: Column): Column =
    when(greatest(length(a), length(b)) === 0, lit(0.0))
      .otherwise(levenshtein(a, b).cast("double") / greatest(length(a), length(b)))

  /** Great-circle km, pure Column math so it stays inside whole-stage
    * codegen (ref s/GeoUtil.java:35-50, R=6378). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * graft.util.GeoUtil.EarthRadiusKm) * asin(sqrt(a))
  }

  /** "user+tag@host" → "user@host" (ref MiscUtil.normalizeEmailPlus:
    * 31-50): splice from the FIRST '+' to the first '@' after it.
    * The anchored single-match pattern carries the reference's three
    * no-op guards — `([^+]+)` refuses a leading '+', the '@' must
    * follow the '+', and the `(?=.)` lookahead refuses a trailing
    * '@' — and anchoring also stops regexp_replace's replace-ALL from
    * splicing later +…@ groups the reference never touches. */
  def normalizeEmailPlus(email: Column): Column =
    regexp_replace(email, "^([^+]+)\\+[^@]*@(?=.)", "$1@")

  /** Plus-strip and remove dots from the local part (gmail-style):
    * "u.s.e.r+t@host" → "user@host"; a local part that strips to
    * nothing keeps the plus-normalized form (ref MiscUtil
    * .normalizeEmailPlusDotStrip:61-76; scalar twin in util.MiscUtil). */
  def normalizeEmailPlusDotStrip(email: Column): Column = {
    val p = normalizeEmailPlus(email)
    val local = regexp_replace(substring_index(p, "@", 1), "\\.", "")
    when(instr(p, "@") > 0 && local =!= "",
      concat(local, substr(p, instr(p, "@"))))
      .otherwise(p)
  }

  /** Email → domain. The reference's DOMAIN keying splits on '@' and
    * SKIPS anything that is not exactly two parts (ref s/customs/
    * Customs.java:508-519) — null here, so malformed addresses drop
    * out of domain-keyed joins instead of grouping under themselves. */
  def emailDomain(email: Column): Column =
    when(size(split(email, "@", -1)) === 2 &&
        substring_index(email, "@", -1) =!= "",
      substring_index(email, "@", -1))

  /** Event timestamp rendered in an escalation timezone — the alert
    * local-time metadata (ref s/authprofile/AuthProfile.java:921-932
    * EVENT_TIMESTAMP_SOURCE_LOCAL). Engine timestamps are UTC;
    * `from_utc_timestamp` shifts the wall-clock fields to `tz`. */
  def eventLocalTime(ts: Column, tz: String): Column =
    from_utc_timestamp(ts, tz)

  /** Pick the client IP out of an X-Forwarded-For list: last entry not
    * inside the trusted-proxy set (ref s/parser/Parser.java:164-238). */
  def xffClientAddress(xff: Column, trustedProxies: Broadcast[InetRadix]): Column = {
    val entries = transform(split(xff, ","), e => trim(e))
    val nonProxy = filter(entries, e => !cidrMatch(trustedProxies)(e))
    try_element_at(nonProxy, lit(-1))
  }

  /** Proxy-pipeline XFF client selection (ref s/parser/Parser.java
    * applyProxyXFFAddressSelector:211-238): with one entry return it;
    * with the pipeline-proxy marker present and 3+ entries the client
    * is THIRD from last (client, proxy, edge); otherwise second from
    * last. Pure split/element_at — stays in codegen. */
  def proxyXffClientAddress(xff: Column, proxyPresent: Column): Column = {
    val parts = transform(split(xff, ","), e => trim(e))
    val n = size(parts)
    when(xff.isNull, lit(null).cast("string"))
      .when(n <= 1, trim(xff))
      .when(!coalesce(proxyPresent, lit(false)) || n === 2,
        element_at(parts, -2))
      .otherwise(element_at(parts, -3))
  }

  /** CIDR membership against a broadcast radix trie — a native
    * codegen'd Catalyst expression (see CidrMatchExpr); null → false. */
  def cidrMatch(trie: Broadcast[InetRadix])(addr: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(CidrMatchExpr(ColumnBridge.expression(addr), trie))
  }

  /** UDF form of cidrMatch, kept for benchmark comparison with the
    * native expression (the expression stays inside whole-stage
    * codegen; the UDF pays boxing + closure dispatch per row). */
  def cidrMatchUdf(trie: Broadcast[InetRadix])(addr: Column): Column = {
    val f = udf((a: String) => a != null && trie.value.contains(a))
    f(addr)
  }

  /** Convenience: build + broadcast a trie from CIDR strings. */
  def broadcastCidrs(spark: SparkSession, cidrs: Seq[String]): Broadcast[InetRadix] =
    spark.sparkContext.broadcast(InetRadix(cidrs))

  /** Unicode normalization (UAX #15) of a text column — a native
    * codegen'd Catalyst expression (see UnicodeNormExpr); Spark has no
    * built-in. Forms: NFC (canonical compose — the cross-engine-stable
    * dedup key), NFD, NFKC (adds compatibility folding: ligatures,
    * full-width ASCII), NFKD. Invalid form fails at plan build. */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      UnicodeNormExpr(ColumnBridge.expression(text), form))
  }

  /** Multi-pattern containment in ONE pass (Aho–Corasick): ordinals
    * (ascending) of every `terms` entry occurring in the text — see
    * MultiContainsExpr. Case-exact; compose with `lower()` for the
    * usual case-folded blocklist screen. */
  def multiContains(text: Column, terms: Seq[String]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      MultiContainsExpr(ColumnBridge.expression(text), terms))
  }

  /** Multiset membership count of a string array against a fixed term
    * set in ONE codegen pass — the whole-stage-codegen replacement for
    * `size(filter(arr, t => array_contains(lit(terms), t)))` (an
    * interpreted-lambda HOF); see ArrayCountInExpr. */
  def arrayCountIn(arr: Column, terms: Seq[String]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      ArrayCountInExpr(ColumnBridge.expression(arr), terms))
  }

  /** Dotted-quad → unsigned int in a BIGINT, null if malformed; pure
    * Column math (stays codegen'd) for use in joins/sorts over IPs. */
  def ipv4ToLong(addr: Column): Column = {
    val ok = addr.rlike("^([0-9]{1,3}\\.){3}[0-9]{1,3}$")
    val parts = split(addr, "\\.")
    val v = element_at(parts, 1).cast("long") * 16777216L +
      element_at(parts, 2).cast("long") * 65536L +
      element_at(parts, 3).cast("long") * 256L +
      element_at(parts, 4).cast("long")
    val valid = ok &&
      element_at(parts, 1).cast("int") <= 255 &&
      element_at(parts, 2).cast("int") <= 255 &&
      element_at(parts, 3).cast("int") <= 255 &&
      element_at(parts, 4).cast("int") <= 255
    when(valid, v)
  }
}
