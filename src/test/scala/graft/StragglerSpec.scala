package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.util.CidrUtil

/** Tests for the scalar stragglers: minFraud fake enrichment,
  * forward-confirmed reverse DNS, alert local time, and the native
  * count_if feature twin. */
class StragglerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("minfraud fake enrichment attaches deterministic insights fields") {
    import spark.implicits._
    import graft.parse.Minfraud
    val events = Seq(
      graft.model.Event("e1", new java.sql.Timestamp(0), "raw", "x",
        normalized = graft.model.Normalized(
          sourceAddress = Some("1.2.3.9"))), // last octet 9 -> anonymous
      graft.model.Event("e2", new java.sql.Timestamp(0), "raw", "x",
        normalized = graft.model.Normalized(
          sourceAddress = Some("1.2.3.7"))), // 7 -> hosting
      graft.model.Event("e3", new java.sql.Timestamp(0), "raw", "x"))
      .toDS()
    val out = Minfraud.enrich(events, new Minfraud.FakeResolver).collect()
      .map(e => e.id -> e.fields).toMap
    assert(out("e1")("minfraud_anonymous") == "true")
    assert(out("e1")("minfraud_hosting") == "false")
    assert(out("e2")("minfraud_hosting") == "true")
    assert(!out("e3").contains("minfraud_anonymous"))
    // deterministic risk score
    assert(out("e1")("minfraud_risk_score") ==
      new graft.parse.Minfraud.FakeResolver()
        .lookup("1.2.3.9").get.riskScore.toString)
  }

  private class FakeDns(reverse: Map[String, String],
      forward: Map[String, Seq[String]]) extends CidrUtil.DnsResolver {
    def canonicalHostName(ip: String) = Some(reverse.getOrElse(ip, ip))
    def addressesOf(host: String) = forward.getOrElse(host, Seq.empty)
  }

  test("forward-confirmed reverse DNS canonical host check") {
    val dns = new FakeDns(
      reverse = Map("8.8.8.8" -> "dns.google.com",
        "5.5.5.5" -> "spoof.google.com"),
      forward = Map("dns.google.com" -> Seq("8.8.8.8"),
        "spoof.google.com" -> Seq("6.6.6.6"))) // forward-confirm fails
    assert(CidrUtil.resolvedCanonicalHostMatches(
      "8.8.8.8", ".*\\.google\\.com$", dns))
    // hostname does not resolve back to the address: rejected
    assert(!CidrUtil.resolvedCanonicalHostMatches(
      "5.5.5.5", ".*\\.google\\.com$", dns))
    // lookup echoed the ip (failed resolution): rejected
    assert(!CidrUtil.resolvedCanonicalHostMatches(
      "9.9.9.9", ".*", dns))
    // pattern is a full match
    assert(!CidrUtil.resolvedCanonicalHostMatches(
      "8.8.8.8", "google\\.com", dns))
  }

  test("alert local time conversion shifts wall clock to the policy tz") {
    import spark.implicits._
    import graft.functions.Functions
    // 2024-01-15 12:00 UTC -> 04:00 in Los Angeles (PST, UTC-8)
    val got = Seq("2024-01-15 12:00:00").toDF("s")
      .select(date_format(Functions.eventLocalTime(
        to_timestamp(col("s")), "America/Los_Angeles"),
        "yyyy-MM-dd HH:mm").as("local"))
      .as[String].head()
    assert(got == "2024-01-15 04:00")
  }

  test("alert summary thresholds: levels, direction disable, min floor") {
    import spark.implicits._
    import graft.operators.Heuristics
    import graft.operators.Heuristics.SummaryThreshold
    val t = 1700006400L // window-aligned base
    // day 1: 10 alerts on (web, httprequest, error_rate);
    // day 2: 20 (100% up); day 3: 10 (50% down)
    val rows = (
      (0 until 10).map(i => (t + i, "web", "httprequest", "error_rate")) ++
      (0 until 20).map(i => (t + 86400 + i, "web", "httprequest", "error_rate")) ++
      (0 until 10).map(i => (t + 172800 + i, "web", "httprequest", "error_rate")))
      .toDF("t", "r", "c", "s")
      .withColumn("ts", timestamp_seconds(col("t")))
    val out = Heuristics.alertSummaryThresholds(rows, col("ts"),
      col("r"), col("c"), col("s"), "1 day", Seq(
        // up-only rule on the resource level: fires day 2 only
        SummaryThreshold("web", 50.0, 0.0, 5),
        // down-only on the subcategory level: fires day 3 only
        SummaryThreshold("web-httprequest-error_rate", 0.0, 25.0, 5),
        // floor of 1000 never met: silent
        SummaryThreshold("*", 1.0, 1.0, 1000)))
      .collect()
      .map(r => (r.getAs[String]("classifier"), r.getAs[Double]("pct_change")))
      .toSet
    assert(out == Set(("web", 100.0),
      ("web-httprequest-error_rate", -50.0)))
  }

  test("native typeFeatures equals the typed-Aggregator twin") {
    import graft.operators.Features
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val native = Features.typeFeaturesNative(events,
      col("user_id"), col("event_type"))
      .orderBy(col("key")).collect()
    val typed = Features.typeFeatures(events,
      col("user_id"), col("event_type"))
      .select("key", "n_click", "n_error", "n_purchase", "n_signup",
        "n_view", "total", "variance")
      .orderBy(col("key")).collect()
    assert(native.length == typed.length)
    native.zip(typed).foreach { case (a, b) =>
      assert(a.getAs[String]("key") == b.getAs[String]("key"))
      Seq("n_click", "n_error", "n_purchase", "n_signup", "n_view",
        "total").foreach(c => assert(a.getAs[Long](c) == b.getAs[Long](c)))
      // bit-identical doubles: same fixed expression tree
      assert(a.getAs[Double]("variance") == b.getAs[Double]("variance"))
    }
  }
}
