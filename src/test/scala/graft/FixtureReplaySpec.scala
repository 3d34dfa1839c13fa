package graft

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Functions
import graft.operators.{CustomsDetectors, Heuristics, HttpHeuristics}
import graft.parse.Parser

/** Replay of the reference's own test fixtures through this engine,
  * asserting the same alert-level expectations its pipeline tests
  * assert (ref t/java/com/mozilla/secops/... cited per test). The
  * fixture files are read from the reference checkout at test time —
  * real GLB / FxA-auth / AMO log lines exercising the full envelope
  * strip + payload probe + detector path, pinning parser field parity
  * much harder than synthetic lines. Tests are skipped (assume) when
  * the reference checkout is absent. */
class FixtureReplaySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val refData = "/root/reference/src/test/resources/testdata"

  private def fixture(name: String): Seq[String] = {
    val p = java.nio.file.Paths.get(refData, name)
    assume(java.nio.file.Files.exists(p), s"reference fixture $name unavailable")
    scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(p)).asScala.toSeq
      .filter(l => l.nonEmpty && !l.startsWith("#"))
  }

  private def lines(names: String*): Dataset[String] = {
    import spark.implicits._
    names.flatMap(fixture).toDS()
  }

  private def parsedHttp(ds: Dataset[String]): DataFrame =
    pipelines.HttpRequestPipeline.parsedHttp(ds)

  /** FxA-auth events with the client re-selected through the
    * reference's XffAddressSelector semantics (trusted 127.0.0.1/32:
    * last chain element not in the trusted set). */
  private def parsedFxa(ds: Dataset[String]): DataFrame = {
    val trusted = Functions.broadcastCidrs(spark, Seq("127.0.0.1/32"))
    Parser.parse(ds).toDF()
      .filter(col("payloadType") === "fxaauth")
      .withColumn("src", Functions.xffClientAddress(
        translate(element_at(col("fields"), "remote_address_chain"),
          "[]\"", ""), trusted))
      .withColumn("email", element_at(col("fields"), "email"))
      .withColumn("summary", element_at(col("fields"), "event_summary"))
  }

  // --- HTTPRequest fixtures -------------------------------------------

  test("httpreq_thresholdanalysis1: byte-exact golden alert (ref TestThresholdAnalysis1)") {
    val alerts = pipelines.HttpRequestPipeline.thresholdAlertsGolden(
      lines("httpreq_thresholdanalysis1.txt"),
      monitoredResource = "test", modifier = 1.0)
    val json = sinks.Sinks.alertJsonGolden(alerts).collect()
    assert(json.length == 1)
    val expectedId = java.util.UUID.nameUUIDFromBytes(
      "test|threshold_analysis|10.0.0.1|0".getBytes("UTF-8")).toString
    assert(json.head ==
      s"""{"severity":"info","id":"$expectedId","summary":"test httprequest threshold_analysis 10.0.0.1 100","category":"httprequest","timestamp":"1970-01-01T00:00:59.999Z","metadata":[{"key":"category","value":"threshold_analysis"},{"key":"sourceaddress","value":"10.0.0.1"},{"key":"mean","value":"${(120.0 / 11).toString}"},{"key":"count","value":"100"},{"key":"threshold_modifier","value":"1.0"},{"key":"notify_merge","value":"test threshold_analysis"},{"key":"window_timestamp","value":"1970-01-01T00:00:59.999Z"}]}""")
  }

  test("httpreq_thresholdanalysisnatdetect1: NAT gateway suppressed (ref TestThresholdAnalysis1#natdetect)") {
    val parsed = parsedHttp(lines("httpreq_thresholdanalysisnatdetect1.txt"))
    val ts = col("timestamp"); val src = col("normalized.sourceAddress")
    // DetectNat marks sources with >= 2 distinct user agents
    // (ref DetectNat.java UAMARKPROBABLE = 2)
    val nat = Heuristics.distinctCardinality(parsed, ts, src,
        col("normalized.userAgent"), "1 minute", minDistinct = 2)
      .select(col("window_start_ms"), col("key"))
    val out = Heuristics.thresholdAnalysis(parsed, ts, src, "1 minute",
        modifier = 1.0)
      .join(broadcast(nat), Seq("window_start_ms", "key"), "left_anti")
      .collect()
    // 10.0.0.2 (100 requests, 2 distinct UAs) is the suppressed NAT;
    // the reference asserts one alert, 10.0.0.1 count 100 mean ~18.33
    assert(out.length == 1)
    assert(out.head.getAs[String]("key") == "10.0.0.1")
    assert(out.head.getAs[Long]("n") == 100L)
    assert(out.head.getAs[Double]("mean_n") == 220.0 / 12)
  }

  test("httpreq_hardlimit1: three clients at 11 > 10, plus violation derivation (ref TestHardLimit1)") {
    import spark.implicits._
    val parsed = parsedHttp(lines("httpreq_hardlimit1.txt"))
    val out = Heuristics.hardLimit(parsed, col("timestamp"),
      col("normalized.sourceAddress"), "1 minute", limit = 10)
    val rows = out.collect()
    assert(rows.map(_.getAs[String]("key")).toSet ==
      Set("192.168.1.2", "192.168.1.4", "192.168.1.5"))
    assert(rows.forall(_.getAs[Long]("n") == 11L))
    assert(rows.forall(_.getAs[Long]("window_start_ms") == 0L))
    // iprepd path: hard_limit maps to hard_limit_violation per source
    // (the reference test asserts reputation writes for all three)
    val v = sinks.Sinks.violations(
        out.withColumn("subcategory", lit("hard_limit")),
        col("subcategory"), col("key"))
      .select("ip", "violation").as[(String, String)].collect().toSet
    assert(v == Set("192.168.1.2", "192.168.1.4", "192.168.1.5")
      .map(ip => ip -> "hard_limit_violation"))
  }

  test("httpreq_hardlimit1 + uablocklist1: UA blocklist hits one client; NAT detection empties it (ref TestUserAgentBlocklist1)") {
    val parsed = parsedHttp(lines("httpreq_hardlimit1.txt"))
    val blocklist = fixture("uablocklist1.txt")
    val hits = HttpHeuristics.userAgentBlocklist(parsed, col("timestamp"),
      col("normalized.sourceAddress"), col("normalized.userAgent"),
      "1 minute", blocklist).collect()
    // only 192.168.1.4 carries the ^.*Variance.*$ agent
    assert(hits.length == 1)
    assert(hits.head.getAs[String]("addr") == "192.168.1.4")
    assert(hits.head.getAs[String]("useragent") == "Mozilla Variance")
    assert(hits.head.getAs[Long]("window_start_ms") == 0L)
    // with NAT detection on, the client's own 2-UA variety marks it a
    // gateway and the result set is empty (the reference asserts
    // empty + one natDetected counter)
    val nat = Heuristics.distinctCardinality(parsed, col("timestamp"),
      col("normalized.sourceAddress"), col("normalized.userAgent"),
      "1 minute", minDistinct = 2).select(col("key"))
    val suppressed = HttpHeuristics.userAgentBlocklist(parsed,
      col("timestamp"), col("normalized.sourceAddress"),
      col("normalized.userAgent"), "1 minute", blocklist,
      natAddrs = Some(nat))
    assert(suppressed.isEmpty)
  }

  test("httpreq_errorrate1: 35 client errors over the 30 limit (ref TestErrorRate1)") {
    val parsed = parsedHttp(lines("httpreq_errorrate1.txt"))
    val out = Heuristics.errorRate(parsed, col("timestamp"),
      col("normalized.sourceAddress"),
      col("normalized.requestStatus").between(400, 499),
      "1 minute", maxErrors = 30).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("key") == "10.0.0.1")
    assert(out.head.getAs[Long]("errors") == 35L)
    assert(out.head.getAs[Long]("window_start_ms") == 0L)
  }

  test("httpreq_endpointabuse1: one abuser at 10, variance client suppressed (ref TestEndpointAbuse1)") {
    val parsed = parsedHttp(lines(
      "httpreq_endpointabuse1/httpreq_endpointabuse1_1.txt",
      "httpreq_endpointabuse1/httpreq_endpointabuse1_2.txt",
      "httpreq_endpointabuse1/httpreq_endpointabuse1_3.txt"))
    val out = HttpHeuristics.endpointAbuse(parsed, col("timestamp"),
      col("normalized.sourceAddress"), col("normalized.requestMethod"),
      col("normalized.urlRequestPath"), col("normalized.userAgent"),
      "1 hour", Seq(HttpHeuristics.Endpoint("GET", "/test", 8))).collect()
    // 192.168.1.2: 10 monitored requests, nothing else -> alerts.
    // 192.168.1.3 also reaches 10 but touched /test/somethingelse
    // (variance) and 192.168.1.1 browsed elsewhere -> suppressed.
    assert(out.length == 1)
    assert(out.head.getAs[String]("addr") == "192.168.1.2")
    assert(out.head.getAs[Long]("n") == 10L)
    assert(out.head.getAs[String]("useragent") == "Mozilla")
    assert(out.head.getAs[Long]("latest_ts_ms") == 15000L)
  }

  test("httpreq_endpointabuse2: extended variance — ANY unmonitored browsing exempts (ref TestEndpointAbuse1#endpointAbuseTestStreamExtendedVariance)") {
    val parsed = parsedHttp(lines(
      "httpreq_endpointabuse2/httpreq_endpointabuse2_1.txt",
      "httpreq_endpointabuse2/httpreq_endpointabuse2_2.txt",
      "httpreq_endpointabuse2/httpreq_endpointabuse2_3.txt"))
    val out = HttpHeuristics.endpointAbuse(parsed, col("timestamp"),
      col("normalized.sourceAddress"), col("normalized.requestMethod"),
      col("normalized.urlRequestPath"), col("normalized.userAgent"),
      "1 hour", Seq(HttpHeuristics.Endpoint("GET", "/test", 8)),
      varianceSupportingOnly = true).collect()
    // the reference's one alert: 192.168.1.2 at 10 monitored GETs,
    // UA Mozilla; the other client's supporting-content browsing
    // counts as variance under the extended flag and exempts it
    assert(out.length == 1)
    assert(out.head.getAs[String]("addr") == "192.168.1.2")
    assert(out.head.getAs[Long]("n") == 10L)
    assert(out.head.getAs[String]("useragent") == "Mozilla")
  }

  test("httpreq_endpointabuse5: custom variance substrings exempt matching requests (ref TestEndpointAbuse1#endpointAbuseTestStreamCustomVariance)") {
    val parsed = parsedHttp(lines(
      "httpreq_endpointabuse5/httpreq_endpointabuse5_1.txt",
      "httpreq_endpointabuse5/httpreq_endpointabuse5_2.txt",
      "httpreq_endpointabuse5/httpreq_endpointabuse5_3.txt"))
    val out = HttpHeuristics.endpointAbuse(parsed, col("timestamp"),
      col("normalized.sourceAddress"), col("normalized.requestMethod"),
      col("normalized.urlRequestPath"), col("normalized.userAgent"),
      "1 hour", Seq(HttpHeuristics.Endpoint("GET", "/test", 8)),
      varianceSupportingOnly = true,
      customVarianceSubstrings = Seq("init?"),
      url = Some(col("normalized.requestUrl"))).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("addr") == "192.168.1.2")
    assert(out.head.getAs[Long]("n") == 10L)
    assert(out.head.getAs[String]("useragent") == "Mozilla")
  }

  test("httpreq_sessionlimitanalysis1: proxy-XFF client, 20-min session of 7 monitored posts (ref TestSessionLimitAnalysis)") {
    import spark.implicits._
    // nginx variant-1 lines whose true client rides X-Forwarded-For
    // behind a pipeline proxy — useXffAsRemote + useProxyXff semantics
    val parsed = parsedHttp(lines(
      "httpreq_sessionlimitanalysis1/httpreq_sessionlimitanalysis1_1.txt",
      "httpreq_sessionlimitanalysis1/httpreq_sessionlimitanalysis1_2.txt",
      "httpreq_sessionlimitanalysis1/httpreq_sessionlimitanalysis1_3.txt"))
      .withColumn("client", Functions.proxyXffClientAddress(
        element_at(col("fields"), "x_forwarded_for"),
        element_at(col("fields"), "x_pipeline_proxy").isNotNull))
    // the configured limit 6:20:POST:^/submit/click.*
    val monitored = parsed.filter(
      col("normalized.requestMethod") === "POST" &&
        col("normalized.urlRequestPath").rlike("^/submit/click.*"))
    val sessions = operators.Sessionize.assignSessions(
        monitored.select(col("timestamp").as("ts"), col("client")),
        col("ts"), col("client"), gapSeconds = 1200)
      .groupBy(col("client"), col("session_id"))
      .agg(count(lit(1)).as("n"),
        unix_millis(min(col("ts"))).as("start_ms"),
        unix_millis(max(col("ts"))).as("last_ms"))
    val over = sessions.filter(col("n") >= 6).collect()
    // one 7-request session for 192.168.0.1 (third-from-last XFF
    // entry behind the pipeline proxy) from 21:59:42 to 22:40:42; the
    // 23:05:42 request opens a new session and stays under the limit
    assert(over.length == 1)
    assert(over.head.getAs[String]("client") == "192.168.0.1")
    assert(over.head.getAs[Long]("n") == 7L)
    def epoch(s: String) = java.time.Instant.parse(s).toEpochMilli
    assert(over.head.getAs[Long]("start_ms") == epoch("2021-07-08T21:59:42Z"))
    assert(over.head.getAs[Long]("last_ms") == epoch("2021-07-08T22:40:42Z"))
    assert(sessions.count() == 2)
  }

  test("httpreq_endpointsequenceabuse1: last-first pairing counts one violation (ref TestEndpointSequenceAbuse)") {
    // pattern 1:GET:/test:1000:GET:/test2 — two /test firsts then one
    // /test2 ten ms later: the reference's scan pairs the second with
    // the LAST first only (count 1, not an all-pairs 2)
    val parsed = parsedHttp(lines("httpreq_endpointsequenceabuse1.txt"))
      .withColumn("eid", monotonically_increasing_id())
    val out = Heuristics.sequenceAbuse(parsed, col("timestamp"),
      col("eid"), col("normalized.sourceAddress"),
      col("normalized.requestMethod") === "GET" &&
        col("normalized.urlRequestPath") === "/test",
      col("normalized.requestMethod") === "GET" &&
        col("normalized.urlRequestPath") === "/test2",
      deltaMs = 1000L).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("key") == "192.168.1.2")
    assert(out.head.getAs[Long]("n") == 1L)
    assert(out.head.getAs[Long]("latest_ms") == 10L)
  }

  // --- Customs fixtures -----------------------------------------------

  test("customs_rl_badlogin_simple1: per-source failures, distributed account, summary (ref TestCustoms#sourceLoginFailureTest)") {
    import spark.implicits._
    val fxa = parsedFxa(lines("customs_rl_badlogin_simple1.txt"))
    val failures = fxa.filter(col("summary") === "loginFailure")
    // source_login_failure: 216.160.83.56 at exactly 10 (the two
    // errno-125 blocked events never classify as failures)
    val perSrc = failures
      .groupBy(col("src")).agg(count(lit(1)).as("n"),
        collect_set(col("email")).as("emails"))
      .filter(col("n") >= 10).collect()
    assert(perSrc.length == 1)
    assert(perSrc.head.getAs[String]("src") == "216.160.83.56")
    assert(perSrc.head.getAs[Long]("n") == 10L)
    assert(perSrc.head.getAs[scala.collection.Seq[String]]("emails")
      .toSeq == Seq("spock@mozilla.com"))
    // source_login_failure_distributed: kirk from 10 distinct sources
    // (12 events, two addresses duplicated)
    val dist = CustomsDetectors.sourceLoginFailureDist(fxa,
      col("timestamp"), col("email"), col("src"),
      col("summary") === "loginFailure", "10 minutes",
      threshold = 10).collect()
    assert(dist.length == 1)
    assert(dist.head.getAs[String]("email") == "kirk@mozilla.com")
    assert(dist.head.getAs[Long]("n_src") == 10L)
    // summary: 22 login failures in the period
    val sm = CustomsDetectors.summary(fxa, col("timestamp"),
      when(col("summary") === "loginFailure", "login_failure"))
      .as[(Long, String, Long)].collect()
    assert(sm.toSeq.map(t => (t._2, t._3)) == Seq(("login_failure", 22L)))
  }

  test("customs_createacctabuse: three creations from one source (ref TestCustoms#accountCreationAbuseTest)") {
    val fxa = parsedFxa(lines("customs_createacctabuse.txt"))
    val out = fxa.filter(col("summary") === "accountCreateSuccess")
      .groupBy(col("src")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 3).collect()
    // 216.160.83.56 created 3 accounts; 1.2.3.4 only 2
    assert(out.length == 1)
    assert(out.head.getAs[String]("src") == "216.160.83.56")
    assert(out.head.getAs[Long]("n") == 3L)
  }

  test("customs_createacctabuse_dist: similar-email creations across sources (ref TestCustoms#accountCreationAbuseTestDist)") {
    val fxa = parsedFxa(lines("customs_createacctabuse_dist.txt"))
    val out = CustomsDetectors.accountCreationDist(fxa, col("timestamp"),
      col("email"), col("src"),
      col("summary") === "accountCreateSuccess", "10 minutes",
      threshold = 5).collect()
    // mail.com: user1..user6 from six different sources -> one alert
    // per creation, count 6 each; mailer.com: all from one source ->
    // no address variance, silent (the reference asserts the
    // user3@mail.com / 216.160.83.56 alert with count 6)
    assert(out.length == 6)
    assert(out.forall(_.getAs[Long]("n") == 6L))
    val user3 = out.find(_.getAs[String]("email") == "user3@mail.com").get
    assert(user3.getAs[String]("src") == "216.160.83.56")
    assert(user3.getAs[String]("email_similar") ==
      "user1@mail.com, user2@mail.com, user4@mail.com, user5@mail.com, user6@mail.com")
    assert(!out.exists(_.getAs[String]("email").endsWith("@mailer.com")))
  }

  test("httpreq_statuscodeanalysis: nginx EC2 variant, 302-rate above/below threshold (ref TestStatusCodeRateAnalysis)") {
    // this fixture is the reference's SECOND Stackdriver nginx shape
    // (remote_ip/code/agent) — full envelope + variant-2 field parity
    val parsed = parsedHttp(lines("httpreq_statuscodeanalysis.txt"))
    def run(max: Long) = Heuristics.errorRate(parsed, col("timestamp"),
      col("normalized.sourceAddress"),
      col("normalized.requestStatus") === 302, "1 minute",
      maxErrors = max).collect()
    // limit 2: one alert, 192.168.0.1 with three 302s, window
    // 2021-05-08T19:15:00Z
    val out = run(2)
    assert(out.length == 1)
    assert(out.head.getAs[String]("key") == "192.168.0.1")
    assert(out.head.getAs[Long]("errors") == 3L)
    assert(out.head.getAs[Long]("window_start_ms") == 1620501300000L)
    // limit 3: below threshold, empty (the reference's first test)
    assert(run(3).isEmpty)
  }

  test("gatekeeper guardduty sample findings: typed parse of every real finding (ref TestGatekeeper)") {
    val parsed = Parser.parse(lines(
      "gatekeeper/guardduty-sample-findings-default.txt")).toDF()
      .filter(col("payloadType") === "guardduty")
      .select(element_at(col("fields"), "account").as("account"),
        element_at(col("fields"), "region").as("region"),
        element_at(col("fields"), "finding_id").as("fid"),
        element_at(col("fields"), "finding_type").as("ftype"),
        element_at(col("fields"), "severity").as("sev"))
      .collect()
    // all 19 sample findings classify as guardduty with the account
    // and region the reference's alerts assert
    assert(parsed.length == 19)
    assert(parsed.forall(_.getAs[String]("account") == "123456789012"))
    assert(parsed.forall(_.getAs[String]("region") == "us-west-2"))
    assert(parsed.forall(r => r.getAs[String]("ftype") != null &&
      r.getAs[String]("sev") != null))
    // the finding whose console URL the reference checks
    assert(parsed.exists(_.getAs[String]("fid") ==
      "36b59ed2edad8b965a0ee921052cb481"))
  }

  test("gatekeeper etd sample findings: typed parse incl. project number (ref TestGatekeeper)") {
    val parsed = Parser.parse(lines("gatekeeper/etd-sample-findings.txt"))
      .toDF()
      .filter(col("payloadType") === "etd")
      .select(element_at(col("fields"), "project_number").as("pn"),
        element_at(col("fields"), "rule_name").as("rule"))
      .collect()
    assert(parsed.length == 3)
    // the three org project numbers the reference's gcp alerts carry
    assert(parsed.map(_.getAs[String]("pn")).toSet ==
      Set("123456789012", "123456785822", "123456789210"))
    assert(parsed.forall(_.getAs[String]("rule") != null))
  }

  test("duo_buffer1: duopull admin events parse under the real Logger tag") {
    val parsed = Parser.parse(lines("duo_buffer1.txt")).toDF()
      .filter(col("payloadType") === "duopull")
      .select(col("normalized.subjectUser").as("user"),
        element_at(col("fields"), "event_action").as("action"))
      .collect()
    // every line of the buffer is a duopull admin event (Logger
    // "duopull", Type "app.log"); some system events carry no
    // username, which stays null rather than failing the parse
    assert(parsed.length == 12)
    assert(parsed.exists(_.getAs[String]("user") != null))
    assert(parsed.exists(_.getAs[String]("action") == "bypass_create"))
  }

  test("cloudtrail_buffer1: raw cloudtrail records classify with auth fields") {
    val all = Parser.parse(lines("cloudtrail_buffer1.txt")).toDF().cache()
    val parsed = all.filter(col("payloadType") === "cloudtrail")
      .select(col("normalized.subjectUser").as("user"),
        col("normalized.sourceAddress").as("src"),
        element_at(col("fields"), "event_name").as("event"))
      .collect()
    // 4 real cloudtrail records; the 5th line is deliberate junk
    // ({"not-an-event": ...}) and must fall through to RAW, not fail
    assert(parsed.length == 4)
    assert(parsed.exists(r => r.getAs[String]("user") == "uhura" &&
      r.getAs[String]("event") == "CreateAccessKey"))
    assert(parsed.forall(_.getAs[String]("src") != null))
    assert(all.filter(col("payloadType") === "raw").count() == 1)
    all.unpersist()
  }

  test("customs_abuse_password_reset1: one source resetting five accounts (ref TestCustoms#passwordResetAbuseTest)") {
    val fxa = parsedFxa(lines("customs_abuse_password_reset1.txt"))
    val out = fxa.filter(col("summary") === "passwordForgotSendCodeSuccess")
      .groupBy(col("src"))
      .agg(countDistinct(col("email")).as("n_accounts"))
      .filter(col("n_accounts") >= 5).collect()
    // 10.0.0.1 reset riker1..riker5; 10.0.0.2 only four accounts
    assert(out.length == 1)
    assert(out.head.getAs[String]("src") == "10.0.0.1")
    assert(out.head.getAs[Long]("n_accounts") == 5L)
  }

  test("customs_account_status_abuse1: enumeration alerts exactly the designed sources (ref TestCustoms#accountEnumerationTest)") {
    val fxa = parsedFxa(lines("customs_account_status_abuse1.txt"))
      .withColumn("path", element_at(col("fields"), "path"))
    val isStatusCheck = col("summary").isin(
      "accountStatusCheckSuccess", "accountStatusCheckBlocked")
    val out = CustomsDetectors.accountEnumeration(fxa, col("timestamp"),
      col("src"), col("email"), col("path"), isStatusCheck,
      "10 minutes", threshold = 3).collect()
    // fixture design (ref test comment): .1 crosses with a mix of
    // success+blocked, .3 with successes only; .2 below threshold,
    // .4 too few distinct accounts, .5 touched other endpoints
    assert(out.map(r => r.getAs[String]("src") ->
      r.getAs[Long]("n_emails")).toMap == Map(
      "10.0.0.1" -> 3L, "10.0.0.3" -> 3L))
  }

  test("authprof_critobj1+2: crit-object alerts with real-MMDB geo (ref TestCritObject)") {
    // real MaxMind City test database through our MMDB binary reader
    val mmdbPath = java.nio.file.Paths.get(refData, "GeoIP2-City-Test.mmdb")
    assume(java.nio.file.Files.exists(mmdbPath))
    val db = new graft.parse.MaxmindDb(
      java.nio.file.Files.readAllBytes(mmdbPath))
    val parsed = Parser.parse(
      lines("authprof_critobj1.txt", "authprof_critobj2.txt"))
    val enriched = graft.parse.GeoIp.enrich(parsed,
      new graft.parse.MaxmindDb.MmdbResolver(db)).toDF()
      .filter(col("payloadType") === "gcpaudit")
      // the reference's ignoreUserRegex drops riker before analysis
      .filter(!col("normalized.subjectUser").rlike("^riker@mozilla.com$"))
    val out = operators.AuthState.critObjectAnalyze(enriched,
      col("timestamp"), col("normalized.subjectUser"),
      col("normalized.objectValue"), col("normalized.sourceAddress"),
      Seq("^projects/test$", "super-important-account")).collect()
    // three laforge events hit the crit object (1 in critobj1, 2 in
    // critobj2 — the reference's 2-alert expectation is ours after
    // session suppression, spec'd separately); riker is ignored
    assert(out.length == 3)
    assert(out.forall(_.getAs[String]("username") == "laforge@mozilla.com"))
    assert(out.forall(_.getAs[String]("object") == "projects/test"))
    assert(out.forall(_.getAs[String]("sourceaddress") == "216.160.83.56"))
    assert(out.forall(_.getAs[String]("severity") == "critical"))
    // the geo the reference's summary carries: Milton/US from the
    // MaxMind test DB
    val geo = enriched.filter(
        col("normalized.sourceAddress") === "216.160.83.56")
      .select(col("normalized.geo.city"), col("normalized.geo.country"))
      .head()
    assert(geo.getString(0) == "Milton" && geo.getString(1) == "US")
  }

  test("event_matchers.json: config-form cloudtrail matchers over cloudtrail_buffer1 (ref TestAwsBehavior#matcherTest / TestCloudtrailMatcherManager)") {
    // the reference's matcher CONFIG file, parsed as the manager does
    val p = java.nio.file.Paths.get(refData, "event_matchers.json")
    assume(java.nio.file.Files.exists(p))
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(p.toFile)
    val matchers = scala.jdk.CollectionConverters
      .IteratorHasAsScala(root.path("event_matchers").elements()).asScala
      .map { m =>
        val fields = scala.jdk.CollectionConverters
          .IteratorHasAsScala(m.path("fields").elements()).asScala
          .map(f => f.get(0).asText() -> f.get(1).asText()).toSeq
        pipelines.AwsBehaviorPipeline.Matcher(
          m.path("description").asText(), fields,
          Option(m.path("resource").asText(null)))
      }.toSeq
    assert(matchers.length == 2)
    assert(matchers.head.description == "access key created")
    val out = pipelines.AwsBehaviorPipeline.analyze(
      Parser.parse(lines("cloudtrail_buffer1.txt")).toDF(), matchers)
      .collect()
    // the reference's exact three: uhura's CreateAccessKey (resource
    // guinan) + picard's two mfa-less console GetUsers — the mfa=true
    // GetUser and the junk line never match
    assert(out.length == 3)
    val got = out.map(r => (r.getAs[String]("username"),
      r.getAs[String]("description"), r.getAs[String]("resource")))
    assert(got.count(_ == (("uhura", "access key created", "guinan"))) == 1)
    assert(got.count(_ == (("picard",
      "IAM action from console without mfa", null))) == 2)
    assert(out.forall(_.getAs[String]("severity") == "critical"))
  }

  test("authprof_critobj3: hour-of-day alternate Slack escalation policy (ref TestCritObject#critObjectTestSupplementaryPolicy + #MissingPolicy)") {
    val mmdbPath = java.nio.file.Paths.get(refData, "GeoIP2-City-Test.mmdb")
    assume(java.nio.file.Files.exists(mmdbPath))
    val db = new graft.parse.MaxmindDb(
      java.nio.file.Files.readAllBytes(mmdbPath))
    val enriched = graft.parse.GeoIp.enrich(
      Parser.parse(lines("authprof_critobj3.txt")),
      new graft.parse.MaxmindDb.MmdbResolver(db)).toDF()
      .filter(col("payloadType") === "gcpaudit")
    def run(email: Option[String]) = operators.AuthState.critObjectAnalyze(
      enriched, col("timestamp"), col("normalized.subjectUser"),
      col("normalized.objectValue"), col("normalized.sourceAddress"),
      Seq("^projects/test$", "super-important-account"),
      city = col("normalized.geo.city"),
      country = col("normalized.geo.country"),
      critNotifyEmail = email,
      escalation = Some(operators.AuthState.CritEscalation(
        "EST", 8, 10, "test")),
      alertId = lit("AID"))
      .collect().map(r => r.getAs[Long]("ts_ms") -> r).toMap
    val out = run(Some("section31@mozilla.com"))
    assert(out.size == 3)
    // 2019-01-01T13:30Z = EST 08:30 Tuesday: inside the policy window
    val alt = out(1546349400000L)
    assert(alt.getAs[String]("notify_email_direct") == null)
    assert(alt.getAs[String]("notify_slack_supplementary") == "test")
    assert(alt.getAs[String]("slack_supplementary_message") ==
      "<!channel> critical authentication event observed " +
        "laforge@mozilla.com to projects/test, 216.160.83.56 [Milton/US]" +
        "\nalert id: AID")
    // 23:00Z = EST 18:00 (outside hours); Jan 5 13:30Z = EST Saturday
    // (weekday rule) — both take the standard escalation
    for (ts <- Seq(1546383600000L, 1546695000000L)) {
      val std = out(ts)
      assert(std.getAs[String]("notify_email_direct") ==
        "section31@mozilla.com")
      assert(std.getAs[String]("notify_slack_supplementary") == "test")
      assert(std.getAs[String]("slack_supplementary_message") ==
        "critical authentication event observed laforge@mozilla.com to " +
          "projects/test, 216.160.83.56 [Milton/US]" +
          "\nNotification has been sent to section31@mozilla.com" +
          "\nalert id: AID")
    }
    // no notification email configured: standard escalations say so
    // and carry no direct-email route
    val out2 = run(None)
    assert(out2(1546349400000L).getAs[String]("slack_supplementary_message")
      .startsWith("<!channel> "))
    for (ts <- Seq(1546383600000L, 1546695000000L)) {
      assert(out2(ts).getAs[String]("notify_email_direct") == null)
      assert(out2(ts).getAs[String]("slack_supplementary_message").contains(
        "\nNotification has been sent to no one! <!channel>\nalert id: AID"))
    }
  }

  test("authprof_critobj4: AWS SwitchRole crit object through the account map (ref TestCritObject#critObjectAwsSwitchRoleTest)") {
    val parsed = Parser.parse(lines("authprof_critobj4.txt")).toDF()
      .filter(col("payloadType") === "cloudtrail")
    // the identity manager's aws_account_map, as a literal-map Column
    val obj = operators.Identity.mapAwsAccount(
      col("normalized.objectValue"), Map(
        "123456789" -> "riker-vacationing-on-risa",
        "123456789012" -> "mock-aws-account-name",
        "999999999999" -> "super-important-account"))
    val out = operators.AuthState.critObjectAnalyze(parsed,
      col("timestamp"), col("normalized.subjectUser"), obj,
      col("normalized.sourceAddress"),
      Seq("^projects/test$", "super-important-account"),
      critNotifyEmail = Some("section31@mozilla.com")).collect()
    assert(out.length == 1)
    val a = out.head
    // the SwitchFrom ARN's user resource, not the assumed-role arn
    assert(a.getAs[String]("username") == "uhura")
    assert(a.getAs[String]("object") == "super-important-account")
    assert(a.getAs[String]("sourceaddress") == "127.0.0.1")
    assert(a.getAs[String]("summary") ==
      "critical authentication event observed uhura to " +
        "super-important-account, 127.0.0.1 [unknown/unknown]")
    assert(a.getAs[String]("notify_email_direct") == "section31@mozilla.com")
    assert(a.getAs[String]("severity") == "critical")
  }

  test("authprof_critobj5+6: session-gap suppression extends on suppressed alerts, keys on address (ref TestCritObject#critObjectWithSessionBasedSuppression*)") {
    def critEmitted(fixture: String): Seq[(String, Long)] = {
      val crit = operators.AuthState.critObjectAnalyze(
        Parser.parse(lines(fixture)).toDF()
          .filter(col("payloadType") === "gcpaudit"),
        col("timestamp"), col("normalized.subjectUser"),
        col("normalized.objectValue"), col("normalized.sourceAddress"),
        Seq("^projects/test$", "super-important-account"))
      operators.Stateful.suppressSession(crit,
        timestamp_millis(col("ts_ms")), col("suppression_key"), 1800L)
        .collect().map(r => (r.getAs[String]("key"),
          r.getAs[Long]("ts_us") / 1000)).toSeq.sortBy(_._2)
    }
    // critobj5: 13:30 emits, 13:55 suppressed (25m < 30m gap),
    // 14:30 re-emits (35m since the SUPPRESSED 13:55 > 30m)
    val e5 = critEmitted("authprof_critobj5.txt")
    assert(e5.map(_._2) == Seq(1546349400000L, 1546353000000L))
    // critobj6: the suppression key carries the source address, so the
    // 13:55 event from a NEW address is not suppressed
    val e6 = critEmitted("authprof_critobj6.txt")
    assert(e6.length == 2)
    assert(e6.map(_._1).distinct.length == 2)
    assert(e6.map(_._2) == Seq(1546349400000L, 1546350900000L))
  }

  test("authprof_critobj5: the COMPOSED critObjects pipeline carries the session suppressor (ref AuthProfile.java:1053)") {
    // same expectations as the manual critObjectAnalyze+suppressSession
    // composition above, now through AuthProfilePipeline.critObjects —
    // pins that the pipeline wires AlertSuppressorSession(1800) on the
    // user_object_sourceaddress key exactly where the reference does
    val got = pipelines.AuthProfilePipeline.critObjects(
        lines("authprof_critobj5.txt"),
        pipelines.AuthProfilePipeline.Config(
          critObjectPatterns = Seq("^projects/test$",
            "super-important-account"),
          suppressSeconds = 1800))
      .collect().map(_.getAs[Long]("ts_ms")).sorted.toSeq
    assert(got == Seq(1546349400000L, 1546353000000L))
  }

  test("watchlist_analyze_buffer2: engine-produced alert JSON parses with metadata incl. list keys") {
    val parsed = Parser.parse(lines("watchlist_analyze_buffer2.txt")).toDF()
      .filter(col("payloadType") === "alert")
      .select(element_at(col("fields"), "summary").as("summary"),
        element_at(col("fields"), "category").as("category"),
        element_at(col("fields"), "meta_sourceaddress").as("src"),
        element_at(col("fields"), "meta_email").as("emails"))
      .collect()
    assert(parsed.nonEmpty)
    val first = parsed.head
    assert(first.getAs[String]("category") == "customs")
    assert(first.getAs[String]("src") == "10.0.0.1")
    // the ", "-joined list-valued email key splits back to 3 accounts
    val emails = graft.model.AlertMeta.splitListValues(
      graft.model.AlertMeta.Email, first.getAs[String]("emails"))
    assert(emails == Seq("example@enterprise.com",
      "another_example@enterprise.com",
      "yet_another_example@enterprise.com"))
  }

  test("httpreq_perendpointerrorrate1: per-client monitored-path error counts (ref TestPerEndpointErrorRateAnalysis)") {
    val parsed = parsedHttp(lines(
      "httpreq_perendpointerrorrate1/httpreq_perendpointerrorrate1_1.txt",
      "httpreq_perendpointerrorrate1/httpreq_perendpointerrorrate1_2.txt",
      "httpreq_perendpointerrorrate1/httpreq_perendpointerrorrate1_3.txt"))
    val out = HttpHeuristics.perEndpointErrorRate(
      parsed.filter(col("normalized.requestStatus").between(400, 499)),
      col("timestamp"), col("normalized.sourceAddress"),
      col("normalized.requestMethod"), col("normalized.urlRequestPath"),
      "1 minute", Seq(HttpHeuristics.ErrorRule("GET", "/test", 4))).collect()
    // .1 (1+4 GET errors, latest 45s) and .2 (5 at 0s) clear the
    // 4-error GET rule; .3's five errors split 3 GET + 2 POST and .4
    // has one — neither alerts (the reference test asserts exactly
    // the .1 and .2 alerts)
    val byAddr = out.map(r => r.getAs[String]("addr") ->
      (r.getAs[Long]("n_errors"), r.getAs[Long]("latest_error_ms"))).toMap
    assert(byAddr == Map(
      "192.168.1.1" -> (5L, 45000L),
      "192.168.1.2" -> (5L, 0L)))
    assert(out.forall(_.getAs[Long]("window_start_ms") == 0L))
  }

  test("httpreq_perendpointerrorrate2+4: repeat batches still one alert per client; sub-threshold stays silent (ref TestPerEndpointErrorRateAnalysis)") {
    def run(files: String*) = {
      val parsed = parsedHttp(lines(files: _*))
      HttpHeuristics.perEndpointErrorRate(
        parsed.filter(col("normalized.requestStatus").between(400, 499)),
        col("timestamp"), col("normalized.sourceAddress"),
        col("normalized.requestMethod"), col("normalized.urlRequestPath"),
        "1 minute",
        // rate2's configured rule is 4:GET:/t.* (rate4 overrides below
        // covers the digit-guessing pattern); paths FULL-match
        Seq(HttpHeuristics.ErrorRule("GET", "/t.*", 4))).collect()
    }
    // rate2: the same two clients as rate1 spread across three
    // micro-batch files — per-(window, client) aggregation still
    // yields exactly one alert each (the reference's suppression
    // collapses the repeats; batch windows make it structural)
    val o2 = run(
      "httpreq_perendpointerrorrate2/httpreq_perendpointerrorrate2_1.txt",
      "httpreq_perendpointerrorrate2/httpreq_perendpointerrorrate2_2.txt",
      "httpreq_perendpointerrorrate2/httpreq_perendpointerrorrate2_3.txt")
    val byAddr2 = o2.map(r => r.getAs[String]("addr") ->
      r.getAs[Long]("n_errors")).toMap
    assert(byAddr2.keySet == Set("192.168.1.1", "192.168.1.2"))
    assert(byAddr2.values.forall(_ >= 5L))
    // rate4: the id-guessing pattern 4:GET:/test/(\d+)/profile —
    // exactly one client (192.168.1.3, 6 errors) over the rule
    val parsed4 = parsedHttp(lines(
      "httpreq_perendpointerrorrate4/httpreq_perendpointerrorrate4_1.txt"))
    val o4 = HttpHeuristics.perEndpointErrorRate(
      parsed4.filter(col("normalized.requestStatus").between(400, 499)),
      col("timestamp"), col("normalized.sourceAddress"),
      col("normalized.requestMethod"), col("normalized.urlRequestPath"),
      "1 minute",
      Seq(HttpHeuristics.ErrorRule("GET", "/test/(\\d+)/profile", 4)))
      .collect()
    assert(o4.length == 1)
    assert(o4.head.getAs[String]("addr") == "192.168.1.3")
    assert(o4.head.getAs[Long]("n_errors") == 6L)
  }

  test("pioneer/exfiltration2a-c: the growing session's early panes as batch prefixes (ref TestPioneer#pioneerExfiltration2)") {
    def run(files: String*) = {
      val parsed = Parser.parse(lines(files: _*)).toDF()
      pipelines.PioneerPipeline.exfiltrationFromFlows(parsed,
        thresholdSeconds = 3600, thresholdBytes = 100000000L,
        gapSeconds = 1200).collect()
    }
    def epoch(s: String) = java.time.Instant.parse(s).toEpochMilli
    // the first delivery alone is the reference's first early pane:
    // 1000004000 bytes ending 00:08
    val a = run("pioneer/exfiltration2a.txt")
    assert(a.length == 1)
    assert(a.head.getAs[String]("key") == "192.168.1.1-22")
    assert(a.head.getAs[Long]("bytes") == 1000004000L)
    assert(a.head.getAs[Long]("end_ms") == epoch("2020-01-01T00:08:00Z"))
    // the second delivery is zero-byte keepalives: the session end
    // advances but the byte total does not
    val ab = run("pioneer/exfiltration2a.txt", "pioneer/exfiltration2b.txt")
    assert(ab.length == 1)
    assert(ab.head.getAs[Long]("bytes") == 1000004000L)
    assert(ab.head.getAs[Long]("end_ms") > epoch("2020-01-01T00:08:00Z"))
    // with the third delivery the same session reaches 1000006000
    // bytes ending 00:18 — the reference's final pane
    val abc = run("pioneer/exfiltration2a.txt", "pioneer/exfiltration2b.txt",
      "pioneer/exfiltration2c.txt")
    assert(abc.length == 1)
    assert(abc.head.getAs[Long]("bytes") == 1000006000L)
    assert(abc.head.getAs[Long]("start_ms") == epoch("2020-01-01T00:02:00Z"))
    assert(abc.head.getAs[Long]("end_ms") == epoch("2020-01-01T00:18:00Z"))
  }

  test("pioneer/exfiltration1: vpc-flow session exceeds the byte threshold once (ref TestPioneer)") {
    val parsed = Parser.parse(lines("pioneer/exfiltration1.txt")).toDF()
    val out = pipelines.PioneerPipeline.exfiltrationFromFlows(parsed,
      thresholdSeconds = 3600, thresholdBytes = 100000000L,
      gapSeconds = 1200).collect()
    def epoch(s: String) = java.time.Instant.parse(s).toEpochMilli
    // one alert: 192.168.1.1:22, 1000009000 bytes over 00:02..00:18;
    // the 00:48 flow is a fresh session and 192.168.1.2 stays tiny
    assert(out.length == 1)
    assert(out.head.getAs[String]("key") == "192.168.1.1-22")
    assert(out.head.getAs[Long]("bytes") == 1000009000L)
    assert(out.head.getAs[Long]("start_ms") == epoch("2020-01-01T00:02:00Z"))
    assert(out.head.getAs[Long]("end_ms") == epoch("2020-01-01T00:18:00Z"))
    // instance name rides the parsed fields (alert INSTANCE_NAME)
    assert(parsed.filter(col("payloadType") === "gcp_vpc_flow")
      .select(element_at(col("fields"), "src_instance_name")).head()
      .getString(0) == "instancename")
  }

  test("privaterelay 1+2: real-address hash mismatches per uid (ref TestCustoms#privateRelayForwardTest)") {
    import spark.implicits._
    val parsed = Parser.parse(
        lines("privaterelay/privaterelay1.txt", "privaterelay/privaterelay2.txt"))
      .toDF()
      .filter(col("payloadType") === "privaterelay")
      .withColumn("seq", monotonically_increasing_id())
    val out = CustomsDetectors.privateRelayForward(parsed, col("timestamp"),
      col("seq"), element_at(col("fields"), "uid"),
      element_at(col("fields"), "event_type"),
      element_at(col("fields"), "real_address"))
      .select("uid", "actual", "expected")
      .as[(String, String, String)].collect().toSet
    // uid 0: relay hash flips from the rp-event-established a... to
    // b...; uid 1: from its first-seen c... to d... — two alerts, the
    // reference's exact expected/actual pairs
    assert(out == Set(
      ("0" * 32, "b" * 64, "a" * 64),
      ("1" * 32, "d" * 64, "c" * 64)))
  }

  test("authprof_awscorr1a+1b: cross-account AssumeRole halves pair and fix the subject (ref TestAwsAssumeRoleCorrelator)") {
    val ct = Parser.parse(
        lines("authprof_awscorr1a.txt", "authprof_awscorr1b.txt")).toDF()
      .filter(col("payloadType") === "cloudtrail" &&
        element_at(col("fields"), "event_name") === "AssumeRole")
      .withColumn("role_acct", regexp_extract(
        element_at(col("fields"), "request_role_arn"),
        "arn:aws:iam::(\\d+):", 1))
    val out = operators.AuthState.assumeRoleCorrelate(ct,
      element_at(col("fields"), "shared_event_id"), col("timestamp"),
      element_at(col("fields"), "event_id"),
      // trusting half carries no resolvable user (AWSAccount identity)
      needsFixup = col("normalized.subjectUser").isNull,
      // trusted half called into a different account's role
      isCrossAccount =
        col("role_acct") =!= element_at(col("fields"), "identity_account_id"),
      subjectUser = col("normalized.subjectUser"),
      gapSeconds = 120).collect()
    // the reference's correlated alert names uhura as the acting user
    assert(out.length == 1)
    assert(out.head.getAs[String]("fixed_user") == "uhura")
    assert(out.head.getAs[String]("shared_id") ==
      "1bfc7fd0-0c12-441d-b155-fe2442532683")
  }

  // shared helpers for the AssumeRole correlator variants
  private val awsAccountMap = Map(
    "123456789" -> "riker-vacationing-on-risa",
    "123456789012" -> "mock-aws-account-name",
    "999999999999" -> "super-important-account")

  private def assumeRoleAuth(df: org.apache.spark.sql.DataFrame) = df
    // the correlator consumes AUTH-normalized events only — the
    // reference's isAuthEvent gate keeps service calls out entirely
    .filter(col("payloadType") === "cloudtrail" &&
      array_contains(col("normalized.types"), "AUTH") &&
      element_at(col("fields"), "event_name") === "AssumeRole")
    .withColumn("role_acct", regexp_extract(
      element_at(col("fields"), "request_role_arn"),
      "arn:aws:iam::(\\d+):", 1))

  private def correlateAws(df: org.apache.spark.sql.DataFrame) =
    operators.AuthState.assumeRoleCorrelate(df,
      element_at(col("fields"), "shared_event_id"), col("timestamp"),
      element_at(col("fields"), "event_id"),
      needsFixup = col("normalized.subjectUser").isNull,
      isCrossAccount = col("role_acct") =!=
        element_at(col("fields"), "identity_account_id"),
      subjectUser = col("normalized.subjectUser"), gapSeconds = 120)

  test("authprof_awscorr1c: delayed trusted half still pairs; duplicated trusting half still one (ref #CrossAccountDelayBetweenEvents/#WithDuplicateEvent)") {
    // 1c is the trusted half arriving 70s after the trusting event
    val delayed = assumeRoleAuth(Parser.parse(
      lines("authprof_awscorr1a.txt", "authprof_awscorr1c.txt")).toDF())
    val out = correlateAws(delayed).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("fixed_user") == "uhura")
    // the trusting event delivered twice: same (shared id, event id)
    // dedupes first, one correlation either way
    val dup = assumeRoleAuth(Parser.parse(
      lines("authprof_awscorr1a.txt")).toDF()
      .union(Parser.parse(lines("authprof_awscorr1a.txt")).toDF())
      .union(Parser.parse(lines("authprof_awscorr1c.txt")).toDF()))
    assert(correlateAws(dup).count() == 1)
    // full chain: join the fixed subject back on the trusting half and
    // run crit-object analysis over the account map — the reference's
    // single "uhura to super-important-account" alert
    val corr = correlateAws(delayed)
    val trusting = delayed.filter(col("normalized.subjectUser").isNull)
      .join(corr, element_at(col("fields"), "shared_event_id") ===
        corr("shared_id"))
    val alerts = operators.AuthState.critObjectAnalyze(trusting,
      col("timestamp"), col("fixed_user"),
      operators.Identity.mapAwsAccount(col("normalized.objectValue"),
        awsAccountMap),
      col("normalized.sourceAddress"),
      Seq("^projects/test$", "super-important-account"),
      critNotifyEmail = Some("section31@mozilla.com")).collect()
    assert(alerts.length == 1)
    assert(alerts.head.getAs[String]("summary") ==
      "critical authentication event observed uhura to " +
        "super-important-account, 127.0.0.1 [unknown/unknown]")
  }

  test("authprof_awscorr2: same-account AssumeRole has no shared id — plain crit-object alert (ref #critObjectAwsAssumeRoleSameAccountTest)") {
    val parsed = Parser.parse(lines("authprof_awscorr2.txt")).toDF()
    // nothing to correlate: no shared event id
    assert(correlateAws(assumeRoleAuth(parsed)).count() == 0)
    val out = operators.AuthState.critObjectAnalyze(
      parsed.filter(col("payloadType") === "cloudtrail" &&
        array_contains(col("normalized.types"), "AUTH")),
      col("timestamp"), col("normalized.subjectUser"),
      operators.Identity.mapAwsAccount(col("normalized.objectValue"),
        awsAccountMap),
      col("normalized.sourceAddress"),
      Seq("^projects/test$", "super-important-account"),
      critNotifyEmail = Some("section31@mozilla.com")).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("username") == "uhura")
    assert(out.head.getAs[String]("object") == "super-important-account")
    assert(out.head.getAs[String]("sourceaddress") == "127.0.0.1")
  }

  test("authprof_awscorr3: AWSService AssumeRole is not an auth event — no alert, no correlation (ref #critObjectAwsAssumeRoleCrossAccountAwsService)") {
    val parsed = Parser.parse(lines("authprof_awscorr3.txt")).toDF()
      .filter(col("payloadType") === "cloudtrail")
    assert(parsed.count() == 1)
    // the isAuthEvent gate: service-invoked assume-role is NOT
    // normalized AUTH, so neither the correlator nor the crit-object
    // path ever sees it — despite the shared event id
    assert(parsed.filter(
      array_contains(col("normalized.types"), "AUTH")).count() == 0)
    assert(parsed.head().getAs[org.apache.spark.sql.Row]("normalized")
      .getAs[String]("objectValue") == null)
    assert(correlateAws(assumeRoleAuth(parsed)).count() == 0)
  }

  test("authprof_awscorr4: late duplicate trusted events keep the first pairing timestamp (ref #critObjectAwsAssumeRoleCrossAccountWithSuppression)") {
    val all = assumeRoleAuth(Parser.parse(lines("authprof_awscorr1a.txt",
      "authprof_awscorr1c.txt", "authprof_awscorr4.txt")).toDF())
    // awscorr4's two re-deliveries share (shared id, event id) with 1c
    // but carry timestamps 13 and 33 minutes later: earliest-wins
    // dedupe must keep 1c's 70s-gap pairing — a latest-pick would fall
    // outside the correlation gap and drop the alert entirely
    val out = correlateAws(all).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("fixed_user") == "uhura")
    assert(out.head.getAs[String]("shared_id") ==
      "1bfc7fd0-0c12-441d-b155-fe2442532683")
  }

  test("customs_contentserver: variance view gates account enumeration (ref TestCustoms#accountEnumerationWithContentServerVarianceTest)") {
    // status-abuse events plus real fxa-content lines: sources with
    // organic content-server activity are exempt from enumeration
    val all = Parser.parse(lines("customs_account_status_abuse1.txt",
      "customs_contentserver.txt")).toDF().cache()
    val fxa = parsedFxa(lines("customs_account_status_abuse1.txt"))
      .withColumn("path", element_at(col("fields"), "path"))
    val variance = CustomsDetectors.contentServerVariance(
      all.filter(col("payloadType") === "fxacontent"),
      col("timestamp"), col("normalized.sourceAddress"), "10 minutes")
    val isStatusCheck = col("summary").isin(
      "accountStatusCheckSuccess", "accountStatusCheckBlocked")
    val gated = CustomsDetectors.accountEnumeration(fxa, col("timestamp"),
      col("src"), col("email"), col("path"), isStatusCheck,
      "10 minutes", threshold = 3,
      variance = Some(variance), minVarianceClients = 3)
    val ungated = CustomsDetectors.accountEnumeration(fxa, col("timestamp"),
      col("src"), col("email"), col("path"), isStatusCheck,
      "10 minutes", threshold = 3).collect()
      .map(_.getAs[String]("src")).toSet
    val gatedSrcs = gated.collect().map(_.getAs[String]("src")).toSet
    val varianceSrcs = variance.collect()
      .map(_.getAs[String]("src")).toSet
    // without the view both enumerators alert; with it 10.0.0.3's
    // organic content-server activity exempts it — the reference
    // asserts exactly the single 10.0.0.1 alert
    assert(ungated == Set("10.0.0.1", "10.0.0.3"))
    assert(varianceSrcs.contains("10.0.0.3"))
    assert(gatedSrcs == Set("10.0.0.1"))
    all.unpersist()
  }

  // --- AMO fixtures ---------------------------------------------------

  private def parsedAmo(ds: Dataset[String]): DataFrame =
    Parser.parse(ds).toDF()
      .filter(col("payloadType") === "amodocker")

  test("amo_multimatch/block1: ten accounts sharing one upload hash (ref TestAmo#testMultiMatch)") {
    val amo = parsedAmo(lines("amo_multimatch/block1.txt"))
      .filter(element_at(col("fields"), "amo_type") === "fileuploadmnt")
    val out = operators.AmoDetectors.addonMultiMatch(amo, col("timestamp"),
      element_at(col("fields"), "upload_hash"),
      element_at(col("fields"), "email"),
      "30 minutes", alertOn = 10).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_emails") == 10L)
    assert(out.head.getAs[String]("upload_hash") ==
      "sha256:e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
  }

  test("amo_fxaaliasabuse/dotnormalizationabuse: six dot-aliases of one account (ref TestAmo#testFxaAliasAbuseDotNormalization)") {
    val amo = parsedAmo(lines("amo_fxaaliasabuse/dotnormalizationabuse.txt"))
      .filter(element_at(col("fields"), "amo_type") === "fxalogin")
    val out = operators.AmoDetectors.fxaAccountAbuseAlias(amo,
      col("timestamp"), element_at(col("fields"), "email"),
      gapSeconds = 1800, maxAliases = 5).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("email_normalized") ==
      "test12345@example-email.com")
    assert(out.head.getAs[Long]("n_aliases") == 6L)
  }

  // --- AuthProfile state-analysis fixtures (ref TestAuthProfile) ------

  /** The reference's MaxMind City test database through our MMDB
    * binary reader. */
  private lazy val cityResolver: graft.parse.GeoIp.GeoIpResolver = {
    val p = java.nio.file.Paths.get(refData, "GeoIP2-City-Test.mmdb")
    assume(java.nio.file.Files.exists(p))
    new graft.parse.MaxmindDb.MmdbResolver(
      new graft.parse.MaxmindDb(java.nio.file.Files.readAllBytes(p)))
  }

  /** The reference's identitymanager.json, parsed to the alias table
    * Identity.resolve consumes (alias → canonical, canonical →
    * canonical) and the named-subnet list. */
  private lazy val idManagerJson = {
    val p = java.nio.file.Paths.get(refData, "identitymanager.json")
    assume(java.nio.file.Files.exists(p))
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(p.toFile)
  }

  private def aliasDf: DataFrame = {
    import spark.implicits._
    scala.jdk.CollectionConverters
      .IteratorHasAsScala(idManagerJson.get("identities").fields()).asScala
      .flatMap { e =>
        val canonical = e.getKey
        val al = e.getValue.path("aliases")
        val aliases =
          if (!al.isArray) Nil
          else scala.jdk.CollectionConverters
            .IteratorHasAsScala(al.elements()).asScala.map(_.asText()).toSeq
        aliases.map(a => (a, canonical))
      }.toSeq.toDF("alias", "canonical")
  }

  private def namedSubnets: Seq[(String, String)] =
    scala.jdk.CollectionConverters
      .IteratorHasAsScala(idManagerJson.path("named_subnets").fields())
      .asScala.map(e => (e.getKey, e.getValue.asText())).toSeq

  import graft.operators.AuthState

  test("authprof_buffer1: one new-source + one deduped known for the resolved identity (ref TestAuthProfile#analyzeTest)") {
    // object + username come from the syslog preamble / sshd line
    val parsed = pipelines.AuthProfilePipeline.parsedAuth(
      lines("authprof_buffer1.txt"))
    val first = parsed.select(col("normalized.subjectUser"),
      col("normalized.objectValue"), col("normalized.sourceAddress")).head()
    assert(first.getString(0) == "riker")
    assert(first.getString(1) == "emit-bastion")
    assert(first.getString(2) == "216.160.83.56")
    val out = pipelines.AuthProfilePipeline.stateAnalysis(
      lines("authprof_buffer1.txt"), aliasDf, cityResolver).collect()
    // 5 duplicate events: 1 new source (no prior state -> the
    // reference's minfraud/geo-failure escalation), 1 known, 3 deduped
    assert(out.length == 2)
    assert(out.forall(_.getAs[String]("key") == "wriker@mozilla.com"))
    assert(out.forall(_.getAs[String]("addr") == "216.160.83.56"))
    assert(out.forall(_.getAs[Long]("ts_ms") == 1537308938000L))
    val actions = out.map(_.getAs[String]("action"))
    assert(actions.count(_ == AuthState.UnknownGeoFailure) == 1)
    assert(actions.count(_ == AuthState.KnownIp) == 1)
  }

  test("authprof_buffer1 + insights_hosting1: the hosting-provider flag pre-empts the geo-failure classification (ref AuthProfile.java:663-690 + the cacheInsightsResource seam)") {
    val p = java.nio.file.Paths.get(refData, "minfraud/insights_hosting1.json")
    assume(java.nio.file.Files.exists(p))
    val resolver = new graft.parse.Minfraud.JsonInsightsResolver(Map(
      "216.160.83.56" ->
        new String(java.nio.file.Files.readAllBytes(p), "UTF-8")))
    val out = pipelines.AuthProfilePipeline.stateAnalysis(
      lines("authprof_buffer1.txt"), aliasDf, cityResolver,
      insights = Some(resolver)).collect()
    assert(out.length == 2)
    val actions = out.map(_.getAs[String]("action"))
    // the new source now escalates as a hosting provider; the repeat
    // stays known (flags never demote a known address)
    assert(actions.count(_ == AuthState.UnknownHostingProvider) == 1)
    assert(actions.count(_ == AuthState.KnownIp) == 1)
  }

  test("authprof_buffer2: mixed sshd/gcpaudit/cloudtrail — 2 new sources, AWS Internal dropped, untracked kept (ref TestAuthProfile#analyzeMixedTest)") {
    val out = pipelines.AuthProfilePipeline.stateAnalysis(
      lines("authprof_buffer2.txt"), aliasDf, cityResolver).collect()
    val wriker = out.filter(_.getAs[String]("key") == "wriker@mozilla.com")
      .map(r => (r.getAs[String]("addr"), r.getAs[String]("action")))
    // sshd 2018-09: new + deduped known; gcpaudit 2019-01 via alias
    // riker@mozilla.com from 127.0.0.1: the 10-day entry-age prune has
    // forgotten 2018's address and 127.0.0.1 has no geo -> geo-failure
    // new source — the reference's 2 new + 1 known for this identity
    assert(wriker.count(_ == (("216.160.83.56", AuthState.UnknownGeoFailure))) == 1)
    assert(wriker.count(_ == (("216.160.83.56", AuthState.KnownIp))) == 1)
    assert(wriker.count(_ == (("127.0.0.1", AuthState.UnknownGeoFailure))) == 1)
    assert(wriker.length == 3)
    // laforge has no identitymanager entry: untracked, keyed by itself
    // (the reference's second informational)
    val laforge = out.filter(_.getAs[String]("key") == "laforge@mozilla.com")
    assert(laforge.length == 1)
    assert(laforge.head.getAs[String]("addr") == "127.0.0.1")
    // the cloudtrail ConsoleLogin row carries source "AWS Internal"
    // and must have been dropped before analysis
    assert(out.length == 4)
    assert(!out.exists(_.getAs[String]("addr") == "AWS Internal"))
  }

  test("authprof_buffer3: named-subnet entry keys — second office v6 address is KNOWN (ref TestAuthProfile#analyzeNamedSubnetsTest)") {
    val out = pipelines.AuthProfilePipeline.stateAnalysis(
        lines("authprof_buffer3.txt"), aliasDf, cityResolver,
        namedSubnets = namedSubnets)
      .collect()
    assert(out.forall(_.getAs[String]("key") == "wriker@mozilla.com"))
    // all five events share one timestamp, so which office address the
    // scan meets first is tie-dependent — like the reference's own
    // test, assert the order-independent facts: the office SUBNET
    // produces exactly ONE new source across its two addresses (the
    // other classifies known against the shared entry), and aaaa::1
    // (outside every named subnet) is its own new source
    val fd = out.filter(_.getAs[String]("addr").startsWith("fd00"))
    assert(fd.nonEmpty)
    assert(fd.forall(_.getAs[String]("entry_key") == "office"))
    assert(fd.count(_.getAs[String]("action") != AuthState.KnownIp) == 1)
    assert(fd.exists(_.getAs[String]("action") == AuthState.KnownIp))
    val aa = out.filter(_.getAs[String]("addr").startsWith("aaaa"))
    assert(aa.count(_.getAs[String]("action") != AuthState.KnownIp) == 1)
    assert(aa.count(_.getAs[String]("action") == AuthState.KnownIp) == 1)
    assert(aa.forall(_.getAs[String]("entry_key") == null))
    // the reference's 2-new-source expectation: fd00 once + aaaa once
    assert(out.count(r => r.getAs[String]("action") != AuthState.KnownIp) == 2)
  }

  test("authprof_buffer5: GCP-origin audit event parses as untracked session auth (ref TestAuthProfile#analyzeGcpAlertIOIgnoreTest)") {
    val out = pipelines.AuthProfilePipeline.stateAnalysis(
      lines("authprof_buffer5.txt"), aliasDf, cityResolver).collect()
    // laforge is untracked; the single event is a new source
    assert(out.length == 1)
    assert(out.head.getAs[String]("key") == "laforge@mozilla.com")
    assert(out.head.getAs[String]("addr") == "35.232.216.1")
    assert(out.head.getAs[String]("action") != AuthState.KnownIp)
  }

  test("authprof_buffer6: auth0 tenant logs — client-id gate, prompt username, clientName object (ref TestAuthProfile#analyzeTestAuth0)") {
    // the reference analyzes only configured auth0ClientIds
    val parsed = pipelines.AuthProfilePipeline.parsedAuthEnriched(
        lines("authprof_buffer6.txt"), cityResolver)
      .filter(!(col("payloadType") === "auth0") ||
        element_at(col("fields"), "client_id") === "1234567890")
    // username comes from details.prompts[].user_name, the object is
    // the tenant application
    assert(parsed.count() == 3)
    val row = parsed.select(col("normalized.subjectUser"),
      col("normalized.objectValue"), col("normalized.sourceAddress")).head()
    assert(row.getString(0) == "wriker@mozilla.com")
    assert(row.getString(1) == "www.enterprise.com")
    assert(row.getString(2) == "216.160.83.56")
    val resolved = graft.operators.Identity.resolve(parsed,
      col("normalized.subjectUser"), aliasDf)
    val out = AuthState.stateAnalyze(resolved, col("timestamp"),
      unix_micros(col("timestamp")), col("identity"),
      col("normalized.sourceAddress"),
      col("normalized.geo.latitude"), col("normalized.geo.longitude"),
      pruneAgeSeconds = 864000L, maxKmStatic = 800.0,
      dedupeWindowSeconds = Some(86400L)).collect()
    // 3 gated events: 1 new + 1 known + 1 deduped, all wriker
    assert(out.length == 2)
    assert(out.forall(_.getAs[String]("key") == "wriker@mozilla.com"))
    assert(out.count(_.getAs[String]("action") == AuthState.KnownIp) == 1)
  }

  test("authprof_buffer7: preloaded model entry makes the new source WITHIN geo (ref TestAuthProfile#analyzeTestMaxDistance)") {
    val spark2 = spark
    import spark2.implicits._
    val auth = pipelines.AuthProfilePipeline.parsedAuthEnriched(
      lines("authprof_buffer7.txt"), cityResolver)
    val resolved = graft.operators.Identity.resolve(auth,
        col("normalized.subjectUser"), aliasDf)
      .select(col("identity").as("key"), col("timestamp"),
        unix_micros(col("timestamp")).as("seq"),
        col("normalized.sourceAddress").as("addr"),
        col("normalized.geo.latitude").as("lat"),
        col("normalized.geo.longitude").as("lon"))
    // the reference preloads the state model with 89.160.20.128 at
    // (58.4162, 15.6162) one hour before; the batch analogue is a
    // prior event row
    val fixtureTsUs = resolved.select(min(unix_micros(col("timestamp"))))
      .head().getLong(0)
    val preload = Seq(("wriker@mozilla.com",
        new java.sql.Timestamp((fixtureTsUs - 3600000000L) / 1000L),
        0L, "89.160.20.128", Some(58.4162), Some(15.6162)))
      .toDF("key", "timestamp", "seq", "addr", "lat", "lon")
    val out = AuthState.stateAnalyze(preload.union(resolved),
        col("timestamp"), col("seq"), col("key"), col("addr"),
        col("lat"), col("lon"),
        pruneAgeSeconds = 864000L, maxKmStatic = 800.0,
        dedupeWindowSeconds = Some(86400L)).collect()
      .filter(_.getAs[String]("addr") == "89.160.20.112")
    // Linköping (test MMDB) vs the preloaded entry: ~a few km, far
    // under the 800 km static max -> new-but-WITHIN-geo notification,
    // then 1 known (third duplicate deduped)
    assert(out.length == 2)
    val nw = out.filter(_.getAs[String]("action") == AuthState.UnknownWithinGeo)
    assert(nw.length == 1)
    assert(nw.head.getAs[String]("prev_addr") == "89.160.20.128")
    assert(nw.head.getAs[Long]("km_centi") < 80000L)
    assert(out.count(_.getAs[String]("action") == AuthState.KnownIp) == 1)
  }

  test("authprof_buffer8: GCP-internal placeholder sources produce ZERO events (ref TestAuthProfile#testFilterGcpInternal)") {
    val out = pipelines.AuthProfilePipeline.parsedAuth(
      lines("authprof_buffer8.txt"))
    assert(out.count() == 0)
  }

  // --- Customs velocity / comparator / activity fixtures --------------

  test("customs_velocity1: Milton→London, 7740.82 km in 9 s, exactly one alert (ref TestCustoms#velocityTest)") {
    val spark2 = spark
    import spark2.implicits._
    val resolver = cityResolver
    val geoOf = udf((ip: String) =>
      resolver.lookup(ip).map(g => (g.latitude, g.longitude)))
    val fxa = parsedFxa(lines("customs_velocity1.txt"))
      .filter(col("summary") === "loginSuccess")
      .withColumn("uid", element_at(col("fields"), "uid"))
      .withColumn("geo", geoOf(col("src")))
    val out = CustomsDetectors.velocity(fxa, col("timestamp"),
        unix_micros(col("timestamp")), col("uid"), col("email"),
        col("src"), col("geo._1"), col("geo._2"),
        maxKmPerSecond = 800.0 / 3600.0, minDistanceKm = 0).collect()
    // the 12-h return to Milton stays under 800 km/h: one alert only
    assert(out.length == 1)
    val a = out.head
    assert(a.getAs[String]("uid") == "00000000000000000000000000000000")
    assert(a.getAs[String]("email") == "riker@mozilla.com")
    assert(a.getAs[String]("addr") == "81.2.69.192")
    assert(a.getAs[String]("prev_addr") == "216.160.83.56")
    assert(a.getAs[Long]("td_s") == 9L)
    // the reference's summary says "7740.82 km"
    assert(a.getAs[Long]("km_centi") == 774082L)
    // the geo the reference renders: London/GB from Milton/US
    assert(resolver.lookup("81.2.69.192").flatMap(_.city).contains("London"))
    assert(resolver.lookup("216.160.83.56").flatMap(_.city).contains("Milton"))
  }

  test("customs_status_comparator1+2: monitored-address hit then at-risk login failure (ref TestCustoms#statusComparatorTest)") {
    val spark2 = spark
    import spark2.implicits._
    val monitored = fixture("customs_status_comparator_address_list.txt").toDS()
    val fxa = parsedFxa(lines("customs_status_comparator1.txt",
        "customs_status_comparator2.txt"))
      .withColumn("path", element_at(col("fields"), "path"))
    val checks = fxa.filter(col("summary").isin(
      "accountStatusCheckSuccess", "accountStatusCheckBlocked"))
    val hits = CustomsDetectors.statusComparator(checks, col("timestamp"),
      col("src"), col("email"), monitored).collect()
    // only spock's status check comes from a listed address
    assert(hits.length == 1)
    assert(hits.head.getAs[String]("email") == "spock@mozilla.com")
    assert(hits.head.getAs[String]("src") == "3.3.3.3")
    // a comparator hit marks the account at risk; spock's later login
    // failure then alerts (kirk/uhura fail too but were never flagged)
    val flags = hits.map(r => (r.getAs[String]("email"),
      r.getAs[Long]("ts_ms"))).toSeq.toDF("email", "flag_ms")
    val failures = fxa.filter(col("summary") === "loginFailure")
      .select(col("email"), unix_millis(col("timestamp")).as("ts_ms"),
        col("src"))
    val atRisk = failures.join(flags, Seq("email"))
      .filter(col("ts_ms") >= col("flag_ms")).collect()
    assert(atRisk.length == 1)
    assert(atRisk.head.getAs[String]("email") == "spock@mozilla.com")
    assert(atRisk.head.getAs[String]("src") == "10.0.1.11")
  }

  test("customs_status_comparator: streaming at-risk twin flags then alerts across batches (ref TestCustoms#statusComparatorTest)") {
    val spark2 = spark
    import spark2.implicits._
    // the same fixture content through the streaming at-risk state op:
    // batch 1 = comparator hits (flags), batch 2 = login failures
    val monitored = fixture("customs_status_comparator_address_list.txt").toDS()
    val b1 = parsedFxa(lines("customs_status_comparator1.txt"))
    val flagged = CustomsDetectors.statusComparator(
      b1.filter(col("summary").isin("accountStatusCheckSuccess",
        "accountStatusCheckBlocked")),
      col("timestamp"), col("src"), col("email"), monitored)
      .collect().map(r => graft.streaming.Streaming.AccountEvent(
        r.getAs[String]("email"), r.getAs[Long]("ts_ms") * 1000L, "flag"))
    val fails = parsedFxa(lines("customs_status_comparator2.txt"))
      .filter(col("summary") === "loginFailure").collect()
      .map(r => graft.streaming.Streaming.AccountEvent(
        r.getAs[String]("email"),
        r.getAs[java.sql.Timestamp]("timestamp").getTime * 1000L, "fail"))
    implicit val sqlCtx = spark2.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.Streaming.AccountEvent]
    val q = graft.streaming.Streaming.atRiskAccounts(in.toDS())
      .writeStream.format("memory").queryName("atrisk_replay")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      in.addData(flagged.toIndexedSeq: _*)
      q.processAllAvailable()
      in.addData(fails.toIndexedSeq: _*)
      q.processAllAvailable()
      val got = spark2.table("atrisk_replay")
        .as[graft.streaming.Streaming.AtRiskAlert].collect()
      assert(got.length == 1)
      assert(got.head.key == "spock@mozilla.com")
    } finally q.stop()
  }

  test("authprof_geovelocity buffers: impossible travel Milton→London alerts, the slow return does not") {
    // (dead fixtures upstream — no reference test reads them — but
    // they are real bastion logs spanning three MMDB cities, ideal
    // for the impossible-travel branch)
    val out = pipelines.AuthProfilePipeline.analyze(
      lines("authprof_geovelocity_buffer1.txt",
        "authprof_geovelocity_buffer2.txt",
        "authprof_geovelocity_buffer3.txt"),
      aliasDf, cityResolver,
      pipelines.AuthProfilePipeline.Config(maxKmh = 800.0)).collect()
    // Milton -> London one hour later is ~7700 km/h; the later hops
    // (London repeat at the same instant dedupes to speed 0 within
    // suppression, Linköping 4.7 days later is slow) stay silent
    assert(out.length == 1)
    val a = out.head
    assert(a.getAs[String]("identity") == "wriker@mozilla.com")
    assert(a.getAs[String]("subcategory") == "geo_velocity")
    assert(a.getAs[Long]("speed_kmh") > 5000L)
  }

  test("detectnat1 + detectnatlist1: UA-variety NAT view plus known gateways (ref TestDetectNat)") {
    val spark2 = spark
    import spark2.implicits._
    val parsed = parsedHttp(lines("detectnat1.txt"))
    val detected = graft.operators.Heuristics.distinctCardinality(
        parsed, col("timestamp"), col("normalized.sourceAddress"),
        col("normalized.userAgent"), "1 minute", minDistinct = 2)
      .select(col("key")).distinct()
      .as[String].collect().toSet
    // 192.168.1.1 rotates two agents in-window; 192.168.1.2 does not
    assert(detected == Set("192.168.1.1"))
    // with the known-gateway file the view unions in 192.168.1.2
    val known = fixture("detectnatlist1.txt").toSet
    assert((detected ++ known) == Set("192.168.1.1", "192.168.1.2"))
  }

  test("alertsummary_buffer1: sliding pane compare reproduces the reference's three threshold alerts (ref TestPostProcessing#alertSummaryThreshold)") {
    val parsed = Parser.parse(lines("alertsummary_buffer1.txt")).toDF()
      .filter(col("payloadType") === "alert")
      .select(col("timestamp"),
        element_at(col("fields"), "meta_monitored_resource").as("mr"),
        element_at(col("fields"), "category").as("cat"),
        element_at(col("fields"), "meta_category").as("subcat"))
    assert(parsed.count() == 57)
    val rules = Seq(graft.operators.Heuristics.SummaryThreshold(
      "*", 50.0, 50.0, 1))
    // 15-minute comparison (30-minute sliding width): the reference's
    // 1→10 increase at 00:00 and 5→1 decrease at 00:45 — and nothing
    // else (halves with zero alerts skip, so the 10→0 silence and the
    // 0→20 burst never compare)
    val small = graft.operators.Heuristics.alertSummaryPanes(parsed,
      col("timestamp"), col("mr"), col("cat"), col("subcat"),
      widthMinutes = 30, rules).collect()
      .map(r => (r.getAs[Long]("window_start_ms"), r.getAs[Long]("old_n"),
        r.getAs[Long]("new_n"))).toSet
    assert(small == Set(
      (1577836800000L, 1L, 10L), // 2020-01-01T00:00, 1 -> 10
      (1577839500000L, 5L, 1L))) // 2020-01-01T00:45, 5 -> 1
    // 1-hour comparison (2-hour width): the 16 -> 41 increase
    val large = graft.operators.Heuristics.alertSummaryPanes(parsed,
      col("timestamp"), col("mr"), col("cat"), col("subcat"),
      widthMinutes = 120, rules).collect()
      .map(r => (r.getAs[Long]("window_start_ms"), r.getAs[Long]("old_n"),
        r.getAs[Long]("new_n"))).toSet
    assert(large == Set((1577836800000L, 16L, 41L)))
  }

  test("httpreq_multi1.json: MULTIPLEX config drives per-resource toggled analyses (ref TestMulti#testMulti1)") {
    val spark2 = spark
    import spark2.implicits._
    val cfgPath = java.nio.file.Paths.get(refData, "httpreq_multi1.json")
    assume(java.nio.file.Files.exists(cfgPath))
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(cfgPath.toFile)
    assert(root.path("input").path("mode").asText() == "MULTIPLEX")
    // build the multiplexed frame exactly as the config declares it:
    // one named element per resource, its file inputs resolved into
    // the reference checkout
    val elems = scala.jdk.CollectionConverters
      .IteratorHasAsScala(root.path("input").path("elements").elements())
      .asScala.map { e =>
        val name = e.path("name").asText()
        val files = scala.jdk.CollectionConverters
          .IteratorHasAsScala(e.path("file_inputs").elements()).asScala
          .map(_.asText().split("/testdata/").last).toSeq
        name -> files
      }.toSeq
    assert(elems.map(_._1) == Seq("resource1", "resource2"))
    val mux = sources.Multiplex.union(elems.map { case (n, fs) =>
      sources.Multiplex.named(lines(fs: _*), n)
    })
    // per-resource service toggles route each branch to its analyses
    val toggles = root.path("service_toggles")
    val analyses: Map[String,
        org.apache.spark.sql.Dataset[String] => DataFrame] =
      elems.map { case (n, _) =>
        val t = toggles.path(n)
        n -> { (ls: org.apache.spark.sql.Dataset[String]) =>
          val parsed = parsedHttp(ls)
          val raw =
            if (t.path("enable_hard_limit_analysis").asBoolean(false))
              Heuristics.hardLimit(parsed, col("timestamp"),
                  col("normalized.sourceAddress"), "1 minute",
                  t.path("hard_limit_request_count").asLong(10))
                .withColumn("kind", lit("hard_limit"))
                .withColumnRenamed("n", "count")
            else
              Heuristics.errorRate(parsed, col("timestamp"),
                  col("normalized.sourceAddress"),
                  col("normalized.requestStatus").between(400, 499),
                  "1 minute", maxErrors = 30)
                .withColumn("kind", lit("error_rate"))
                .withColumnRenamed("errors", "count")
          if (!t.path("enable_nat_detection").asBoolean(false)) raw
          else { // UA-variety NAT gateways are exempt, per the toggle
            val nat = Heuristics.distinctCardinality(parsed,
              col("timestamp"), col("normalized.sourceAddress"),
              col("normalized.userAgent"), "1 minute", minDistinct = 2)
            raw.join(nat.select(col("window_start_ms"), col("key")),
              Seq("window_start_ms", "key"), "left_anti")
          }
        }
      }.toMap
    val out = sources.Multiplex.analyzeAll(mux, analyses).collect()
    // the reference's two alerts, each tagged with ITS resource: the
    // hard limit fires only on resource2's stream, the error rate
    // only on resource1's — per-branch config isolation
    assert(out.length == 2)
    val byRes = out.map(r => r.getAs[String]("resource") ->
      (r.getAs[String]("kind"), r.getAs[String]("key"),
        r.getAs[Long]("count"))).toMap
    assert(byRes("resource1") == (("error_rate", "10.0.0.1", 35L)))
    assert(byRes("resource2") == (("hard_limit", "192.168.1.2", 11L)))
  }

  test("httpreq_endpointsequenceabuse2-10: ordering, delta bound, multi-pattern max, NAT exemption (ref TestEndpointSequenceAbuse)") {
    def run(file: String, first: String = "/test",
        second: String = "/test2"): Array[org.apache.spark.sql.Row] = {
      val parsed = parsedHttp(lines(file))
      Heuristics.sequenceAbuse(parsed, col("timestamp"),
        unix_micros(col("timestamp")), col("normalized.sourceAddress"),
        col("normalized.requestMethod") === "GET" &&
          col("normalized.urlRequestPath") === first,
        col("normalized.requestMethod") === "GET" &&
          col("normalized.urlRequestPath") === second,
        deltaMs = 1000L, threshold = 1).collect()
    }
    // abuse2: the second-half request precedes its first in FILE order
    // but not in event time — still exactly one violation at t=10ms
    val o2 = run("httpreq_endpointsequenceabuse2.txt")
    assert(o2.length == 1 && o2.head.getAs[String]("key") == "192.168.1.2")
    assert(o2.head.getAs[Long]("n") == 1L)
    assert(o2.head.getAs[Long]("latest_ms") == 10L)
    // abuse4: second halves land exactly AT first+delta — the strict
    // bound rejects both pairs (the reference's zero-alert case)
    assert(run("httpreq_endpointsequenceabuse4.txt").isEmpty)
    // abuse5: 60 s between the tracked first and the second half
    assert(run("httpreq_endpointsequenceabuse5.txt").isEmpty)
    // abuse6/7 equivalents: a pattern whose first or second half
    // matches nothing never fires on the abuse1 traffic
    assert(run("httpreq_endpointsequenceabuse1.txt",
      first = "/nosuch").isEmpty)
    assert(run("httpreq_endpointsequenceabuse1.txt",
      second = "/nosuch").isEmpty)
    // abuse3: two configured patterns alert on the MAX count — the
    // test/test2 pattern pairs twice (t=0.5 s and t=10.5 s), the
    // test3/test4 pattern once; the winner carries count 2 at 10.5 s
    val p1 = run("httpreq_endpointsequenceabuse3.txt")
    val p2 = run("httpreq_endpointsequenceabuse3.txt", "/test3", "/test4")
    assert(p1.length == 1 && p1.head.getAs[Long]("n") == 2L)
    assert(p1.head.getAs[Long]("latest_ms") == 10500L)
    assert(p2.length == 1 && p2.head.getAs[Long]("n") == 1L)
    val winner = (p1 ++ p2).maxBy(_.getAs[Long]("n"))
    assert(winner.getAs[Long]("n") == 2L &&
      winner.getAs[Long]("latest_ms") == 10500L)
    // abuse8: two abusers, one violation each
    val o8 = run("httpreq_endpointsequenceabuse8.txt")
    assert(o8.map(r => r.getAs[String]("key") -> r.getAs[Long]("latest_ms"))
      .toSet == Set("192.168.1.2" -> 10L, "192.168.1.3" -> 40L))
    // abuse9: the abuser rotates user agents — NAT detection exempts it
    val parsed9 = parsedHttp(lines("httpreq_endpointsequenceabuse9.txt"))
    val raw9 = Heuristics.sequenceAbuse(parsed9, col("timestamp"),
      unix_micros(col("timestamp")), col("normalized.sourceAddress"),
      col("normalized.requestMethod") === "GET" &&
        col("normalized.urlRequestPath") === "/test",
      col("normalized.requestMethod") === "GET" &&
        col("normalized.urlRequestPath") === "/test2",
      deltaMs = 1000L, threshold = 1)
    assert(raw9.count() == 1) // fires without the NAT view...
    val nat9 = Heuristics.distinctCardinality(parsed9, col("timestamp"),
      col("normalized.sourceAddress"), col("normalized.userAgent"),
      "1 minute", minDistinct = 2).select(col("key"))
    assert(raw9.join(nat9, Seq("key"), "left_anti").count() == 0) // ...exempt with it
    // abuse10: unmatched later traffic does not extend the count
    val o10 = run("httpreq_endpointsequenceabuse10.txt")
    assert(o10.length == 1 && o10.head.getAs[Long]("n") == 1L)
    assert(o10.head.getAs[Long]("latest_ms") == 10L)
  }

  test("customs_account_status_abuse2 + contentserver2: per-window variance gating leaves ONE alert (ref TestCustoms#accountEnumerationWithContentServerVarianceTest two-window form)") {
    val all = Parser.parse(lines("customs_account_status_abuse1.txt",
      "customs_contentserver.txt", "customs_account_status_abuse2.txt",
      "customs_contentserver2.txt")).toDF().cache()
    try {
      val fxa = parsedFxa(lines("customs_account_status_abuse1.txt",
          "customs_account_status_abuse2.txt"))
        .withColumn("path", element_at(col("fields"), "path"))
      val variance = CustomsDetectors.contentServerVariance(
        all.filter(col("payloadType") === "fxacontent"),
        col("timestamp"), col("normalized.sourceAddress"), "10 minutes")
      val isStatusCheck = col("summary").isin(
        "accountStatusCheckSuccess", "accountStatusCheckBlocked")
      val gated = CustomsDetectors.accountEnumeration(fxa, col("timestamp"),
        col("src"), col("email"), col("path"), isStatusCheck,
        "10 minutes", threshold = 3,
        variance = Some(variance), minVarianceClients = 3).collect()
      // window 1: organic content traffic exists for 10.0.0.2/10.0.0.3
      // but NOT 10.0.0.1 -> only 10.0.0.1 alerts. window 2: the
      // variance view has fewer than 3 distinct clients, so the whole
      // window is suppressed (the reference's single-alert outcome).
      assert(gated.length == 1)
      assert(gated.head.getAs[String]("src") == "10.0.0.1")
      assert(gated.head.getAs[Long]("window_start_ms") == 0L)
      assert(gated.head.getAs[Long]("n_emails") == 3L)
    } finally all.unpersist()
  }

  test("amo_fxaacctabuse_newversion blocks: full AMO detector sweep incl. reputation gates (ref TestAmo#fxaAccountAbuseNewVersion)") {
    val spark2 = spark
    import spark2.implicits._
    import graft.operators.AmoDetectors
    val amo = parsedAmo(lines(
      "amo_fxaacctabuse_newversion/block1.txt",
      "amo_fxaacctabuse_newversion/block2.txt",
      "amo_fxaacctabuse_newversion/block3.txt")).cache()
    try {
      def typed(t: String) =
        amo.filter(element_at(col("fields"), "amo_type") === t)
      // the reference's TestIprepdIO-preloaded reputations, as the
      // broadcast reputation table the Spark ops consume
      val reputation = Seq(("email", "kurn@mozilla.com", 0),
        ("email", "locutus@mozilla.com", 0), ("ip", "255.255.25.25", 25))
        .toDF("kind", "value", "score")
      // new-version-login: both zero-reputation accounts alert from
      // their respective addresses
      val nvl = AmoDetectors.newVersionLogin(typed("fxalogin"),
        col("timestamp"), element_at(col("fields"), "email"),
        col("normalized.sourceAddress"), reputation).collect()
      assert(nvl.map(r => r.getAs[String]("email") -> r.getAs[String]("src"))
        .toSet == Set("kurn@mozilla.com" -> "255.255.25.26",
          "locutus@mozilla.com" -> "255.255.25.30"))
      // ban pattern locutus.* fires on the same login
      val ban = AmoDetectors.fxaBanPatterns(typed("fxalogin"),
        col("timestamp"), element_at(col("fields"), "email"),
        col("normalized.sourceAddress"), Seq("locutus.*")).collect()
      assert(ban.length == 1)
      assert(ban.head.getAs[String]("src") == "255.255.25.30")
      // restriction passthrough
      val restr = AmoDetectors.reportRestriction(typed("restricted"),
        col("timestamp"), col("normalized.sourceAddress"),
        element_at(col("fields"), "restricted_value")).collect()
      assert(restr.length == 1)
      assert(restr.head.getAs[String]("restricted_value") == "kurn@mozilla.com")
      // reputation-gated submissions from the bad ip
      val nvs = AmoDetectors.newVersionSubmission(
        typed("newversion").unionByName(typed("fileupload")),
        col("timestamp"), col("normalized.sourceAddress"),
        element_at(col("fields"), "addon_id"),
        element_at(col("fields"), "addon_version"), reputation).collect()
      assert(nvs.nonEmpty)
      assert(nvs.forall(_.getAs[String]("src") == "255.255.25.25"))
      assert(nvs.exists(r => r.getAs[String]("addon_version") == "1.0.0" &&
        r.getAs[String]("addon_id") == "0000001"))
      // alias abuse: laforge+test1..6 are six aliases of one account
      val alias = AmoDetectors.fxaAccountAbuseAlias(typed("fxalogin"),
        col("timestamp"), element_at(col("fields"), "email"),
        gapSeconds = 7200, maxAliases = 5).collect()
      assert(alias.length == 1)
      assert(alias.head.getAs[String]("email_normalized") ==
        "laforge@mozilla.com")
      assert(alias.head.getAs[Long]("n_aliases") == 6L)
      // matched addon: the configured .*test_submission.* 7500:7500
      // criterion hits exactly lwaxana's three uploads
      val matched = AmoDetectors.addonMatcher(typed("fileuploadmnt"),
        col("timestamp"),
        element_at(col("fields"), "file_name"),
        element_at(col("fields"), "bytes").cast("long"),
        col("normalized.sourceAddress"), element_at(col("fields"), "email"),
        Seq(AmoDetectors.MatchCriterion(".*test_submission.*", 7500, 7500)))
        .collect()
      assert(matched.nonEmpty)
      assert(matched.forall(r =>
        r.getAs[String]("file_name") ==
          "00000000000000000000000000000000_test_submission.zip" &&
        r.getAs[String]("src") == "216.160.83.63" &&
        r.getAs[String]("email") == "lwaxana@mozilla.com" &&
        r.getAs[Long]("bytes") == 7500L))
      // multi submit: every 7500-byte upload rounds to the 10000
      // bucket; 11 distinct accounts — the reference's COUNT
      val msub = AmoDetectors.addonMultiSubmit(typed("fileuploadmnt"),
        col("timestamp"), element_at(col("fields"), "bytes").cast("long"),
        element_at(col("fields"), "email"), "30 minutes", alertOn = 10)
        .collect()
      assert(msub.length == 1)
      assert(msub.head.getAs[Long]("size_bucket") == 10000L)
      assert(msub.head.getAs[Long]("n_emails") == 11L)
      // multi-ip login: sevenofnine from 2 addresses in 2 countries
      // (countries resolved through the real MaxMind test MMDB)
      val resolver = cityResolver
      val countryOf = udf((ip: String) =>
        resolver.lookup(ip).flatMap(_.country))
      val mip = AmoDetectors.multiIpLogin(typed("login"),
        col("timestamp"), element_at(col("fields"), "email"),
        col("normalized.sourceAddress"),
        countryOf(col("normalized.sourceAddress")), gapSeconds = 900,
        alertOn = 2, alertOnIp = 2).collect()
      assert(mip.length == 1)
      assert(mip.head.getAs[String]("email") == "sevenofnine@mozilla.net")
      assert(mip.head.getAs[Long]("n_countries") == 2L)
      assert(mip.head.getAs[Long]("n_addrs") == 2L)
      // cloud submission: the API new-version from AWS address space
      val cloud = AmoDetectors.addonCloudSubmission(typed("newversion"),
        col("timestamp"), col("normalized.sourceAddress"),
        element_at(col("fields"), "guid"), element_at(col("fields"), "email"),
        awsCidrs = Seq("52.204.0.0/14"), gcpCidrs = Nil).collect()
      assert(cloud.length == 1)
      assert(cloud.head.getAs[String]("provider") == "aws")
      assert(cloud.head.getAs[String]("src") == "52.204.100.1")
      assert(cloud.head.getAs[String]("email") == "tashayar@mozilla.com")
      assert(cloud.head.getAs[String]("addon_guid") == "extension_guid")
    } finally amo.unpersist()
  }

  test("httpreq_sourcecorrelator1: ISP correlation through the real ISP test MMDB (ref TestHTTPRequestSourceCorrelator)") {
    val ispPath = java.nio.file.Paths.get(refData, "GeoIP2-ISP-Test.mmdb")
    assume(java.nio.file.Files.exists(ispPath))
    val ispResolver = new graft.parse.MaxmindDb.MmdbResolver(
      new graft.parse.MaxmindDb(java.nio.file.Files.readAllBytes(ispPath)))
    val ispOf = udf((ip: String) =>
      ispResolver.lookup(ip).flatMap(_.isp).getOrElse("unknown"))
    val parsed = parsedHttp(lines("httpreq_sourcecorrelator1.txt"))
    // the reference's threshold analysis: modifier 1.0 over the
    // per-minute mean with >= 2 requests per client
    val alerts = Heuristics.thresholdAnalysis(parsed, col("timestamp"),
      col("normalized.sourceAddress"), "1 minute", modifier = 1.0,
      minCount = 2)
    val corr = pipelines.CorrelationPipeline.sourceCorrelation(
      parsed.select(col("normalized.sourceAddress").as("addr")),
      alerts.select(col("key").as("addr")),
      network = ispOf(_), minAddrs = 2, minAlertedRatio = 0.5).collect()
    // the reference's single correlation alert: Century Link, both of
    // its two observed addresses alerting
    val cl = corr.filter(_.getAs[String]("network") == "Century Link")
    assert(cl.length == 1)
    assert(cl.head.getAs[Long]("n_addrs") == 2L)
    assert(cl.head.getAs[Long]("n_alerted") == 2L)
  }

  test("httpreq_filter + cidrutil2: project, label and CIDR-exclusion filters (ref TestFilter)") {
    val parsed = parsedHttp(lines("httpreq_filter.txt")).cache()
    try {
      assert(parsed.count() == 3)
      // stackdriver project filter "test" keeps one event
      assert(parsed.filter(col("stackdriverProject") === "test").count() == 1)
      // label filter env:holodeck keeps two; a non-matching label none
      assert(parsed.filter(element_at(col("stackdriverLabels"), "env") ===
        "holodeck").count() == 2)
      assert(parsed.filter(element_at(col("stackdriverLabels"), "env") ===
        "hydroponicsbay").count() == 0)
      // the cidrutil2 exclusion list (192.168.1.1/32) removes one
      val cidrs = Functions.broadcastCidrs(spark,
        fixture("cidrutil2.txt"))
      assert(parsed.filter(!Functions.cidrMatch(cidrs)(
        col("normalized.sourceAddress"))).count() == 2)
    } finally parsed.unpersist()
  }

  test("httpreq_urlhostfilter: include-host regex list gates the stream (ref TestFilter#hostFilterTest)") {
    val parsed = parsedHttp(lines("httpreq_urlhostfilter.txt")).cache()
    try {
      assert(parsed.count() == 4)
      def hostMatch(res: Seq[String]) = {
        val pat = res.map(r => s"(?:$r)").mkString("(?:", "|", ")")
        col("normalized.urlRequestHost").rlike(pat)
      }
      // "wontmatch" OR ^send\..* keeps the two send.* hosts
      assert(parsed.filter(hostMatch(Seq("wontmatch", "^send\\..*")))
        .count() == 2)
      // nothing matching keeps nothing
      assert(parsed.filter(hostMatch(Seq("wontmatch", "wontmatch2")))
        .count() == 0)
    } finally parsed.unpersist()
  }

  test("parsermetrics_mixedinput: per-type classification counts match the reference's parser metrics (ref TestParserMetrics)") {
    val spark2 = spark
    import spark2.implicits._
    val parsed = Parser.parse(lines("parsermetrics_mixedinput.txt")).toDF()
    val counts = parsed.groupBy(col("payloadType")).count()
      .as[(String, Long)].collect().toMap
    // the reference's exact EnumMap expectations over the mixed file
    assert(counts == Map("glb" -> 1L, "openssh" -> 5L, "raw" -> 1L,
      "fxaauth" -> 1L, "guardduty" -> 1L, "cloudtrail" -> 1L,
      "gcpaudit" -> 1L))
    // the multiplex double-read of the same file doubles every count
    // per resource (ref TestParserMetrics#testMultiplexParserMetrics)
    val mux = sources.Multiplex.union(Seq(
      sources.Multiplex.named(lines("parsermetrics_mixedinput.txt"), "a"),
      sources.Multiplex.named(lines("parsermetrics_mixedinput.txt"), "b")))
    val perRes = Parser.parse(
        sources.Multiplex.branch(mux, "a"))
      .toDF().groupBy(col("payloadType")).count()
      .as[(String, Long)].collect().toMap
    assert(perRes == counts)
  }

  test("templateoutput/slack goldens: authprofile slack notification is byte-exact per state action (ref TestAuthProfile#templateRender)") {
    val spark2 = spark
    import spark2.implicits._
    val variants = Map(
      "unknown_ip_minfraud_geo_failure" -> "authprof_state_new.txt",
      "unknown_ip_anon_network" -> "authprof_state_new_anon.txt",
      "unknown_ip_hosting_provider" -> "authprof_state_new_hosting.txt",
      "unknown_ip_outside_geo" -> "authprof_state_new_outside_geo.txt",
      "unknown_ip_within_geo" -> "authprof_state_new_within_geo.txt")
    val eventTs = "2018-09-18T22:15:38.000Z"
    val eventTsLocal = "2018-09-18T15:15:38.000-07:00"
    val alertId = "eca99844-96ac-4a44-adba-48ce3c593157"
    for ((action, golden) <- variants) {
      val p = java.nio.file.Paths.get(refData, "templateoutput/slack", golden)
      assume(java.nio.file.Files.exists(p))
      val expected = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        .replaceAll("DATESTAMP", eventTs)
        .replaceAll("DATELOCALSTAMP", eventTsLocal)
        .replaceAll("ALERTID", alertId)
        .stripLineEnd
      val got = Seq((action)).toDF("action")
        .select(sinks.Notify.authProfileSlackText(
          lit("riker"), lit("emit-bastion"), lit("216.160.83.56"),
          lit("Milton"), lit("US"), lit(eventTs), lit(eventTsLocal),
          col("action"), lit("https://localhost"), lit("test@localhost"),
          lit(alertId)).as("text"))
        .as[String].head()
      assert(got == expected, s"variant $action drifted from $golden")
    }
  }

  test("iprepdio1: engine-produced alert derives both iprepd violations (ref TestIprepdIO#iprepdIOTestWrite)") {
    // the reference submits this matched-addon alert and expects the
    // ip's reputation to drop (endpoint abuse violation) AND the
    // account's to zero (abusive-account violation)
    val parsed = Parser.parse(lines("iprepdio1.txt")).toDF()
      .filter(col("payloadType") === "alert")
    assert(parsed.count() == 1)
    val out = sinks.Sinks.violationsTyped(parsed,
      element_at(col("fields"), "meta_category"),
      element_at(col("fields"), "meta_sourceaddress"),
      array(element_at(col("fields"), "meta_email"))).collect()
    val byType = out.map(r => r.getAs[String]("type") ->
      (r.getAs[String]("object"), r.getAs[String]("violation"))).toMap
    assert(byType("ip") == (("99.99.99.1", "endpoint_abuse_violation")))
    assert(byType("email") ==
      (("testiprepdio1@mozilla.com", "abusive_account_violation")))
    assert(out.length == 2)
  }

  // --- Gatekeeper config matchers + suppression fixtures --------------

  /** Parse a reference guardduty matcher config json into GdMatcher
    * lists (ignore, high). */
  private def gdConfig(name: String)
      : (Seq[pipelines.GatekeeperPipeline.GdMatcher],
         Seq[pipelines.GatekeeperPipeline.GdMatcher]) = {
    val p = java.nio.file.Paths.get(refData, name)
    assume(java.nio.file.Files.exists(p))
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(p.toFile)
    def parseList(key: String) = {
      val arr = root.path(key)
      if (!arr.isArray) Nil
      else scala.jdk.CollectionConverters
        .IteratorHasAsScala(arr.elements()).asScala.map { m =>
          val tags = if (!m.path("aws_tags").isObject) Map.empty[String, String]
            else scala.jdk.CollectionConverters
              .IteratorHasAsScala(m.path("aws_tags").fields()).asScala
              .map(e => e.getKey -> e.getValue.asText()).toMap
          pipelines.GatekeeperPipeline.GdMatcher(
            findingType = Option(m.path("finding_type").asText(null)),
            accountId = Option(m.path("account_id").asText(null)),
            awsTags = tags,
            domainName = Option(m.path("domain_name").asText(null)))
        }.toSeq
    }
    (parseList("ignore_matchers"), parseList("high_severity_matchers"))
  }

  test("gatekeeper guardduty + matcher config: ignore and high buckets (ref TestGatekeeper#gatekeeperGDTest)") {
    val (ignore, high) = gdConfig("guarddutyconfig.json")
    val out = pipelines.GatekeeperPipeline.guardDutyAlerts(
      lines("gatekeeper/guardduty-sample-findings.txt"), ignore, high)
      .collect()
    val types = out.map(_.getAs[String]("finding_type"))
    // the ignore matchers drop exactly three findings: the Recon:EC2
    // probe (type regex), the Trojan resolving ignore.com (type +
    // domain conjunction), and the Trojan whose instance carries the
    // Name=iTalkToCryptoMiningServers tag (aws_tags matcher)
    assert(!types.contains("Recon:EC2/PortProbeEMRUnprotectedPort"))
    assert(!types.contains("Trojan:EC2/DriveBySourceTraffic!DNS"))
    assert(!types.contains("Trojan:EC2/DropPoint!DNS"))
    // every emitted alert is critical, category fixed
    assert(out.forall(_.getAs[String]("severity") == "critical"))
    assert(out.forall(_.getAs[String]("category") == "gatekeeper:aws"))
    // the reference's exact buckets: 17 alerts, 6 high (3 remaining
    // Trojans + 2 Backdoors + the 999999999-account Stealth), 11 low
    val highs = out.filter(_.getAs[String]("handling") == "high")
      .map(_.getAs[String]("finding_type")).sorted
    assert(highs.count(_.startsWith("Trojan")) == 3)
    assert(highs.count(_.startsWith("Backdoor")) == 2)
    assert(out.filter(_.getAs[String]("account") == "999999999")
      .forall(_.getAs[String]("handling") == "high"))
    assert(out.length == 17)
    assert(highs.length == 6)
    assert(out.count(_.getAs[String]("handling") == "low") == 11)
  }

  test("gatekeeper guardduty duplicates: same finding id suppresses to one alert (ref TestGatekeeper#gatekeeperSuppressRepeatedGDFindingsOneInstant)") {
    val out = pipelines.GatekeeperPipeline.guardDutyAlerts(
      lines("gatekeeper/guardduty-sample-findings-with-duplicates.txt"))
      .collect()
    // 5 findings: 2 share one id, 3 share another -> 2 alerts
    assert(out.length == 2)
    assert(out.map(_.getAs[String]("finding_id")).distinct.length == 2)
    // the same-instant collapse is a DETERMINISTIC pick (lexicographic
    // min of the content columns), not dropDuplicates' partition-order
    // pick: re-running with reversed input order yields identical rows
    val rev = pipelines.GatekeeperPipeline.guardDutyAlerts(
      spark.createDataset(lines(
        "gatekeeper/guardduty-sample-findings-with-duplicates.txt")
        .collect().reverse.toSeq)(
        org.apache.spark.sql.Encoders.STRING))
      .collect()
    def keyOf(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("finding_id"), r.getAs[Long]("ts_ms"),
        r.getAs[String]("finding_type"), r.getAs[String]("account"),
        r.getAs[String]("region"))
    assert(out.map(keyOf).toSet == rev.map(keyOf).toSet)
  }

  test("gatekeeper etd duplicates: same (project, rule, technique, indicator) suppresses (ref TestGatekeeper#gatekeeperSuppressRepeatedETDFindingsOneInstant)") {
    val out = pipelines.GatekeeperPipeline.etdAlerts(
      lines("gatekeeper/etd-sample-findings-with-duplicates.txt"))
      .collect()
    // 5 findings: 2 share one project id, 3 share another -> 2 alerts
    assert(out.length == 2)
    assert(out.map(_.getAs[String]("project_number")).distinct.length == 2)
  }

  test("gatekeeper ignore-all configs: one branch silenced, the other intact (ref TestGatekeeper#gatekeeperETDTest / #gatekeeperIgnoreAllETDTest)") {
    // guardduty ignore-all config -> zero aws alerts
    val (ignoreAll, _) = gdConfig("guarddutyconfig-ignore-all.json")
    val gd = pipelines.GatekeeperPipeline.guardDutyAlerts(
      lines("gatekeeper/guardduty-sample-findings.txt"), ignoreAll, Nil)
    assert(gd.count() == 0)
    // the etd branch still alerts on all three projects
    val etd = pipelines.GatekeeperPipeline.etdAlerts(
      lines("gatekeeper/etd-sample-findings.txt")).collect()
    assert(etd.length == 3)
    assert(etd.map(_.getAs[String]("project_number")).toSet ==
      Set("123456789012", "123456785822", "123456789210"))
    assert(etd.forall(_.getAs[String]("rule_name") == "iam_anomalous_grant"))
    assert(etd.forall(_.getAs[String]("technique") == "persistence"))
    assert(etd.forall(_.getAs[String]("indicator") == "audit_log"))
    // and the reference's ignore-ETD regex empties it symmetrically
    assert(pipelines.GatekeeperPipeline.etdAlerts(
      lines("gatekeeper/etd-sample-findings.txt"),
      ignoreRuleRegexes = Seq(".+")).count() == 0)
  }

  test("customs_activity_for_monitored_accounts: 3 alerts for the listed account (ref TestCustoms#activityMonitorTest)") {
    val spark2 = spark
    import spark2.implicits._
    val accounts =
      fixture("customs_activity_for_monitored_accounts_account_list.txt").toDS()
    // no XFF selector in this detector: the normalized source is the
    // last chain element (127.0.0.1), exactly what the reference
    // asserts as SOURCEADDRESS
    val fxa = Parser.parse(lines(
        "customs_activity_for_monitored_accounts1.txt",
        "customs_activity_for_monitored_accounts2.txt")).toDF()
      .filter(col("payloadType") === "fxaauth")
      .withColumn("email", element_at(col("fields"), "email"))
      .withColumn("summary", element_at(col("fields"), "event_summary"))
      .filter(col("summary").isin("loginSuccess", "loginFailure"))
    val out = CustomsDetectors.monitoredActivity(fxa, col("timestamp"),
      col("email"), col("normalized.sourceAddress"), col("summary"),
      accounts).collect()
    assert(out.length == 3)
    assert(out.forall(_.getAs[String]("email") == "spock@mozilla.com"))
    assert(out.forall(_.getAs[String]("src") == "127.0.0.1"))
    val actions = out.map(_.getAs[String]("action"))
    assert(actions.count(_ == "loginSuccess") == 1)
    assert(actions.count(_ == "loginFailure") == 2)
  }

  test("httpreq_endpointabuse3: non-4xx pre-filter leaves only the 401 client alerting (ref TestEndpointAbuse1#endpointAbuseTestPreprocessFilter)") {
    import graft.filter.EventFilter
    val parsed = parsedHttp(lines(
      "httpreq_endpointabuse3/httpreq_endpointabuse3_1.txt"))
    // the reference's filterRequestPath except-rules: drop GET /test
    // and GET /test2 requests whose status is NOT 4xx (status 0-399
    // or >= 500), keeping only client-error traffic on those paths
    // (ref HTTPRequestToggles.toStandardFilter:938-973)
    def exceptFor(path: String) = EventFilter.Rule(
      wantNormalizedTypes = Seq("HTTP_REQUEST"),
      payload = Seq(
        EventFilter.StringMatch("normalized.requestMethod", "GET"),
        EventFilter.StringMatch("normalized.urlRequestPath", path),
        EventFilter.OrMatch(Seq(
          EventFilter.IntRange("normalized.requestStatus", 0, 399),
          EventFilter.IntRange("normalized.requestStatus", 500,
            Int.MaxValue)))))
    val pred = EventFilter.compile(Seq(EventFilter.Rule(
      wantNormalizedTypes = Seq("HTTP_REQUEST"),
      except = Seq(exceptFor("/test"), exceptFor("/test2")))))
    val filtered = parsed.filter(pred)
    // 4 of 5 clients ran non-4xx traffic on the monitored paths and
    // vanish pre-analysis; 192.168.1.6's 8 401s survive and alert
    val out = HttpHeuristics.endpointAbuse(filtered, col("timestamp"),
      col("normalized.sourceAddress"), col("normalized.requestMethod"),
      col("normalized.urlRequestPath"), col("normalized.userAgent"),
      "1 hour", Seq(HttpHeuristics.Endpoint("GET", "/test", 8),
        HttpHeuristics.Endpoint("GET", "/test2", 8))).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("addr") == "192.168.1.6")
    assert(out.head.getAs[Long]("n") == 8L)
  }

  test("httpreq_endpointabuse4: 20-min sessions split the 00:00 and 00:30 bursts into two alerts with the reference's window stamps (ref TestEndpointAbuse1#endpointAbuseTestStreamStateExpiry)") {
    val parsed = parsedHttp(lines(
      "httpreq_endpointabuse4/httpreq_endpointabuse4_1.txt",
      "httpreq_endpointabuse4/httpreq_endpointabuse4_2.txt",
      "httpreq_endpointabuse4/httpreq_endpointabuse4_3.txt"))
    val out = HttpHeuristics.endpointAbuseSessions(parsed,
      col("timestamp"), col("normalized.sourceAddress"),
      col("normalized.requestMethod"), col("normalized.urlRequestPath"),
      col("normalized.userAgent"), gapSeconds = 1200,
      Seq(HttpHeuristics.Endpoint("GET", "/test", 8))).collect()
    // two sessions for 192.168.1.2 (10 monitored GETs each, no
    // variance); 192.168.1.3 browses /test/somethingelse (variance)
    // and 192.168.1.1/1.4 stay under threshold
    assert(out.length == 2)
    assert(out.forall(_.getAs[String]("addr") == "192.168.1.2"))
    assert(out.forall(_.getAs[Long]("n") == 10L))
    assert(out.forall(_.getAs[String]("useragent") == "Mozilla"))
    // Beam session maxTimestamp: last event + gap - 1ms — the
    // reference's asserted 00:19:59.999Z and 00:49:59.999Z
    assert(out.map(_.getAs[Long]("window_max_ts_ms")).sorted.toSeq ==
      Seq(1199999L, 2999999L))
  }

  test("httpreq_perendpointerrorrate3: error sessions split at exactly the gap — nothing reaches threshold (ref TestPerEndpointErrorRateAnalysis#perEndpointErrorRateTestStream3)") {
    val parsed = parsedHttp(lines(
      "httpreq_perendpointerrorrate3/httpreq_perendpointerrorrate3_1.txt",
      "httpreq_perendpointerrorrate3/httpreq_perendpointerrorrate3_2.txt",
      "httpreq_perendpointerrorrate3/httpreq_perendpointerrorrate3_3.txt"))
    // 192.168.1.2's errors land at 0s,0s,15s then 75s,75s: the 60s
    // quiet period equals the session gap, so the second burst opens
    // a NEW session (Beam windows [15,75) and [75,135) do not
    // overlap) and both sessions stay under the 4-error threshold
    val out = HttpHeuristics.perEndpointErrorRateSessions(
      parsed.filter(col("normalized.requestStatus").between(400, 499)),
      col("timestamp"), col("normalized.sourceAddress"),
      col("normalized.requestMethod"), col("normalized.urlRequestPath"),
      gapSeconds = 60,
      Seq(HttpHeuristics.ErrorRule("GET", "/test", 4)))
    assert(out.count() == 0)
  }

  test("httpreq_perendpointerrorrate5: good traffic does not extend an error session (ref TestPerEndpointErrorRateAnalysis#perEndpointErrorRateTestStream5)") {
    val parsed = parsedHttp(lines(
      "httpreq_perendpointerrorrate5/httpreq_perendpointerrorrate5_1.txt",
      "httpreq_perendpointerrorrate5/httpreq_perendpointerrorrate5_2.txt",
      "httpreq_perendpointerrorrate5/httpreq_perendpointerrorrate5_3.txt"))
    // 192.168.1.3: three 404s at 0s, steady 200s until 45s, then a
    // 400 at 70s — the reference sessionizes ERRORS ONLY, so the good
    // traffic cannot bridge the 70s quiet gap and neither error
    // session reaches 4
    val out = HttpHeuristics.perEndpointErrorRateSessions(
      parsed.filter(col("normalized.requestStatus").between(400, 499)),
      col("timestamp"), col("normalized.sourceAddress"),
      col("normalized.requestMethod"), col("normalized.urlRequestPath"),
      gapSeconds = 60,
      Seq(HttpHeuristics.ErrorRule("GET", "/test", 4)))
    assert(out.count() == 0)
  }

  test("httpreq_perendpointerrorrate6: multi-pattern max rule, accumulating panes 7 then 18 (ref TestPerEndpointErrorRateAnalysis#perEndpointErrorRateTestStream6)") {
    def run(files: String*) = {
      val parsed = parsedHttp(lines(files: _*))
      HttpHeuristics.perEndpointErrorRateSessions(
        parsed.filter(col("normalized.requestStatus").between(400, 499)),
        col("timestamp"), col("normalized.sourceAddress"),
        col("normalized.requestMethod"),
        col("normalized.urlRequestPath"), gapSeconds = 60,
        Seq(HttpHeuristics.ErrorRule("GET", "/test", 4),
          HttpHeuristics.ErrorRule("GET", "/t.*", 4))).collect()
    }
    val base = Seq(
      "httpreq_perendpointerrorrate6/httpreq_perendpointerrorrate6_1.txt",
      "httpreq_perendpointerrorrate6/httpreq_perendpointerrorrate6_2.txt",
      "httpreq_perendpointerrorrate6/httpreq_perendpointerrorrate6_3.txt")
    // early pane (first batch alone): /t.* full-matches /testing too,
    // so it carries the max (7 > 5) — the reference's first firing
    val early = run(base.head)
    assert(early.length == 1)
    assert(early.head.getAs[String]("addr") == "192.168.1.2")
    assert(early.head.getAs[String]("rule_path") == "/t.*")
    assert(early.head.getAs[Long]("n_errors") == 7L)
    assert(early.head.getAs[Long]("window_max_ts_ms") == 59999L)
    // accumulated session (all batches): the 45s burst merges into the
    // same session; 18 /t.* matches, window max 00:01:44.999
    val full = run(base: _*)
    assert(full.length == 1)
    assert(full.head.getAs[String]("rule_path") == "/t.*")
    assert(full.head.getAs[Long]("n_errors") == 18L)
    assert(full.head.getAs[Long]("latest_error_ms") == 45000L)
    assert(full.head.getAs[Long]("window_max_ts_ms") == 104999L)
  }

  test("httpreq_sessionlimitanalysis1_0: in-session UA variety marks a NAT and suppresses the limit alert (ref TestSessionLimitAnalysis#sessionLimitAnalysisAlertUAVariancePresent)") {
    import spark.implicits._
    val parsed = parsedHttp(lines(
      "httpreq_sessionlimitanalysis1/httpreq_sessionlimitanalysis1_0.txt",
      "httpreq_sessionlimitanalysis1/httpreq_sessionlimitanalysis1_2.txt",
      "httpreq_sessionlimitanalysis1/httpreq_sessionlimitanalysis1_3.txt"))
      .withColumn("client", Functions.proxyXffClientAddress(
        element_at(col("fields"), "x_forwarded_for"),
        element_at(col("fields"), "x_pipeline_proxy").isNotNull))
    // sessionize ALL of the client's requests; the uaMap covers every
    // request in session, monitored or not (ref SessionLimitAnalysis
    // .java:170-193: two distinct agents in-session => treated as NAT,
    // the per-client analysis returns before thresholding)
    val sessions = operators.Sessionize.assignSessions(
        parsed.select(col("timestamp").as("ts"), col("client"),
          col("normalized.userAgent").as("ua"),
          (col("normalized.requestMethod") === "POST" &&
            col("normalized.urlRequestPath").rlike("^/submit/click.*"))
            .as("mon")),
        col("ts"), col("client"), gapSeconds = 1200)
      .groupBy(col("client"), col("session_id"))
      .agg(count(when(col("mon"), 1)).as("n"),
        countDistinct(col("ua")).as("n_uas"))
    // the monitored count DOES cross the limit — only the NAT gate
    // silences it (the reference's 0-alert + reputation-100 outcome)
    assert(sessions.filter(col("n") >= 6).count() == 1)
    assert(sessions.filter(col("n") >= 6 && col("n_uas") < 2).count() == 0)
  }

  test("httpreq_errorrate1_single.json: one-element MULTIPLEX config behaves as simplex (ref TestErrorRate1#errorRateTestCfg)") {
    val spark2 = spark
    import spark2.implicits._
    val cfgPath = java.nio.file.Paths.get(refData, "httpreq_errorrate1_single.json")
    assume(java.nio.file.Files.exists(cfgPath))
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(cfgPath.toFile)
    assert(root.path("input").path("mode").asText() == "MULTIPLEX")
    val elems = scala.jdk.CollectionConverters
      .IteratorHasAsScala(root.path("input").path("elements").elements())
      .asScala.toSeq
    assert(elems.map(_.path("name").asText()) == Seq("test"))
    val e = elems.head
    val files = scala.jdk.CollectionConverters
      .IteratorHasAsScala(e.path("file_inputs").elements()).asScala
      .map(_.asText().split("/testdata/").last).toSeq
    // the element's parser config: substring fast matcher + project filter
    val fast = e.path("parser_configuration")
      .path("parser_fast_matcher").asText()
    val proj = e.path("parser_configuration")
      .path("stackdriver_project_filter").asText()
    val toggles = root.path("service_toggles").path("test")
    assert(toggles.path("enable_error_rate_analysis").asBoolean())
    val parsed = parsedHttp(lines(files: _*).filter(col("value").contains(fast)))
      .filter(col("stackdriverProject") === proj)
    val out = Heuristics.errorRate(parsed, col("timestamp"),
      col("normalized.sourceAddress"),
      col("normalized.requestStatus").between(400, 499),
      "1 minute", maxErrors = 30).collect()
    // the reference's single error_rate alert: 10.0.0.1, 35 errors,
    // window [00:00, 00:01)
    assert(out.length == 1)
    assert(out.head.getAs[String]("key") == "10.0.0.1")
    assert(out.head.getAs[Long]("errors") == 35L)
    assert(out.head.getAs[Long]("window_start_ms") == 0L)
  }

  test("httpreq_multi2.json: a monitored resource with no matching events stays silent, the others alert (ref TestMulti#testMulti2)") {
    val spark2 = spark
    import spark2.implicits._
    val cfgPath = java.nio.file.Paths.get(refData, "httpreq_multi2.json")
    assume(java.nio.file.Files.exists(cfgPath))
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(cfgPath.toFile)
    val elems = scala.jdk.CollectionConverters
      .IteratorHasAsScala(root.path("input").path("elements").elements())
      .asScala.map { e =>
        val name = e.path("name").asText()
        val files = scala.jdk.CollectionConverters
          .IteratorHasAsScala(e.path("file_inputs").elements()).asScala
          .map(_.asText().split("/testdata/").last).toSeq
        val fast = Option(e.path("parser_configuration")
          .path("parser_fast_matcher").asText(null))
        val proj = Option(e.path("parser_configuration")
          .path("stackdriver_project_filter").asText(null))
        (name, files, fast, proj)
      }.toSeq
    assert(elems.map(_._1) == Seq("resource1", "resource2", "resource3"))
    val mux = sources.Multiplex.union(elems.map { case (n, fs, fast, _) =>
      val ls = fast.foldLeft(lines(fs: _*))((d, f) =>
        d.filter(col("value").contains(f)))
      sources.Multiplex.named(ls, n)
    })
    val analyses: Map[String,
        org.apache.spark.sql.Dataset[String] => DataFrame] =
      elems.map { case (n, _, _, proj) =>
        n -> { (ls: org.apache.spark.sql.Dataset[String]) =>
          val parsed = proj.foldLeft(parsedHttp(ls))((d, p) =>
            d.filter(col("stackdriverProject") === p))
          Heuristics.errorRate(parsed, col("timestamp"),
            col("normalized.sourceAddress"),
            col("normalized.requestStatus").between(400, 499),
            "1 minute", maxErrors = 30)
        }
      }.toMap
    val out = sources.Multiplex.analyzeAll(mux, analyses).collect()
    // resource2 reads hardlimit1 through the "stage-send" fast matcher:
    // nothing matches, so the resource produces NO alerts (the
    // reference's monitored-resource-without-events case); resource1
    // (filtered) and resource3 (unfiltered) both see the 35-error
    // client
    assert(out.length == 2)
    val byRes = out.map(r => r.getAs[String]("resource") ->
      (r.getAs[String]("key"), r.getAs[Long]("errors"))).toMap
    assert(byRes.keySet == Set("resource1", "resource3"))
    assert(byRes.values.toSet == Set(("10.0.0.1", 35L)))
  }

  test("httpreq_endpointsequenceabuse6+7: 10ms pair violates the 1s delta bound, 2s pair does not (orphan fixtures, semantics per TestEndpointSequenceAbuse)") {
    def run(file: String) = {
      val parsed = parsedHttp(lines(file))
        .withColumn("eid", monotonically_increasing_id())
      Heuristics.sequenceAbuse(parsed, col("timestamp"),
        col("eid"), col("normalized.sourceAddress"),
        col("normalized.requestMethod") === "GET" &&
          col("normalized.urlRequestPath") === "/test",
        col("normalized.requestMethod") === "GET" &&
          col("normalized.urlRequestPath") === "/test2",
        deltaMs = 1000L).collect()
    }
    val fast = run("httpreq_endpointsequenceabuse6.txt")
    assert(fast.length == 1)
    assert(fast.head.getAs[String]("key") == "192.168.1.2")
    assert(fast.head.getAs[Long]("n") == 1L)
    // abuse7's /test2 lands 2s after the last /test — outside the bound
    assert(run("httpreq_endpointsequenceabuse7.txt").isEmpty)
  }

  test("orphan fixtures parse: authprof_buffer4 openssh, customs_multi1 fxaauth, customs_geo1 raw (no reference parser exists), rl_badlogin_suppress duplicate key") {
    val spark2 = spark
    import spark2.implicits._
    // authprof_buffer4: riker's six bastion logins from the City-test
    // address, plus two non-auth syslog lines
    val b4 = Parser.parse(lines("authprof_buffer4.txt")).toDF()
    val ssh = b4.filter(col("payloadType") === "openssh")
    assert(ssh.count() == 6)
    assert(ssh.filter(col("normalized.subjectUser") === "riker" &&
      col("normalized.sourceAddress") === "216.160.83.56").count() == 6)
    // customs_multi1: every line is an fxa-auth request.summary
    val m1 = Parser.parse(lines("customs_multi1.txt")).toDF()
    assert(m1.count() > 0)
    assert(m1.filter(col("payloadType") =!= "fxaauth").count() == 0)
    assert(m1.filter(element_at(col("fields"), "path") ===
      "/v1/account/status").count() == 20)
    // customs_geo1: secevent.model lines — the reference declares a
    // SECEVENT payload enum but ships NO parser for it, so raw
    // fallthrough is the faithful classification; the embedded
    // address still geo-resolves through the City test MMDB
    val g1 = Parser.parse(lines("customs_geo1.txt")).toDF()
    assert(g1.filter(col("payloadType") =!= "raw").count() == 0)
    val addr = get_json_object(col("raw"), "$.source_address")
    val geo = g1.select(addr.as("a")).distinct().as[String].collect()
    assert(geo.toSeq == Seq("216.160.83.56"))
    assert(cityResolver.lookup("216.160.83.56")
      .flatMap(_.city).contains("Milton"))
    // customs_rl_badlogin_suppress: two identical bad logins — the
    // (source, account) rate-limit key collapses them to one row of
    // count 2
    val rl = parsedFxa(lines("customs_rl_badlogin_suppress.txt"))
    val keyed = rl.filter(col("summary") === "loginFailure")
      .groupBy(col("src"), col("email")).count().collect()
    assert(keyed.length == 1)
    assert(keyed.head.getAs[Long]("count") == 2L)
  }

  test("minfraud/insights_normal1+hosting1: real Insights response JSON parses to the consumed flags (ref TestAuthProfile cacheInsightsResource fixtures)") {
    def insights(name: String): String = {
      val p = java.nio.file.Paths.get(refData, "minfraud", name)
      assume(java.nio.file.Files.exists(p))
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    }
    val resolver = new graft.parse.Minfraud.JsonInsightsResolver(Map(
      "216.160.83.56" -> insights("insights_normal1.json"),
      "81.2.69.192" -> insights("insights_hosting1.json")))
    val normal = resolver.lookup("216.160.83.56").get
    assert(normal.riskScore == 0.01)
    assert(!normal.isAnonymous && !normal.isHostingProvider)
    // the hosting fixture differs only in the is_hosting_provider
    // trait — the flag AuthProfile's new-source escalation keys on
    val hosting = resolver.lookup("81.2.69.192").get
    assert(hosting.isHostingProvider && !hosting.isAnonymous)
    assert(resolver.lookup("10.9.9.9").isEmpty)
  }

  test("cidrutil1: CIDR file load and containment set (ref TestCidrUtil#fileInputCidrMatchTest)") {
    val spark2 = spark
    import spark2.implicits._
    val cidrs = Functions.broadcastCidrs(spark, fixture("cidrutil1.txt"))
    val probes = Seq("10.0.0.10", "11.0.0.1", "192.168.1.254",
      "192.168.2.1", "1.1.1.1", "1.1.1.2").toDF("addr")
    val got = probes
      .withColumn("hit", Functions.cidrMatch(cidrs)(col("addr")))
      .as[(String, Boolean)].collect().toMap
    // the reference's six assertions over 10/8, 192.168.1/24, 1.1.1.1/32
    assert(got == Map("10.0.0.10" -> true, "11.0.0.1" -> false,
      "192.168.1.254" -> true, "192.168.2.1" -> false,
      "1.1.1.1" -> true, "1.1.1.2" -> false))
  }

  test("detectnatlist2: known-gateway list load keeps every entry (ref TestDetectNat#TestGivenValidPathReturnMapWithAllItemsMany)") {
    val spark2 = spark
    import spark2.implicits._
    val known = fixture("detectnatlist2.txt")
    assert(known.toSet == Set("192.168.0.0", "10.0.0.0", "255.255.255.255"))
    // wired as the pipeline consumes it: a broadcast suppression list
    // that exempts listed gateways from threshold alerts regardless of
    // observed UA variety (ref DetectNat.java:141-151)
    val candidates = Seq("192.168.0.0", "10.0.0.1").toDF("key")
    val kept = candidates.join(
      org.apache.spark.sql.functions.broadcast(known.toDF("key")),
      Seq("key"), "left_anti").as[String].collect()
    assert(kept.toSeq == Seq("10.0.0.1"))
  }

  test("iprepdio2: alert without the category metadata key derives NO violations (ref TestIprepdIO#iprepdIOTestWriteMalformed)") {
    // the malformed alert carries amo_category instead of category, so
    // getSubcategory() is null and Violation.fromAlert returns null —
    // the reference asserts both reputations stay at 100
    val parsed = Parser.parse(lines("iprepdio2.txt")).toDF()
      .filter(col("payloadType") === "alert")
    assert(parsed.count() == 1)
    val out = sinks.Sinks.violationsTyped(parsed,
      element_at(col("fields"), "meta_category"),
      element_at(col("fields"), "meta_sourceaddress"),
      array(element_at(col("fields"), "meta_email")))
    assert(out.count() == 0)
  }

  test("customs_variance1: the reference's path-diversity variance index per source (ref TestCustomsFeatures#testCustomsFeaturesVariance)") {
    val fxa = parsedFxa(lines("customs_variance1.txt"))
    val out = operators.Features.pathVarianceIndex(fxa,
      col("src"), element_at(col("fields"), "path"),
      element_at(col("fields"), "status").cast("int")).collect()
    val byKey = out.map(r => r.getAs[String]("key") ->
      (r.getAs[Long]("variance_index"), r.getAs[Boolean]("nominal"))).toMap
    // 10.0.0.1: index 55, nominal; 10.0.0.2: index 24, below the
    // NOMINAL_VARIANCE_INDEX=33 gate
    assert(byKey("10.0.0.1") == ((55L, true)))
    assert(byKey("10.0.0.2") == ((24L, false)))
    assert(byKey.size == 2)
  }

  test("watchlist_analyze_buffer1: watched email + ip escalate with full metadata (ref TestPostProcessing#testWatchlistAnalyze)") {
    val spark2 = spark
    import spark2.implicits._
    val parsed = Parser.parse(lines("watchlist_analyze_buffer1.txt")).toDF()
      .filter(col("payloadType") === "alert")
    // the reference's Datastore watchlist entries, as the broadcast table
    val wl = Seq(
      ("ip", "127.0.0.1", "critical", "picard"),
      ("email", "example@enterprise.com", "warn", "picard"))
      .toDF("kind", "object", "severity", "created_by")
    val out = pipelines.CorrelationPipeline.watchlistAnalyze(parsed, wl,
      warningEmail = "picard@enterprise.com",
      criticalEmail = "pagerduty@enterprise.com").collect()
    assert(out.length == 3)
    assert(out.forall(_.getAs[String]("category") == "postprocessing"))
    assert(out.forall(_.getAs[String]("subcategory") == "watchlist"))
    assert(out.forall(_.getAs[String]("source_alert") ==
      "0e555555-8df8-4b3d-92dd-24e0e5248534"))
    val emails = out.filter(_.getAs[String]("matched_type") == "email")
    assert(emails.length == 2)
    assert(emails.forall(_.getAs[String]("severity") == "warn"))
    assert(emails.forall(_.getAs[String]("matched_metadata_key") ==
      "identity_key"))
    assert(emails.forall(_.getAs[String]("matched_metadata_value") ==
      "example@enterprise.com"))
    assert(emails.forall(_.getAs[String]("notify_email_direct") ==
      "picard@enterprise.com"))
    val ips = out.filter(_.getAs[String]("matched_type") == "ip")
    assert(ips.length == 1)
    assert(ips.head.getAs[String]("severity") == "critical")
    assert(ips.head.getAs[String]("matched_metadata_key") == "sourceaddress")
    assert(ips.head.getAs[String]("matched_metadata_value") == "127.0.0.1")
    assert(ips.head.getAs[String]("notify_email_direct") ==
      "pagerduty@enterprise.com")
    assert(out.forall(_.getAs[String]("watchlist_created_by") == "picard"))
  }

  test("watchlist_analyze_buffer2: list-valued email key splits and matches once per occurrence (ref TestPostProcessing#testWatchlistAnalyzeMultiValueEmailKey)") {
    val spark2 = spark
    import spark2.implicits._
    val parsed = Parser.parse(lines("watchlist_analyze_buffer2.txt")).toDF()
      .filter(col("payloadType") === "alert")
    val wl = Seq(
      ("ip", "127.0.0.1", "critical", "picard"),
      ("email", "example@enterprise.com", "warn", "picard"))
      .toDF("kind", "object", "severity", "created_by")
    val out = pipelines.CorrelationPipeline.watchlistAnalyze(parsed, wl,
      warningEmail = "picard@enterprise.com",
      criticalEmail = "pagerduty@enterprise.com").collect()
    // the reference's exact counts: two email matches (one from the
    // 3-entry list, one single-valued), zero ip matches
    assert(out.length == 2)
    assert(out.forall(_.getAs[String]("matched_type") == "email"))
    assert(out.forall(_.getAs[String]("matched_metadata_key") == "email"))
    assert(out.forall(_.getAs[String]("matched_metadata_value") ==
      "example@enterprise.com"))
    assert(out.forall(_.getAs[String]("source_alert") ==
      "e116e0ee-5747-4cd5-a1b1-d36d91ac62b9"))
    assert(out.forall(_.getAs[String]("severity") == "warn"))
  }

  test("amo_fxaaliasabuse/dotnormalizationabuse2: repeated alias is NOT distinct — no alert (ref TestAmo#testFxaAliasAbuseDotNormalizationNonDistinct)") {
    val amo = parsedAmo(lines("amo_fxaaliasabuse/dotnormalizationabuse2.txt"))
      .filter(element_at(col("fields"), "amo_type") === "fxalogin")
    // seven login events but only two distinct alias spellings of the
    // account (test12345 + t.est12345 six times) — under the 5-alias bound
    assert(amo.count() == 7)
    val out = operators.AmoDetectors.fxaAccountAbuseAlias(amo,
      col("timestamp"), element_at(col("fields"), "email"),
      gapSeconds = 1800, maxAliases = 5)
    assert(out.count() == 0)
  }

  test("guarddutyconfig-empty.json: no matchers — every finding emits, all low handling, console URL attached (ref TestGatekeeper#gatekeeperNoFiltersTest)") {
    val (ignore, high) = gdConfig("guarddutyconfig-empty.json")
    assert(ignore.isEmpty && high.isEmpty)
    val out = pipelines.GatekeeperPipeline.guardDutyAlerts(
      lines("gatekeeper/guardduty-sample-findings-default.txt"),
      ignore, high).collect()
    // nothing ignored, nothing escalated: one alert per distinct finding
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[String]("handling") == "low"))
    assert(out.forall(_.getAs[String]("severity") == "critical"))
    assert(out.forall(_.getAs[String]("account") == "123456789012"))
    assert(out.forall(_.getAs[String]("region") == "us-west-2"))
    assert(out.forall(r => r.getAs[String]("summary")
      .startsWith("suspicious activity detected in aws account")))
    // the reference's exact deep link for finding 36b59ed2...
    val f = out.filter(_.getAs[String]("finding_id") ==
      "36b59ed2edad8b965a0ee921052cb481")
    assert(f.length == 1)
    assert(f.head.getAs[String]("url_to_finding") ==
      "https://us-west-2.console.aws.amazon.com/guardduty/home?region=us-west-2#/findings?fId=36b59ed2edad8b965a0ee921052cb481")
    assert(out.forall(_.getAs[String]("url_to_finding") != null))
  }

  test("inputtype_buffer1-3: simplex union, multiplex per-resource counts, per-element raw filter (ref TestInputTypeFileMulti + TestInputJson)") {
    val spark2 = spark
    import spark2.implicits._
    // simplex: both files into one stream, 10 + 20 lines
    assert(lines("inputtype_buffer1.txt", "inputtype_buffer2.txt")
      .count() == 30L)
    // multiplex: named elements keep their per-resource identity
    val mux = sources.Multiplex.union(Seq(
      sources.Multiplex.named(lines("inputtype_buffer1.txt"), "a"),
      sources.Multiplex.named(lines("inputtype_buffer2.txt"), "b")))
    val counts = mux.groupBy(col("resource")).count()
      .as[(String, Long)].collect().toMap
    assert(counts == Map("a" -> 10L, "b" -> 20L))
    // parsing keeps the counts (every line parses, RAW as fallthrough)
    val parsedA = Parser.parse(sources.Multiplex.branch(mux, "a")).toDF()
    assert(parsedA.count() == 10L)
    assert(parsedA.filter(col("payloadType") === "raw").count() == 10L)
    // per-element raw string filter: buffer3 mixes test/test2 lines;
    // the RAW_RAW match keeps exactly the 10 "test" lines per element
    // (ref TestInputJson#readTextTestParsingMultiElementFilter)
    val b3 = Parser.parse(lines("inputtype_buffer3.txt")).toDF()
    val pred = graft.filter.EventFilter.compile(Seq(
      graft.filter.EventFilter.Rule(
        wantSubtype = Some("raw"),
        payload = Seq(graft.filter.EventFilter.StringMatch("raw", "test")))))
    assert(b3.filter(pred).count() == 10L)
  }
}
