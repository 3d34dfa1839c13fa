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
}
