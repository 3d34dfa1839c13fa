package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.AmoDetectors

/** Fixture tests for the AMO abuse detectors, mirroring the
  * reference's TestAmo* fixtures: realistic http_app_addons mozlog
  * lines through the real parser, then the detector operators. */
class AmoDetectorsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def amoLine(t: Long, msg: String, addr: String,
      email: Option[String] = None, uploadHash: Option[String] = None,
      uid: String = "anonymous"): String = {
    val extra = email.map(e => s""","email":"$e"""").getOrElse("") +
      uploadHash.map(h => s""","upload_hash":"$h"""").getOrElse("")
    s"""{"Timestamp":${t}000000000,"Type":"z.files","Logger":"http_app_addons",""" +
      s""""Hostname":"h","Fields":{"uid":"$uid","remoteAddressChain":"$addr",""" +
      s""""msg":"$msg"$extra}}"""
  }

  private def upload(name: String, bytes: Long) =
    s"UPLOAD: '$name' ($bytes bytes) to '/mnt/efs/a.xpi'"

  private def parseAmo(lines: Seq[String]) = {
    import spark.implicits._
    graft.parse.Parser.parse(lines.toDS()).toDF()
      .filter(col("payloadType") === "amodocker")
  }

  private def fields(c: String) = element_at(col("fields"), c)

  test("addon matcher: filename regex + size window criteria") {
    val t = 1700000000L
    val df = parseAmo(Seq(
      amoLine(t, upload("evil_payload.xpi", 5000), "1.1.1.1",
        email = Some("who+tag@x.com")),
      amoLine(t, upload("evil_payload.xpi", 99999), "2.2.2.2"), // too big
      amoLine(t, upload("benign.xpi", 5000), "3.3.3.3"))) // name mismatch
      .filter(fields("amo_type") === "fileuploadmnt")
    val out = AmoDetectors.addonMatcher(df, col("timestamp"),
      fields("file_name"), fields("bytes").cast("long"),
      col("normalized.sourceAddress"), fields("email"),
      Seq(AmoDetectors.MatchCriterion("evil_.*\\.xpi", 1000, 10000))).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("src") == "1.1.1.1")
    assert(out.head.getAs[String]("email_normalized") == "who@x.com")
    assert(out.head.getAs[Long]("bytes") == 5000L)
  }

  test("addon multi match: same upload hash from many accounts") {
    val t = 1700000000L
    val lines = (0 until 4).map(i =>
      amoLine(t + i, upload(s"${"0" * 32}_x.xpi", 1500), s"9.9.9.$i",
        email = Some(s"acct$i@x.com"), uploadHash = Some("sha256:aaa"))) :+
      amoLine(t, upload("y.xpi", 1500), "8.8.8.8",
        email = Some("solo@x.com"), uploadHash = Some("sha256:bbb"))
    val df = parseAmo(lines).filter(fields("amo_type") === "fileuploadmnt")
    val out = AmoDetectors.addonMultiMatch(df, col("timestamp"),
      fields("upload_hash"), fields("email"), "10 minutes",
      alertOn = 4).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("upload_hash") == "sha256:aaa")
    assert(out.head.getAs[Long]("n_emails") == 4L)
  }

  test("addon multi submit: size bucket rounding and the 3000-byte floor") {
    val t = 1700000000L
    // 13400 and 17900 both round up to 20000; 2000 is under the floor
    val lines = Seq(
      amoLine(t, upload("a.xpi", 13400), "1.1.1.1", email = Some("a@x.com")),
      amoLine(t + 1, upload("b.xpi", 17900), "1.1.1.2", email = Some("b@x.com")),
      amoLine(t + 2, upload("c.xpi", 2000), "1.1.1.3", email = Some("c@x.com")))
    val df = parseAmo(lines).filter(fields("amo_type") === "fileuploadmnt")
    val out = AmoDetectors.addonMultiSubmit(df, col("timestamp"),
      fields("bytes").cast("long"), fields("email"), "5 minutes",
      alertOn = 2).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("size_bucket") == 20000L)
    assert(out.head.getAs[Long]("n_emails") == 2L)
  }

  test("addon cloud submission: provider labeling from CIDR sets") {
    val t = 1700000000L
    val lines = Seq(
      amoLine(t, "New version: <Version: 1.0.0> (123) from <FileUpload: a>",
        "52.0.0.5", uid = "u1"),
      amoLine(t, "New version: <Version: 1.0.1> (124) from <FileUpload: b>",
        "35.190.1.2", uid = "u2"),
      amoLine(t, "New version: <Version: 1.0.2> (125) from <FileUpload: c>",
        "99.99.99.99", uid = "u3"))
    val df = parseAmo(lines).filter(fields("amo_type") === "newversion")
    val out = AmoDetectors.addonCloudSubmission(df, col("timestamp"),
      col("normalized.sourceAddress"), fields("guid"), fields("email"),
      awsCidrs = Seq("52.0.0.0/8"), gcpCidrs = Seq("35.190.0.0/17"))
      .collect()
    assert(out.map(r => r.getAs[String]("src") ->
      r.getAs[String]("provider")).toSet ==
      Set("52.0.0.5" -> "aws", "35.190.1.2" -> "gcp"))
  }

  test("report restriction: restricted events pass through") {
    val t = 1700000000L
    val df = parseAmo(Seq(
      amoLine(t, "Restricting request from ip 1.2.3.4 (reputation=50)",
        "1.2.3.4"),
      amoLine(t, "Restricting request from email bad@x.com (reputation=10)",
        "5.6.7.8")))
      .filter(fields("amo_type") === "restricted")
    val out = AmoDetectors.reportRestriction(df, col("timestamp"),
      col("normalized.sourceAddress"), fields("restricted_value")).collect()
    assert(out.map(_.getAs[String]("restricted_value")).toSet ==
      Set("1.2.3.4", "bad@x.com"))
  }

  test("fxa alias abuse: dot/plus aliases of one account in a session") {
    val t = 1700000000L
    val lines = Seq(
      amoLine(t, "Logging in FxA user k.urn@x.com", "1.1.1.1"),
      amoLine(t + 60, "Logging in FxA user ku.rn@x.com", "1.1.1.1"),
      amoLine(t + 120, "Logging in FxA user kur.n@x.com", "1.1.1.1"),
      // plain account: not an alias, never counted
      amoLine(t + 180, "Logging in FxA user kurn@x.com", "1.1.1.1"),
      // other user, one alias only: below the limit
      amoLine(t + 200, "Logging in FxA user w.orf@x.com", "2.2.2.2"))
    val df = parseAmo(lines).filter(fields("amo_type") === "fxalogin")
    val out = AmoDetectors.fxaAccountAbuseAlias(df, col("timestamp"),
      fields("email"), gapSeconds = 7200, maxAliases = 2).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("email_normalized") == "kurn@x.com")
    assert(out.head.getAs[Long]("n_aliases") == 3L)
    // the sharded escape hatch is result-identical (the alias flood's
    // hot normalized key is exactly the case it exists for)
    val sharded = AmoDetectors.fxaAccountAbuseAlias(df, col("timestamp"),
      fields("email"), gapSeconds = 7200, maxAliases = 2,
      sharded = true).collect()
    assert(sharded.map(_.toSeq).toSet == out.map(_.toSeq).toSet)
    // and on the real events table at q52's parameters
    import org.apache.spark.sql.functions.{concat, lit, when}
    val e = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("email", concat(
        when(col("event_id") % 3 === 1, "u.ser").otherwise("us.er"),
        col("user_id"), lit("@x.com")))
      .filter(col("event_id") % 3 =!= 0)
    def rows(sh: Boolean) = AmoDetectors.fxaAccountAbuseAlias(e,
        col("ts"), col("email"), gapSeconds = 86400, maxAliases = 1,
        sharded = sh)
      .collect().map(_.toSeq).toSet
    val (plain, shardedReal) = (rows(false), rows(true))
    assert(shardedReal == plain && plain.nonEmpty)
  }

  test("multi-ip login: gap sessions, account exceptions, aggressive matchers") {
    import spark.implicits._
    val t = 1700000000L
    def row(off: Long, email: String, addr: String, country: String) =
      (new java.sql.Timestamp((t + off) * 1000L), email, addr, country)
    val df = Seq(
      // abuser: 2 countries + 3 addrs inside one 15-min-gap session
      row(0, "abuser@x.com", "1.1.1.1", "US"),
      row(60, "abuser@x.com", "2.2.2.2", "DE"),
      row(120, "abuser@x.com", "3.3.3.3", "DE"),
      // a >gap pause opens a SECOND session that stays under bounds:
      // the tumbling-window form would have merged these into one day
      row(7200, "abuser@x.com", "1.1.1.1", "US"),
      // excepted account: same pattern, dropped pre-analysis
      row(0, "svc-runner@x.com", "1.1.1.1", "US"),
      row(60, "svc-runner@x.com", "2.2.2.2", "DE"),
      row(120, "svc-runner@x.com", "3.3.3.3", "FR"),
      // aggressive-matched: 2 countries but only 2 addrs — the IP
      // bound is bypassed for it
      row(0, "vip@x.com", "4.4.4.4", "US"),
      row(60, "vip@x.com", "5.5.5.5", "JP"),
      // normal account at 2 countries / 2 addrs: below the IP bound
      row(0, "meh@x.com", "6.6.6.6", "US"),
      row(60, "meh@x.com", "7.7.7.7", "CA")
    ).toDF("ts", "email", "addr", "country")
    val out = AmoDetectors.multiIpLogin(df, col("ts"), col("email"),
      col("addr"), col("country"), gapSeconds = 900, alertOn = 2,
      alertOnIp = 3, acctExceptions = Seq("svc-.*"),
      aggMatchers = Seq("vip@x\\.com"))
      .orderBy(col("email")).collect()
    assert(out.map(_.getAs[String]("email")).toSeq ==
      Seq("abuser@x.com", "vip@x.com"))
    val ab = out(0)
    assert(ab.getAs[Long]("n_countries") == 2L &&
      ab.getAs[Long]("n_addrs") == 3L &&
      ab.getAs[Long]("session_start_ms") == t * 1000L)
    assert(out(1).getAs[Long]("n_addrs") == 2L)
  }

  test("fxa ban patterns: anchored full-match on the account") {
    val t = 1700000000L
    val lines = Seq(
      amoLine(t, "Logging in FxA user bot1234@spam.net", "1.1.1.1"),
      amoLine(t, "Logging in FxA user human@x.com", "2.2.2.2"))
    val df = parseAmo(lines).filter(fields("amo_type") === "fxalogin")
    val out = AmoDetectors.fxaBanPatterns(df, col("timestamp"),
      fields("email"), col("normalized.sourceAddress"),
      Seq("bot\\d+@spam\\.net")).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("email") == "bot1234@spam.net")
  }
}
