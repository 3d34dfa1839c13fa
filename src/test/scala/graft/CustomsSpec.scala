package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipelines.CustomsPipeline

class CustomsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def fxa(email: String, action: String, src: String, t: Long,
      path: String = "/v1/x", status: String = "200") =
    s"""{"Timestamp":${t}000000000,"Type":"fxa-auth","Hostname":"h","Fields":{"email":"$email","action":"$action","status":"$status","path":"$path","sourceaddress":"$src"}}"""

  test("customs pipeline: per-source windowed detectors, variance exemption, distributed creation") {
    import spark.implicits._
    val base = 1700000000L
    val lines = (
      // 6 login failures from one source in one 10-min window
      (0 until 6).map(i => fxa(s"u$i@ok.com", "loginFailure", "1.1.1.1", base + i * 10)) ++
      // password-reset abuse: ONE source resetting 3 distinct accounts
      // (the reference keys this detector by source address and counts
      // distinct accounts, CustomsPasswordResetAbuse.java:76-89)
      Seq(
        fxa("victim1@mail.com", "passwordReset", "9.9.9.9", base),
        fxa("victim2@mail.com", "passwordReset", "9.9.9.9", base + 60),
        fxa("victim3@mail.com", "passwordReset", "9.9.9.9", base + 120)) ++
      // distributed creation: similar local parts from 3 sources
      Seq(
        fxa("bot1@spam.net", "accountCreate", "7.7.7.1", base),
        fxa("bot2@spam.net", "accountCreate", "7.7.7.2", base + 30),
        fxa("bot3@spam.net", "accountCreate", "7.7.7.3", base + 60)) ++
      // a NOMINAL-variance source: 6 failures but organic browsing
      // across 3 successful paths (index 3 + 10*3 = 33 >= 33) — the
      // reference's varianceView exempts it (SourceLoginFailure:90)
      (0 until 6).map(i => fxa(s"v$i@ok.com", "loginFailure", "8.8.8.8",
        base + i * 10, path = s"/v1/p${i % 3}")) ++
      // quiet background
      Seq(fxa("normal@mail.com", "loginFailure", "2.2.2.2", base))
    ).toDS()
    val alerts = CustomsPipeline.analyze(lines).collect()
    val bySub = alerts.groupBy(_.getAs[String]("subcategory"))
      .view.mapValues(_.map(r => r.getAs[String]("key")).toSet).toMap
    assert(bySub("source_login_failure") == Set("1.1.1.1"))
    assert(bySub("password_reset_abuse") == Set("9.9.9.9"))
    assert(bySub("account_creation_abuse_distributed") == Set("spam.net"))
    assert(!bySub.contains("account_creation_abuse")) // max 1 distinct per source
    // the reset alerts carry the sourceaddress keying
    assert(alerts.filter(_.getAs[String]("subcategory") ==
      "password_reset_abuse").forall(
      _.getAs[String]("key_kind") == "sourceaddress"))
  }

  test("fxaauth matcher normalizes AUTH_SESSION with email subject") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val e = graft.parse.Parser.parseLine(
      fxa("a@b.c", "loginFailure", "1.2.3.4", 1700000000L), mapper)
    assert(e.payloadType == "fxaauth")
    assert(e.normalized.types == Seq("AUTH_SESSION"))
    assert(e.normalized.subjectUser.contains("a@b.c"))
    assert(e.fields("action") == "loginFailure")
    assert(e.timestamp.toInstant.getEpochSecond == 1700000000L)
  }
}
