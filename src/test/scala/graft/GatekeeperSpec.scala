package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipelines.{CorrelationPipeline, GatekeeperPipeline}

class GatekeeperSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def finding(ft: String, sev: Double, acct: String, t: String) =
    s"""{"findingType":"$ft","severity":$sev,"accountId":"$acct","region":"us-west-2","timestamp":"$t","logName":"projects/p/logs/gd"}"""

  test("gatekeeper: severity mapping + per-(type,account) suppression") {
    import spark.implicits._
    val lines = Seq(
      finding("Recon:EC2", 2.0, "a1", "2024-01-01T00:00:00Z"),  // info, emits
      finding("Recon:EC2", 2.0, "a1", "2024-01-01T00:05:00Z"),  // suppressed (<15m)
      finding("Recon:EC2", 2.0, "a1", "2024-01-01T00:20:00Z"),  // re-emits
      finding("Backdoor:EC2", 8.0, "a1", "2024-01-01T00:06:00Z"), // different type, emits
      finding("Recon:EC2", 5.0, "a2", "2024-01-01T00:07:00Z")   // different account, emits
    ).toDS()
    val alerts = GatekeeperPipeline.analyze(lines).collect()
    assert(alerts.length == 4)
    val sev = alerts.map(r => (r.getAs[String]("subcategory"),
      r.getAs[String]("account")) -> r.getAs[String]("severity")).toMap
    assert(sev(("Recon:EC2", "a1")) == "info")
    assert(sev(("Backdoor:EC2", "a1")) == "critical")
    assert(sev(("Recon:EC2", "a2")) == "warn")
  }

  test("gatekeeper: matcher bucketing - ignore list drops, escalation forces critical") {
    import spark.implicits._
    val lines = Seq(
      finding("Recon:EC2/Portscan", 2.0, "a1", "2024-01-01T00:00:00Z"),
      finding("Discovery:S3/AnomalousBehavior", 3.0, "a1", "2024-01-01T00:01:00Z"),
      finding("CryptoCurrency:EC2/Mining", 4.0, "a1", "2024-01-01T00:02:00Z")
    ).toDS()
    val alerts = GatekeeperPipeline.analyze(lines,
      GatekeeperPipeline.Config(
        ignorePatterns = Seq("Discovery:S3/.*"),
        escalatePatterns = Seq("CryptoCurrency:.*"))).collect()
    val sev = alerts.map(r =>
      r.getAs[String]("subcategory") -> r.getAs[String]("severity")).toMap
    assert(!sev.contains("Discovery:S3/AnomalousBehavior")) // ignored
    assert(sev("Recon:EC2/Portscan") == "info")
    assert(sev("CryptoCurrency:EC2/Mining") == "critical") // escalated
  }

  test("source correlation: mostly-alerting networks flagged") {
    import spark.implicits._
    // network 10.0.0.x: 4 addrs, 3 alerted; network 10.0.1.x: 3 addrs, 0 alerted
    val events = Seq("10.0.0.1", "10.0.0.2", "10.0.0.3", "10.0.0.4",
      "10.0.1.1", "10.0.1.2", "10.0.1.3").toDF("addr")
    val alerted = Seq("10.0.0.1", "10.0.0.2", "10.0.0.3").toDF("addr")
    val got = CorrelationPipeline.sourceCorrelation(events, alerted,
      CorrelationPipeline.slash24, minAddrs = 3, minAlertedRatio = 0.7)
      .collect()
    assert(got.length == 1)
    assert(got(0).getAs[String]("network") == "10.0.0")
    assert(got(0).getAs[Long]("n_alerted") == 3)
  }

  test("watchlist join escalates only watched identifiers, broadcast") {
    import spark.implicits._
    val alerts = Seq(("a1", "1.1.1.1"), ("a2", "2.2.2.2")).toDF("id", "src")
    val watchlist = Seq(("ip", "1.1.1.1", "critical"),
      ("email", "x@y.z", "warn")).toDF("kind", "value", "severity_override")
    val got = CorrelationPipeline.watchlisted(alerts, col("src"), "ip", watchlist)
    assert(got.collect().map(_.getAs[String]("id")).toSeq == Seq("a1"))
    assert(got.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }
}
