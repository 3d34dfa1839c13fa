package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curation

class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def hosts = {
    import spark.implicits._
    Seq(
      (1L, "tracker.net"), // exact match
      (2L, "cdn.tracker.net"), // subdomain match
      (3L, "nottracker.net"), // label boundary: must NOT match
      (4L, "tracker.net.evil.org"), // suffix is evil.org, not tracker.net
      (5L, "www.shop.example.com"), // clean
      (6L, "ads.example.com") // matches the deeper entry
    ).toDF("doc_id", "host")
  }

  private def blocklist = {
    import spark.implicits._
    Seq("tracker.net", "ads.example.com").toDF("domain")
  }

  test("blocklist matching is label-suffix, never substring") {
    val m = Curation.blockedMatches(hosts, col("doc_id"), col("host"),
      blocklist, col("domain")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("blocked_domain"))
    assert(m.toMap == Map(1L -> "tracker.net", 2L -> "tracker.net",
      6L -> "ads.example.com"))
    val kept = Curation.filterBlockedDomains(hosts, col("doc_id"),
      col("host"), blocklist, col("domain"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L, 5L))
  }

  test("a multi-entry match drops the row once and reports each entry") {
    import spark.implicits._
    val bl = Seq("tracker.net", "cdn.tracker.net").toDF("domain")
    val m = Curation.blockedMatches(hosts, col("doc_id"), col("host"),
      bl, col("domain")).filter(col("doc_id") === 2L).collect()
    assert(m.map(_.getAs[String]("blocked_domain")).sorted.toSeq ==
      Seq("cdn.tracker.net", "tracker.net"))
    val kept = Curation.filterBlockedDomains(hosts, col("doc_id"),
      col("host"), bl, col("domain")).count()
    assert(kept == 4L) // docs 1 and 2 dropped (2 once, not twice)
  }

  test("literal-list predicate form agrees with the DataFrame form") {
    val viaCol = hosts.filter(!Curation.isBlockedDomain(col("host"),
      Seq("tracker.net", "ads.example.com")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaDf = Curation.filterBlockedDomains(hosts, col("doc_id"),
      col("host"), blocklist, col("domain"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaCol == viaDf)
  }

  test("plan: blocklist broadcast, no cartesian; predicate form adds no exchange") {
    val p = Curation.filterBlockedDomains(hosts, col("doc_id"),
      col("host"), blocklist, col("domain"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
    val p2 = hosts.filter(!Curation.isBlockedDomain(col("host"),
      Seq("tracker.net"))).queryExecution.executedPlan.toString
    assert(!p2.contains("Exchange"), s"predicate form must be map-only:\n$p2")
  }
}
