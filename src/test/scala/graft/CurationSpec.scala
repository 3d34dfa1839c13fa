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

  test("composed/decomposed unicode twins collapse to ONE survivor in " +
      "BOTH curation paths — batch curate and curateStream hash the " +
      "same NFC-canonical text") {
    import spark.implicits._
    import graft.pipelines.CorpusPipeline
    // byte-distinct, NFC-canonically identical (explicit \u escapes —
    // the two forms render identically in any editor)
    val composed = "le caf\u00e9 r\u00e9sum\u00e9 sits beside the " +
      "na\u00efve river while seventeen violinists rehearse quietly"
    val decomposed = "le cafe\u0301 re\u0301sume\u0301 sits beside the " +
      "nai\u0308ve river while seventeen violinists rehearse quietly"
    assert(composed != decomposed)
    val other = "a completely different prose passage with the usual " +
      "stopwords and enough tokens to clear the quality gate"
    val markers = Map("x" -> Seq("river"), "y" -> Seq("prose"))

    // batch: the twin pair is ONE exact-dup group (n_copies = 2, the
    // smaller id canonical); the decomposed copy is not a survivor
    val docs = Seq((1L, composed), (2L, decomposed), (3L, other))
      .toDF("doc_id", "text")
    val batch = CorpusPipeline.curate(docs, col("doc_id"), col("text"),
        markers).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_copies"))
      .toMap
    assert(batch == Map(1L -> 2L, 3L -> 1L), s"batch $batch")

    // streaming: the decomposed twin arrives later and is dropped by
    // the watermarked exact screen, same decision as batch
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, String)]
    val q = CorpusPipeline.curateStream(
        in.toDS().select(timestamp_seconds(col("_1")).as("ts"),
          col("_2").as("doc_id"), col("_3").as("text")),
        "ts", col("doc_id"), col("text"), watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("unitwins")
      .outputMode("append").start()
    try {
      in.addData((1700000000L, 1L, composed),
        (1700000010L, 2L, decomposed), (1700000020L, 3L, other))
      q.processAllAvailable()
      val streamed = spark.table("unitwins").select("doc_id")
        .as[Long].collect().toSet
      assert(streamed == Set(1L, 3L), s"streamed $streamed")
    } finally q.stop()
  }
}
