package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Alert, AlertMeta, AlertMetaEntry}
import graft.pipelines.HttpRequestPipeline
import graft.sinks.Sinks

/** Byte-exact alert-JSON parity against reference-shaped goldens
  * (ref t/java/com/mozilla/secops/httprequest/TestThresholdAnalysis1
  * .java:24-112 semantics; JSON shape from the engine-produced fixture
  * lines in t/resources/testdata/watchlist_analyze_buffer2.txt and
  * iprepdio1.txt). */
class GoldenAlertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** A GLB LogEntry line our parser maps to an HTTP_REQUEST event —
    * same envelope the reference's httpreq_* fixtures use. */
  private def glb(ip: String, tsIso: String): String =
    s"""{"httpRequest":{"requestMethod":"GET","requestUrl":"https://send.firefox.com/public/locales/en-US/send.js","status":200,"remoteIp":"$ip","userAgent":"Mozilla"},"timestamp":"$tsIso","logName":"projects/test/logs/requests","resource":{"type":"http_load_balancer"}}"""

  test("SQS sink: queue-spec parsing and SendMessageRequest shape") {
    import spark.implicits._
    import graft.sinks.Sinks
    // the reference's 5-part spec: url (contains one ':') + key +
    // secret + region
    assert(Sinks.parseSqsQueueInfo(
      "https://sqs.test-r.example/123/q:AKIA:s3cr3t:test-r")
      .contains(("https://sqs.test-r.example/123/q", "AKIA", "s3cr3t",
        "test-r")))
    assert(Sinks.parseSqsQueueInfo("nocolonanywhere").isEmpty)
    assert(Sinks.parseSqsQueueInfo("a:b:c").isEmpty)
    assert(Sinks.parseSqsQueueInfo("a:b:c:d:e:f").isEmpty)
    intercept[IllegalArgumentException] {
      new Sinks.SqsWriter("bad", "/tmp/unused")
    }
    // writer: rendered strings wrap into (queue_url, delay=0, body)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sqs").toString + "/out"
    val w = new Sinks.SqsWriter(
      "https://sqs.test-r.example/123/q:AKIA:s3cr3t:test-r", dir)
    w.write(Seq("""{"summary":"x"}""", """{"summary":"y"}""")
      .toDF("value"))
    val rows = spark.read.parquet(dir)
      .collect().map(r => (r.getAs[String]("queue_url"),
        r.getAs[Int]("delay_seconds"),
        r.getAs[String]("message_body"))).toSet
    assert(rows == Set(
      ("https://sqs.test-r.example/123/q", 0, """{"summary":"x"}"""),
      ("https://sqs.test-r.example/123/q", 0, """{"summary":"y"}""")))
  }

  test("Pub/Sub sink: writeStrings shape — (topic, data) records") {
    import spark.implicits._
    import graft.sinks.Sinks
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pubsub").toString + "/out"
    new Sinks.PubsubWriter("alerts-topic", dir)
      .write(Seq("""{"summary":"x"}""").toDF("value"))
    val rows = spark.read.parquet(dir).collect()
      .map(r => (r.getAs[String]("topic"), r.getAs[String]("data"))).toSet
    assert(rows == Set(("alerts-topic", """{"summary":"x"}""")))
    intercept[IllegalArgumentException] {
      new Sinks.PubsubWriter("", "/tmp/unused")
    }
  }

  test("threshold_analysis alert JSON is byte-exact vs the reference-shaped golden") {
    import spark.implicits._
    // fixture semantics of httpreq_thresholdanalysis1.txt: 100
    // requests from 10.0.0.1 plus 2 each from 10 well-behaved
    // clients, all inside minute zero -> per-client mean 120/11,
    // modifier 1.0, exactly one alert (the reference test asserts
    // count 100, mean ~10.90, window_timestamp
    // 1970-01-01T00:00:59.999Z — here pinned to the byte)
    val lines =
      (0 until 100).map(i =>
        glb("10.0.0.1", f"1970-01-01T00:00:${i % 60}%02d.000Z")) ++
      (1 to 10).flatMap(c => Seq(
        glb(s"192.168.1.$c", "1970-01-01T00:00:05.000Z"),
        glb(s"192.168.1.$c", "1970-01-01T00:00:35.000Z")))
    val alerts = HttpRequestPipeline.thresholdAlertsGolden(
      lines.toDS(), monitoredResource = "test", modifier = 1.0)
    val json = Sinks.alertJsonGolden(alerts).collect()
    assert(json.length == 1)
    val expectedId = java.util.UUID.nameUUIDFromBytes(
      "test|threshold_analysis|10.0.0.1|0".getBytes("UTF-8")).toString
    // 120/11 renders as Java Double.toString -> 10.909090909090908
    val expected =
      s"""{"severity":"info","id":"$expectedId","summary":"test httprequest threshold_analysis 10.0.0.1 100","category":"httprequest","timestamp":"1970-01-01T00:00:59.999Z","metadata":[{"key":"category","value":"threshold_analysis"},{"key":"sourceaddress","value":"10.0.0.1"},{"key":"mean","value":"10.909090909090908"},{"key":"count","value":"100"},{"key":"threshold_modifier","value":"1.0"},{"key":"notify_merge","value":"test threshold_analysis"},{"key":"window_timestamp","value":"1970-01-01T00:00:59.999Z"}]}"""
    assert(json.head == expected)
  }

  test("alert JSON with a list-valued email key matches a reference-produced fixture line byte-for-byte") {
    import spark.implicits._
    // the first line of t/resources/testdata/
    // watchlist_analyze_buffer2.txt, produced by the reference
    // engine's Alert.toJSON — reproduced from our model + serializer
    val alert = Alert(
      alertId = "e116e0ee-5747-4cd5-a1b1-d36d91ac62b9",
      timestamp = new Timestamp(0L),
      summary = "test 10.0.0.1 account enumeration threshold exceeded, " +
        "3 in 10 minutes",
      category = "customs",
      metadata = Seq(
        AlertMetaEntry(AlertMeta.AlertSubcategoryField,
          "account_enumeration"),
        AlertMetaEntry(AlertMeta.NotifyMergeKey, "account_enumeration"),
        AlertMetaEntry(AlertMeta.SourceAddress, "10.0.0.1"),
        AlertMetaEntry(AlertMeta.Count, "3"),
        AlertMetaEntry(AlertMeta.Email, AlertMeta.joinListValues(
          AlertMeta.Email, Seq("example@enterprise.com",
            "another_example@enterprise.com",
            "yet_another_example@enterprise.com")))))
    val json = Sinks.alertJsonGolden(Seq(alert).toDS()).head()
    val expected =
      """{"severity":"info","id":"e116e0ee-5747-4cd5-a1b1-d36d91ac62b9","summary":"test 10.0.0.1 account enumeration threshold exceeded, 3 in 10 minutes","category":"customs","timestamp":"1970-01-01T00:00:00.000Z","metadata":[{"key":"category","value":"account_enumeration"},{"key":"notify_merge","value":"account_enumeration"},{"key":"sourceaddress","value":"10.0.0.1"},{"key":"count","value":"3"},{"key":"email","value":"example@enterprise.com, another_example@enterprise.com, yet_another_example@enterprise.com"}]}"""
    assert(json == expected)
  }

  test("list-valued key join/split round-trips; non-list keys rejected") {
    val vals = Seq("a@x.com", "b@x.com")
    val joined = AlertMeta.joinListValues(AlertMeta.Email, vals)
    assert(joined == "a@x.com, b@x.com")
    assert(AlertMeta.splitListValues(AlertMeta.Email, joined) == vals)
    intercept[IllegalArgumentException] {
      AlertMeta.joinListValues(AlertMeta.Count, vals)
    }
    intercept[IllegalArgumentException] {
      AlertMeta.splitListValues(AlertMeta.SourceAddress, "x")
    }
  }

  test("payload field renders between category and timestamp when present") {
    import spark.implicits._
    val alert = Alert(
      alertId = "00000000-0000-0000-0000-000000000001",
      timestamp = new Timestamp(1000L),
      summary = "s", category = "c",
      payload = Some("raw payload text"))
    val json = Sinks.alertJsonGolden(Seq(alert).toDS()).head()
    assert(json ==
      """{"severity":"info","id":"00000000-0000-0000-0000-000000000001","summary":"s","category":"c","payload":"raw payload text","timestamp":"1970-01-01T00:00:01.000Z","metadata":[]}""")
  }
}
