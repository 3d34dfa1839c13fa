package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.Notify

/** Golden-string tests for notification rendering — mirrors the
  * reference's payload assembly, Slack text and template substitution
  * formats (alert/Alert.java:86-98, AlertSlack.java:93,
  * TemplateManager.java). */
class NotifySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): String =
    Seq(1).toDF("x").select(c.as("r")).head().getString(0)

  test("assembled payload: metadata block in entry order") {
    val meta = array(
      Notify.metaEntry(lit("sourceaddress"), lit("10.0.0.1")),
      Notify.metaEntry(lit("count"), lit("9")))
    assert(one(Notify.assembledPayload(lit("limit exceeded"), meta)) ==
      "limit exceeded\n\nAlert metadata:\nsourceaddress = 10.0.0.1\ncount = 9\n")
  }

  test("assembled payload: null or empty metadata renders the bare payload") {
    assert(one(Notify.assembledPayload(lit("p"),
      lit(null).cast("array<struct<k:string,v:string>>"))) == "p")
    assert(one(Notify.assembledPayload(lit("p"),
      array().cast("array<struct<k:string,v:string>>"))) == "p")
  }

  test("slack text is 'summary (alertId)'") {
    assert(one(Notify.slackText(lit("bad login burst"), lit("a-1"))) ==
      "bad login burst (a-1)")
  }

  test("template rendering substitutes ${key} markers; null renders empty; unbound markers survive") {
    val r = Notify.renderTemplate(
      "hello ${who}, n=${n}, missing=${nope}, nullv=[${nv}]",
      Map("who" -> lit("world"), "n" -> lit(7L),
        "nv" -> lit(null).cast("string")))
    assert(one(r) == "hello world, n=7, missing=${nope}, nullv=[]")
  }

  test("authprofile slack body degrades field-by-field on nulls, never nulls whole") {
    // concat is null-propagating: without per-field coalescing a single
    // null interpolation silently nulls the ENTIRE notification body
    val nullCol = lit(null).cast("string")
    val body = one(Notify.authProfileSlackText(
      nullCol, lit("emit-bastion"), lit("1.2.3.4"), nullCol, nullCol,
      nullCol, nullCol, lit("unknown_ip_outside_geo"),
      lit("https://doc"), lit("sec@x"), nullCol))
    assert(body != null, "null field must not null the body")
    assert(body.contains("authentication event for user unknown"))
    assert(body.contains("emit-bastion"))
    assert(body.contains("[unknown/unknown]"))
    assert(body.contains("alert id: unknown"))
  }

  test("email doc carries subject/text/html") {
    val meta = array(Notify.metaEntry(lit("k"), lit("v")))
    val doc = Notify.emailDoc(lit("s"), lit("p"), meta,
      "<b>${k}</b>", Map("k" -> lit("v")))
    val row = Seq(1).toDF("x").select(doc.as("d")).select(
      col("d.subject"), col("d.text_body"), col("d.html_body")).head()
    assert(row.getString(0) == "s")
    assert(row.getString(1) == "p\n\nAlert metadata:\nk = v\n")
    assert(row.getString(2) == "<b>v</b>")
  }

  test("notify merge: shared keys collapse with count suffix, keyless and singletons pass (ref TestAlertMerge#alertMergeTest)") {
    import spark.implicits._
    // the reference's exact four alerts: two sharing "key", one
    // keyless, one alone on "something"
    val alerts = Seq(
      ("test1", Some("key")),
      ("test2", None),
      ("test3", Some("key")),
      ("test4", Some("something"))).toDF("summary", "mk")
    val out = sinks.Sinks.notifyMerge(alerts, col("mk"))
      .select(col("summary"), col("notify_merged_count"))
      .collect()
      .map(r => r.getAs[String]("summary") ->
        Option(r.getAs[java.lang.Long]("notify_merged_count"))).toMap
    // three alerts out: the "key" pair merged into its lexicographic
    // minimum with the " (1 similar alerts)" suffix and count 2
    assert(out.size == 3)
    assert(out("test1 (1 similar alerts)") == Some(2L))
    assert(out("test2") == None)
    assert(out("test4") == None)
  }
}
