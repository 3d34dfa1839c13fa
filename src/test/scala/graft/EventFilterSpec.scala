package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.filter.EventFilter
import graft.filter.EventFilter._
import graft.parse.Parser

class EventFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val events = {
    import spark.implicits._
    Parser.parse(Seq(
      // glb 200
      """{"httpRequest":{"requestMethod":"GET","requestUrl":"https://h/a","status":200,"remoteIp":"1.1.1.1","userAgent":"good"},"timestamp":"2024-01-01T00:00:00Z","logName":"projects/p1/logs/l","labels":{"env":"prod"}}""",
      // glb 503 bot
      """{"httpRequest":{"requestMethod":"GET","requestUrl":"https://h/b","status":503,"remoteIp":"2.2.2.2","userAgent":"bot-agent"},"timestamp":"2024-01-01T00:00:00Z","logName":"projects/p1/logs/l","labels":{"env":"dev"}}""",
      // glb 404 human
      """{"httpRequest":{"requestMethod":"GET","requestUrl":"https://h/c","status":404,"remoteIp":"3.3.3.3","userAgent":"human"},"timestamp":"2024-01-01T00:00:00Z","logName":"projects/p2/logs/l"}""",
      // openssh
      "May  1 00:00:00 h sshd[1]: Accepted password for bob from 4.4.4.4 port 1 ssh2"
    ).toDS()).toDF().cache()
  }

  private def paths(c: org.apache.spark.sql.Column): Set[String] =
    events.filter(c).collect()
      .map(r => Option(r.getAs[org.apache.spark.sql.Row]("normalized")
        .getAs[String]("urlRequestPath")).getOrElse("-")).toSet

  test("empty filter matches nothing (default deny)") {
    assert(events.filter(EventFilter.compile(Nil)).count() == 0)
  }

  test("subtype + int range + except regex") {
    val pred = compile(Seq(Rule(
      wantSubtype = Some("glb"),
      payload = Seq(IntRange("normalized.requestStatus", 400, 599)),
      except = Seq(Rule(payload = Seq(
        RegexMatch("normalized.userAgent", "^bot")))))))
    assert(paths(pred) == Set("/c"))
  }

  test("normalized type + project + label matchers") {
    assert(paths(compile(Seq(Rule(
      wantNormalizedTypes = Seq("HTTP_REQUEST"),
      wantProject = Some("p1"))))) == Set("/a", "/b"))
    assert(paths(compile(Seq(Rule(
      labelEquals = Map("env" -> "prod"))))) == Set("/a"))
  }

  test("rules are OR'd; fields-map matchers work") {
    val pred = compile(Seq(
      Rule(payload = Seq(StringMatch("fields.outcome", "Accepted"))),
      Rule(payload = Seq(IntMatch("normalized.requestStatus", 404)))))
    val got = events.filter(pred).count()
    assert(got == 2) // the ssh event + the 404 event
  }

  test("OrMatch: payload matchers OR inside one AND rule") {
    // glb AND (status 503 OR status 404): excludes the 200
    val pred = compile(Seq(Rule(
      wantSubtype = Some("glb"),
      payload = Seq(OrMatch(Seq(
        IntMatch("normalized.requestStatus", 503),
        IntMatch("normalized.requestStatus", 404)))))))
    assert(paths(pred) == Set("/b", "/c"))
    // empty OR matches nothing, so the whole rule matches nothing
    val none = compile(Seq(Rule(payload = Seq(OrMatch(Nil)))))
    assert(events.filter(none).count() == 0)
  }

  test("filter compiles to a plain Catalyst predicate (no UDF in plan)") {
    val pred = compile(Seq(Rule(wantSubtype = Some("glb"))))
    val plan = events.filter(pred).queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("scalaudf"))
  }
}
