package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse.Parser
import graft.pipelines.{AuthProfilePipeline, CustomsPipeline, HttpRequestPipeline}

/** The pre-parse fast-match pushdown (ref Parser.java:508-516): the
  * substring predicate must sit BELOW the opaque mapPartitions parse
  * in the physical plan, so at scale non-candidate lines never reach
  * Jackson. Catalyst cannot push a filter through mapPartitions, so
  * the pipelines place it manually — these specs pin that placement. */
class FastFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val mixed = Seq(
    """{"httpRequest":{"requestMethod":"GET","requestUrl":"https://h.test/a","status":200,"remoteIp":"1.2.3.4","userAgent":"ua-1"},"timestamp":"2024-05-01T10:00:00Z","logName":"projects/p/logs/requests"}""",
    """{"Timestamp":1714557600000000000,"Type":"fxa-auth","Hostname":"h","Fields":{"email":"a@b.c","action":"loginFailure","status":"400","sourceaddress":"2.3.4.5"}}""",
    "May  1 10:22:00 host sshd[123]: Accepted publickey for alice from 203.0.113.5 port 5222 ssh2",
    "totally unrelated line with no markers at all")

  /** Lines as a FILE source: a LocalRelation would let Catalyst fold
    * the pre-parse Filter away at optimize time (ConvertToLocalRelation),
    * hiding exactly the plan node these specs pin. Production input is
    * always a file/stream scan, so test against one. */
  private lazy val mixedFile: org.apache.spark.sql.Dataset[String] = {
    val dir = java.nio.file.Files.createTempDirectory("fastfilter").toString
    val p = java.nio.file.Paths.get(dir, "lines.txt")
    java.nio.file.Files.write(p, String.join("\n", mixed: _*).getBytes)
    spark.read.textFile(p.toString)
  }

  /** The filter must be in the plan as a substring predicate on the
    * raw value, strictly below (after, in plan text order) any
    * SerializeFromObject/MapPartitions node. In Spark's explain output
    * the scan is at the bottom, so "below the parse" = the Filter line
    * appears LATER in the text than the MapPartitions line. */
  private def assertPushdown(df: org.apache.spark.sql.DataFrame,
      keyword: String): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    val filterIdx = plan.linesIterator.zipWithIndex.collect {
      case (l, i) if l.contains("Filter") && l.contains(keyword) => i
    }.toSeq
    val parseIdx = plan.linesIterator.zipWithIndex.collect {
      case (l, i) if l.contains("MapPartitions") => i
    }.toSeq
    assert(filterIdx.nonEmpty, s"no Filter[$keyword] in plan:\n$plan")
    assert(parseIdx.nonEmpty, s"no MapPartitions parse in plan:\n$plan")
    assert(filterIdx.max > parseIdx.min,
      s"fast-match filter is not below the parse:\n$plan")
  }

  test("http pipeline plan: substring pushdown below the parse") {
    assertPushdown(HttpRequestPipeline.parsedHttp(mixedFile), "httpRequest")
  }

  test("customs pipeline plan: fxa-auth pushdown below the parse") {
    assertPushdown(CustomsPipeline.parsedFxa(mixedFile), "fxa-auth")
  }

  test("authprofile pipeline plan: auth keywords pushdown below the parse") {
    assertPushdown(AuthProfilePipeline.parsedAuth(mixedFile), "sshd")
  }

  test("fastFilter semantics: admits exactly the fast-match candidates") {
    val ds = mixed.toDS()
    for (t <- Seq("glb", "fxaauth", "openssh", "nginx")) {
      val kept = ds.filter(Parser.fastFilter(t)).collect().toSet
      val expected = mixed.filter(l =>
        Parser.matchers.find(_.name == t).get.fastMatch(l)).toSet
      assert(kept == expected, s"payload type $t")
    }
  }

  test("fastFilterAny(HTTP_REQUEST types) keeps glb+apache, prunes nothing needed") {
    val kept = mixed.toDS()
      .filter(Parser.fastFilterAny(Parser.payloadTypesFor("HTTP_REQUEST")))
      .collect().toSet
    assert(kept.contains(mixed.head)) // glb line must survive
    // every event the unfiltered pipeline yields must also come
    // through the filtered one (pushdown is semantics-preserving)
    val unfiltered = Parser.parse(mixed.toDS()).toDF()
      .filter(org.apache.spark.sql.functions.col("payloadType") === "glb")
      .count()
    val filtered = HttpRequestPipeline.parsedHttp(mixed.toDS()).count()
    assert(filtered == unfiltered)
  }

  test("raw payload type admits everything (keywordless)") {
    assert(mixed.toDS().filter(Parser.fastFilter("raw")).count() == mixed.size)
    assert(mixed.toDS().filter(Parser.fastFilter("nonexistent")).count() == mixed.size)
  }
}
