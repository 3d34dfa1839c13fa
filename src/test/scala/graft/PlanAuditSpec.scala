package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

/** Physical-plan audits for the round-2 operators: the properties
  * that make these plans survive a 100x scale-up — broadcast where
  * the side is provably small, codegen through the similarity inner
  * loop, no accidental cartesian products. */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("monitored-list detectors broadcast the list side") {
    val p = plan(SparkEntry.queries("q47_monitored_activity")(spark, sf))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"monitored list should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("account enumeration: variance gate joins stay keyed, clients broadcast") {
    val p = plan(SparkEntry.queries("q44_account_enumeration")(spark, sf))
    assert(p.contains("BroadcastExchange"),
      s"window-client floor should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("similarity scoring runs the native dot product inside codegen") {
    val df = SparkEntry.queries("q19_cosine_topk")(spark, sf)
    // the native expression must appear in the plan (not an HOF chain)
    val logical = df.queryExecution.optimizedPlan.toString
    assert(logical.contains("dot_q"),
      s"native dot_q missing from plan:\n$logical")
    assert(!logical.contains("aggregate(zip_with"),
      s"interpreted HOF chain leaked back into the plan:\n$logical")
    df.collect() // finalize AQE so codegen stages materialize
    val p = plan(df)
    // codegen stages render as "*(n)" in the simple plan string
    assert(p.contains("*("), s"no whole-stage-codegen stages:\n$p")
  }

  test("velocity and auth-state scans are single-exchange per key") {
    // one Exchange hashpartitioning on the analysis key feeding the
    // window/sort — no repeated shuffles of the event stream
    val p = plan(SparkEntry.queries("q43_customs_velocity")(spark, sf))
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    // dedupe window rank + per-uid lag reuse the same uid partitioning:
    // expect at most 2 hash exchanges (uid+window+addr rank, then uid)
    assert(exchanges <= 2, s"too many exchanges ($exchanges):\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("pioneer exfiltration: both window frames share one sort") {
    val p = plan(SparkEntry.queries("q54_pioneer_exfil")(spark, sf))
    // range-frame sum/max and the pick rank all run over (key, session)
    // orderings; the plan must not shuffle the flow stream more than
    // twice (session assignment on key, then key+session windows)
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, s"too many exchanges ($exchanges):\n$p")
  }

  test("aws behavior matcher: one scan regardless of matcher count") {
    val df = SparkEntry.queries("q55_aws_behavior")(spark, sf)
    val p = plan(df)
    // single-pass explode(array(when...)): exactly one Generate node,
    // no union of per-matcher scans
    val generates = p.linesIterator.count(_.contains("Generate"))
    assert(generates == 1, s"expected one Generate:\n$p")
    assert(!p.contains("Union"), s"per-matcher scan union crept in:\n$p")
  }
}
