package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench contract line's self-adjudication (round-15 item: two
  * official artifacts in a row were drift-recorded and their
  * per-query vectors carried phantom regressions — the record must
  * label its own host health so consumers stop doing eps
  * archaeology). */
class BenchSpec extends AnyFunSuite {

  test("isHealthy: clean-band eps passes, drifted eps fails, filtered " +
      "runs never claim health (no parse pass to adjudicate with)") {
    // the two recorded drift incidents sit far below the floor
    assert(!Bench.isHealthy(264488, filtered = false)) // official r14
    assert(!Bench.isHealthy(174000, filtered = false)) // official r13
    // clean-band history: 395-515k
    assert(Bench.isHealthy(396000, filtered = false))
    assert(Bench.isHealthy(515000, filtered = false))
    // boundary: the floor itself is healthy (>=)
    assert(Bench.isHealthy(Bench.HealthyEpsFloor, filtered = false))
    assert(!Bench.isHealthy(Bench.HealthyEpsFloor - 1, filtered = false))
    // a filtered (partial-suite) run skips the parse pass: eps is the
    // -1 sentinel and must never read as healthy — nor would a stale
    // positive value
    assert(!Bench.isHealthy(-1.0, filtered = true))
    assert(!Bench.isHealthy(500000, filtered = true))
    // the floor sits between every recorded drifted run and the clean
    // band, with margin on both sides
    assert(Bench.HealthyEpsFloor > 300000 && Bench.HealthyEpsFloor < 395000)
  }

  test("shouldRetry: a forced low floor exercises the retry path; " +
      "recovery, the attempt cap, filtered runs, sub-adjudicable " +
      "corpora, and the wall-clock deadline stop it") {
    val official = 100000L // the sf0.1 event count
    // within budget: one pass done (~100s), default deadline 2.2x
    val inBudget = (100.0, 220.0)
    def retry(eps: Seq[Double], filtered: Boolean = false,
        nEvents: Long = official, budget: (Double, Double) = inBudget) =
      Bench.shouldRetry(eps, filtered, maxAttempts = 3, nEvents,
        elapsedS = budget._1, deadlineS = budget._2)
    // r15's official record read eps 219k — under the new contract
    // that pass retries instead of merely self-labeling
    assert(retry(Seq(219158.0)))
    // still contended after a retry: keep going while budget remains
    assert(retry(Seq(219158.0, 250000.0)))
    // a healthy attempt ends the loop immediately
    assert(!retry(Seq(219158.0, 400000.0)))
    // the attempt budget is a hard cap even when still unhealthy
    assert(!retry(Seq(200000.0, 210000.0, 220000.0)))
    // filtered runs skip the parse probe: health is UNKNOWABLE, not
    // bad — retrying would loop to the cap on every probe corpus
    assert(!retry(Seq(-1.0), filtered = true))
    assert(!retry(Nil))
    // sf0.01 (10k events) reads ~72k eps on an IDLE host: the floor
    // cannot adjudicate it, so the gate's bench leg must not burn 3
    // full passes there
    assert(!retry(Seq(72000.0), nEvents = 10000L))
    assert(Bench.AdjudicableEventsFloor > 10000L &&
      Bench.AdjudicableEventsFloor <= 100000L)
  }

  test("shouldRetry deadline: a retry that would outrun the caller's " +
      "wall-clock budget must not start (the r16 rc-124 casualty — " +
      "retries fire exactly when passes run slow)") {
    val official = 100000L
    def retry(elapsed: Double, deadline: Double) =
      Bench.shouldRetry(Seq(219158.0), filtered = false, maxAttempts = 3,
        nEvents = official, elapsedS = elapsed, deadlineS = deadline)
    // the r16 shape: one pass already ate the whole budget — stop,
    // keeping the already-emitted attempt-1 record
    assert(!retry(elapsed = 600.0, deadline = 220.0))
    // at the deadline exactly: strict <, no retry
    assert(!retry(elapsed = 220.0, deadline = 220.0))
    // within budget: retry proceeds as before
    assert(retry(elapsed = 100.0, deadline = 220.0))
    // an explicit SPARK_GRAFT_BENCH_DEADLINE_S larger than the run
    // keeps the full 3-attempt budget available
    assert(retry(elapsed = 500.0, deadline = 10000.0))
  }

  test("record supersession: emitting after every attempt means a kill " +
      "mid-retry leaves the best COMPLETED attempt (never parsed:null), " +
      "and a better retry supersedes the first emission") {
    def pass(eps: Double, q1: Double): Bench.Pass = Bench.Pass(
      Map("q01_pricing_summary" -> Seq(Some(q1), Some(q1 + 0.1), Some(q1 + 0.2))),
      parseEps = eps, nEvents = 100000L)
    val contended = pass(219158.0, 5.0) // slow host: inflated timing
    val idle = pass(400000.0, 2.0)

    // after attempt 1 the record already exists and is parseable —
    // this line is what a driver kill during attempt 2 would leave
    val Seq(detail1, line1) =
      Bench.record(Vector(contended), runs = 3, filtered = false, sfDir = "/x")
    assert(detail1.startsWith("BENCH_DETAIL {"))
    assert(line1.contains(""""valid":true""") &&
      line1.contains(""""healthy":false""") &&
      line1.contains(""""attempts":1"""))
    assert(line1.contains(""""value":5.000""")) // min-of-3 of the one pass

    // after the retry, the emission reflects the BEST attempt whole —
    // printed later, it supersedes line1 in the driver's tail window
    val Seq(detail2, line2) =
      Bench.record(Vector(contended, idle), runs = 3, filtered = false, sfDir = "/x")
    assert(line2.contains(""""healthy":true""") &&
      line2.contains(""""attempts":2"""))
    assert(line2.contains(""""value":2.000""")) // the idle pass's vector
    assert(detail2.contains(""""attempt_eps":[219158,400000]"""))

    // a pass with a crashed run is labeled, not silently averaged
    val broken = Bench.Pass(
      Map("q01_pricing_summary" -> Seq(Some(1.0), None, Some(1.1))),
      parseEps = 400000.0, nEvents = 100000L)
    val Seq(_, line3) =
      Bench.record(Vector(broken), runs = 3, filtered = false, sfDir = "/x")
    assert(line3.contains(""""valid":false""") &&
      line3.contains(""""failed":["q01"]"""))
  }

  test("contract line fits the consumer's 2000-char output window at " +
      "the CURRENT query-surface size (past ~160 queries the per-query " +
      "map is dropped for a parseable summary; the full vector lives " +
      "in bench_detail_last.json)") {
    // the real surface: one pass with every SparkEntry query present
    val qs = SparkEntry.queries.keys.map(_ -> Seq[Option[Double]](
      Some(1.234), Some(1.345), Some(1.456))).toMap
    val pass = Bench.Pass(qs, parseEps = 400000.0, nEvents = 100000L)
    val Seq(detail, line) =
      Bench.record(Vector(pass), runs = 3, filtered = false,
        sfDir = "/root/testdata/sf0.1")
    // the WHOLE line must sit inside the window with headroom for
    // the newline and a stray shutdown message (r15's 171-query line
    // fit at 1982; the 187-query full map read 2138 and would have
    // head-truncated to parsed:null)
    assert(line.length <= 1900, s"contract line ${line.length} chars")
    assert(line.startsWith("""{"metric":"total_min_of_3""") &&
      line.contains(""""valid":true""") &&
      line.contains(""""value":""".trim))
    // the summary self-describes where the per-query vector went
    if (!line.contains("\"q01\""))
      assert(line.contains(""""n_queries":""") &&
        line.contains("bench_detail_last.json"), line)
    // the detail line always carries the full-name full-precision map
    assert(SparkEntry.queries.keys.forall(detail.contains), "detail map")
    // and it parses as JSON after the prefix strip (the file content)
    assert(detail.startsWith("BENCH_DETAIL {") && detail.endsWith("}"))
  }

  test("pickBest: the attempt with the fastest host window becomes " +
      "the record (whole-vector, never mixed across passes)") {
    // the r15 adjudication shape: contended first attempt, idle rerun
    assert(Bench.pickBest(Seq(219158.0, 362869.0, 300000.0)) == 1)
    assert(Bench.pickBest(Seq(500000.0)) == 0)
    // a tie keeps the earliest attempt (maxBy is first-wins)
    assert(Bench.pickBest(Seq(400000.0, 400000.0)) == 0)
  }
}
