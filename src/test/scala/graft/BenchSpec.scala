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
      "recovery, the attempt cap, filtered runs, and sub-adjudicable " +
      "corpora stop it") {
    val official = 100000L // the sf0.1 event count
    // r15's official record read eps 219k — under the new contract
    // that pass retries instead of merely self-labeling
    assert(Bench.shouldRetry(Seq(219158.0), filtered = false,
      maxAttempts = 3, nEvents = official))
    // still contended after a retry: keep going while budget remains
    assert(Bench.shouldRetry(Seq(219158.0, 250000.0), filtered = false,
      maxAttempts = 3, nEvents = official))
    // a healthy attempt ends the loop immediately
    assert(!Bench.shouldRetry(Seq(219158.0, 400000.0), filtered = false,
      maxAttempts = 3, nEvents = official))
    // the attempt budget is a hard cap even when still unhealthy
    assert(!Bench.shouldRetry(Seq(200000.0, 210000.0, 220000.0),
      filtered = false, maxAttempts = 3, nEvents = official))
    // filtered runs skip the parse probe: health is UNKNOWABLE, not
    // bad — retrying would loop to the cap on every probe corpus
    assert(!Bench.shouldRetry(Seq(-1.0), filtered = true,
      maxAttempts = 3, nEvents = official))
    assert(!Bench.shouldRetry(Nil, filtered = false, maxAttempts = 3,
      nEvents = official))
    // sf0.01 (10k events) reads ~72k eps on an IDLE host: the floor
    // cannot adjudicate it, so the gate's bench leg must not burn 3
    // full passes there
    assert(!Bench.shouldRetry(Seq(72000.0), filtered = false,
      maxAttempts = 3, nEvents = 10000L))
    assert(Bench.AdjudicableEventsFloor > 10000L &&
      Bench.AdjudicableEventsFloor <= 100000L)
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
