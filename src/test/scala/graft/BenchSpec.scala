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
}
