package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sessionize

/** The sharded sessionizer's contract: result-IDENTICAL to the
  * analytic [[Sessionize.assignSessions]] on every input (the whole
  * point is that callers can switch paths for skew without touching
  * semantics), while the plan's heavy sort partitions by
  * (key, time-slice) instead of key alone. */
class SessionizeShardedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private def canon(df: org.apache.spark.sql.DataFrame) = df
    .select(col("k"), col("t"), col("session_id"))
    .collect()
    .map(r => (Option(r.getString(0)).getOrElse(" <null>"),
      r.getTimestamp(1).getTime, r.getLong(2)))
    .sorted
    .toSeq

  test("slice-and-mend equals the analytic sessionizer on the " +
      "adversarial fixture: multi-slice sessions, exact-gap " +
      "boundaries, empty slices, singleton keys") {
    import spark.implicits._
    val gap = 100L
    val rows = Seq(
      // key a: one session CHAINING through 5 slices (events 60 s
      // apart, slice = gap = 100 s), then an exact-gap boundary
      // (>= gap starts a NEW session), then an empty-slice hole
      ("a", 10L), ("a", 70L), ("a", 130L), ("a", 190L), ("a", 250L),
      ("a", 350L),         // 250 -> 350 = exactly gap: NEW session
      ("a", 800L),         // far past: new session after empty slices
      // key b: all inside one slice, two sessions via in-slice gap
      ("b", 10L), ("b", 20L), ("b", 125L),
      // key c: a single event
      ("c", 500L),
      // key d: boundary pair straddling a slice edge but WITHIN gap
      ("d", 95L), ("d", 105L),
      // key e: duplicate timestamps (ties never split a session)
      ("e", 42L), ("e", 42L), ("e", 42L),
      // null key: the analytic PARTITION BY keeps it as its own
      // group — the sharded mend join must not drop it
      (null, 50L), (null, 60L), (null, 300L))
    val df = rows.map { case (k, s) => (k, ts(s)) }.toDF("k", "t")
    val plain = canon(Sessionize.assignSessions(
      df, col("t"), col("k"), gap))
    for (slice <- Seq(100L, 150L, 1000L)) {
      val sharded = canon(Sessionize.assignSessionsSharded(
        df, col("t"), col("k"), gap, slice))
      assert(sharded == plain,
        s"slice=$slice diverged:\n$sharded\nvs\n$plain")
    }
    // and the ids really are the analytic running count: key a gets
    // sessions 1 (x5 events), 2, 3
    val aIds = plain.filter(_._1 == "a").map(_._3)
    assert(aIds == Seq(1L, 1L, 1L, 1L, 1L, 2L, 3L), aIds.toString)
  }

  test("seeded random sweep: equivalence over dense timelines at " +
      "several gap/slice combinations") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val rows = (1 to 2000).map { _ =>
      (s"k${rnd.nextInt(7)}", rnd.nextInt(5000).toLong)
    }
    val df = rows.map { case (k, s) => (k, ts(s)) }.toDF("k", "t")
    for ((gap, slice) <- Seq((30L, 30L), (30L, 45L), (120L, 120L),
        (7L, 7L), (7L, 1000L))) {
      val plain = canon(Sessionize.assignSessions(
        df, col("t"), col("k"), gap))
      val sharded = canon(Sessionize.assignSessionsSharded(
        df, col("t"), col("k"), gap, slice))
      assert(sharded == plain, s"gap=$gap slice=$slice diverged")
    }
  }

  test("sessionSummarySharded equals sessionSummary on the real " +
      "events table at q42's gap") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    def c(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sorted.toSeq
    val plain = c(Sessionize.sessionSummary(
      ev, col("ts"), col("user_id"), 3600))
    val sharded = c(Sessionize.sessionSummarySharded(
      ev, col("ts"), col("user_id"), 3600))
    assert(sharded == plain)
  }

  test("sessionLimitSharded equals sessionLimit on the real events " +
      "table at q14's gate") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    def c(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted.toSeq
    val plain = c(Sessionize.sessionLimit(
      ev, col("ts"), col("user_id"), 3600, 3))
    val sharded = c(Sessionize.sessionLimitSharded(
      ev, col("ts"), col("user_id"), 3600, 3))
    assert(sharded == plain && plain.nonEmpty)
  }

  test("sequenceAbuseSharded equals sequenceAbuse: adversarial " +
      "fixture (boundary pairs, superseded firsts, ties, null key) " +
      "plus a seeded random sweep and the real events table") {
    import spark.implicits._
    import graft.operators.Heuristics
    def c(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (Option(r.get(0)).map(_.toString).getOrElse(" <null>"),
        r.getLong(1), r.getLong(2))).sorted.toSeq
    def run(df: org.apache.spark.sql.DataFrame, delta: Long,
        slices: Seq[Long]): Unit = {
      val plain = c(Heuristics.sequenceAbuse(df, col("t"), col("sq"),
        col("k"), col("e") === "f", col("e") === "s", delta))
      for (sl <- slices) {
        val sharded = c(Heuristics.sequenceAbuseSharded(df, col("t"),
          col("sq"), col("k"), col("e") === "f", col("e") === "s",
          delta, sliceSeconds = sl))
        assert(sharded == plain,
          s"slice=$sl diverged:\n$sharded\nvs\n$plain")
      }
    }
    // hand fixture: a first in slice 0 pairing a second in slice 2
    // (the prefix max crosses an EMPTY slice), a superseded first,
    // a first+second tie at one timestamp, a second with no first,
    // and a null key
    val fix = Seq(
      ("a", 10L, 1L, "f"), ("a", 250L, 2L, "s"), // cross-slice pair
      ("a", 260L, 3L, "f"), ("a", 261L, 4L, "s"), // superseded first
      ("b", 42L, 5L, "f"), ("b", 42L, 6L, "s"),   // tie: pairs
      ("c", 10L, 7L, "s"),                        // no first: drops
      (null, 5L, 8L, "f"), (null, 30L, 9L, "s"))
      .map { case (k, s, q, e) => (k, ts(s), q, e) }
      .toDF("k", "t", "sq", "e")
    run(fix, delta = 300000L, slices = Seq(100L, 60L, 7L))
    // seeded random sweep over dense timelines
    val rnd = new scala.util.Random(1717)
    val dense = (1 to 3000).map { i =>
      (s"k${rnd.nextInt(5)}", ts(rnd.nextInt(5000).toLong), i.toLong,
        if (rnd.nextBoolean()) "f" else "s")
    }.toDF("k", "t", "sq", "e")
    run(dense, delta = 120000L, slices = Seq(30L, 77L, 3600L))
    // the real events table at q69's exact parameters
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    def cq(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    val plainQ = cq(Heuristics.sequenceAbuse(ev, col("ts"),
      col("event_id"), col("user_id"), col("event_type") === "click",
      col("event_type") === "error", deltaMs = 3600000L))
    val shardedQ = cq(Heuristics.sequenceAbuseSharded(ev, col("ts"),
      col("event_id"), col("user_id"), col("event_type") === "click",
      col("event_type") === "error", deltaMs = 3600000L))
    assert(shardedQ == plainQ && plainQ.nonEmpty)
    // card-driven auto: the balanced real table keeps the analytic
    // path (no slice column), a 50%-hot fixture flips to sharded —
    // rows identical to the analytic form either way
    val autoQ = Heuristics.sequenceAbuseAuto(ev, col("ts"),
      col("event_id"), col("user_id"), col("event_type") === "click",
      col("event_type") === "error", deltaMs = 3600000L)
    assert(!autoQ.queryExecution.executedPlan.toString.contains("__slice"))
    assert(cq(autoQ) == plainQ)
    val hotSeq = ((1 to 1000).map(i =>
      ("hot", ts(i.toLong), i.toLong, if (i % 2 == 0) "f" else "s")) ++
      (1 to 100).flatMap(k => (0 to 9).map(i =>
        (s"k$k", ts(i * 40L), (10000 + k * 10 + i).toLong,
          if (i % 2 == 0) "f" else "s"))))
      .toDF("k", "t", "sq", "e")
    val autoHotSeq = Heuristics.sequenceAbuseAuto(hotSeq, col("t"),
      col("sq"), col("k"), col("e") === "f", col("e") === "s",
      deltaMs = 120000L)
    assert(autoHotSeq.queryExecution.executedPlan.toString
      .contains("__slice"), "hot sequence input kept the analytic path")
    def cqs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(cqs(autoHotSeq) == cqs(Heuristics.sequenceAbuse(hotSeq,
      col("t"), col("sq"), col("k"), col("e") === "f",
      col("e") === "s", deltaMs = 120000L)))
  }

  test("privateRelayForwardSharded equals privateRelayForward: " +
      "boundary fixture plus a seeded random sweep and the real " +
      "events table") {
    import spark.implicits._
    import graft.operators.CustomsDetectors
    import graft.operators.CustomsDetectors.{EmailRelay, FxaRpEvent}
    def c(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3))).sorted.toSeq
    def run(df: org.apache.spark.sql.DataFrame,
        slices: Seq[Long]): Unit = {
      val plain = c(CustomsDetectors.privateRelayForward(df, col("t"),
        col("sq"), col("u"), col("e"), col("addr")))
      for (sl <- slices) {
        val sharded = c(CustomsDetectors.privateRelayForwardSharded(df,
          col("t"), col("sq"), col("u"), col("e"), col("addr"),
          sliceSeconds = sl))
        assert(sharded == plain,
          s"slice=$sl diverged:\n$sharded\nvs\n$plain")
      }
    }
    // hand fixture: a mismatching forward whose predecessor sits in
    // the previous ACTIVE slice (with an empty slice between), a
    // slice-first row whose predecessor matches (no alert), a
    // same-timestamp tie ordered by seq, and a leading forward with
    // no predecessor
    val fix = Seq(
      (1L, 10L, 1L, FxaRpEvent, "h1"),
      (1L, 250L, 2L, EmailRelay, "h2"),  // expected h1 from slice 0: alert
      (2L, 10L, 3L, EmailRelay, "h1"),   // no predecessor: drops
      (2L, 105L, 4L, EmailRelay, "h1"),  // slice-first, matches: quiet
      (3L, 42L, 5L, FxaRpEvent, "h1"),
      (3L, 42L, 6L, EmailRelay, "h3"))   // tie broken by seq: alert
      .map { case (u, s, q, e, a) => (u, ts(s), q, e, a) }
      .toDF("u", "t", "sq", "e", "addr")
    run(fix, slices = Seq(100L, 60L, 7L))
    // null-ts rows: the analytic window sorts them FIRST within the
    // uid (nulls-first) and chains them by seq — the mend join must
    // KEEP them (null-safe <=> on __slice; a plain === dropped the
    // alerting row below, r16 advisory). The null-tolerant collector
    // maps a null ts_ms to -1 on both paths.
    val nullFix = Seq(
      (4L, None, 7L, FxaRpEvent, "h1"),
      (4L, None, 8L, EmailRelay, "h9"),      // expected h1: ALERTS (null ts)
      (4L, Some(20L), 9L, EmailRelay, "h9")) // pred = null-chain last: quiet
      .map { case (u, s, q, e, a) => (u, s.map(ts).orNull, q, e, a) }
      .toDF("u", "t", "sq", "e", "addr")
    def cN(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]).getOrElse(-1L),
        r.getString(2), r.getString(3))).sorted.toSeq
    val plainN = cN(CustomsDetectors.privateRelayForward(nullFix,
      col("t"), col("sq"), col("u"), col("e"), col("addr")))
    assert(plainN == Seq((4L, -1L, "h9", "h1")))
    for (sl <- Seq(100L, 7L)) {
      val shardedN = cN(CustomsDetectors.privateRelayForwardSharded(
        nullFix, col("t"), col("sq"), col("u"), col("e"), col("addr"),
        sliceSeconds = sl))
      assert(shardedN == plainN, s"slice=$sl null-ts diverged:" +
        s"\n$shardedN\nvs\n$plainN")
    }
    // seeded random sweep
    val rnd = new scala.util.Random(2626)
    val dense = (1 to 3000).map { i =>
      (rnd.nextInt(5).toLong, ts(rnd.nextInt(5000).toLong), i.toLong,
        if (rnd.nextBoolean()) EmailRelay else FxaRpEvent,
        s"h${rnd.nextInt(3)}")
    }.toDF("u", "t", "sq", "e", "addr")
    run(dense, slices = Seq(30L, 77L, 3600L))
    // the real events table at q46's exact derivation
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type").isin("signup", "view", "click"))
      .withColumn("etype", when(col("event_type") === "signup",
        FxaRpEvent).otherwise(EmailRelay))
      .withColumn("real_address", concat(lit("h"), col("event_id") % 3))
    val plainQ = c(CustomsDetectors.privateRelayForward(ev, col("ts"),
      col("event_id"), col("user_id"), col("etype"),
      col("real_address")))
    val shardedQ = c(CustomsDetectors.privateRelayForwardSharded(ev,
      col("ts"), col("event_id"), col("user_id"), col("etype"),
      col("real_address")))
    assert(shardedQ == plainQ && plainQ.nonEmpty)
    // card-driven auto: the balanced real table keeps the analytic
    // path; a 50%-hot uid flips to sharded — rows identical either way
    val autoQ = CustomsDetectors.privateRelayForwardAuto(ev, col("ts"),
      col("event_id"), col("user_id"), col("etype"),
      col("real_address"))
    assert(!autoQ.queryExecution.executedPlan.toString.contains("__slice"))
    assert(c(autoQ) == plainQ)
    val hotRelay = ((1 to 1000).map(i =>
      (0L, ts(i.toLong), i.toLong,
        if (i % 2 == 0) EmailRelay else FxaRpEvent, s"h${i % 3}")) ++
      (1 to 100).flatMap(k => (0 to 9).map(i =>
        (k.toLong, ts(i * 40L), (10000 + k * 10 + i).toLong,
          if (i % 2 == 0) EmailRelay else FxaRpEvent, s"h${i % 2}"))))
      .toDF("u", "t", "sq", "e", "addr")
    val autoHot = CustomsDetectors.privateRelayForwardAuto(hotRelay,
      col("t"), col("sq"), col("u"), col("e"), col("addr"))
    assert(autoHot.queryExecution.executedPlan.toString
      .contains("__slice"), "hot relay input kept the analytic path")
    assert(c(autoHot) == c(CustomsDetectors.privateRelayForward(
      hotRelay, col("t"), col("sq"), col("u"), col("e"), col("addr"))))
  }

  test("the heavy sort shards by (key, slice) and a narrow slice is " +
      "rejected") {
    import spark.implicits._
    val df = Seq(("a", ts(1L))).toDF("k", "t")
    val plan = Sessionize.assignSessionsSharded(
        df, col("t"), col("k"), 100L)
      .queryExecution.executedPlan.toString
    // the event-level exchange must carry the slice column — that IS
    // the parallelism claim (hot key spread over its time axis)
    assert(plan.contains("__sess_slice"),
      s"slice column absent from the physical plan:\n$plan")
    assert(intercept[IllegalArgumentException] {
      Sessionize.assignSessionsSharded(df, col("t"), col("k"),
        gapSeconds = 100L, sliceSeconds = 50L)
    }.getMessage.contains("NON-adjacent"))
    // gap 0 with the slice DEFAULTING from it resolves to a
    // zero-width slice (a zero DIV divisor) — refused loudly,
    // pointing at the escape hatches
    assert(intercept[IllegalArgumentException] {
      Sessionize.assignSessionsSharded(df, col("t"), col("k"),
        gapSeconds = 0L)
    }.getMessage.contains("analytic"))
    // ... but gap 0 with an EXPLICIT slice has a non-zero divisor
    // and is legal (r16 advisory: the guard is on the resolved
    // slice, not gapSeconds) — every event becomes its own session,
    // identical to the analytic form
    val multi = Seq(("a", ts(1L)), ("a", ts(1L)), ("a", ts(5L)),
      ("b", ts(2L))).toDF("k", "t")
    val g0 = Sessionize.assignSessionsSharded(multi, col("t"),
      col("k"), gapSeconds = 0L, sliceSeconds = 10L)
    val g0Plain = Sessionize.assignSessions(multi, col("t"), col("k"),
      gapSeconds = 0L)
    assert(canon(g0) == canon(g0Plain) && canon(g0).size == 4)
    // card-driven AUTO path: a balanced input resolves to the
    // analytic plan (no slice column), a 50%-hot input to the
    // sharded plan (slice column present) — and the rows are
    // identical either way (the whole point of the chooser)
    val balanced = (1 to 300).flatMap(k =>
      (0 to 9).map(i => (s"k$k", ts(i * 1000L)))).toDF("k", "t")
    val hotIn = ((1 to 1000).map(i => ("hot", ts(i * 7L))) ++
      (1 to 100).flatMap(k => (0 to 9).map(i =>
        (s"k$k", ts(i * 1000L))))).toDF("k", "t")
    val autoBal = Sessionize.sessionSummaryAuto(balanced, col("t"),
      col("k"), gapSeconds = 100L)
    assert(!autoBal.queryExecution.executedPlan.toString
      .contains("__sess_slice"), "balanced input took the sharded path")
    val autoHot = Sessionize.sessionSummaryAuto(hotIn, col("t"),
      col("k"), gapSeconds = 100L)
    assert(autoHot.queryExecution.executedPlan.toString
      .contains("__sess_slice"), "50%-hot input kept the analytic path")
    def srows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(_.toSeq).toSet
    assert(srows(autoHot) == srows(Sessionize.sessionSummary(hotIn,
      col("t"), col("k"), gapSeconds = 100L)))
    assert(srows(autoBal) == srows(Sessionize.sessionSummary(balanced,
      col("t"), col("k"), gapSeconds = 100L)))
    // empty input short-circuits to the analytic form
    assert(Sessionize.sessionSummaryAuto(
      Seq.empty[(String, java.sql.Timestamp)].toDF("k", "t"),
      col("t"), col("k"), gapSeconds = 100L).collect().isEmpty)

    // scratch-name collisions refuse rather than silently destroy
    // caller data (the saltedJoin/_salt contract)
    assert(intercept[IllegalArgumentException] {
      Sessionize.assignSessionsSharded(
        df.withColumn("__sess_slice", lit(1)), col("t"), col("k"), 100L)
    }.getMessage.contains("scratch"))
    // the relay and sequence twins make the same parallelism claim:
    // their heavy window sorts partition by (key, __slice), so the
    // slice column must reach the physical plan
    import graft.operators.{CustomsDetectors, Heuristics}
    val ev = Seq((1L, ts(1L), 1L,
        CustomsDetectors.EmailRelay, "h1"))
      .toDF("u", "t", "sq", "e", "addr")
    val relayPlan = CustomsDetectors.privateRelayForwardSharded(ev,
        col("t"), col("sq"), col("u"), col("e"), col("addr"))
      .queryExecution.executedPlan.toString
    assert(relayPlan.contains("__slice"),
      s"relay twin: slice column absent:\n$relayPlan")
    val seqPlan = Heuristics.sequenceAbuseSharded(ev, col("t"),
        col("sq"), col("u"), col("e") === CustomsDetectors.EmailRelay,
        col("e") === CustomsDetectors.FxaRpEvent, deltaMs = 1000L)
      .queryExecution.executedPlan.toString
    assert(seqPlan.contains("__slice"),
      s"sequence twin: slice column absent:\n$seqPlan")
  }
}
