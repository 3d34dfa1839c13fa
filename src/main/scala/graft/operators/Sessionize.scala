package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (ref s/httprequest/HTTPRequest.java:151-163 —
  * 45-min-gap session windows per source address; s/amo/AddonMultiIpLogin
  * .java:146-155 — 15-min gap).
  *
  * Two forms:
  *  - batch: analytic-function sessionization (lag → gap flag → running
  *    sum) — one shuffle on the key, sort within partitions, no state.
  *  - streaming: `session_window` grouping (see graft.streaming) with
  *    watermarks, for unbounded inputs.
  *
  * Scale notes: the batch form is a single `PARTITION BY key ORDER BY ts`
  * window spec reused by all three analytic columns, so Spark plans ONE
  * exchange + ONE sort. Skewed keys are the usual caveat; at 100 TB the
  * per-key timeline fits executor memory because sessions are bounded by
  * the key's own traffic (same assumption the reference makes).
  */
object Sessionize {

  /** Assign a session id to every row: session boundaries open where the
    * gap to the key's previous event reaches `gapSeconds`. Output keeps
    * all input columns plus `session_id` (1-based per key).
    *
    * Boundary semantics match session WINDOWS (the reference's Beam
    * `Sessions.withGapDuration` and Spark's own `session_window`): an
    * event's window is [ts, ts+gap) and windows merge only when they
    * OVERLAP, so an event arriving exactly `gapSeconds` after the
    * previous one starts a NEW session (>=, not >). */
  def assignSessions(df: DataFrame, ts: Column, key: Column,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts)
    df.withColumn("prev_ts", lag(ts, 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(ts) - unix_micros(col("prev_ts")) >= gapSeconds * 1000000L,
          lit(1)).otherwise(lit(0)))
      .withColumn("session_id",
        sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_ts", "new_session")
  }

  /** Per-(key, session) summary: event count, start/end epoch millis. */
  def sessionSummary(df: DataFrame, ts: Column, key: Column,
      gapSeconds: Long): DataFrame =
    assignSessions(df, ts, key, gapSeconds)
      .groupBy(key.as("key"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        unix_millis(min(ts)).as("session_start_ms"),
        unix_millis(max(ts)).as("session_end_ms"))

  /** Per-key session stats (ref SessionLimitAnalysis: alert when one key
    * opens too many sessions / too-large sessions). */
  def sessionLimit(df: DataFrame, ts: Column, key: Column, gapSeconds: Long,
      maxSessionEvents: Long): DataFrame =
    sessionSummary(df, ts, key, gapSeconds)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"),
        sum(col("n_events")).as("total_events"))
      .filter(col("max_session_events") >= maxSessionEvents)

  /** Sharded sessionization — the skew-resilient scale path of
    * [[assignSessions]], result-identical by construction
    * (equivalence spec-pinned; q169 shares q42's oracle as a
    * path-equality twin).
    *
    * Why: [[assignSessions]]'s single `PARTITION BY key` sort puts a
    * hot key's ENTIRE timeline in one task — the skew probe measured
    * the session family at 2.4–2.9x under a 50-percent hot key
    * (SCALING.md round-15), the straggler this variant removes. The
    * fix is the classic slice-and-mend: sessionize within
    * `(key, time-slice)` shards (parallelism = keys x active slices,
    * so the hot key spreads over its time axis), then repair the
    * sessions that cross slice boundaries on a per-(key, slice)
    * SUMMARY frame — one row per active slice, bounded by
    * horizon/slice regardless of corpus size.
    *
    * Exactness argument (the invariant the spec sweeps): with
    * `slice >= gap`, events in non-adjacent active slices are at
    * least one full slice apart, so only a slice's FIRST event and
    * its predecessor slice's LAST event can ever be within `gap` —
    * the unsharded order's lag at that position is exactly that pair,
    * so the within-slice `>=`-gap flags plus the one boundary check
    * reproduce every boundary decision [[assignSessions]] makes, and
    * the mend's running renumber (`base - merge + local_id`)
    * reproduces its running-sum ids. Merge chains longer than one
    * slice (a session spanning many slices) telescope through the
    * running sum.
    *
    * Constraint: timestamps at or after the epoch (the slice index
    * uses integer `DIV`, which truncates rather than floors on
    * negatives). `sliceSeconds` 0 (the default) means `gapSeconds` —
    * the smallest legal slice, i.e. the most parallelism. */
  def assignSessionsSharded(df: DataFrame, ts: Column, key: Column,
      gapSeconds: Long, sliceSeconds: Long = 0L): DataFrame = {
    val slice = if (sliceSeconds == 0L) gapSeconds else sliceSeconds
    // the RESOLVED slice is the DIV divisor: a 0 slice would null
    // the slice index under non-ANSI (silently collapsing the
    // sharding to one shard per key) or crash under ANSI — refuse
    // loudly instead (the function's other guards' contract). The
    // guard is on the resolved value, not gapSeconds: gap 0 (every
    // event its own session — the >=-gap rule fires on every row and
    // the mend merges nothing) is legal here too when the caller
    // supplies an explicit sliceSeconds >= 1; only gap 0 with the
    // slice DEFAULTING from it is a zero-width slice.
    require(slice >= 1L,
      s"resolved sliceSeconds=$slice must be >= 1: a zero-width " +
        "slice cannot shard (with gap 0, pass an explicit " +
        "sliceSeconds, or use the analytic assignSessions)")
    require(slice >= gapSeconds,
      s"sliceSeconds=$slice must be >= gapSeconds=$gapSeconds: with a " +
        "narrower slice, sessions could merge across NON-adjacent " +
        "slices and the one-boundary mend would miss them")
    // withColumn would silently REPLACE (and the final drop erase) a
    // caller's column named like our scratch space — refuse, never
    // corrupt (the saltedJoin/_salt contract)
    val scratch = Seq("__sess_us", "__sess_slice", "__sess_prev",
      "__sess_new", "__sess_lsid", "__sk", "__ss", "__off")
    val clash = df.columns.toSet.intersect(scratch.toSet)
    require(clash.isEmpty,
      s"input already carries scratch column(s) ${clash.mkString(", ")}")
    val gapUs = gapSeconds * 1000000L
    val sliceUs = slice * 1000000L
    val wLocal = Window.partitionBy(key, col("__sess_slice")).orderBy(ts)
    val local = df
      .withColumn("__sess_us", unix_micros(ts))
      .withColumn("__sess_slice", expr(s"__sess_us DIV $sliceUs"))
      .withColumn("__sess_prev", lag(col("__sess_us"), 1).over(wLocal))
      .withColumn("__sess_new",
        when(col("__sess_prev").isNull ||
          col("__sess_us") - col("__sess_prev") >= gapUs,
          lit(1)).otherwise(lit(0)))
      .withColumn("__sess_lsid", sum(col("__sess_new")).over(
        wLocal.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__sess_prev", "__sess_new")
    // the mend frame: ONE row per (key, active slice) — its window
    // sort is over horizon/slice rows per key, never corpus rows
    val slices = local
      .groupBy(key.as("__sk"), col("__sess_slice").as("__ss"))
      .agg(min(col("__sess_us")).as("__first"),
        max(col("__sess_us")).as("__last"),
        max(col("__sess_lsid")).as("__m"))
    val wk = Window.partitionBy(col("__sk")).orderBy(col("__ss"))
    val offsets = slices
      .withColumn("__prev_last", lag(col("__last"), 1).over(wk))
      .withColumn("__merge",
        when(col("__prev_last").isNotNull &&
          col("__first") - col("__prev_last") < gapUs,
          lit(1L)).otherwise(lit(0L)))
      .withColumn("__base", coalesce(
        sum(col("__m") - col("__merge")).over(
          wk.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__sk"), col("__ss"),
        (col("__base") - col("__merge")).as("__off"))
    // null-safe equality: the analytic form's PARTITION BY keeps a
    // null key as its own group, so the mend join must too (`===`
    // would silently DROP null-key rows)
    local.join(offsets,
        (key <=> col("__sk")) && (col("__sess_slice") <=> col("__ss")))
      .withColumn("session_id", col("__off") + col("__sess_lsid"))
      .drop("__sess_us", "__sess_slice", "__sess_lsid",
        "__sk", "__ss", "__off")
  }

  /** [[sessionSummary]] on the sharded path — identical rows, no
    * single-task sort of a hot key's timeline. */
  def sessionSummarySharded(df: DataFrame, ts: Column, key: Column,
      gapSeconds: Long, sliceSeconds: Long = 0L): DataFrame =
    assignSessionsSharded(df, ts, key, gapSeconds, sliceSeconds)
      .groupBy(key.as("key"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        unix_millis(min(ts)).as("session_start_ms"),
        unix_millis(max(ts)).as("session_end_ms"))

  /** [[sessionLimit]] on the sharded path — identical rows; the skew
    * probe measured the analytic form as the family's WORST straggler
    * (2.9x at the 50-percent hot key), because its per-key sort feeds
    * a per-key rollup that cannot start until the hot sort finishes. */
  def sessionLimitSharded(df: DataFrame, ts: Column, key: Column,
      gapSeconds: Long, maxSessionEvents: Long,
      sliceSeconds: Long = 0L): DataFrame =
    sessionSummarySharded(df, ts, key, gapSeconds, sliceSeconds)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"),
        sum(col("n_events")).as("total_events"))
      .filter(col("max_session_events") >= maxSessionEvents)

  /** Multi-address login detection (ref s/amo/AddonMultiIpLogin.java:
    * 146-250 — 15-min-gap sessions per account; alert when one
    * session's logins span too many distinct addresses/countries,
    * after plus-normalizing the account email). Session assignment +
    * one distinct-aggregate per (key, session). */
  def multiAddressSessions(df: DataFrame, ts: Column, key: Column,
      addr: Column, country: Column, gapSeconds: Long,
      minAddrs: Long, minCountries: Long): DataFrame =
    assignSessions(df.select(ts.as("__ts"), key.as("__k"),
        addr.as("__a"), country.as("__c")),
        col("__ts"), col("__k"), gapSeconds)
      .groupBy(col("__k").as("key"), col("session_id"))
      .agg(countDistinct(col("__a")).as("n_addrs"),
        countDistinct(col("__c")).as("n_countries"),
        count(lit(1)).as("n_logins"),
        unix_millis(min(col("__ts"))).as("session_start_ms"))
      .filter(col("n_addrs") >= minAddrs ||
        col("n_countries") >= minCountries)

  /** CARD-DRIVEN sessionization — the operator that runs its own
    * skew diagnostic and picks its path: one [[graft.operators.Skew
    * .keySkewCard]] pass over the keys (a single partial-agg shuffle
    * of \|keys\| rows — cheap next to either session sort), then
    * [[graft.operators.Skew.choosePath]] maps the card to the
    * analytic or the slice-and-mend form per the measured crossovers
    * (SCALING.md r15–r17). Both paths are result-identical (the
    * path-equality twins q169 ≡ q42), so the card changes COST,
    * never answers — this is the deployment rule from the decision
    * table, executable.
    *
    * The card keys on `xxhash64(key)` so string keys (the
    * reference's source addresses) diagnose without the manual
    * pre-hash the raw card requires; the hash only relabels keys, so
    * share/fold — all the chooser reads — are unchanged (nulls
    * collapse onto the seed hash: one key, exactly how the analytic
    * window groups them). An empty input short-circuits to the
    * analytic form (no card row to read). */
  def sessionSummaryAuto(df: DataFrame, ts: Column, key: Column,
      gapSeconds: Long): DataFrame = {
    val card = Skew.keySkewCard(df.select(xxhash64(key).as("__k")),
      col("__k"))
    val path =
      if (card.isEmpty) Skew.SerialPath.Analytic
      else Skew.choosePath(card, Skew.SerialOp.Sessions)
    path match {
      case Skew.SerialPath.Sharded =>
        sessionSummarySharded(df, ts, key, gapSeconds)
      case _ => sessionSummary(df, ts, key, gapSeconds)
    }
  }
}
