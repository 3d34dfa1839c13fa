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
}
