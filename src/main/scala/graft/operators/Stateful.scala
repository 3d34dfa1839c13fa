package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stateful / order-dependent detection operators (SURVEY.md §2.6).
  *
  * References:
  *  - AlertSuppressor: s/alert/AlertSuppressor.java:53-143 — first
  *    alert per key emits and arms a timer; later alerts are dropped
  *    until the expiry elapses, then the next one re-emits.
  *  - Geo-velocity: s/authstate/AuthStateModel.java:241-430 — compare
  *    consecutive login locations per identity; impossible travel speed
  *    ⇒ alert.
  *
  * Scale design: `suppress` is implemented with the secondary-sort
  * pattern — `repartition(key)` + `sortWithinPartitions(key, ts)` +
  * a streaming per-partition scan — NOT `groupByKey.flatMapGroups`,
  * because the scan is O(1) memory per key (flatMapGroups would
  * materialize each group; a hot key at 100 TB would OOM an executor).
  * One shuffle, one sort, no state map. Geo-velocity is a lag window
  * over the same single exchange+sort.
  */
object Stateful {

  /** Greedy suppression: per key, emit the first event, then suppress
    * every event while the gap since the last emitted one stays at or
    * under `expirySeconds`; a strictly-larger gap re-emits and
    * re-arms (the reference's `isExpired` is strict `>`,
    * AlertSuppressor.java:71-77 — an event at EXACTLY the expiry
    * instant is still suppressed).
    * Returns (key: string, ts_us: long) of emitted events. */
  def suppress(df: DataFrame, ts: Column, key: Column,
      expirySeconds: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val expiryUs = expirySeconds * 1000000L
    val prepared = df
      .select(key.cast("string").as("key"), unix_micros(ts).as("ts_us"))
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("ts_us"))
      .as[(String, Long)]
    prepared.mapPartitions { it =>
      var curKey: String = null
      var lastEmit = Long.MinValue
      it.flatMap { case (k, t) =>
        if (k != curKey) { curKey = k; lastEmit = t; Some((k, t)) }
        else if (lastEmit != Long.MinValue && t - lastEmit > expiryUs) {
          lastEmit = t; Some((k, t))
        } else None
      }
    }.toDF("key", "ts_us")
  }

  /** Count-aware suppression (ref s/alert/AlertSuppressorCount.java:
    * 27-35 with the base state flow of AlertSuppressor.java:96-143) —
    * the batch twin of [[graft.streaming.Streaming.suppressCount]]:
    * like [[suppress]], but each event carries a count, and an event
    * whose count DIFFERS from the last-emitted count re-emits even
    * INSIDE the suppression window (`!ss.count.equals(newss.count)` —
    * the alert changed, so it is news again; decreases re-emit too).
    * State `(ts, count)` is overwritten on EVERY emission, including
    * expiry-triggered ones (`counter.write(newss)` on both emit
    * paths, AlertSuppressor.java:121,140); a suppressed event leaves
    * state untouched. Same secondary-sort scan: one shuffle, one
    * sort, O(1) memory per key.
    * Returns (key: string, ts_us, count) of emitted events. */
  def suppressCount(df: DataFrame, ts: Column, key: Column,
      count: Column, expirySeconds: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val expiryUs = expirySeconds * 1000000L
    // count joins the sort key as a tiebreak: two events sharing a
    // (key, ts) must replay in ONE order or the emission set itself
    // becomes run-dependent (ascending: the smaller count is
    // considered first; under emit-on-change an equal-ts event whose
    // count differs from the stored one still re-emits)
    val prepared = df
      .select(key.cast("string").as("key"), unix_micros(ts).as("ts_us"),
        count.cast("long").as("count"))
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("ts_us"), col("count"))
      .as[(String, Long, Long)]
    prepared.mapPartitions { it =>
      var curKey: String = null
      var lastEmit = Long.MinValue
      var lastCount = Long.MinValue
      it.flatMap { case (k, t, c) =>
        if (k != curKey || t - lastEmit > expiryUs || c != lastCount) {
          curKey = k; lastEmit = t; lastCount = c; Some((k, t, c))
        } else None
      }
    }.toDF("key", "ts_us", "count")
  }

  /** Session-gap suppression (ref s/alert/AlertSuppressorSession.java:
    * 69-113): per key, emit the first event, then suppress while the
    * gap since the last SEEN event (emitted or suppressed — the
    * reference rewrites state on every element) stays at or under
    * `gapSeconds`; a strictly-larger gap re-emits. Differs from
    * [[suppress]] in that suppressed events EXTEND the quiet period —
    * a steady drip never re-alerts here, while the fixed-expiry form
    * re-emits every `expirySeconds`. Same secondary-sort scan: one
    * shuffle, one sort, O(1) memory per key. */
  def suppressSession(df: DataFrame, ts: Column, key: Column,
      gapSeconds: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L
    val prepared = df
      .select(key.cast("string").as("key"), unix_micros(ts).as("ts_us"))
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("ts_us"))
      .as[(String, Long)]
    prepared.mapPartitions { it =>
      var curKey: String = null
      var lastSeen = Long.MinValue
      it.flatMap { case (k, t) =>
        // strict > like the reference's isExpired
        val emit = (k != curKey) || (t - lastSeen > gapUs)
        curKey = k
        lastSeen = t
        if (emit) Some((k, t)) else None
      }
    }.toDF("key", "ts_us")
  }

  /** [[suppressCount]] as a composed pipeline gate (the reference
    * applies AlertSuppressorCount to WHOLE alerts — ParDo over
    * KV<key, Alert>; the state scan only needs the (key, ts, count)
    * triple, so the alert body rides a join back on that triple
    * instead of through the scan). Returns the surviving full input
    * rows. Rows must be unique per (key, ts) — true of every
    * per-window / per-session alert family the reference feeds this
    * stage (a key's windows/sessions are time-disjoint).
    *
    * Scale: the scan shuffles only the 3-column triple; the join-back
    * runs on already-aggregated alert rows (tiny next to raw events),
    * and AQE will broadcast the emitted side when it is small. */
  def suppressCountGate(df: DataFrame, ts: Column, key: Column,
      count: Column, expirySeconds: Long): DataFrame = {
    val in = df
      .withColumn("__sc_key", key.cast("string"))
      .withColumn("__sc_ts_us", unix_micros(ts))
      .withColumn("__sc_n", count.cast("long"))
    val emitted = suppressCount(in, timestamp_micros(col("__sc_ts_us")),
        col("__sc_key"), col("__sc_n"), expirySeconds)
      .select(col("key").as("__sc_key"), col("ts_us").as("__sc_ts_us"),
        col("count").as("__sc_n"))
    in.join(emitted, Seq("__sc_key", "__sc_ts_us", "__sc_n"))
      .drop("__sc_key", "__sc_ts_us", "__sc_n")
  }

  /** [[suppressSession]] as a composed pipeline gate — the
    * AlertSuppressorSession analog of [[suppressCountGate]] (ref
    * AuthProfile.java:1035,1053: ParDo of the session suppressor over
    * KV<suppression key, Alert>). Returns surviving full rows; rows
    * must be unique per (key, ts). */
  def suppressSessionGate(df: DataFrame, ts: Column, key: Column,
      gapSeconds: Long): DataFrame = {
    val in = df
      .withColumn("__ss_key", key.cast("string"))
      .withColumn("__ss_ts_us", unix_micros(ts))
    val emitted = suppressSession(in, timestamp_micros(col("__ss_ts_us")),
        col("__ss_key"), gapSeconds)
      .select(col("key").as("__ss_key"), col("ts_us").as("__ss_ts_us"))
    in.join(emitted, Seq("__ss_key", "__ss_ts_us"))
      .drop("__ss_key", "__ss_ts_us")
  }

  /** Geo-velocity (impossible travel): per key, compare each event's
    * location with the previous one; emit events whose implied speed
    * exceeds `maxKmh`. Speed is rounded to integer km/h. Single window
    * spec → one exchange + one sort. */
  def geoVelocity(df: DataFrame, ts: Column, key: Column,
      lat: Column, lon: Column, maxKmh: Double): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("ts"))
    df.select(key.as("key"), ts.as("ts"), lat.as("lat"), lon.as("lon"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("prev_lat", lag(col("lat"), 1).over(w))
      .withColumn("prev_lon", lag(col("lon"), 1).over(w))
      .filter(col("prev_ts").isNotNull &&
        unix_micros(col("ts")) > unix_micros(col("prev_ts")))
      .withColumn("km", graft.functions.Functions.haversineKm(
        col("prev_lat"), col("prev_lon"), col("lat"), col("lon")))
      .withColumn("hours",
        (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) / lit(3600.0e6))
      .withColumn("speed_kmh", floor(col("km") / col("hours") + 0.5).cast("long"))
      .filter(col("speed_kmh") > maxKmh)
      .select(col("key"), unix_millis(col("ts")).as("ts_ms"), col("speed_kmh"))
  }
}
