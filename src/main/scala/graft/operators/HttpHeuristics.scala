package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The named HTTPRequest heuristics the reference configures per
  * deployment (SURVEY.md §2.3):
  *
  *  - EndpointAbuseAnalysis (ref s/httprequest/heuristics/
  *    EndpointAbuseAnalysis.java:136-299): per client per window,
  *    count requests to each monitored (method, path); ANY request
  *    off the monitored list sets a variance flag (in
  *    variance-supporting-only mode, only supporting-object requests
  *    — css/js/images — or configured substrings count as variance);
  *    no-variance clients whose busiest monitored endpoint meets its
  *    threshold alert on that endpoint.
  *  - PerEndpointErrorRateAnalysis (ref PerEndpointErrorRateAnalysis
  *    .java:90-230): per client per window, count error responses
  *    matching each configured (method, path-regex, threshold) rule;
  *    alert on the rule with the highest qualifying count.
  *  - UserAgentBlocklistAnalysis (ref UserAgentBlocklistAnalysis
  *    .java:90-180): clients presenting a blocklisted user agent
  *    (full-match against the configured pattern list), NAT-suppressed
  *    via the detect-nat view.
  *
  * All three are single hash-aggregates per (window, client) over
  * codegen'd conditional counts — the per-group loops of the
  * reference collapse into `count(when...)` columns because the
  * endpoint lists are static configuration. Ties across endpoints
  * keep the lowest-index rule, exactly like the reference's
  * strictly-greater max scan.
  */
object HttpHeuristics {

  /** One monitored endpoint (ref EndpointAbuseAnalysis endpoint
    * config `threshold:method:path`). */
  case class Endpoint(method: String, path: String, threshold: Long)

  /** One error-rate rule; `path` is a regex
    * (ref PerEndpointErrorRateAnalysis `threshold:method:path`). */
  case class ErrorRule(method: String, path: String, threshold: Long)

  /** Supporting-object check (ref EndpointAbuseAnalysis.java:280-291). */
  def isSupporting(path: Column): Column =
    Seq(".css", ".js", ".gif", ".jpg", ".ico", ".svg", ".png")
      .map(path.endsWith(_)).reduce(_ || _)

  private def windowStartMs(ts: Column, window: String): Column =
    unix_millis(org.apache.spark.sql.functions.window(ts, window)
      .getField("start"))

  /** EndpointAbuseAnalysis. Output: (window_start_ms, addr,
    * endpoint_method, endpoint_path, n, latest_ts_ms, useragent).
    * The alert user agent is the latest monitored request's agent
    * (deterministic refinement of the reference's iteration-order
    * pick, EndpointAbuseAnalysis.java:182-186).
    *
    * `customVarianceSubstrings` match against the FULL request URL —
    * including the query string, e.g. the reference's own "init?"
    * test value — per the reference's keyed tuple (HTTPRequest.java:
    * 141-147 index 4 = url; EndpointAbuseAnalysis.java:164). Pass
    * `url` when using them; it falls back to `path` (which cannot
    * carry a query string) otherwise. */
  def endpointAbuse(df: DataFrame, ts: Column, addr: Column,
      method: Column, path: Column, userAgent: Column, window: String,
      endpoints: Seq[Endpoint], varianceSupportingOnly: Boolean = false,
      customVarianceSubstrings: Seq[String] = Nil,
      url: Option[Column] = None): DataFrame = {
    val monIdx = endpoints.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (e, i)) =>
        when(method === e.method && path === e.path, i).otherwise(acc)
    }
    val urlCol = url.getOrElse(path)
    val customVariance = customVarianceSubstrings
      .map(s => urlCol.contains(s)).reduceOption(_ || _).getOrElse(lit(false))
    val extendedVarianceEvent =
      monIdx.isNull && (isSupporting(path) || customVariance)
    val varianceEvent = if (varianceSupportingOnly) extendedVarianceEvent
      else monIdx.isNull
    val counts = endpoints.indices.map(i =>
      count(when(monIdx === i, 1)).as(s"n_$i"))
    val aggs = counts ++ Seq(
      count(when(varianceEvent, 1)).as("n_variance"),
      max(when(monIdx.isNotNull, unix_millis(ts))).as("latest_ts_ms"),
      max_by(when(monIdx.isNotNull, userAgent),
        when(monIdx.isNotNull, unix_millis(ts))).as("useragent"))
    val grouped = df
      .groupBy(windowStartMs(ts, window).as("window_start_ms"),
        addr.as("addr"))
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("n_variance") === 0)
    // argmax over the static endpoint columns: greatest() of the
    // qualifying counts, then the FIRST index attaining it — lowest
    // index wins ties, the reference's strictly-greater scan
    val qual = endpoints.indices.map(i =>
      when(col(s"n_$i") >= endpoints(i).threshold, col(s"n_$i"))
        .otherwise(lit(null).cast("long")))
    val maxQual = if (qual.length == 1) qual.head else greatest(qual: _*)
    val bestIdx = endpoints.indices.foldLeft(lit(null).cast("int")) {
      (acc, i) =>
        when(acc.isNull && qual(i) === maxQual, i).otherwise(acc)
    }
    grouped
      .withColumn("best", bestIdx)
      .filter(col("best").isNotNull)
      .withColumn("endpoint_method",
        endpoints.indices.foldLeft(lit(null).cast("string")) { (acc, i) =>
          when(col("best") === i, endpoints(i).method).otherwise(acc) })
      .withColumn("endpoint_path",
        endpoints.indices.foldLeft(lit(null).cast("string")) { (acc, i) =>
          when(col("best") === i, endpoints(i).path).otherwise(acc) })
      .withColumn("n",
        endpoints.indices.foldLeft(lit(null).cast("long")) { (acc, i) =>
          when(col("best") === i, col(s"n_$i")).otherwise(acc) })
      .select(col("window_start_ms"), col("addr"), col("endpoint_method"),
        col("endpoint_path"), col("n"), col("latest_ts_ms"),
        col("useragent"))
  }

  /** EndpointAbuseAnalysis over the reference's actual windowing —
    * per-client session windows (ref HTTPRequest.java:312-325 feeds
    * EndpointAbuseAnalysis through KeyAndWindowForSessionsFireEarly
    * with sessionGapDurationMinutes). Same monitored-count + variance
    * + argmax semantics as [[endpointAbuse]], grouped by (addr,
    * session) instead of fixed windows; `window_max_ts_ms` is Beam's
    * session `w.maxTimestamp()` (last session event + gap − 1 ms),
    * which the reference stamps on the alert. */
  def endpointAbuseSessions(df: DataFrame, ts: Column, addr: Column,
      method: Column, path: Column, userAgent: Column,
      gapSeconds: Long, endpoints: Seq[Endpoint],
      varianceSupportingOnly: Boolean = false,
      customVarianceSubstrings: Seq[String] = Nil,
      url: Option[Column] = None): DataFrame = {
    // null keyed fields drop pre-sessionization, as in the keying
    // DoFn (HTTPRequest.java:125-140; a null UA becomes "unknown")
    val base = Sessionize.assignSessions(
      df.select(ts.as("__ts"), addr.as("addr"), method.as("__m"),
        path.as("__p"), coalesce(userAgent, lit("unknown")).as("__ua"),
        url.getOrElse(path).as("__u")).filter(col("addr").isNotNull &&
        col("__m").isNotNull && col("__p").isNotNull),
      col("__ts"), col("addr"), gapSeconds)
    val monIdx = endpoints.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (e, i)) =>
        when(col("__m") === e.method && col("__p") === e.path, i)
          .otherwise(acc)
    }
    val customVariance = customVarianceSubstrings
      .map(s => col("__u").contains(s)).reduceOption(_ || _)
      .getOrElse(lit(false))
    val extendedVarianceEvent =
      monIdx.isNull && (isSupporting(col("__p")) || customVariance)
    val varianceEvent = if (varianceSupportingOnly) extendedVarianceEvent
      else monIdx.isNull
    val counts = endpoints.indices.map(i =>
      count(when(monIdx === i, 1)).as(s"n_$i"))
    val aggs = counts ++ Seq(
      count(when(varianceEvent, 1)).as("n_variance"),
      max(when(monIdx.isNotNull, unix_millis(col("__ts"))))
        .as("latest_ts_ms"),
      max_by(when(monIdx.isNotNull, col("__ua")),
        when(monIdx.isNotNull, unix_millis(col("__ts")))).as("useragent"),
      max(unix_millis(col("__ts"))).as("__last"))
    val grouped = base.groupBy(col("addr"), col("session_id"))
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("n_variance") === 0)
    val qual = endpoints.indices.map(i =>
      when(col(s"n_$i") >= endpoints(i).threshold, col(s"n_$i"))
        .otherwise(lit(null).cast("long")))
    val maxQual = if (qual.length == 1) qual.head else greatest(qual: _*)
    val bestIdx = endpoints.indices.foldLeft(lit(null).cast("int")) {
      (acc, i) =>
        when(acc.isNull && qual(i) === maxQual, i).otherwise(acc)
    }
    grouped
      .withColumn("best", bestIdx)
      .filter(col("best").isNotNull)
      .withColumn("endpoint_method",
        endpoints.indices.foldLeft(lit(null).cast("string")) { (acc, i) =>
          when(col("best") === i, endpoints(i).method).otherwise(acc) })
      .withColumn("endpoint_path",
        endpoints.indices.foldLeft(lit(null).cast("string")) { (acc, i) =>
          when(col("best") === i, endpoints(i).path).otherwise(acc) })
      .withColumn("n",
        endpoints.indices.foldLeft(lit(null).cast("long")) { (acc, i) =>
          when(col("best") === i, col(s"n_$i")).otherwise(acc) })
      .withColumn("window_max_ts_ms",
        col("__last") + lit(gapSeconds * 1000L) - lit(1L))
      .select(col("addr"), col("session_id"), col("endpoint_method"),
        col("endpoint_path"), col("n"), col("latest_ts_ms"),
        col("useragent"), col("window_max_ts_ms"))
  }

  /** PerEndpointErrorRateAnalysis. Input should already be filtered
    * to error responses. Output: (window_start_ms, addr, rule_method,
    * rule_path, n_errors, latest_error_ms). Rule paths FULL-match
    * (the reference's Pattern.matcher(path).matches(),
    * PerEndpointErrorRateAnalysis.java:106-108). */
  def perEndpointErrorRate(df: DataFrame, ts: Column, addr: Column,
      method: Column, path: Column, window: String,
      rules: Seq[ErrorRule]): DataFrame = {
    val matches = rules.map(r =>
      method === r.method && path.rlike("^(?:" + r.path + ")$"))
    val counts = rules.indices.map(i =>
      count(when(matches(i), 1)).as(s"n_$i"))
    val latest = rules.indices.map(i =>
      max(when(matches(i), unix_millis(ts))).as(s"t_$i"))
    val grouped = df
      .groupBy(windowStartMs(ts, window).as("window_start_ms"),
        addr.as("addr"))
      .agg((counts ++ latest).head, (counts ++ latest).tail: _*)
    val qual = rules.indices.map(i =>
      when(col(s"n_$i") >= rules(i).threshold, col(s"n_$i"))
        .otherwise(lit(null).cast("long")))
    val maxQual = if (qual.length == 1) qual.head else greatest(qual: _*)
    val bestIdx = rules.indices.foldLeft(lit(null).cast("int")) {
      (acc, i) => when(acc.isNull && qual(i) === maxQual, i).otherwise(acc)
    }
    grouped
      .withColumn("best", bestIdx)
      .filter(col("best").isNotNull)
      .withColumn("rule_method",
        rules.indices.foldLeft(lit(null).cast("string")) { (acc, i) =>
          when(col("best") === i, rules(i).method).otherwise(acc) })
      .withColumn("rule_path",
        rules.indices.foldLeft(lit(null).cast("string")) { (acc, i) =>
          when(col("best") === i, rules(i).path).otherwise(acc) })
      .withColumn("n_errors",
        rules.indices.foldLeft(lit(null).cast("long")) { (acc, i) =>
          when(col("best") === i, col(s"n_$i")).otherwise(acc) })
      .withColumn("latest_error_ms",
        rules.indices.foldLeft(lit(null).cast("long")) { (acc, i) =>
          when(col("best") === i, col(s"t_$i")).otherwise(acc) })
      .select(col("window_start_ms"), col("addr"), col("rule_method"),
        col("rule_path"), col("n_errors"), col("latest_error_ms"))
  }

  /** PerEndpointErrorRateAnalysis, faithful session form (ref
    * s/httprequest/HTTPRequest.java:96-165
    * KeyAndWindowForSessionsFireEarly + PerEndpointErrorRateAnalysis
    * .java:160-250): the reference filters to client errors FIRST and
    * sessionizes only those per source address (gap =
    * errorSessionGapDurationMinutes), so quiet error periods split
    * sessions even while good traffic continues. Per (addr, session),
    * each rule counts full-match (method, path-regex) errors; the
    * qualifying rule with the highest count wins (first-listed wins
    * ties — the reference's strictly-greater max scan); the row
    * carries the most recent matching error and the session-window
    * max timestamp (last error + gap − 1 ms, Beam's
    * `w.maxTimestamp()`).
    *
    * Input must already be filtered to the error statuses of interest
    * (the reference keeps 400–499). One exchange on addr for the
    * sessionization, then a hash aggregate of conditional counts —
    * same scan shape as the fixed-window form. */
  def perEndpointErrorRateSessions(df: DataFrame, ts: Column,
      addr: Column, method: Column, path: Column, gapSeconds: Long,
      rules: Seq[ErrorRule]): DataFrame = {
    // the reference's keying DoFn drops events missing any of the
    // keyed fields before sessionizing (HTTPRequest.java:125-140)
    val base = Sessionize.assignSessions(
      df.select(ts.as("__ts"), addr.as("addr"), method.as("__m"),
        path.as("__p")).filter(col("addr").isNotNull &&
        col("__m").isNotNull && col("__p").isNotNull),
      col("__ts"), col("addr"), gapSeconds)
    val matches = rules.map(r =>
      col("__m") === r.method && col("__p").rlike("^(?:" + r.path + ")$"))
    val counts = rules.indices.map(i =>
      count(when(matches(i), 1)).as(s"n_$i"))
    val latest = rules.indices.map(i =>
      max(when(matches(i), unix_millis(col("__ts")))).as(s"t_$i"))
    val aggs = counts ++ latest :+
      max(unix_millis(col("__ts"))).as("__last")
    val grouped = base.groupBy(col("addr"), col("session_id"))
      .agg(aggs.head, aggs.tail: _*)
    val qual = rules.indices.map(i =>
      when(col(s"n_$i") >= rules(i).threshold, col(s"n_$i"))
        .otherwise(lit(null).cast("long")))
    val maxQual = if (qual.length == 1) qual.head else greatest(qual: _*)
    val bestIdx = rules.indices.foldLeft(lit(null).cast("int")) {
      (acc, i) => when(acc.isNull && qual(i) === maxQual, i).otherwise(acc)
    }
    grouped
      .withColumn("best", bestIdx)
      .filter(col("best").isNotNull)
      .withColumn("rule_method",
        rules.indices.foldLeft(lit(null).cast("string")) { (acc, i) =>
          when(col("best") === i, rules(i).method).otherwise(acc) })
      .withColumn("rule_path",
        rules.indices.foldLeft(lit(null).cast("string")) { (acc, i) =>
          when(col("best") === i, rules(i).path).otherwise(acc) })
      .withColumn("n_errors",
        rules.indices.foldLeft(lit(null).cast("long")) { (acc, i) =>
          when(col("best") === i, col(s"n_$i")).otherwise(acc) })
      .withColumn("latest_error_ms",
        rules.indices.foldLeft(lit(null).cast("long")) { (acc, i) =>
          when(col("best") === i, col(s"t_$i")).otherwise(acc) })
      // the session WINDOW tracks every error event in the session,
      // matching or not (the reference sessionizes before rule
      // matching), so its max timestamp derives from __last
      .withColumn("window_max_ts_ms",
        col("__last") + lit(gapSeconds * 1000L) - lit(1L))
      .select(col("addr"), col("session_id"), col("rule_method"),
        col("rule_path"), col("n_errors"), col("latest_error_ms"),
        col("window_max_ts_ms"))
  }

  /** UserAgentBlocklistAnalysis. `natAddrs`, when given, suppresses
    * clients the NAT detector flagged (broadcast left-anti — the
    * reference's side-input map). Firefox agents are excluded before
    * the blocklist test, as the reference does. Output:
    * (window_start_ms, addr, useragent) — one row per distinct
    * blocklisted agent per client per window. */
  def userAgentBlocklist(df: DataFrame, ts: Column, addr: Column,
      userAgent: Column, window: String, blocklist: Seq[String],
      natAddrs: Option[DataFrame] = None): DataFrame = {
    val pat = "^(?:" + blocklist.map(p => s"(?:$p)").mkString("|") + ")$"
    val base = df
      .filter(addr.isNotNull && userAgent.isNotNull &&
        !userAgent.contains("Firefox/") && userAgent.rlike(pat))
      .select(windowStartMs(ts, window).as("window_start_ms"),
        addr.as("addr"), userAgent.as("useragent"))
      .distinct()
    natAddrs match {
      case None => base
      case Some(nat) => base.join(broadcast(nat
        .select(col(nat.columns.head).as("addr"))), Seq("addr"), "left_anti")
    }
  }
}
