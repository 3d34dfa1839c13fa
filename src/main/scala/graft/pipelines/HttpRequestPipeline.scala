package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.filter.EventFilter
import graft.operators.{Heuristics, Sessionize}
import graft.parse.Parser

/** The HTTPRequest analysis pipeline (ref EP1, s/httprequest/
  * HTTPRequest.java:182-385): one parsed stream fans out to the rate
  * heuristics sharing a single 1-minute-windowed view, plus the NAT
  * detector whose output suppresses threshold alerts, plus session
  * heuristics — re-expressed as one cached DataFrame with declarative
  * branches (the reference fuses these stages manually; Catalyst does
  * it from the lineage).
  *
  * Scale notes: the parsed frame is cached because 5+ heuristics read
  * it (the reference's InputCollectionCache, §4 "Caching"); each
  * heuristic is one hash-aggregate over the SAME window+key grouping,
  * so at 100 TB the dominant cost is one scan + one shuffle per
  * distinct grouping, and the NAT suppression is a broadcast
  * left-anti join on the already-aggregated (tiny) side.
  */
object HttpRequestPipeline {

  /** joda-style ISO-millis UTC rendering, held in a static module so
    * executor closures reference it without serializing a
    * DateTimeFormatter (which is not Serializable). */
  private object IsoMillis {
    private val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
      .withZone(java.time.ZoneOffset.UTC)
    def format(epochMs: Long): String =
      fmt.format(java.time.Instant.ofEpochMilli(epochMs))
  }

  case class Config(
      window: String = "1 minute",
      hardLimit: Long = 100,
      thresholdModifier: Double = 2.0,
      errorMaxCount: Long = 30,
      natMinDistinctUserAgents: Long = 4,
      sessionGapSeconds: Long = 2700,
      maxSessionEvents: Long = 1000,
      /** Addresses always treated as gateways regardless of observed
        * UA variety (ref DetectNat.withKnownGateways). */
      knownGateways: Seq[String] = Nil)

  /** Reference-exact per-heuristic documentation strings for the
    * config tick (ref s/httprequest/HTTPRequest.java:656-732
    * buildConfigurationTick + each heuristic's getTransformDoc —
    * ThresholdAnalysis.java:73-79, HardLimitAnalysis.java:65-70,
    * ErrorRateAnalysis.java:53-58, UserAgentBlocklistAnalysis.java:
    * 68-71): the tick payload self-documents what the pipeline is
    * configured to alert on. Feed to `Streaming.cfgTickStream`. */
  def configTickPayload(cfg: Config,
      options: Map[String, String] = Map.empty): String = {
    import graft.streaming.CfgTickBuilder.doc
    graft.streaming.CfgTickBuilder.build(Seq(
      doc("ThresholdAnalysis",
        f"Alert if a single source address makes more than " +
          f"${cfg.thresholdModifier}%.2f times the calculated mean request " +
          "rate for all clients within a 1 minute window."),
      doc("HardLimitAnalysis",
        s"Alert if single source address makes more than ${cfg.hardLimit} " +
          "requests in a 1 minute window."),
      doc("ErrorRateAnalysis",
        s"Alert if a single source address generates more than " +
          s"${cfg.errorMaxCount} 4xx errors in a 1 minute window."),
      doc("UserAgentBlocklistAnalysis",
        "Alert if client makes request with user agent that matches entry " +
          "in blocklist.")), options)
  }

  /** Parse raw lines and keep HTTP_REQUEST events (compiled filter).
    * The fast-match pushdown prunes non-candidate lines BEFORE the
    * opaque mapPartitions parse (ref Parser.java:508-516) — at scale
    * the parse dominates, so lines that cannot possibly become
    * HTTP_REQUEST events must never reach Jackson. */
  def parsedHttp(lines: Dataset[String]): DataFrame =
    Parser.parse(lines
        .filter(Parser.fastFilterAny(Parser.payloadTypesFor("HTTP_REQUEST"))))
      .toDF()
      .filter(EventFilter.compile(Seq(EventFilter.Rule(
        wantNormalizedTypes = Seq("HTTP_REQUEST")))))

  private def alert(df: DataFrame, subcategory: String, severity: String,
      countCol: String): DataFrame =
    df.select(
      lit(s"${subcategory}_exceeded").as("summary"),
      lit("httprequest").as("category"),
      lit(subcategory).as("subcategory"),
      lit(severity).as("severity"),
      col("key").as("sourceaddress"),
      col(countCol).cast("long").as("count"),
      col("window_start_ms"))

  /** Full batch analysis: raw lines → unioned alert frame.
    *
    * `cacheParsed` (default true) caches the parsed frame so the four
    * heuristics + the NAT view share ONE parse. The 100× probe
    * measured the trade's other side: when the cached frame
    * approaches the executor storage pool, eviction + shuffle-spill
    * pressure turns the last decade super-linear (12.8 s @30× →
    * 116 s @100× in an 8→24 GB JVM, with 8 GB failing outright on
    * UNABLE_TO_ACQUIRE_MEMORY). Memory-constrained deployments pass
    * `cacheParsed = false` and trade five linear re-parses for zero
    * storage pressure — recompute beats spill once the frame no
    * longer fits. */
  def analyze(lines: Dataset[String], cfg: Config = Config(),
      cacheParsed: Boolean = true): DataFrame = {
    val parsed0 = parsedHttp(lines)
    // Optimization r17 (guide §2.3 "project before the exchange",
    // §2.4 "share one exchange"): the four windowed heuristics + the
    // NAT view all group by the SAME (1-window, sourceAddress) key
    // and consume only four scalar columns — so (a) the cached frame
    // carries exactly those columns instead of full Event rows
    // (raw line + two maps + nested struct: the old cache serialized
    // the whole envelope five consumers never read), and (b) ONE
    // fused per-(window, key) aggregate replaces the four separate
    // aggregations of the same rows (hard-limit n, error-rate 4xx
    // count, NAT distinct-UA cardinality ride one shuffle; the
    // threshold mean is an aggregate OVER the per-key frame, as
    // before). Branch-for-branch equivalence with the former
    // Heuristics.* calls: same window expression, same grouping, and
    // the per-branch filters reproduce each heuristic's row set —
    // count(when(4xx)) differs from the old filter-then-count only on
    // keys with zero errors, which `errors > errorMaxCount` (>= 0)
    // excludes exactly as the old filter did. q80's oracle hash is
    // the proof.
    val slim0 = parsed0.select(col("timestamp"),
      col("normalized.sourceAddress").as("__src"),
      col("normalized.userAgent").as("__ua"),
      col("normalized.requestStatus").as("__status"))
    val slim = if (cacheParsed) slim0.cache() else slim0
    val ts = col("timestamp")
    val src = col("__src")

    val spark = lines.sparkSession
    import spark.implicits._
    val perKey0 = slim
      .groupBy(unix_millis(window(ts, cfg.window).getField("start"))
          .as("window_start_ms"),
        src.as("key"))
      .agg(count(lit(1)).as("n"),
        count(when(col("__status").between(400, 499), 1)).as("errors"),
        countDistinct(col("__ua")).as("n_ua"))
    // five consumers (NAT view, hard, threshold per-key + per-window
    // mean, error rate) — cached so the fused aggregation runs once;
    // bounded by |windows x active keys|, the same class as the old
    // per-heuristic aggregate outputs
    val perKey = if (cacheParsed) perKey0.cache() else perKey0

    // NAT view: sources carrying many distinct user agents in the
    // window are gateways; the reference's natView suppresses BOTH
    // threshold and hard-limit alerts (ThresholdAnalysis +
    // HardLimitAnalysis.java:88-128 each take the view). Known
    // gateways (ref DetectNat.withKnownGateways) suppress on the key
    // alone, in every window.
    val nat = perKey.filter(col("n_ua") >= cfg.natMinDistinctUserAgents)
      .select(col("window_start_ms"), col("key"))
    def natGate(df: DataFrame): DataFrame = {
      val windowed = df.join(broadcast(nat),
        Seq("window_start_ms", "key"), "left_anti")
      if (cfg.knownGateways.isEmpty) windowed
      else windowed.join(broadcast(cfg.knownGateways.toDF("key")),
        Seq("key"), "left_anti")
    }

    val hard = alert(
      natGate(perKey.filter(col("n") > cfg.hardLimit)
        .select(col("window_start_ms"), col("key"), col("n"))),
      "hard_limit", "warn", "n")

    val perWindow = perKey.groupBy(col("window_start_ms"))
      .agg(avg(col("n")).as("mean_n"))
    val threshold = alert(
      natGate(perKey.join(broadcast(perWindow), Seq("window_start_ms"))
        .filter(col("n") >= col("mean_n") * cfg.thresholdModifier &&
          col("n") >= 1)
        .select(col("window_start_ms"), col("key"), col("n"),
          col("mean_n"))),
      "threshold", "warn", "n")

    val errors = alert(
      perKey.filter(col("errors") > cfg.errorMaxCount)
        .select(col("window_start_ms"), col("key"), col("errors")),
      "error_rate", "warn", "errors")

    val sessions = alert(
      Sessionize.sessionLimit(slim, ts, src, cfg.sessionGapSeconds,
          cfg.maxSessionEvents)
        .withColumn("window_start_ms", lit(null).cast("long")),
      "session_limit", "critical", "max_session_events")

    hard.unionByName(threshold).unionByName(errors).unionByName(sessions)
  }

  /** Endpoint-abuse alerts in the reference's FULL composition (ref
    * EndpointAbuseAnalysis.java:136-299 → GlobalTriggers →
    * AlertSuppressorCount, java:277): per-client session-window abuse
    * detection, then count-aware suppression keyed by the client
    * address — a repeat alert for the same client re-emits only when
    * the suppression window lapses or the count CHANGES. The
    * suppression timestamp is the latest monitored request
    * (`a.setTimestamp(latestEpaRequest)`, java:233). */
  def endpointAbuseAlerts(lines: Dataset[String],
      endpoints: Seq[graft.operators.HttpHeuristics.Endpoint],
      sessionGapSeconds: Long = 2700, suppressSeconds: Long = 600,
      varianceSupportingOnly: Boolean = false,
      customVarianceSubstrings: Seq[String] = Nil): DataFrame = {
    val abuse = graft.operators.HttpHeuristics.endpointAbuseSessions(
      parsedHttp(lines), col("timestamp"),
      col("normalized.sourceAddress"), col("normalized.requestMethod"),
      col("normalized.urlRequestPath"), col("normalized.userAgent"),
      sessionGapSeconds, endpoints, varianceSupportingOnly,
      customVarianceSubstrings, url = Some(col("normalized.requestUrl")))
    graft.operators.Stateful.suppressCountGate(abuse,
        timestamp_millis(col("latest_ts_ms")), col("addr"), col("n"),
        suppressSeconds)
      .select(lit("endpoint_abuse").as("subcategory"),
        lit("httprequest").as("category"),
        lit("warn").as("severity"),
        col("addr").as("sourceaddress"), col("endpoint_method"),
        col("endpoint_path"), col("n").as("count"), col("useragent"),
        col("latest_ts_ms").as("ts_ms"), col("window_max_ts_ms"))
  }

  /** Per-endpoint error-rate alerts in the reference's full
    * composition (ref PerEndpointErrorRateAnalysis.java:160-250 →
    * AlertSuppressorCount, java:248): error-session detection, then
    * count-aware suppression keyed by client address; the suppression
    * timestamp is the most recent matching error. */
  def perEndpointErrorRateAlerts(lines: Dataset[String],
      rules: Seq[graft.operators.HttpHeuristics.ErrorRule],
      errorSessionGapSeconds: Long = 1800,
      suppressSeconds: Long = 600): DataFrame = {
    val errs = graft.operators.HttpHeuristics.perEndpointErrorRateSessions(
      parsedHttp(lines)
        .filter(col("normalized.requestStatus").between(400, 499)),
      col("timestamp"), col("normalized.sourceAddress"),
      col("normalized.requestMethod"), col("normalized.urlRequestPath"),
      errorSessionGapSeconds, rules)
    graft.operators.Stateful.suppressCountGate(errs,
        timestamp_millis(col("latest_error_ms")), col("addr"),
        col("n_errors"), suppressSeconds)
      .select(lit("per_endpoint_error_rate").as("subcategory"),
        lit("httprequest").as("category"),
        lit("warn").as("severity"),
        col("addr").as("sourceaddress"), col("rule_method"),
        col("rule_path"), col("n_errors").as("count"),
        col("latest_error_ms").as("ts_ms"), col("window_max_ts_ms"))
  }

  /** Session-limit alerts in the reference's full composition (ref
    * SessionLimitAnalysis.java:200-292 → AlertSuppressorCount): one
    * alert per qualifying (client, session) with the session request
    * count, `monitor_only` below the hard threshold, then count-aware
    * suppression keyed by client address. Suppression timestamp is
    * the session's latest request (`a.setTimestamp(latestRequest)`,
    * java:239). */
  def sessionLimitAlerts(lines: Dataset[String],
      sessionGapSeconds: Long = 2700, threshold: Long = 1000,
      monitor: Long = 500, suppressSeconds: Long = 600): DataFrame = {
    val sessions = Sessionize.sessionSummary(parsedHttp(lines),
        col("timestamp"), col("normalized.sourceAddress"),
        sessionGapSeconds)
      .filter(col("n_events") >= monitor)
    graft.operators.Stateful.suppressCountGate(sessions,
        timestamp_millis(col("session_end_ms")), col("key"),
        col("n_events"), suppressSeconds)
      .select(
        when(col("n_events") >= threshold, "session_limit_analysis")
          .otherwise("session_limit_analysis_monitor_only")
          .as("subcategory"),
        lit("httprequest").as("category"),
        lit("critical").as("severity"),
        col("key").as("sourceaddress"), col("session_id"),
        col("n_events").as("count"),
        col("session_end_ms").as("ts_ms"))
  }

  /** Reference-shaped threshold_analysis alerts: full `Alert` rows
    * whose metadata sequence replicates the reference's addMetadata
    * call order exactly (ref s/httprequest/heuristics/
    * ThresholdAnalysis.java:152-196): "category" (the subcategory
    * entry, from setSubcategory), sourceaddress, mean (Java
    * Double.toString of the per-window client mean), count,
    * threshold_modifier, notify_merge ("<resource>
    * threshold_analysis"), window_timestamp (window max event-time,
    * joda-style ISO millis — the value
    * t/.../TestThresholdAnalysis1.java:66 asserts). Rendered through
    * `Sinks.alertJsonGolden` this is byte-compatible with the
    * reference's own alert JSON; GoldenAlertSpec pins it.
    *
    * Deterministic divergences (documented, unasserted by the
    * reference's tests): alertId is a name-UUID of (resource, key,
    * window) instead of random, and the alert timestamp is the
    * window max instead of wall clock. */
  def thresholdAlertsGolden(lines: Dataset[String],
      monitoredResource: String, modifier: Double,
      cfg: Config = Config()): Dataset[graft.model.Alert] = {
    val spark = lines.sparkSession
    import spark.implicits._
    require(cfg.window == "1 minute") // winMax below assumes 60s windows
    Heuristics.thresholdAnalysis(parsedHttp(lines), col("timestamp"),
        col("normalized.sourceAddress"), cfg.window, modifier)
      .select(col("window_start_ms"), col("key"), col("n"), col("mean_n"))
      .as[(Long, String, Long, Double)]
      .map { case (winStart, key, n, mean) =>
        val winMaxMs = winStart + 60000L - 1L
        val winMaxIso = IsoMillis.format(winMaxMs)
        graft.model.Alert(
          alertId = java.util.UUID.nameUUIDFromBytes(
            s"$monitoredResource|threshold_analysis|$key|$winStart"
              .getBytes("UTF-8")).toString,
          timestamp = new java.sql.Timestamp(winMaxMs),
          summary = s"$monitoredResource httprequest threshold_analysis " +
            s"$key $n",
          category = "httprequest",
          subcategory = Some("threshold_analysis"),
          severity = graft.model.AlertSeverity.Info,
          metadata = Seq(
            graft.model.AlertMetaEntry(
              graft.model.AlertMeta.AlertSubcategoryField,
              "threshold_analysis"),
            graft.model.AlertMetaEntry(
              graft.model.AlertMeta.SourceAddress, key),
            graft.model.AlertMetaEntry(
              graft.model.AlertMeta.MeanValue, mean.toString),
            graft.model.AlertMetaEntry(
              graft.model.AlertMeta.Count, n.toString),
            graft.model.AlertMetaEntry(
              graft.model.AlertMeta.ThresholdModifier, modifier.toString),
            graft.model.AlertMetaEntry(
              graft.model.AlertMeta.NotifyMergeKey,
              s"$monitoredResource threshold_analysis"),
            graft.model.AlertMetaEntry(
              graft.model.AlertMeta.WindowTimestamp, winMaxIso)))
      }
  }

  /** Streaming form of the hard-limit branch: unbounded lines →
    * mapPartitions parse (narrow, streaming-safe) → compiled filter →
    * watermarked event-time window → alert rows. Run in update mode
    * for early firings (the reference's accumulating panes) and attach
    * sinks via Sinks.streamTo / foreachBatch. */
  def analyzeStream(lines: Dataset[String], cfg: Config = Config(),
      watermarkDelay: String = "30 seconds"): DataFrame = {
    val parsed = parsedHttp(lines) // watermark applied by windowedHardLimit
    graft.streaming.Streaming.windowedHardLimit(parsed, "timestamp",
        col("normalized.sourceAddress"), cfg.window, watermarkDelay,
        cfg.hardLimit)
      .select(
        lit("hard_limit_exceeded").as("summary"),
        lit("httprequest").as("category"),
        lit("hard_limit").as("subcategory"),
        lit("warn").as("severity"),
        col("key").as("sourceaddress"),
        col("n").cast("long").as("count"),
        col("window_start_ms"))
  }

  /** The composed production shape as ONE streaming query (ref
    * HTTPRequest.java:818-889 expandInputMap: per-resource input →
    * analyses + cfgtick processor → flatten): raw multiplexed lines →
    * parse → a SINGLE windowed aggregate per (window, client) carrying
    * the request count, 4xx count and distinct-UA cardinality →
    * hard-limit and error-rate alerts, unioned with config-tick
    * alerts parsed from the same stream (ref CfgTickProcessor — ticks
    * ride the input).
    *
    * NAT gating follows the reference exactly: HardLimitAnalysis
    * consumes the DetectNat view and skips emission for flagged
    * sources (HardLimitAnalysis.java:88-128) and for configured known
    * gateways; ErrorRateAnalysis takes no NAT view. The NAT signal
    * rides the same aggregate as the counts
    * (`size(collect_set(ua))` — exact, and one state store instead of
    * a second aggregation + stream-stream join), so adding it costs
    * no extra shuffle. Append mode: a window's alerts emit once the
    * watermark passes its end; later-than-watermark events are
    * dropped, the streaming twin of the reference's
    * `withAllowedLateness(ZERO)`.
    *
    * Session limits ride this SAME query as a third stateful branch
    * (a `session_window` aggregate unioned with the time-window
    * aggregate — Spark 4 runs the two state stores side by side in
    * one append query); one alert per offending session, where the
    * batch form reports one row per key with its max session (the
    * difference only shows when a key offends in two separate
    * sessions of one run). Threshold analysis (global per-window mean
    * side input) is the ONE heuristic that stays a sibling query —
    * [[thresholdAlertStream]] — because the mean join needs a
    * foreachBatch epilogue at window finalization that cannot union
    * into an append-mode branch. Run both over the same multiplexed
    * input for the reference's full per-resource fan-out
    * (HTTPRequest.java:182-385). */
  def analyzeStreamFull(lines: Dataset[String], cfg: Config = Config(),
      watermarkDelay: String = "30 seconds"): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    val parsed = parsedHttp(lines)
    val perClient = parsed
      .withWatermark("timestamp", watermarkDelay)
      .groupBy(window(col("timestamp"), cfg.window),
        col("normalized.sourceAddress").as("key"))
      .agg(
        count(lit(1)).as("n"),
        count(when(col("normalized.requestStatus").between(400, 499), 1))
          .as("errors"),
        // HLL++, not collect_set: the NAT signal only needs to clear
        // a single-digit threshold, where the sparse sketch is exact,
        // and the per-key state stays bounded no matter how many
        // distinct agents a proxy fans out
        approx_count_distinct(col("normalized.userAgent"), 0.01)
          .as("n_ua"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("key"), col("n"), col("errors"), col("n_ua"))
    val natFlag = col("n_ua") >= cfg.natMinDistinctUserAgents ||
      (if (cfg.knownGateways.isEmpty) lit(false)
       else col("key").isin(cfg.knownGateways: _*))
    def alertRows(pred: Column, subcategory: String, countCol: Column) =
      perClient.filter(pred).select(
        lit(s"${subcategory}_exceeded").as("summary"),
        lit("httprequest").as("category"),
        lit(subcategory).as("subcategory"),
        lit("warn").as("severity"),
        col("key").as("sourceaddress"),
        countCol.cast("long").as("count"),
        col("window_start_ms"))
    val hard = alertRows(col("n") > cfg.hardLimit && !natFlag,
      "hard_limit", col("n"))
    val errors = alertRows(col("errors") > cfg.errorMaxCount,
      "error_rate", col("errors"))
    // session-limit branch: its own keyed session_window state over
    // the same parsed stream; a session emits once the watermark
    // passes its gap (final pane), mirroring the batch
    // Sessionize.sessionLimit >= bound
    val sessions = parsed
      .withWatermark("timestamp", watermarkDelay)
      .groupBy(session_window(col("timestamp"),
          s"${cfg.sessionGapSeconds} seconds"),
        col("normalized.sourceAddress").as("key"))
      .agg(count(lit(1)).as("n_events"))
      .filter(col("n_events") >= cfg.maxSessionEvents)
      .select(
        lit("session_limit_exceeded").as("summary"),
        lit("httprequest").as("category"),
        lit("session_limit").as("subcategory"),
        lit("critical").as("severity"),
        col("key").as("sourceaddress"),
        col("n_events").cast("long").as("count"),
        lit(null).cast("long").as("window_start_ms"))
    // second branch over the same source: the cfgtick fast-keyword
    // pushdown prunes non-tick lines before this branch's parse, so
    // the double scan costs one substring probe per line, not two
    // full parses
    val ticks = Parser.parse(
        lines.filter(Parser.fastFilter("cfgtick"))).toDF()
      .filter(col("payloadType") === "cfgtick")
      .select(
        col("raw").as("summary"),
        lit("httprequest-cfgtick").as("category"),
        lit("cfgtick").as("subcategory"),
        lit("info").as("severity"),
        lit(null).cast("string").as("sourceaddress"),
        lit(null).cast("long").as("count"),
        lit(null).cast("long").as("window_start_ms"))
    hard.unionByName(errors).unionByName(sessions).unionByName(ticks)
  }

  /** The threshold branch of the streaming fan-out, NAT-gated like
    * the batch form (ThresholdAnalysis consumes the DetectNat view):
    * ONE stateful aggregate carries the per-(window, client) count
    * AND the distinct-UA NAT signal; when the watermark finalizes a
    * window, every key of that window lands in the same micro-batch,
    * so the global per-window mean, the threshold compare, and the
    * NAT suppression run as a plain batch join inside foreachBatch
    * (see [[graft.streaming.Streaming.thresholdStream]] for why a
    * chained agg→agg formulation silently drops the finalized rows).
    * `onAlerts` receives alert rows in the [[analyze]] schema. Start
    * this alongside [[analyzeStreamFull]] over the same lines for
    * the full per-resource fan-out. */
  def thresholdAlertStream(lines: Dataset[String], cfg: Config = Config(),
      watermarkDelay: String = "30 seconds")(onAlerts: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.streaming.OutputMode
    val perClient = parsedHttp(lines)
      .withWatermark("timestamp", watermarkDelay)
      .groupBy(window(col("timestamp"), cfg.window),
        col("normalized.sourceAddress").as("key"))
      .agg(count(lit(1)).as("n"),
        approx_count_distinct(col("normalized.userAgent"), 0.01)
          .as("n_ua"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("key"), col("n"), col("n_ua"))
    perClient.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val b = batch.toDF()
        val mean = b.groupBy(col("window_start_ms"))
          .agg(avg(col("n")).as("mean_n"))
        val natFlag = col("n_ua") >= cfg.natMinDistinctUserAgents ||
          (if (cfg.knownGateways.isEmpty) lit(false)
           else col("key").isin(cfg.knownGateways: _*))
        onAlerts(b.join(broadcast(mean), Seq("window_start_ms"))
          .filter(col("n") >= col("mean_n") * cfg.thresholdModifier &&
            !natFlag)
          .select(
            lit("threshold_exceeded").as("summary"),
            lit("httprequest").as("category"),
            lit("threshold").as("subcategory"),
            lit("warn").as("severity"),
            col("key").as("sourceaddress"),
            col("n").cast("long").as("count"),
            col("window_start_ms")))
      }
  }
}
