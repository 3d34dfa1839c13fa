package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.Functions
import graft.parse.Parser
import graft.operators.CustomsDetectors

/** The Customs pipeline (ref EP3, s/customs/Customs.java:601-702):
  * FxA auth events keyed three ways — source address, email,
  * email domain — through fixed feature windows, then per-keying
  * detectors over the windowed counts:
  *  - source login failure (SourceLoginFailure: failures per source)
  *  - account-creation abuse (CustomsAccountCreation: creations/source)
  *  - password-reset abuse (CustomsPasswordResetAbuse: resets/email)
  *  - distributed account creation (CustomsAccountCreationDist:
  *    similar normalized emails across distinct sources)
  *
  * One parsed+cached frame feeds all keyings (the reference's
  * CustomsPreFilter tag-split becomes three filters over the cache);
  * every detector is a single windowed hash-aggregate + threshold,
  * and the similar-email clustering joins only within an email-domain
  * group (bounded pair blow-up, same trick as the reference's
  * per-address grouping).
  */
object CustomsPipeline {

  case class Config(
      window: String = "10 minutes",
      maxLoginFailuresPerSource: Long = 5,
      maxCreationsPerSource: Long = 3,
      maxResetsPerSource: Long = 3,
      distMinSources: Long = 3,
      distMaxEditDistance: Long = 2)

  /** Parse raw lines, keep FxA auth-session events. Fast-match
    * pushdown ("fxa-auth" substring) prunes before the parse. */
  def parsedFxa(lines: Dataset[String]): DataFrame =
    Parser.parse(lines.filter(Parser.fastFilter("fxaauth"))).toDF()
      .filter(col("payloadType") === "fxaauth")

  private def alert(df: DataFrame, subcategory: String, keyKind: String): DataFrame =
    df.select(
      lit("customs").as("category"),
      lit(subcategory).as("subcategory"),
      lit("warn").as("severity"),
      lit(keyKind).as("key_kind"),
      col("key").cast("string").as("key"),
      col("n").cast("long").as("count"),
      col("window_start_ms").as("alert_ts_ms"))

  def analyze(lines: Dataset[String], cfg: Config = Config()): DataFrame = {
    val fxa = parsedFxa(lines)
      .select(col("timestamp"),
        element_at(col("fields"), "email").as("email"),
        element_at(col("fields"), "action").as("action"),
        element_at(col("fields"), "status").as("status"),
        element_at(col("fields"), "path").as("path"),
        col("normalized.sourceAddress").as("src"))
      .withColumn("norm_email", Functions.normalizeEmailPlus(lower(col("email"))))
      .withColumn("domain", Functions.emailDomain(col("norm_email")))
      .cache()

    // the reference's varianceView: a per-(window, source) path
    // diversity score; NOMINAL sources (organic browsing, index >= 33)
    // are exempt from all three per-source detectors
    // (CustomsAccountCreation.java:92, SourceLoginFailure.java:90,
    // CustomsPasswordResetAbuse.java:92 each return on
    // cf.nominalVariance())
    val nominal = graft.operators.Features.pathVarianceIndexWindowed(
        fxa.filter(col("src").isNotNull), col("timestamp"), cfg.window,
        col("src"), col("path"), col("status").cast("int"))
      .filter(col("nominal"))
      .select(col("window_start_ms"), col("key"))
    def varianceGate(df: DataFrame): DataFrame =
      df.join(broadcast(nominal), Seq("window_start_ms", "key"),
        "left_anti")

    def windowed(pred: org.apache.spark.sql.Column,
        key: org.apache.spark.sql.Column, minN: Long,
        distinctOf: Option[org.apache.spark.sql.Column] = None): DataFrame =
      fxa.filter(pred)
        .groupBy(unix_millis(window(col("timestamp"), cfg.window)
          .getField("start")).as("window_start_ms"), key.as("key"))
        .agg(distinctOf.map(countDistinct(_))
          .getOrElse(count(lit(1))).as("n"))
        .filter(col("n") >= minN)

    // count = failures carrying an account (ref SourceLoginFailure
    // .java:75-89 skips null-email events before counting)
    val loginFailure = alert(varianceGate(windowed(
      col("action") === "loginFailure" && col("email").isNotNull,
      col("src"), cfg.maxLoginFailuresPerSource)),
      "source_login_failure", "sourceaddress")

    // count = DISTINCT accounts created by the source
    // (ref CustomsAccountCreation.java:77-89 dedups seen accounts)
    val creationAbuse = alert(varianceGate(windowed(
      col("action") === "accountCreate" && col("email").isNotNull,
      col("src"), cfg.maxCreationsPerSource,
      distinctOf = Some(col("email")))),
      "account_creation_abuse", "sourceaddress")

    // keyed by SOURCE, counting DISTINCT reset accounts — the
    // reference's CustomsPasswordResetAbuse runs on the
    // source-address keying (Customs.java:565), not per account
    val resetAbuse = alert(varianceGate(windowed(
      col("action") === "passwordReset" && col("email").isNotNull,
      col("src"), cfg.maxResetsPerSource,
      distinctOf = Some(col("email")))),
      "password_reset_abuse", "sourceaddress")

    // distributed creation: similar emails (edit distance on the local
    // part) created from >= distMinSources distinct sources within a
    // domain. The pair join goes through the shared length-band
    // kernel (CustomsDetectors.pairCandidatesAbsolute) — the plain
    // (domain)-keyed self-join is quadratic on a hot consumer domain
    // at corpus scale; banding on floor(len/(d+1)) bounds candidates
    // while provably keeping every pair within edit distance d
    val creations = fxa.filter(col("action") === "accountCreate")
      .select(col("domain"), col("norm_email").as("email"), col("src"),
        substring_index(col("norm_email"), "@", 1).as("local"))
      .dropDuplicates()
    val dist = graft.operators.CustomsDetectors
      .pairCandidatesAbsolute(creations, cfg.distMaxEditDistance)
      .filter(col("email") < col("email_b") &&
        col("src") =!= col("src_b") &&
        levenshtein(col("local"), col("local_b")) <= cfg.distMaxEditDistance)
      // count sources across BOTH sides of the similar pairs
      .select(col("domain"), explode(array(col("src"), col("src_b"))).as("s"))
      .groupBy(col("domain").as("key"))
      .agg(countDistinct(col("s")).as("n"))
      .filter(col("n") >= cfg.distMinSources)
      .withColumn("window_start_ms", lit(null).cast("long"))
    val distAlert = alert(dist, "account_creation_abuse_distributed", "domain")

    loginFailure.unionByName(creationAbuse).unionByName(resetAbuse)
      .unionByName(distAlert)
  }

  /** Full detector-suite configuration (ref Customs.CustomsOptions). */
  case class FullConfig(
      window: String = "10 minutes",
      enumerationThreshold: Long = 5,
      minVarianceClients: Long = 3,
      srcFailDistThreshold: Long = 3,
      velocityMaxKmPerSecond: Double = 0.25,
      velocityMinDistanceKm: Double = 100,
      /** Experimental lower-bar velocity pass (ref CustomsVelocity
        * maxKilometersPerSecondMonitorOnly): alerts tagged
        * velocity_monitor_only, emitted IN ADDITION to escalated
        * velocity alerts for jumps exceeding both bars. */
      velocityMonitorOnlyMaxKmPerSecond: Option[Double] = None,
      velocityMonitorOnlyMinDistanceKm: Double = 0,
      monitoredAddrs: Seq[String] = Nil,
      monitoredAccounts: Seq[String] = Nil,
      /** Cap on the streaming gates' per-(window, key) distinct-set
        * state. The default (-1 = AUTO) resolves to 4× the largest
        * configured gate threshold (see [[resolvedDistinctStateCap]])
        * — flood-bounded out of the box, because unbounded per-key
        * state is linear in an ATTACKER-CONTROLLED quantity (a
        * deliberate high-cardinality flood of distinct emails/sources
        * inflates the state store until the watermark closes the
        * window). A positive cap switches to a bounded k-min distinct
        * counter: exact below the cap, saturating AT it, state ≤ cap
        * values per key — so every `>= threshold` gate decides
        * identically as long as cap >= threshold (enforced), while
        * the emitted count (and therefore the count-change
        * suppressor) saturates once a key exceeds the cap. 0 opts
        * into exact `collect_set` for deployments where batch-twin
        * count parity at ANY fan-out matters more than flood-bounded
        * state. */
      distinctStateCap: Int = -1) {

    /** The cap the streaming gates actually run with: the explicit
      * value when >= 0, else (AUTO) 4× the largest gate threshold —
      * provably gate-identical (every `>= threshold` decision is
      * unchanged while cap >= threshold) with headroom for the
      * emitted count to stay exact well past the alert boundary. */
    def resolvedDistinctStateCap: Int =
      if (distinctStateCap >= 0) distinctStateCap
      else (4L * math.max(enumerationThreshold, srcFailDistThreshold))
        .min(Int.MaxValue).toInt
  }

  /** Distinct-cardinality aggregate for the streaming gates: exact
    * `collect_set` size by default; with `cap > 0`, the bounded
    * [[graft.functions.KMinValuesAggregator]] keeps the cap-smallest
    * DISTINCT raw values (no hashing — the k smallest distinct
    * elements of a set count the set exactly below k), so
    * size(items) == min(cap, true distinct) and state is bounded by
    * construction. Nulls are not set members in either form. */
  private def distinctCount(v: Column, cap: Int): Column =
    if (cap <= 0) size(collect_set(v)).cast("long")
    else {
      val kmin = udaf(new graft.functions.KMinValuesAggregator(cap))
      size(kmin(v).getField("items")).cast("long")
    }

  /** The full customs suite over ONE parsed+cached frame — the Spark
    * form of the reference's ~12-transform wiring (ref Customs.java:
    * 601-702). Every detector is a filter/aggregate over the same
    * cache; outputs unify into the common alert schema. Velocity runs
    * only when a geo resolver is supplied (it needs locations);
    * content-server variance gating uses fxa-content events parsed
    * from the same lines.
    */
  def analyzeFull(lines: Dataset[String], cfg: FullConfig = FullConfig(),
      geo: Option[graft.parse.GeoIp.GeoIpResolver] = None): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    val candidates = lines.filter(
      Parser.fastFilter("fxaauth") || Parser.fastFilter("fxacontent"))
    val parsedAll = (geo match {
      case Some(r) => graft.parse.GeoIp.enrich(Parser.parse(candidates), r)
      case None => Parser.parse(candidates)
    }).toDF().cache()
    val fxa = parsedAll.filter(col("payloadType") === "fxaauth")
      .select(col("timestamp"), col("id"),
        element_at(col("fields"), "email").as("email"),
        element_at(col("fields"), "uid").as("uid"),
        element_at(col("fields"), "path").as("path"),
        element_at(col("fields"), "event_summary").as("summary"),
        col("normalized.sourceAddress").as("src"),
        col("normalized.geo.latitude").as("lat"),
        col("normalized.geo.longitude").as("lon"))

    def alert(df: DataFrame, subcategory: String, keyKind: String,
        key: Column, n: Column, windowMs: Column): DataFrame =
      df.select(lit("customs").as("category"),
        lit(subcategory).as("subcategory"),
        lit("warn").as("severity"),
        lit(keyKind).as("key_kind"),
        key.cast("string").as("key"),
        n.cast("long").as("count"),
        windowMs.cast("long").as("alert_ts_ms"))

    val isStatusCheck = col("summary").isin(
      "accountStatusCheckSuccess", "accountStatusCheckBlocked")
    val variance = CustomsDetectors.contentServerVariance(
      parsedAll.filter(col("payloadType") === "fxacontent"),
      col("timestamp"), col("normalized.sourceAddress"), cfg.window)
    // the reference gates enumeration alerts with
    // AlertSuppressorCount(600L) keyed on the source address
    // (CustomsAccountEnumeration.java:153): a later window's alert
    // for the same source re-emits only after 600s OR when the
    // distinct-email count changes. The alert is stamped with the
    // LATEST qualifying status-check event — not the window start —
    // and the suppressor's expiry runs on that stamp
    // (`alert.setTimestamp(Parser.getLatestTimestamp(events))`,
    // CustomsAccountEnumeration.java:138; same shape as the HTTP
    // sites' latestEpaRequest / latestRequest stamps). On a
    // window-start clock consecutive 10-minute windows could never
    // sit strictly past the 600s bar, silently suppressing same-count
    // alerts the reference re-emits.
    val enumeration = graft.operators.Stateful.suppressCountGate(
      alert(CustomsDetectors.accountEnumeration(
          fxa, col("timestamp"), col("src"), col("email"), col("path"),
          isStatusCheck, cfg.window, cfg.enumerationThreshold,
          variance = Some(variance),
          minVarianceClients = cfg.minVarianceClients),
        "account_enumeration", "sourceaddress", col("src"),
        col("n_emails"), col("latest_ts_ms")),
      timestamp_millis(col("alert_ts_ms")), col("key"),
      col("count"), expirySeconds = 600)

    val srcFailDist = alert(CustomsDetectors.sourceLoginFailureDist(
        fxa, col("timestamp"), col("email"), col("src"),
        col("summary") === "loginFailure", cfg.window,
        cfg.srcFailDistThreshold),
      "source_login_failure_distributed", "email", col("email"),
      col("n_src"), col("window_start_ms"))

    val summary = alert(CustomsDetectors.summary(fxa, col("timestamp"),
        when(col("summary") === "loginFailure", "login_failure")
          .when(col("summary") === "accountCreateSuccess",
            "account_create_success")
          .when(col("summary") === "loginSuccess", "login_success"),
        "15 minutes"),
      "summary", "class", col("class"), col("n"), col("window_start_ms"))

    // the comparator's hit set doubles as the at-risk account state
    // that CustomsLoginFailureForAtRiskAccount reads (ref
    // CustomsStatusComparator.java:155-166 writes the Datastore entry
    // the lfara transform looks up) — compute it once, alert on it,
    // and feed it to the login-failure join
    val comparatorHits = CustomsDetectors.statusComparator(
      fxa.filter(col("summary") === "accountStatusCheckSuccess"),
      col("timestamp"), col("src"), col("email"),
      spark.createDataset(cfg.monitoredAddrs))
    val comparator = alert(comparatorHits,
      "status_comparator", "sourceaddress", col("src"), lit(1),
      col("ts_ms"))

    val atRisk = alert(CustomsDetectors.loginFailureAtRiskAccount(
        fxa.filter(col("summary") === "loginFailure"),
        col("timestamp"), col("email"), col("src"), comparatorHits),
      "login_failure_at_risk_account", "email", col("email"), lit(1),
      col("ts_ms"))

    val monitored = alert(CustomsDetectors.monitoredActivity(
        fxa.filter(col("summary").isin("loginSuccess", "loginFailure")),
        col("timestamp"), col("email"), col("src"), col("summary"),
        spark.createDataset(cfg.monitoredAccounts)),
      "activity_monitor", "email", col("email"), lit(1), col("ts_ms"))

    val velocity = geo match {
      case None => None
      case Some(_) =>
        val logins = fxa.filter(col("summary") === "loginSuccess")
        // escalated + experimental lower-bar alerts from ONE
        // dedup+lag state pass — the reference runs both threshold
        // checks over a single state read (CustomsVelocity.java:
        // 281-320), so the plan sorts the login stream once, not
        // once per bar; an event exceeding both bars emits both
        Some(CustomsDetectors.velocityDual(logins,
            col("timestamp"), col("id"), col("uid"), col("email"),
            col("src"), col("lat"), col("lon"),
            cfg.velocityMaxKmPerSecond, cfg.velocityMinDistanceKm,
            cfg.velocityMonitorOnlyMaxKmPerSecond,
            cfg.velocityMonitorOnlyMinDistanceKm)
          .select(lit("customs").as("category"), col("subcategory"),
            lit("warn").as("severity"), lit("uid").as("key_kind"),
            col("uid").cast("string").as("key"),
            col("km_centi").cast("long").as("count"),
            col("ts_ms").cast("long").as("alert_ts_ms")))
    }

    val base = enumeration.unionByName(srcFailDist).unionByName(summary)
      .unionByName(comparator).unionByName(atRisk).unionByName(monitored)
    velocity.fold(base)(base.unionByName(_))
  }

  /** The parsed fxa-auth stream projected to the detector fields —
    * shared by every streaming branch: one fast-match-pruned parse,
    * the streaming analogue of analyzeFull's cached batch frame. */
  private def fxaStreamFields(lines: Dataset[String]): DataFrame =
    parsedFxa(lines)
      .select(col("timestamp"),
        element_at(col("fields"), "email").as("email"),
        element_at(col("fields"), "uid").as("uid"),
        element_at(col("fields"), "path").as("path"),
        element_at(col("fields"), "event_summary").as("summary"),
        col("normalized.sourceAddress").as("src"))

  private def streamAlert(df: DataFrame, subcategory: String,
      keyKind: String, key: Column, n: Column, wms: Column): DataFrame =
    df.select(lit("customs").as("category"),
      lit(subcategory).as("subcategory"),
      lit("warn").as("severity"),
      lit(keyKind).as("key_kind"),
      key.cast("string").as("key"),
      n.cast("long").as("count"),
      wms.cast("long").as("alert_ts_ms"))

  /** The continuous form of [[analyzeFull]]: the reference's streaming
    * Customs deployment runs every detector off ONE parse
    * (ref s/customs/Customs.java:601-702 wires ~12 transforms over one
    * multiplexed read). Here one append query unions:
    *
    *  - per-class summary counts (15m windowed aggregate);
    *  - source-login-failure-distributed (windowed aggregate per
    *    account; distinct sources counted EXACTLY via collect_set, so
    *    the gate and the alert count agree with the batch twin at the
    *    threshold boundary — HLL++ has no sparse mode, and the
    *    suppression/count parity contract is exact);
    *  - the stateless status-comparator and monitored-activity
    *    broadcast joins (stream-static, no state).
    *
    * Two detectors stay siblings over the SAME multiplexed input, for
    * the same structural reasons as the HTTP threshold stream:
    * [[enumerationAlertStream]] (the variance gate needs a
    * window-level second aggregation over the finalized window —
    * foreachBatch epilogue), and [[atRiskAlertStream]] (keyed
    * transformWithState, a different state family than windowed
    * aggregates). Geo velocity composes via
    * `Streaming.customsVelocityTws` when a resolver is available.
    * StreamingSpec proves composed + siblings ≡ analyzeFull batch on
    * the same lines, with the late-event drop pinned. */
  def analyzeStreamFull(lines: Dataset[String],
      cfg: FullConfig = FullConfig(),
      watermarkDelay: String = "30 seconds"): DataFrame = {
    require(cfg.resolvedDistinctStateCap == 0 ||
      cfg.resolvedDistinctStateCap >= cfg.srcFailDistThreshold,
      s"distinctStateCap=${cfg.resolvedDistinctStateCap} below " +
        s"srcFailDistThreshold=${cfg.srcFailDistThreshold}: a saturated " +
        "count could no longer decide the gate")
    val spark = lines.sparkSession
    import spark.implicits._
    // the watermark is assigned on the UNFILTERED parsed stream, so
    // every event of the resource advances it — a watermark placed
    // after a branch's filter would stall the whole query's (global,
    // min-of-branches) watermark whenever that event class goes quiet
    val fxa = fxaStreamFields(lines)
      .withWatermark("timestamp", watermarkDelay)

    val summary = streamAlert(
      fxa.withColumn("class",
          when(col("summary") === "loginFailure", "login_failure")
            .when(col("summary") === "accountCreateSuccess",
              "account_create_success")
            .when(col("summary") === "loginSuccess", "login_success"))
        .filter(col("class").isNotNull)
        .groupBy(window(col("timestamp"), "15 minutes"), col("class"))
        .agg(count(lit(1)).as("n")),
      "summary", "class", col("class"), col("n"),
      unix_millis(col("window.start")))

    // EXACT distinct sources (collect_set), not HLL++: the alert's
    // count column and the >= threshold gate must agree with the
    // batch twin's countDistinct at the boundary (Spark's HLL++ has
    // no sparse mode, so even single-digit cardinalities can carry
    // error). State per (window, email) is the distinct-src set —
    // linear in the attack fan-out being measured, which is
    // attacker-controlled: cfg.distinctStateCap bounds it (exact
    // below the cap, saturating at it — gate decisions unchanged
    // while cap >= threshold, which the require pins)
    val srcFailDist = streamAlert(
      fxa.filter(col("summary") === "loginFailure" && col("email").isNotNull)
        .groupBy(window(col("timestamp"), cfg.window), col("email"))
        .agg(count(lit(1)).as("n_failures"),
          distinctCount(col("src"), cfg.resolvedDistinctStateCap).as("n_src"))
        .filter(col("n_failures") >= cfg.srcFailDistThreshold &&
          col("n_src") >= cfg.srcFailDistThreshold),
      "source_login_failure_distributed", "email", col("email"),
      col("n_src"), unix_millis(col("window.start")))

    val comparator = streamAlert(CustomsDetectors.statusComparator(
        fxa.filter(col("summary") === "accountStatusCheckSuccess"),
        col("timestamp"), col("src"), col("email"),
        spark.createDataset(cfg.monitoredAddrs)),
      "status_comparator", "sourceaddress", col("src"), lit(1),
      col("ts_ms"))

    val monitored = streamAlert(CustomsDetectors.monitoredActivity(
        fxa.filter(col("summary").isin("loginSuccess", "loginFailure")),
        col("timestamp"), col("email"), col("src"), col("summary"),
        spark.createDataset(cfg.monitoredAccounts)),
      "activity_monitor", "email", col("email"), lit(1), col("ts_ms"))

    summary.unionByName(srcFailDist).unionByName(comparator)
      .unionByName(monitored)
  }

  /** Streaming account enumeration with the content-server variance
    * gate — the sibling query of [[analyzeStreamFull]] (the gate is a
    * second, window-level aggregation over the finalized windows, so
    * it runs as a foreachBatch epilogue exactly like the HTTP
    * threshold stream's mean join). Auth and content events merge
    * into ONE keyed aggregate (the per-src content-presence flag
    * rides the same state as the enumeration counters); distinct
    * emails are counted exactly BELOW `cfg.resolvedDistinctStateCap`
    * and saturate AT it (the bounded k-min counter; 0 opts back into
    * unbounded exact collect_set) and the single-endpoint gate runs
    * as a constant-state min==max equality, so every gate decides
    * identically to the batch twin at the threshold boundary, and the
    * emitted count agrees with it for any key under the cap.
    * `onAlerts` receives each finalized batch's alert rows.
    *
    * `statePath`, when set, makes the suppression gate RESTART-SAFE:
    * the (key → lastTs, lastCount) map is snapshotted to parquet
    * after every batch that changes it and restored when a new query
    * is built over the same path — matching the reference, where
    * AlertSuppressorCount's per-key Beam state is durable in Dataflow
    * and keeps suppressing across worker restarts. Without a
    * statePath the map is query-scoped (decisions reset on restart,
    * WEAKER than the reference — use a statePath in production). */
  def enumerationAlertStream(lines: Dataset[String],
      cfg: FullConfig = FullConfig(),
      watermarkDelay: String = "30 seconds",
      statePath: Option[String] = None)(onAlerts: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.streaming.OutputMode
    require(cfg.resolvedDistinctStateCap == 0 ||
      cfg.resolvedDistinctStateCap >= cfg.enumerationThreshold,
      s"distinctStateCap=${cfg.resolvedDistinctStateCap} below " +
        s"enumerationThreshold=${cfg.enumerationThreshold}: a saturated " +
        "count could no longer decide the gate")
    // AlertSuppressorCount(600) state (ref
    // CustomsAccountEnumeration.java:153): one (lastTs, lastCount)
    // pair per source that has ALERTED — bounded by the alert volume,
    // not the traffic, and pruned once provably stale (see below).
    // The scan runs on the driver over the batch's collected alert
    // rows: alerts are already thresholded window aggregates (a
    // handful per batch by design), the same documented
    // bounded-summary class as budgetSelect's boundary row.
    val suppressState =
      scala.collection.mutable.Map[String, (Long, Long)]()
    statePath.foreach { p =>
      // heal-then-read through the path's Hadoop FS (hdfs/s3a/local
      // alike) with the declared schema — an absent or half-swapped
      // snapshot restores as empty, never as a construction failure
      graft.sinks.Sinks.readSnapshotOr(lines.sparkSession, p,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("key",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("last_ts_ms",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("last_count",
              org.apache.spark.sql.types.LongType))))
        .collect().foreach { r =>
          suppressState(r.getAs[String]("key")) =
            (r.getAs[Long]("last_ts_ms"), r.getAs[Long]("last_count"))
        }
    }
    val expiryMs = 600000L
    // prune clock: append mode finalizes a window only once the
    // watermark passes its END, so every future alert's latest-event
    // stamp sits past (max finalized window start) — an entry more
    // than `expiry` older than that can only ever hit the
    // emit-regardless expiry path and is decision-irrelevant
    var maxWindowStartMs = Long.MinValue
    val parsedAll = Parser.parse(lines.filter(
      Parser.fastFilter("fxaauth") || Parser.fastFilter("fxacontent"))).toDF()
    val auth = parsedAll.filter(col("payloadType") === "fxaauth")
      .select(col("timestamp"),
        col("normalized.sourceAddress").as("src"),
        element_at(col("fields"), "email").as("email"),
        element_at(col("fields"), "path").as("path"),
        (element_at(col("fields"), "event_summary").isin(
          "accountStatusCheckSuccess", "accountStatusCheckBlocked"))
          .as("is_sc"),
        lit(false).as("is_content"))
    val content = parsedAll.filter(col("payloadType") === "fxacontent")
      .select(col("timestamp"),
        col("normalized.sourceAddress").as("src"),
        lit(null).cast("string").as("email"),
        lit(null).cast("string").as("path"),
        lit(false).as("is_sc"),
        lit(true).as("is_content"))
    val perSrc = auth.unionByName(content)
      .filter(col("src").isNotNull)
      .withWatermark("timestamp", watermarkDelay)
      .groupBy(window(col("timestamp"), cfg.window), col("src"))
      .agg(
        count(when(col("is_sc"), 1)).as("n_checks"),
        // the single-endpoint gate only asks whether distinct paths
        // == 1, which min == max answers EXACTLY in constant state
        // (countDistinct(path) = 1 iff >= 1 non-null path and
        // min == max) — no sketch tolerance at the sharpest gate
        (count(col("path")) > 0 &&
          min(col("path")) === max(col("path")))
          .as("single_path"),
        // EXACT distinct emails, not HLL++: the alert count feeds the
        // emit-on-count-change suppressor and the >= threshold gate,
        // both of which must agree with the batch twin at the
        // boundary. State per (window, src) is the distinct-email
        // set — the enumeration being measured, which is also
        // attacker-controlled fan-out: cfg.distinctStateCap bounds it
        // (exact below the cap, saturating at it)
        distinctCount(when(col("is_sc"), col("email")),
          cfg.resolvedDistinctStateCap).as("n_emails"),
        max(when(col("is_content"), 1).otherwise(0)).as("has_content"),
        // the reference's alert stamp: latest qualifying status-check
        // event (CustomsAccountEnumeration.java:138) — the suppression
        // clock, NOT the window boundary
        unix_millis(max(when(col("is_sc"), col("timestamp"))))
          .as("latest_ts_ms"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("src"), col("n_checks"), col("single_path"), col("n_emails"),
        col("has_content"), col("latest_ts_ms"))
    perSrc.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val b = batch.toDF()
        // the reference's side-input size gate: a window below the
        // variance-client floor produces no alerts at all
        val qualifying = b.filter(col("has_content") === 1)
          .groupBy(col("window_start_ms"))
          .agg(countDistinct(col("src")).as("n_clients"))
          .filter(col("n_clients") >= cfg.minVarianceClients)
          .select(col("window_start_ms"))
        val alerts = streamAlert(
          b.filter(col("has_content") === 0 &&
              col("n_checks") >= cfg.enumerationThreshold &&
              col("single_path") &&
              col("n_emails") >= cfg.enumerationThreshold)
            .join(broadcast(qualifying), Seq("window_start_ms"), "left_semi"),
          "account_enumeration", "sourceaddress", col("src"),
          col("n_emails"), col("latest_ts_ms"))
        // count-aware suppression, same decisions as the batch twin's
        // suppressCountGate: emit iff no state, strictly past expiry,
        // or the count changed; overwrite state on every emission.
        // The clock is the alert's latest-qualifying-event stamp
        // (alert_ts_ms carries it, exactly like the batch twin)
        val rows = alerts.collect()
        val wstarts = batch.toDF().agg(max(col("window_start_ms")))
          .collect().headOption.flatMap(r =>
            if (r.isNullAt(0)) None else Some(r.getLong(0)))
        val (survivors, changed) = suppressState.synchronized {
          val before = suppressState.size
          val kept = rows.sortBy(r => (r.getAs[String]("key"),
              r.getAs[Long]("alert_ts_ms"),
              r.getAs[Long]("count")))
            .filter { r =>
              val (k, t, c) = (r.getAs[String]("key"),
                r.getAs[Long]("alert_ts_ms"), r.getAs[Long]("count"))
              val emit = suppressState.get(k) match {
                case None => true
                case Some((st, sc)) => t - st > expiryMs || sc != c
              }
              if (emit) suppressState(k) = (t, c)
              emit
            }
          // prune decision-irrelevant entries (see clock note above)
          wstarts.foreach { w => maxWindowStartMs = math.max(maxWindowStartMs, w) }
          if (maxWindowStartMs != Long.MinValue)
            suppressState.filterInPlace((_, v) =>
              maxWindowStartMs - v._1 < expiryMs)
          (kept, kept.nonEmpty || suppressState.size != before)
        }
        statePath.foreach { p =>
          if (changed) {
            val snap = suppressState.synchronized(suppressState.toSeq)
            val ss = b.sparkSession
            import ss.implicits._
            // two-rename swap: a crash mid-overwrite must not lose the
            // whole suppression state (Sinks.atomicSnapshotSwap heals
            // its own window on the next write or restore)
            graft.sinks.Sinks.atomicSnapshotSwap(
              snap.map { case (k, (t, c)) => (k, t, c) }
                .toDF("key", "last_ts_ms", "last_count"), p)
          }
        }
        onAlerts(b.sparkSession.createDataFrame(
          b.sparkSession.sparkContext.parallelize(survivors.toSeq, 1),
          alerts.schema))
      }
  }

  /** Streaming at-risk login-failure chain — comparator flags and
    * login failures feed the keyed
    * [[graft.streaming.Streaming.atRiskAccountsTws]] state kernel
    * (the reference's Datastore `ScannedByEntry` written by the
    * status comparator and read by the lfara transform). Sibling of
    * [[analyzeStreamFull]] because per-key transformWithState is a
    * different state family than its windowed aggregates. */
  def atRiskAlertStream(lines: Dataset[String],
      cfg: FullConfig = FullConfig()): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    import graft.streaming.Streaming
    val fxa = fxaStreamFields(lines)
      .filter(col("src").isNotNull && col("email").isNotNull)
    val monitored = typedLit(cfg.monitoredAddrs)
    val ev = fxa.select(col("email").as("key"),
        unix_micros(col("timestamp")).as("tsUs"),
        when(col("summary") === "accountStatusCheckSuccess" &&
            array_contains(monitored, col("src")), "flag")
          .when(col("summary") === "loginFailure", "fail")
          .as("kind"))
      .filter(col("kind").isNotNull)
      .as[Streaming.AccountEvent]
    streamAlert(Streaming.atRiskAccountsTws(ev).toDF(),
      "login_failure_at_risk_account", "email", col("key"), lit(1),
      col("tsUs") / 1000)
  }
}
