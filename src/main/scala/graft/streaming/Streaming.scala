package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming forms of the engine's core operators
  * (SURVEY.md §2.4, §2.6). The batch forms (graft.operators) and these
  * share semantics; streaming adds watermarks, incremental state and
  * output modes:
  *
  *  - fixed windows + watermark ↔ ref fixed windows w/ lateness 0
  *    (s/httprequest/HTTPRequest.java:82-89, :162)
  *  - session_window ↔ ref 45-min-gap sessions (:151-163); the
  *    reference's accumulating early-fired panes map to update mode +
  *    downstream suppression (SURVEY.md §2.4 design note)
  *  - flatMapGroupsWithState ↔ ref AlertSuppressor keyed ValueState +
  *    processing-time Timer (s/alert/AlertSuppressor.java:53-143)
  *
  * Scale notes: all aggregations below are incremental — state is
  * partitioned by (window, key) / session / key across executors, and
  * watermarks bound state growth. The suppressor's state is one long
  * per key, with a processing-time TTL exactly like the reference's
  * expiry timer.
  */
object Streaming {

  /** Hard-limit heuristic, streaming form: tumbling event-time window
    * + watermark; run in update mode for early firings. */
  def windowedHardLimit(df: DataFrame, tsName: String, key: Column,
      duration: String, watermarkDelay: String, limit: Long): DataFrame =
    df.withWatermark(tsName, watermarkDelay)
      .groupBy(window(col(tsName), duration), key.as("key"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > limit)
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("key"), col("n"))

  /** Threshold heuristic, streaming (SURVEY.md §2.5 design note (b) —
    * the reference's per-window singleton side input): windowed
    * per-key counts run as ONE stateful aggregate in append mode;
    * when the watermark crosses a window, ALL of that window's keys
    * finalize in the same micro-batch, so the per-window mean and the
    * threshold comparison are a plain batch aggregation+join inside
    * foreachBatch. (A chained agg→agg→stream-join formulation is
    * accepted by Spark 4 but the join treats the agg outputs — whose
    * event time lags the watermark by construction — as late rows and
    * drops them; the foreachBatch form is both correct and cheaper:
    * one state store instead of three.)
    * Returns a DataStreamWriter; `onBatch` receives finalized alert
    * rows (window_start_ms, key, n, mean_n). */
  def thresholdStream(df: DataFrame, tsName: String, key: Column,
      duration: String, watermarkDelay: String, modifier: Double)(
      onBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val perKey = df.withWatermark(tsName, watermarkDelay)
      .groupBy(window(col(tsName), duration), key.as("key"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("key"), col("n"))
    perKey.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val b = batch.toDF()
        val mean = b.groupBy(col("window_start_ms"))
          .agg(avg(col("n")).as("mean_n"))
        onBatch(b.join(broadcast(mean), Seq("window_start_ms"))
          .filter(col("n") >= col("mean_n") * modifier))
      }
  }

  /** Gap-based session summary, streaming form (native session_window
    * keyed state). Append mode emits a session only once its gap has
    * passed the watermark — the "final pane" semantics. */
  def sessionSummary(df: DataFrame, tsName: String, key: Column,
      gap: String, watermarkDelay: String): DataFrame =
    df.withWatermark(tsName, watermarkDelay)
      .groupBy(session_window(col(tsName), gap), key.as("key"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_millis(col("session_window.start")).as("session_start_ms"),
        unix_millis(col("session_window.end")).as("session_end_ms"),
        col("key"), col("n_events"))

  /** Per-endpoint error rate over native session windows — the
    * streaming twin of
    * [[graft.operators.HttpHeuristics.perEndpointErrorRateSessions]]
    * (ref PerEndpointErrorRateAnalysis fed by
    * KeyAndWindowForSessionsFireEarly). Input must already be
    * filtered to client errors; one `session_window` keyed state per
    * (addr, session), conditional counts per rule, first-index-wins
    * argmax. Append mode emits a session once the watermark passes
    * its gap — the reference's final-pane semantics;
    * `window_max_ts_ms` (session end − 1 ms) matches the batch form's
    * last-event + gap − 1 ms. */
  def perEndpointErrorRateStream(df: DataFrame, tsName: String,
      addr: Column, method: Column, path: Column, gap: String,
      watermarkDelay: String,
      rules: Seq[graft.operators.HttpHeuristics.ErrorRule]): DataFrame = {
    val base = df.select(col(tsName).as("__ts"), addr.as("addr"),
        method.as("__m"), path.as("__p"))
      .filter(col("addr").isNotNull)
      .withWatermark("__ts", watermarkDelay)
    val matches = rules.map(r =>
      col("__m") === r.method && col("__p").rlike("^(?:" + r.path + ")$"))
    val counts = rules.indices.map(i =>
      count(when(matches(i), 1)).as(s"n_$i"))
    val latest = rules.indices.map(i =>
      max(when(matches(i), unix_millis(col("__ts")))).as(s"t_$i"))
    val aggs = counts ++ latest
    val grouped = base
      .groupBy(session_window(col("__ts"), gap), col("addr"))
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
      .select(
        unix_millis(col("session_window.start")).as("session_start_ms"),
        col("addr"),
        rules.indices.foldLeft(lit(null).cast("string")) { (acc, i) =>
          when(col("best") === i, rules(i).method).otherwise(acc) }
          .as("rule_method"),
        rules.indices.foldLeft(lit(null).cast("string")) { (acc, i) =>
          when(col("best") === i, rules(i).path).otherwise(acc) }
          .as("rule_path"),
        rules.indices.foldLeft(lit(null).cast("long")) { (acc, i) =>
          when(col("best") === i, col(s"n_$i")).otherwise(acc) }
          .as("n_errors"),
        rules.indices.foldLeft(lit(null).cast("long")) { (acc, i) =>
          when(col("best") === i, col(s"t_$i")).otherwise(acc) }
          .as("latest_error_ms"),
        (unix_millis(col("session_window.end")) - 1)
          .as("window_max_ts_ms"))
  }

  /** Streaming exact dedup: first occurrence of each content hash
    * passes, replays are dropped; watermark bounds the dedup state to
    * the lateness horizon (the unbounded-corpus twin of the batch
    * exactDedup hash-groupBy). */
  def dedupStream(df: DataFrame, tsName: String, content: Column,
      watermarkDelay: String): DataFrame =
    df.withColumn("content_hash", md5(content))
      .withWatermark(tsName, watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Windowed per-key distinct-cardinality monitor on the KMV sketch —
    * the streaming form of [[graft.operators.Heuristics.kmvDistinct]]
    * for HIGH-cardinality regimes, completing the distinct-count
    * triad: exact `collect_set` where decision parity demands it (the
    * customs gates — state linear in the measured fan-out),
    * `approx_count_distinct` where only Spark ever reads the number,
    * and THIS where state must stay bounded at any cardinality AND
    * the result must be engine-portable: per (window, key) the state
    * is ≤ k 14-hex hashes (vs HLL's opaque engine-specific registers
    * and collect_set's unbounded set), merged incrementally across
    * micro-batches by the same order-insensitive
    * [[graft.functions.KMinValuesAggregator]] the batch form uses —
    * so a finalized window's sketch (and estimate) is BIT-IDENTICAL
    * to the batch kmvDistinct over the same events, regardless of how
    * the stream was micro-batched (StreamingSpec pins the
    * equivalence). Append mode: rows emit once the watermark passes
    * the window end.
    *
    * Output: (window_start_ms, key, n_kept, est_distinct) — the batch
    * twin's schema plus the window column. */
  def kmvCardinalityStream(df: DataFrame, tsName: String, key: Column,
      value: Column, windowDuration: String, watermarkDelay: String,
      k: Int = 32): DataFrame = {
    require(k >= 3 && k <= 64, "k must be in [3, 64]")
    val num = (k - 1).toLong * 72057594037927936L // (k-1) * 2^56
    val kmin = udaf(new graft.functions.KMinValuesAggregator(k))
    df.select(col(tsName), key.as("key"),
        substring(md5(value.cast("string")), 1, 14).as("h"))
      .filter(col("h").isNotNull)
      .withWatermark(tsName, watermarkDelay)
      .groupBy(window(col(tsName), windowDuration), col("key"))
      .agg(kmin(col("h")).as("mins"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("key"),
        size(col("mins.items")).cast("long").as("n_kept"),
        try_element_at(col("mins.items"), lit(k)).as("kth"))
      .select(col("window_start_ms"), col("key"), col("n_kept"),
        when(col("kth").isNull, col("n_kept"))
          .otherwise(expr(
            s"$num DIV greatest(CAST(conv(kth, 16, 10) AS BIGINT), 1L)"))
          .as("est_distinct"))
  }

  /** Streaming eval-set maintenance — the windowed form of
    * [[graft.operators.Sampling.hashReservoir]]: a STANDING exact-k
    * per-(window, stratum) uniform draw over a continuously-ingested
    * corpus (the k smallest md5(id) win, a pure function of the
    * window's id set). Same machinery as [[kmvCardinalityStream]]
    * with the (hash, id) buffer encoding
    * ([[graft.operators.Sampling.reservoirKey]] — which also carries
    * the id contract: null/negative/non-castable ids raise): state
    * per (window, stratum) is ≤ k 31-char entries regardless of how
    * many documents arrive, merged incrementally across micro-batches
    * by the order-insensitive bounded aggregator, so a finalized
    * window's draw is BIT-IDENTICAL to the batch hashReservoir over
    * the same rows no matter how the stream was micro-batched or how
    * many times an id was replayed (StreamingSpec pins both). Append
    * mode: each window's sample emits once the watermark passes its
    * end — exactly when an eval-set snapshot should become visible.
    *
    * Id-contract failure mode — choose it deliberately: with the
    * default strict contract, ONE invalid id (null / negative /
    * non-castable) is a POISON PILL — `reservoirKey` raises, the
    * micro-batch fails, and a restart replays the same offsets and
    * fails again, an unbounded outage from a single bad record in a
    * continuously-ingested corpus (batch jobs want exactly this
    * loudness; a standing monitor usually does not). `lenient = true`
    * trades the hard stop for loud-but-recoverable: invalid ids are
    * DROPPED before the aggregate and surface per micro-batch as the
    * observed metric `reservoir_id_violations` (Dataset.observe →
    * QueryProgressEvent.observedMetrics) for the operator to alarm
    * on — note a dropped id means that window's draw is over the
    * VALID ids only, no longer bit-identical to a batch run that
    * would have raised.
    *
    * Output: (window_start_ms, stratum, rank, id), rank 1..k in hash
    * order. */
  def hashReservoirStream(df: DataFrame, tsName: String,
      stratum: Column, id: Column, windowDuration: String,
      watermarkDelay: String, k: Int,
      lenient: Boolean = false): DataFrame = {
    require(k >= 1 && k <= 4096, "k must be in [1, 4096]")
    val kmin = udaf(new graft.functions.KMinValuesAggregator(k))
    val keyed = df.select(col(tsName), stratum.as("stratum"),
      (if (lenient) graft.operators.Sampling.reservoirKeyLenient(id)
       else graft.operators.Sampling.reservoirKey(id)).as("hk"))
    val checked =
      if (!lenient) keyed
      else keyed
        .observe("reservoir_contract",
          count(when(col("hk").isNull, 1)).as("reservoir_id_violations"))
        .filter(col("hk").isNotNull)
    checked
      .withWatermark(tsName, watermarkDelay)
      .groupBy(window(col(tsName), windowDuration), col("stratum"))
      .agg(kmin(col("hk")).as("mins"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("stratum"),
        posexplode(col("mins.items")).as(Seq("pos", "item")))
      .select(col("window_start_ms"), col("stratum"),
        (col("pos") + 1).cast("long").as("rank"),
        graft.operators.Sampling.reservoirId(col("item")).as("id"))
  }

  /** Streaming language-mix monitor — the ingestion-drift view a
    * multilingual corpus build watches (is the crawl's language mix
    * moving?): classify each arriving document with the PRE-TRAINED
    * [[graft.operators.TextAnalysis.langIdModel]] and count docs per
    * (window, predicted language) under the watermark. Classification
    * is per-ROW (a streaming document is one row, so the batch form's
    * per-doc gram aggregate is the wrong shape here — the
    * [[graft.operators.TextAnalysis.langIdKernel]] runs as a plain
    * Scala function, the parser precedent), which keeps the only
    * stateful operator the windowed count: bounded state
    * (|windows in horizon| · |langs| rows), append-mode emission on
    * finalize. Kernel ≡ declarative-langId equivalence is pinned by
    * spec, so a finalized window's counts equal the batch twin
    * (q162's shape) over the same documents.
    *
    * Output: (window_start_ms, pred_lang, n_docs). */
  def langIdStream(df: DataFrame, tsName: String, text: Column,
      model: Map[String, Map[String, Long]], penalty: Int, d: Int,
      windowDuration: String, watermarkDelay: String,
      maxChars: Int = 4096): DataFrame = {
    require(model.nonEmpty, "model must carry at least one language")
    val classify = udf((t: String) =>
      graft.operators.TextAnalysis.langIdKernel(model, penalty, d,
        maxChars)(t).map(_._1))
    df.select(col(tsName), classify(text).as("pred_lang"))
      .filter(col("pred_lang").isNotNull) // gramless docs: unclassifiable
      .withWatermark(tsName, watermarkDelay)
      .groupBy(window(col(tsName), windowDuration), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("pred_lang"), col("n_docs"))
  }

  /** Streaming language-mix DRIFT alert — [[langIdStream]]'s windowed
    * counts compared window-over-window (the monitor on top of the
    * monitor: q164's composition as a standing query). Drift needs
    * each window's PREDECESSOR, which finalized in an EARLIER
    * micro-batch, so the compare runs as a foreachBatch epilogue over
    * finalized windows (the enumerationAlertStream pattern) with a
    * driver-side carry of the trailing window's counts — bounded by
    * ≤ 2·|langs| entries after pruning, the documented
    * bounded-summary class (finalized windowed aggregates, a handful
    * per batch). The compare itself IS
    * [[graft.operators.TextAnalysis.langMixDrift]] run on a local
    * (carry ∪ batch) frame — ONE implementation, so streaming alerts
    * cannot drift from the batch twin (StreamingSpec pins parity).
    * Each window alerts exactly once: in the batch that finalizes it
    * (append mode finalizes a window once; its predecessor finalized
    * no later, so it is always present in carry-or-batch — a missing
    * predecessor is a genuinely empty window, the reference's
    * empty-half skip).
    *
    * `onAlerts` receives each batch's alert rows (possibly empty):
    * (window_start_ms, pred_lang, old_n, new_n, pct_change,
    * severity). */
  def langMixDriftStream(df: DataFrame, tsName: String, text: Column,
      model: Map[String, Map[String, Long]], penalty: Int, d: Int,
      windowMs: Long, watermarkDelay: String, warnPct: Int,
      critPct: Int, minCount: Long, maxChars: Int = 4096)
      (onAlerts: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.streaming.OutputMode
    require(windowMs > 0, "windowMs must be positive")
    val counts = langIdStream(df, tsName, text, model, penalty, d,
      s"$windowMs milliseconds", watermarkDelay, maxChars)
    val carry = scala.collection.mutable.Map[(Long, String), Long]()
    counts.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = batch.collect()
        if (rows.nonEmpty) {
          val sp = batch.sparkSession
          rows.foreach { r =>
            carry((r.getLong(0), r.getString(1))) = r.getLong(2)
          }
          // only THIS batch's newly-finalized windows can alert;
          // their predecessors are in the carry (or this batch)
          val wsSet = rows.map(_.getLong(0)).toSet
          val local = sp.createDataFrame(
            java.util.Arrays.asList(carry.collect {
              case ((ws, l), n) if wsSet(ws) || wsSet(ws + windowMs) =>
                org.apache.spark.sql.Row(ws, l, n)
            }.toSeq: _*),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("window_start_ms",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("pred_lang",
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("n_docs",
                org.apache.spark.sql.types.LongType))))
          onAlerts(graft.operators.TextAnalysis.langMixDrift(
              local, windowMs, warnPct, critPct, minCount)
            .filter(col("window_start_ms").isin(wsSet.toSeq: _*)))
          // prune: windows finalize in watermark order, so any entry
          // older than the newest finalized window can only ever be
          // the predecessor of an ALREADY-finalized one
          val maxWs = carry.keys.map(_._1).max
          carry.filterInPlace { case ((ws, _), _) => ws >= maxWs }
        }
        ()
      }
  }

  /** Streaming quality-mix monitor — the SHIPPED LLR classifier
    * ([[graft.operators.TextAnalysis.llrTrain]] /
    * `loadLlrModel`) applied to an unbounded document stream: per
    * window, how many incoming docs the frozen model predicts
    * high- vs low-quality (the "is the crawl's quality collapsing"
    * standing monitor, the drift-stream's sibling on the quality
    * axis).
    *
    * Shape: the model joins as a STREAM-STATIC join on the token key
    * — the langIdStream collect-a-Map approach would NOT scale here
    * (the classifier is VOCABULARY-sized where the lang model is
    * |langs|·m-bounded), so the declarative join is load-bearing,
    * not a style choice. The class totals DO collect eagerly (2
    * scalars, self-contained in the model — llrTrain's contract).
    * Per-doc score aggregation is the first stateful operator
    * (windowed, doc-keyed — watermark-evicted), the quality-mix
    * count the second, grouped on the SAME time window — the
    * chained-windowed-aggregation pattern Spark supports in Append
    * mode. Token scoring is [[graft.operators.TextAnalysis]]'s exact
    * integer LLR, so finalized windows are bit-identical to the
    * batch twin (`llrScoreWith` + a window rollup — spec-pinned).
    *
    * Output: (window_start_ms, pred_quality, n_docs). */
  def qualityMixStream(df: DataFrame, tsName: String, id: Column,
      text: Column, model: DataFrame, windowDuration: String,
      watermarkDelay: String): DataFrame = {
    val totalRow = model
      .agg(sum(col("c_pos")).as("t_pos"), sum(col("c_neg")).as("t_neg"))
      .collect()(0)
    val (tPos, tNeg) = (totalRow.getLong(0), totalRow.getLong(1))
    require(tPos > 0 && tNeg > 0,
      "model must carry positive mass in both classes")
    df.withWatermark(tsName, watermarkDelay)
      .select(col(tsName).as("__ts"), id.as("doc_id"),
        explode(graft.operators.Dedup.tokens(text)).as("tok"))
      .join(model.select(col("tok"), col("c_pos"), col("c_neg")),
        Seq("tok"), "left")
      .select(col("__ts"), col("doc_id"),
        graft.operators.TextAnalysis.llrTokenScore(col("c_pos"),
          col("c_neg"), lit(tPos), lit(tNeg)).as("s"))
      .groupBy(window(col("__ts"), windowDuration), col("doc_id"))
      .agg(sum(col("s")).as("score"))
      .select(col("window"), (col("score") > 0).as("pred_quality"))
      .groupBy(col("window"), col("pred_quality"))
      .agg(count(lit(1)).as("n_docs"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("pred_quality"), col("n_docs"))
  }

  /** Streaming key-skew monitor — the in-flight form of
    * [[graft.operators.Skew.keySkewCardBy]]: per-window per-key
    * counts under a watermark (Append mode — a window's counts
    * finalize exactly once, together), with a foreachBatch epilogue
    * folding each finalized window's counts into its skew card and
    * handing the card rows to `onCards`. The NAT-flood alarm is the
    * card itself: `hot_fold_x1000` crossing a provisioning threshold
    * says one key is concentrating the stream WHILE it happens, not
    * at the post-mortem. State is the ordinary (window × key)
    * aggregation state every windowed keyed query carries, bounded by
    * the watermark horizon; the card math adds none (it runs on the
    * already-finalized batch, a bounded |windows × keys|-row frame).
    * Finalized cards are bit-identical to the batch twin on the same
    * lines (q168_key_skew_windows; StreamingSpec pins the parity)
    * because finalized counts are exact and the card is a
    * deterministic function of them.
    *
    * Key contract: the RAW key is grouped (never pre-cast here — a
    * `cast("long")` before the groupBy would, under non-ANSI
    * semantics, silently null every non-castable key BEFORE the
    * card's checked cast could fire, merging the whole stream onto
    * the card's null sentinel and fabricating one giant hot key),
    * so the epilogue's [[graft.operators.Skew.keySkewCardOfCounts]]
    * applies the same loud contract as the batch cards: null keys
    * count under the reserved sentinel, a non-castable key (a string
    * source IP) RAISES with the xxhash64 remediation. */
  def keySkewStream(df: DataFrame, tsName: String, key: Column,
      windowDuration: String, watermarkDelay: String, topK: Int = 10)
      (onCards: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val counts = df.withWatermark(tsName, watermarkDelay)
      .groupBy(window(col(tsName), windowDuration),
        key.as("k"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("k"), col("n"))
    counts.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) onCards(keySkewEpilogue(batch.toDF(), topK))
        ()
      }
  }

  /** [[keySkewStream]]'s foreachBatch epilogue as a NAMED batch
    * function: finalized (window_start_ms, k, n) counts → one skew
    * card per window. Extracted so the exact code the stream runs is
    * also driver-visible and oracle-hashed — q177 feeds it
    * batch-finalized counts and shares q168's oracle verbatim, so a
    * refactor that drifted the epilogue's semantics would
    * hash-mismatch at the gate instead of only failing the
    * streaming parity spec. */
  def keySkewEpilogue(counts: DataFrame, topK: Int = 10): DataFrame =
    graft.operators.Skew.keySkewCardOfCounts(counts,
        col("window_start_ms"), col("k"), col("n"), topK)
      .withColumnRenamed("stratum", "window_start_ms")

  /** Config-tick source (ref s/metrics/CfgTickGenerator.java:13,59 —
    * the unbounded generator emitting pipeline-config JSON every N s):
    * a `rate` stream projected onto the config literal. Union into the
    * input stream so downstream detectors see periodic heartbeats. */
  def cfgTickStream(spark: org.apache.spark.sql.SparkSession,
      intervalSeconds: Int, configJson: String): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", "1") // rate's floor; thinned below
      .load()
      .filter(pmod(unix_seconds(col("timestamp")), lit(intervalSeconds)) === 0)
      .select(col("timestamp"),
        lit("cfgtick").as("payload_type"),
        lit(configJson).as("value"))

  // -- stateful suppression ---------------------------------------------

  case class Keyed(key: String, tsUs: Long)
  case class Emitted(key: String, tsUs: Long)
  case class SuppressState(lastEmitUs: Long)
  case class KeyedCount(key: String, tsUs: Long, count: Long)
  case class EmittedCount(key: String, tsUs: Long, count: Long)
  case class CountState(lastEmitUs: Long, lastCount: Long)

  /** Streaming AlertSuppressor: per key, emit the first element, then
    * suppress until `expirySeconds` after the last emitted element;
    * state carries one timestamp per key. With `stateTtlSeconds > 0`
    * the state is dropped after that much processing-time silence (the
    * reference's expiry+60s cleanup timer) — use it together with a
    * processing-time trigger in production; the default (0 = no
    * timeout) keeps micro-batches purely data-driven, which is what
    * tests and bounded replays want (timeout timers make the engine
    * schedule continuous empty batches). Within a micro-batch elements
    * are processed in event-time order. */
  def suppress(ds: Dataset[Keyed], expirySeconds: Long,
      stateTtlSeconds: Long = 0): Dataset[Emitted] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val expiryUs = expirySeconds * 1000000L
    val timeoutConf =
      if (stateTtlSeconds > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[SuppressState, Emitted](
        OutputMode.Append(), timeoutConf) {
        (key: String, it: Iterator[Keyed], state: GroupState[SuppressState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var last =
              if (state.exists) state.get.lastEmitUs else Long.MinValue
            val out = Seq.newBuilder[Emitted]
            it.toSeq.sortBy(_.tsUs).foreach { e =>
              if (last == Long.MinValue || e.tsUs - last > expiryUs) {
                last = e.tsUs
                out += Emitted(key, e.tsUs)
              }
            }
            if (last != Long.MinValue) {
              state.update(SuppressState(last))
              if (stateTtlSeconds > 0)
                state.setTimeoutDuration(stateTtlSeconds * 1000)
            }
            out.result().iterator
          }
      }
  }

  /** AlertSuppressor on the Spark 4 `transformWithState` API — the
    * modern replacement for `flatMapGroupsWithState`, and the closest
    * Spark analog of the reference's keyed ValueState + expiry Timer
    * (ref alert/AlertSuppressor.java:53-143): state is a named,
    * per-key `ValueState` with a NATIVE TTL (`TTLConfig`), so the
    * manual processing-time-timeout bookkeeping in `suppress`
    * disappears — the store evicts idle keys itself.
    *
    * Semantics are identical to `suppress` (emit when strictly more
    * than `expirySeconds` past the last emitted element per key — the
    * reference's strict `isExpired`; in-batch
    * elements processed in event-time order) — StreamingSpec pins the
    * two implementations equal on the same input. Requires the RocksDB
    * state store provider (the TTL/transformWithState backend):
    * `spark.sql.streaming.stateStore.providerClass =
    *  ...state.RocksDBStateStoreProvider`. */
  class SuppressProcessor(expiryUs: Long, ttlMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, Keyed, Emitted] {
    @transient private var last:
      org.apache.spark.sql.streaming.ValueState[SuppressState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      val ttl =
        if (ttlMs > 0)
          org.apache.spark.sql.streaming.TTLConfig(
            java.time.Duration.ofMillis(ttlMs))
        else org.apache.spark.sql.streaming.TTLConfig.NONE
      last = getHandle.getValueState[SuppressState]("lastEmit",
        org.apache.spark.sql.Encoders.product[SuppressState], ttl)
    }

    override def handleInputRows(key: String, rows: Iterator[Keyed],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[Emitted] = {
      var lastUs = if (last.exists()) last.get().lastEmitUs else Long.MinValue
      val out = Seq.newBuilder[Emitted]
      rows.toSeq.sortBy(_.tsUs).foreach { e =>
        if (lastUs == Long.MinValue || e.tsUs - lastUs > expiryUs) {
          lastUs = e.tsUs
          out += Emitted(key, e.tsUs)
        }
      }
      if (lastUs != Long.MinValue) last.update(SuppressState(lastUs))
      out.result().iterator
    }
  }

  /** [[SuppressProcessor]] seeded from an initial state dataset — the
    * RESTORE half of the cross-run snapshot design (SURVEY §2.6
    * design point d: the reference's Datastore is replaced by Spark
    * state plus parquet snapshots; a new run must be able to pick up
    * exactly where a snapshotted one stopped). `handleInitialState`
    * runs once per seeded key before any input rows. */
  class SuppressProcessorWithInit(expiryUs: Long, ttlMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        String, Keyed, Emitted, SuppressState] {
    @transient private var last:
      org.apache.spark.sql.streaming.ValueState[SuppressState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      val ttl =
        if (ttlMs > 0)
          org.apache.spark.sql.streaming.TTLConfig(
            java.time.Duration.ofMillis(ttlMs))
        else org.apache.spark.sql.streaming.TTLConfig.NONE
      last = getHandle.getValueState[SuppressState]("lastEmit",
        org.apache.spark.sql.Encoders.product[SuppressState], ttl)
    }

    override def handleInitialState(key: String, st0: SuppressState,
        timerValues: org.apache.spark.sql.streaming.TimerValues): Unit =
      last.update(st0)

    override def handleInputRows(key: String, rows: Iterator[Keyed],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[Emitted] = {
      var lastUs = if (last.exists()) last.get().lastEmitUs else Long.MinValue
      val out = Seq.newBuilder[Emitted]
      rows.toSeq.sortBy(_.tsUs).foreach { e =>
        if (lastUs == Long.MinValue || e.tsUs - lastUs > expiryUs) {
          lastUs = e.tsUs
          out += Emitted(key, e.tsUs)
        }
      }
      if (lastUs != Long.MinValue) last.update(SuppressState(lastUs))
      out.result().iterator
    }
  }

  /** `suppressTws` seeded from a restored state snapshot: semantics
    * identical to an uninterrupted `suppressTws` run whose state at
    * the snapshot point was `initial` (StreamingSpec pins the full
    * stop → snapshot → restore → continue round-trip). */
  def suppressTwsFrom(ds: Dataset[Keyed], expirySeconds: Long,
      initial: Dataset[(String, SuppressState)],
      stateTtlSeconds: Long = 0): Dataset[Emitted] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val mode =
      if (stateTtlSeconds > 0)
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
      else org.apache.spark.sql.streaming.TimeMode.None()
    ds.groupByKey(_.key)
      .transformWithState(
        new SuppressProcessorWithInit(expirySeconds * 1000000L,
          stateTtlSeconds * 1000L),
        mode, OutputMode.Append(),
        initial.groupByKey(_._1).mapValues(_._2))
  }

  /** SNAPSHOT half of the cross-run state design: read a (stopped)
    * transformWithState query's named value state out of its
    * checkpoint through Spark's state-store data source and land it
    * as plain parquet — engine-neutral bytes a later run (or another
    * system entirely, as with the reference's Datastore) can restore
    * from. */
  def snapshotTwsValueState(spark: org.apache.spark.sql.SparkSession,
      checkpointDir: String, stateVarName: String, outPath: String): Unit =
    spark.read.format("statestore")
      .option("path", checkpointDir)
      .option("stateVarName", stateVarName)
      .load()
      .write.mode("overwrite").parquet(outPath)

  /** Restore a [[snapshotTwsValueState]] parquet snapshot of the
    * suppressor's `lastEmit` state into the dataset shape
    * [[suppressTwsFrom]] seeds from. */
  def readSuppressSnapshot(spark: org.apache.spark.sql.SparkSession,
      path: String): Dataset[(String, SuppressState)] = {
    import spark.implicits._
    spark.read.parquet(path)
      .select(col("key.value").as("_1"),
        col("value").cast("struct<lastEmitUs:bigint>").as("_2"))
      .as[(String, SuppressState)]
  }

  /** `suppress` on transformWithState (see SuppressProcessor). TTL is
    * opt-in for the same reason as in `suppress`: it switches the query
    * to processing-time scheduling, which keeps scheduling micro-batches
    * on idle input — right for production, livelocks bounded-replay
    * tests that drain with processAllAvailable. */
  def suppressTws(ds: Dataset[Keyed], expirySeconds: Long,
      stateTtlSeconds: Long = 0): Dataset[Emitted] = {
    val spark = ds.sparkSession
    import spark.implicits._
    // state TTL is a processing-time concept: the engine requires
    // TimeMode.ProcessingTime whenever any state has a TTL configured
    val mode =
      if (stateTtlSeconds > 0)
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
      else org.apache.spark.sql.streaming.TimeMode.None()
    ds.groupByKey(_.key)
      .transformWithState(
        new SuppressProcessor(expirySeconds * 1000000L,
          stateTtlSeconds * 1000L),
        mode,
        OutputMode.Append())
  }

  // -- element-count early firing (assume-role correlation) --------------

  /** One AssumeRole half on the wire (the streaming row shape of
    * [[graft.operators.AuthState.assumeRoleCorrelate]]'s inputs). */
  case class CorrEvent(key: String, tsUs: Long, dk: String,
      fixup: Boolean, cross: Boolean, user: String)
  /** An emitted correlation: the trusting half's timestamp with the
    * trusted side's subject user (the batch operator's output row). */
  case class CorrPair(key: String, tsMs: Long, fixedUser: String)

  /** Cross-account AssumeRole correlation with TRUE element-count
    * early firing — the reference's
    * `AfterPane.elementCountAtLeast(2)` trigger (ref
    * s/authprofile/AwsAssumeRoleCorrelator.java:47-59), which classic
    * Spark windowed aggregation cannot express (SURVEY §7(c)): a
    * session-window aggregate only emits on watermark close, and the
    * prior approximation here was a short processing-time trigger.
    * `transformWithState` CAN express it: state is a per-shared-id
    * buffer of halves seen so far, and a pair is emitted IN THE SAME
    * MICRO-BATCH the completing half arrives — exactly "fire as soon
    * as the pane holds 2 elements", with no watermark involved and no
    * polling. StreamingSpec pins both the early firing (pair emitted
    * in the arrival batch of the second half) and batch-equivalence
    * of the emitted pair set.
    *
    * Dedupe discipline: the reference keeps the FIRST-ARRIVED event
    * per (shared id, event id) — late re-deliveries must not shift or
    * re-fire the pairing (awscorr4) — so a row whose dedupe key is
    * already buffered is dropped on arrival. Within one micro-batch
    * (no arrival order exists) rows process in (tsUs, dk) order for
    * determinism, matching the batch operator's earliest-wins pick.
    * Each pair fires exactly once: new-vs-stored only — stored pairs
    * already fired in their own arrival batch.
    *
    * The per-key buffer holds one row per distinct CloudTrail event
    * id inside one correlation window (2-4 rows in practice); TTL
    * evicts idle shared ids. */
  class AssumeRoleProcessor(gapUs: Long, ttlMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, CorrEvent, CorrPair] {
    @transient private var halves:
      org.apache.spark.sql.streaming.ListState[CorrEvent] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      val ttl =
        if (ttlMs > 0)
          org.apache.spark.sql.streaming.TTLConfig(
            java.time.Duration.ofMillis(ttlMs))
        else org.apache.spark.sql.streaming.TTLConfig.NONE
      halves = getHandle.getListState[CorrEvent]("halves",
        org.apache.spark.sql.Encoders.product[CorrEvent], ttl)
    }

    override def handleInputRows(key: String, rows: Iterator[CorrEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[CorrPair] = {
      val stored = scala.collection.mutable.ArrayBuffer.empty[CorrEvent]
      val it = halves.get()
      while (it.hasNext) stored += it.next()
      val out = Seq.newBuilder[CorrPair]
      rows.toSeq.sortBy(e => (e.tsUs, e.dk)).foreach { e =>
        if (!stored.exists(_.dk == e.dk)) { // first arrival wins
          if (e.fixup) { // trusting half completes against trusteds
            stored.iterator
              .filter(s => !s.fixup && s.cross &&
                math.abs(e.tsUs - s.tsUs) <= gapUs)
              .foreach(s => out += CorrPair(key, e.tsUs / 1000, s.user))
          } else if (e.cross) { // trusted half completes against trustings
            stored.iterator
              .filter(t => t.fixup && math.abs(e.tsUs - t.tsUs) <= gapUs)
              .foreach(t => out += CorrPair(key, t.tsUs / 1000, e.user))
          }
          stored += e
          halves.appendValue(e)
        }
      }
      out.result().iterator
    }
  }

  /** [[AssumeRoleProcessor]] behind the standard wrapper (see
    * suppressTws for the TTL/TimeMode coupling). */
  def assumeRoleCorrelateTws(ds: Dataset[CorrEvent], gapSeconds: Long,
      stateTtlSeconds: Long = 0): Dataset[CorrPair] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val mode =
      if (stateTtlSeconds > 0)
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
      else org.apache.spark.sql.streaming.TimeMode.None()
    ds.groupByKey(_.key)
      .transformWithState(
        new AssumeRoleProcessor(gapSeconds * 1000000L,
          stateTtlSeconds * 1000L),
        mode, OutputMode.Append())
  }

  /** Streaming near-duplicate pair detection — the stream-stream
    * SELF-JOIN form of the batch `Dedup.simhashPairs`: each arriving
    * document is simhashed row-locally (`util.SimHash`, the pure
    * mirror of the batch aggregate — no per-doc shuffle), exploded to
    * its four 8-bit band keys, and joined against the same stream on
    * (band, bkey) within ±`horizon` event time. The watermark plus the
    * time-range join condition let the engine expire band-key state
    * continuously — the standard bounded-state recipe for
    * stream-stream joins — so state is O(docs within horizon /
    * 2^8 per band bucket), not the full history. Candidates are
    * verified by exact 32-bit hamming distance, like the batch form.
    *
    * Input columns: event-time column named `tsName`, doc id, text.
    * Output: (doc_a, doc_b, hamming) with doc_a < doc_b. */
  def simhashNearDupStream(docs: DataFrame, tsName: String, id: Column,
      text: Column, maxHamming: Int, horizon: String,
      watermarkDelay: String): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    // native codegen expression, not a Scala UDF: stays inside
    // whole-stage codegen and null-propagates (null text → null hash,
    // dropped by the equi-join) exactly like the batch operator
    val hashCol = ColumnBridge.column(
      graft.functions.SimHashExpr(ColumnBridge.expression(text)))
    val hashed = docs
      .select(col(tsName).as("ts"), id.as("doc_id"), hashCol.as("simhash"))
      .select(col("ts"), col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bkey",
        pmod((col("simhash") / pow(lit(2.0), col("band") * 8).cast("long"))
          .cast("long"), lit(256L)))
    val x = hashed.toDF("ts_a", "doc_a", "h_a", "band_a", "bkey_a")
      .withWatermark("ts_a", watermarkDelay)
    val y = hashed.toDF("ts_b", "doc_b", "h_b", "band_b", "bkey_b")
      .withWatermark("ts_b", watermarkDelay)
    // doc ordering deliberately uses =!= plus least/greatest, NOT
    // doc_a < doc_b in the join condition: the engine's state-watermark
    // derivation walks every </<=/>/>= predicate of a stream-stream
    // join condition assuming it constrains event time, and a plain
    // attribute comparison makes that walk throw (Unevaluable) —
    // Not(EqualTo) is skipped by it.
    x.join(y,
        col("band_a") === col("band_b") && col("bkey_a") === col("bkey_b") &&
          col("doc_a") =!= col("doc_b") &&
          col("ts_b") >= col("ts_a") - expr(s"INTERVAL $horizon") &&
          col("ts_b") <= col("ts_a") + expr(s"INTERVAL $horizon"))
      .withColumn("hamming",
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"), col("hamming"))
  }
  // ^ emits one row per AGREEING band and orientation (a pair at
  // hamming <= 3 agrees on at least one of the four 8-bit bands by
  // pigeonhole, so recall is total; a pair can emit up to 8 times,
  // canonically ordered via least/greatest). Exact once-per-pair output
  // would chain a second stateful operator (dropDuplicatesWithinWatermark)
  // behind the join — supported by the engine, but the multiplicity is
  // harmless to every downstream use here (pair sets, CC edges are
  // duplicate-idempotent) and one stateful stage keeps state accounting
  // simple.

  case class AccountEvent(key: String, tsUs: Long, kind: String)
  case class AtRiskState(flaggedAtUs: Long)
  case class AtRiskAlert(key: String, tsUs: Long)

  /** Per-batch at-risk scan, shared verbatim by the
    * flatMapGroupsWithState and transformWithState forms. */
  private def atRiskScan(key: String, flagged0: Long,
      events: Seq[AccountEvent]): (Long, Seq[AtRiskAlert]) = {
    var flagged = flagged0
    val out = Seq.newBuilder[AtRiskAlert]
    events.sortBy(_.tsUs).foreach { e =>
      e.kind match {
        case "flag" => flagged = e.tsUs
        case "fail" if flagged != Long.MinValue && e.tsUs >= flagged =>
          out += AtRiskAlert(key, e.tsUs)
        case _ => ()
      }
    }
    (flagged, out.result())
  }

  /** At-risk account tracking (ref s/customs/CustomsAtRiskAccountState
    * + CustomsLoginFailureForAtRiskAccount.java): a `flag` event marks
    * the account at-risk; any later `fail` event while flagged emits
    * an alert. State is one timestamp per flagged account. */
  def atRiskAccounts(ds: Dataset[AccountEvent]): Dataset[AtRiskAlert] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[AtRiskState, AtRiskAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[AccountEvent], state: GroupState[AtRiskState]) =>
          val (flagged, out) = atRiskScan(key,
            if (state.exists) state.get.flaggedAtUs else Long.MinValue,
            it.toSeq)
          if (flagged != Long.MinValue) state.update(AtRiskState(flagged))
          out.iterator
      }
  }

  /** At-risk tracking on transformWithState (see SuppressProcessor for
    * the API rationale): the flagged-at timestamp is a named
    * ValueState with optional native TTL — an account whose at-risk
    * flag goes stale simply ages out of the store, which is exactly
    * the reference's Datastore expiry semantics. Same kernel as
    * `atRiskAccounts`; StreamingSpec pins the equivalence. */
  class AtRiskProcessor(ttlMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, AccountEvent, AtRiskAlert] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[AtRiskState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      val ttl =
        if (ttlMs > 0)
          org.apache.spark.sql.streaming.TTLConfig(
            java.time.Duration.ofMillis(ttlMs))
        else org.apache.spark.sql.streaming.TTLConfig.NONE
      st = getHandle.getValueState[AtRiskState]("flagged",
        org.apache.spark.sql.Encoders.product[AtRiskState], ttl)
    }

    override def handleInputRows(key: String, rows: Iterator[AccountEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[AtRiskAlert] = {
      val (flagged, out) = atRiskScan(key,
        if (st.exists()) st.get().flaggedAtUs else Long.MinValue,
        rows.toSeq)
      if (flagged != Long.MinValue) st.update(AtRiskState(flagged))
      out.iterator
    }
  }

  /** `atRiskAccounts` on transformWithState (see AtRiskProcessor). */
  def atRiskAccountsTws(ds: Dataset[AccountEvent],
      stateTtlSeconds: Long = 0): Dataset[AtRiskAlert] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val mode =
      if (stateTtlSeconds > 0)
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
      else org.apache.spark.sql.streaming.TimeMode.None()
    ds.groupByKey(_.key)
      .transformWithState(new AtRiskProcessor(stateTtlSeconds * 1000L),
        mode, OutputMode.Append())
  }

  case class SeqEvent(key: String, tsUs: Long, seq: Long,
      isFirst: Boolean, isSecond: Boolean)
  case class SeqState(lastFirstUs: Long)
  case class SeqViolation(key: String, tsUs: Long)

  /** Per-batch sequence-abuse kernel, shared verbatim by the
    * flatMapGroupsWithState and transformWithState forms — the same
    * last-first pairing as the batch analytic scan
    * ([[graft.operators.Heuristics.sequenceAbuse]], ref
    * s/httprequest/heuristics/EndpointSequenceAbuse.java:201-233):
    * events scan in (ts, firsts-before-seconds, seq) order; a
    * first-half event advances the tracker (before the second-half
    * test, so a same-timestamp first+second pairs); a second-half
    * event strictly inside `deltaUs` of the tracked last first emits
    * ONE violation — earlier firsts are superseded, never multiplied. */
  private def seqAbuseScan(key: String, lastFirst0: Long, deltaUs: Long,
      events: Seq[SeqEvent]): (Long, Seq[SeqViolation]) = {
    var lastFirst = lastFirst0
    val out = Seq.newBuilder[SeqViolation]
    events.sortBy(e => (e.tsUs, !e.isFirst, e.seq)).foreach { e =>
      if (e.isFirst) lastFirst = e.tsUs
      if (e.isSecond && lastFirst != Long.MinValue &&
        e.tsUs < lastFirst + deltaUs)
        out += SeqViolation(key, e.tsUs)
    }
    (lastFirst, out.result())
  }

  /** Streaming last-first sequence abuse: per-key state is ONE
    * timestamp (the latest first-half event seen), carried across
    * micro-batches. Violations emit as individual rows — the
    * count/threshold the batch form applies per key is a downstream
    * aggregation choice, exactly as the reference applies it inside
    * its session windows. */
  def sequenceAbuseStream(ds: Dataset[SeqEvent],
      deltaMs: Long): Dataset[SeqViolation] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val deltaUs = deltaMs * 1000L
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[SeqState, SeqViolation](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[SeqEvent], state: GroupState[SeqState]) =>
          val (lastFirst, out) = seqAbuseScan(key,
            if (state.exists) state.get.lastFirstUs else Long.MinValue,
            deltaUs, it.toSeq)
          if (lastFirst != Long.MinValue) state.update(SeqState(lastFirst))
          out.iterator
      }
  }

  /** transformWithState twin of [[sequenceAbuseStream]] (see
    * SuppressProcessor for the API rationale). Native TTL is lossless
    * here when >= delta: a tracked first older than delta can never
    * pair again, so aging it out of the store changes nothing. */
  class SequenceAbuseProcessor(deltaUs: Long, ttlMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, SeqEvent, SeqViolation] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[SeqState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      val ttl =
        if (ttlMs > 0)
          org.apache.spark.sql.streaming.TTLConfig(
            java.time.Duration.ofMillis(ttlMs))
        else org.apache.spark.sql.streaming.TTLConfig.NONE
      st = getHandle.getValueState[SeqState]("lastFirst",
        org.apache.spark.sql.Encoders.product[SeqState], ttl)
    }

    override def handleInputRows(key: String, rows: Iterator[SeqEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[SeqViolation] = {
      val (lastFirst, out) = seqAbuseScan(key,
        if (st.exists()) st.get().lastFirstUs else Long.MinValue,
        deltaUs, rows.toSeq)
      if (lastFirst != Long.MinValue) st.update(SeqState(lastFirst))
      out.iterator
    }
  }

  /** `sequenceAbuseStream` on transformWithState. */
  def sequenceAbuseTws(ds: Dataset[SeqEvent], deltaMs: Long,
      stateTtlSeconds: Long = 0): Dataset[SeqViolation] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val mode =
      if (stateTtlSeconds > 0)
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
      else org.apache.spark.sql.streaming.TimeMode.None()
    ds.groupByKey(_.key)
      .transformWithState(
        new SequenceAbuseProcessor(deltaMs * 1000L, stateTtlSeconds * 1000L),
        mode, OutputMode.Append())
  }

  case class GeoLogin(key: String, tsUs: Long, lat: Double, lon: Double)
  case class GeoState(tsUs: Long, lat: Double, lon: Double)
  case class TravelAlert(key: String, tsUs: Long, speedKmh: Long)

  /** Streaming geo-velocity (ref s/authstate/AuthStateModel.java:
    * 241-430 via Datastore; here the per-identity last-location lives
    * in Spark state): each login is compared against the previous one
    * for the same identity; impossible travel speed emits an alert and
    * the state advances to the latest location. Within a micro-batch
    * logins are processed in event-time order, matching the batch
    * (lag-window) operator's semantics. */
  /** Per-batch geo-velocity kernel, shared verbatim by the
    * flatMapGroupsWithState and transformWithState forms so their
    * equivalence holds by construction (and is still spec-pinned). */
  private def geoVelocityScan(key: String, prev0: Option[GeoState],
      events: Seq[GeoLogin], maxKmh: Double)
      : (Option[GeoState], Seq[TravelAlert]) = {
    var prev = prev0
    val out = Seq.newBuilder[TravelAlert]
    events.sortBy(_.tsUs).foreach { e =>
      prev.foreach { p =>
        if (e.tsUs > p.tsUs) {
          val km = graft.util.GeoUtil.haversineKm(p.lat, p.lon, e.lat, e.lon)
          val hours = (e.tsUs - p.tsUs) / 3600.0e6
          val speed = math.floor(km / hours + 0.5).toLong
          if (speed > maxKmh) out += TravelAlert(key, e.tsUs, speed)
        }
      }
      if (prev.forall(_.tsUs <= e.tsUs))
        prev = Some(GeoState(e.tsUs, e.lat, e.lon))
    }
    (prev, out.result())
  }

  def geoVelocity(ds: Dataset[GeoLogin], maxKmh: Double): Dataset[TravelAlert] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[GeoState, TravelAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[GeoLogin], state: GroupState[GeoState]) =>
          val (next, out) = geoVelocityScan(key,
            if (state.exists) Some(state.get) else None, it.toSeq, maxKmh)
          next.foreach(state.update)
          out.iterator
      }
  }

  /** Geo-velocity on the Spark 4 `transformWithState` API (see
    * SuppressProcessor for the API rationale): the per-identity last
    * location is a named `ValueState` with an optional NATIVE TTL —
    * idle identities age out of the store without manual timeout
    * bookkeeping, the semantics the reference gets from Datastore
    * entry pruning (ref s/authstate/AuthStateModel.java:241-430).
    * Same kernel as `geoVelocity`; StreamingSpec pins TWS ≡ fMGWS ≡
    * batch on shared input. Requires the RocksDB state store. */
  class GeoVelocityProcessor(maxKmh: Double, ttlMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, GeoLogin, TravelAlert] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[GeoState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      val ttl =
        if (ttlMs > 0)
          org.apache.spark.sql.streaming.TTLConfig(
            java.time.Duration.ofMillis(ttlMs))
        else org.apache.spark.sql.streaming.TTLConfig.NONE
      st = getHandle.getValueState[GeoState]("lastLoc",
        org.apache.spark.sql.Encoders.product[GeoState], ttl)
    }

    override def handleInputRows(key: String, rows: Iterator[GeoLogin],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TravelAlert] = {
      val (next, out) = geoVelocityScan(key,
        if (st.exists()) Some(st.get()) else None, rows.toSeq, maxKmh)
      next.foreach(st.update)
      out.iterator
    }
  }

  /** `geoVelocity` on transformWithState (see GeoVelocityProcessor).
    * TTL opt-in flips the query to processing-time scheduling — right
    * for production, livelocks bounded-replay tests. */
  def geoVelocityTws(ds: Dataset[GeoLogin], maxKmh: Double,
      stateTtlSeconds: Long = 0): Dataset[TravelAlert] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val mode =
      if (stateTtlSeconds > 0)
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
      else org.apache.spark.sql.streaming.TimeMode.None()
    ds.groupByKey(_.key)
      .transformWithState(
        new GeoVelocityProcessor(maxKmh, stateTtlSeconds * 1000L),
        mode, OutputMode.Append())
  }

  case class VelLogin(key: String, tsUs: Long, addr: String,
      email: String, lat: Double, lon: Double)
  case class VelState(addr: String, tsUs: Long, lat: Double, lon: Double,
      windowId: Long, seen: Seq[String])
  case class VelAlert(key: String, tsUs: Long, addr: String,
      prevAddr: String, tdS: Long, kmCenti: Long)

  /** Streaming CustomsVelocity (ref s/customs/CustomsVelocity.java:
    * 93-351, where state is the Datastore AuthStateModel with
    * PruningStrategyLatest): per uid, each address is considered once
    * per dedupe window; a differing address is compared against the
    * latest state entry (haversine distance, floored-epoch-second
    * delta), alerting when implied speed exceeds `maxKmPerSecond` and
    * the jump covers `minDistanceKm`. State per key = ONE latest
    * entry + the current window's seen-address set; semantics equal
    * the batch operator (CustomsDetectors.velocity), pinned by an
    * equivalence spec. */
  /** Per-batch velocity kernel, shared verbatim by the
    * flatMapGroupsWithState and transformWithState forms. */
  private def velocityScan(key: String, st0: Option[VelState],
      events: Seq[VelLogin], windowUs: Long, maxCentiPerSec: Double,
      minCenti: Double): (Option[VelState], Seq[VelAlert]) = {
    var st = st0
    val out = Seq.newBuilder[VelAlert]
    events.sortBy(e => (e.tsUs, e.addr)).foreach { e =>
      val w = Math.floorDiv(e.tsUs, windowUs)
      val seen: Set[String] = st match {
        case Some(s) if s.windowId == w => s.seen.toSet
        case _ => Set.empty
      }
      if (!seen.contains(e.addr)) {
        st match {
          case Some(s) if s.addr != e.addr =>
            val kmCenti = math.floor(graft.util.GeoUtil
              .haversineKm(s.lat, s.lon, e.lat, e.lon) * 100 + 0.5)
              .toLong
            val tdS = Math.floorDiv(e.tsUs, 1000000L) -
              Math.floorDiv(s.tsUs, 1000000L)
            if (kmCenti >= minCenti && kmCenti > maxCentiPerSec * tdS)
              out += VelAlert(key, e.tsUs, e.addr, s.addr, tdS, kmCenti)
          case _ => ()
        }
        st = Some(VelState(e.addr, e.tsUs, e.lat, e.lon, w,
          (seen + e.addr).toSeq.sorted))
      }
    }
    (st, out.result())
  }

  def customsVelocity(ds: Dataset[VelLogin], maxKmPerSecond: Double,
      minDistanceKm: Double,
      dedupeWindowSeconds: Long = 300): Dataset[VelAlert] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val windowUs = dedupeWindowSeconds * 1000000L
    val maxCentiPerSec = maxKmPerSecond * 100
    val minCenti = minDistanceKm * 100
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[VelState, VelAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[VelLogin], state: GroupState[VelState]) =>
          val (st, out) = velocityScan(key,
            if (state.exists) Some(state.get) else None,
            it.toSeq, windowUs, maxCentiPerSec, minCenti)
          st.foreach(state.update)
          out.iterator
      }
  }

  /** CustomsVelocity on the Spark 4 `transformWithState` API (see
    * SuppressProcessor): latest-entry state with optional native TTL
    * — the reference's Datastore PruningStrategyLatest semantics.
    * Same kernel as `customsVelocity`; spec-pinned equivalent. */
  class VelocityProcessor(windowUs: Long, maxCentiPerSec: Double,
      minCenti: Double, ttlMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, VelLogin, VelAlert] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[VelState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      val ttl =
        if (ttlMs > 0)
          org.apache.spark.sql.streaming.TTLConfig(
            java.time.Duration.ofMillis(ttlMs))
        else org.apache.spark.sql.streaming.TTLConfig.NONE
      st = getHandle.getValueState[VelState]("latest",
        org.apache.spark.sql.Encoders.product[VelState], ttl)
    }

    override def handleInputRows(key: String, rows: Iterator[VelLogin],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[VelAlert] = {
      val (next, out) = velocityScan(key,
        if (st.exists()) Some(st.get()) else None,
        rows.toSeq, windowUs, maxCentiPerSec, minCenti)
      next.foreach(st.update)
      out.iterator
    }
  }

  /** `customsVelocity` on transformWithState (see VelocityProcessor). */
  def customsVelocityTws(ds: Dataset[VelLogin], maxKmPerSecond: Double,
      minDistanceKm: Double, dedupeWindowSeconds: Long = 300,
      stateTtlSeconds: Long = 0): Dataset[VelAlert] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val mode =
      if (stateTtlSeconds > 0)
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
      else org.apache.spark.sql.streaming.TimeMode.None()
    ds.groupByKey(_.key)
      .transformWithState(
        new VelocityProcessor(dedupeWindowSeconds * 1000000L,
          maxKmPerSecond * 100, minDistanceKm * 100,
          stateTtlSeconds * 1000L),
        mode, OutputMode.Append())
  }

  case class RelayEvent(key: String, tsUs: Long, seq: Long,
      eventType: String, realAddress: String)
  case class RelayState(tsUs: Long, seq: Long, addr: String)
  case class RelayAlert(key: String, tsMs: Long, actual: String,
      expected: String)

  /** Per-batch relay-forward kernel, shared by the
    * flatMapGroupsWithState and transformWithState forms: every relay
    * or RP event leaves the state's real address equal to its own
    * hash, and a forward whose hash differs from the known previous
    * value alerts — the reference's Datastore state walk
    * (ref s/customs/PrivateRelayForward.java:114-263), and exactly
    * the batch operator's lag(1) semantics
    * ([[graft.operators.CustomsDetectors.privateRelayForward]],
    * equivalence spec-pinned). State per uid = ONE (ts, seq, addr)
    * entry — bounded regardless of traffic. */
  private def relayScan(key: String, st0: Option[RelayState],
      events: Seq[RelayEvent]): (Option[RelayState], Seq[RelayAlert]) = {
    import graft.operators.CustomsDetectors.{EmailRelay, FxaRpEvent}
    var st = st0
    val out = Seq.newBuilder[RelayAlert]
    events
      .filter(e => e.eventType == EmailRelay || e.eventType == FxaRpEvent)
      .sortBy(e => (e.tsUs, e.seq)).foreach { e =>
        st match {
          case Some(s) if e.eventType == EmailRelay &&
              s.addr != e.realAddress =>
            out += RelayAlert(key, Math.floorDiv(e.tsUs, 1000L),
              e.realAddress, s.addr)
          case _ => ()
        }
        st = Some(RelayState(e.tsUs, e.seq, e.realAddress))
      }
    (st, out.result())
  }

  /** Streaming PrivateRelayForward (flatMapGroupsWithState form).
    * Like the suppress/velocity family: within a micro-batch events
    * are processed in (event-time, seq) order; batches must arrive in
    * time order for cross-batch parity (the watermarked-source
    * contract the other stateful detectors document). */
  def privateRelayForwardStream(ds: Dataset[RelayEvent])
      : Dataset[RelayAlert] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[RelayState, RelayAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[RelayEvent],
            state: GroupState[RelayState]) =>
          val (st, out) = relayScan(key,
            if (state.exists) Some(state.get) else None, it.toSeq)
          st.foreach(state.update)
          out.iterator
      }
  }

  /** PrivateRelayForward on the Spark 4 `transformWithState` API —
    * same kernel, optional native TTL (the reference's state-expiry
    * cleanup). */
  class PrivateRelayProcessor(ttlMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, RelayEvent, RelayAlert] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[RelayState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      val ttl =
        if (ttlMs > 0)
          org.apache.spark.sql.streaming.TTLConfig(
            java.time.Duration.ofMillis(ttlMs))
        else org.apache.spark.sql.streaming.TTLConfig.NONE
      st = getHandle.getValueState[RelayState]("lastAddr",
        org.apache.spark.sql.Encoders.product[RelayState], ttl)
    }

    override def handleInputRows(key: String, rows: Iterator[RelayEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[RelayAlert] = {
      val (next, out) = relayScan(key,
        if (st.exists()) Some(st.get()) else None, rows.toSeq)
      next.foreach(st.update)
      out.iterator
    }
  }

  /** [[privateRelayForwardStream]] on transformWithState (see
    * PrivateRelayProcessor). TTL opt-in flips to processing-time
    * scheduling — right for production, livelocks bounded-replay
    * tests (the suppressTws note). */
  def privateRelayForwardTws(ds: Dataset[RelayEvent],
      stateTtlSeconds: Long = 0): Dataset[RelayAlert] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val mode =
      if (stateTtlSeconds > 0)
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
      else org.apache.spark.sql.streaming.TimeMode.None()
    ds.groupByKey(_.key)
      .transformWithState(
        new PrivateRelayProcessor(stateTtlSeconds * 1000L),
        mode, OutputMode.Append())
  }

  /** [[PrivateRelayProcessor]] seeded from an initial state dataset —
    * the RESTORE half of the cross-run snapshot design for the relay
    * detector (the suppress/velocity/at-risk precedent: the
    * reference's Datastore walk is replaced by Spark keyed state
    * plus crash-safe parquet snapshots, so a new run picks up
    * exactly where a snapshotted one stopped).
    * `handleInitialState` runs once per seeded uid before any input
    * rows. */
  class PrivateRelayProcessorWithInit(ttlMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        String, RelayEvent, RelayAlert, RelayState] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[RelayState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      val ttl =
        if (ttlMs > 0)
          org.apache.spark.sql.streaming.TTLConfig(
            java.time.Duration.ofMillis(ttlMs))
        else org.apache.spark.sql.streaming.TTLConfig.NONE
      st = getHandle.getValueState[RelayState]("lastAddr",
        org.apache.spark.sql.Encoders.product[RelayState], ttl)
    }

    override def handleInitialState(key: String, st0: RelayState,
        timerValues: org.apache.spark.sql.streaming.TimerValues): Unit =
      st.update(st0)

    override def handleInputRows(key: String, rows: Iterator[RelayEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[RelayAlert] = {
      val (next, out) = relayScan(key,
        if (st.exists()) Some(st.get()) else None, rows.toSeq)
      next.foreach(st.update)
      out.iterator
    }
  }

  /** [[privateRelayForwardTws]] seeded from a restored state
    * snapshot: semantics identical to an uninterrupted run whose
    * state at the snapshot point was `initial` (StreamingSpec pins
    * the full stop → snapshot → restore → continue round-trip, the
    * suppressTwsFrom pattern). */
  def privateRelayForwardTwsFrom(ds: Dataset[RelayEvent],
      initial: Dataset[(String, RelayState)],
      stateTtlSeconds: Long = 0): Dataset[RelayAlert] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val mode =
      if (stateTtlSeconds > 0)
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
      else org.apache.spark.sql.streaming.TimeMode.None()
    ds.groupByKey(_.key)
      .transformWithState(
        new PrivateRelayProcessorWithInit(stateTtlSeconds * 1000L),
        mode, OutputMode.Append(),
        initial.groupByKey(_._1).mapValues(_._2))
  }

  /** Restore a [[snapshotTwsValueState]] parquet snapshot of the
    * relay detector's `lastAddr` state into the dataset shape
    * [[privateRelayForwardTwsFrom]] seeds from. */
  def readRelaySnapshot(spark: org.apache.spark.sql.SparkSession,
      path: String): Dataset[(String, RelayState)] = {
    import spark.implicits._
    spark.read.parquet(path)
      .select(col("key.value").as("_1"),
        col("value")
          .cast("struct<tsUs:bigint,seq:bigint,addr:string>").as("_2"))
      .as[(String, RelayState)]
  }

  case class AuthLogin(key: String, tsUs: Long, addr: String,
      lat: Double, lon: Double)
  case class AuthEntry(addr: String, tsUs: Long, lat: Double, lon: Double)
  case class AuthModel(entries: Seq[AuthEntry])
  case class AuthAction(key: String, tsUs: Long, addr: String,
      action: String, kmCenti: Option[Long], prevAddr: Option[String])

  /** Streaming known-IP state analysis (ref s/authprofile/AuthProfile
    * .java:568-660 + s/authstate/AuthStateModel.java:241-430, where
    * the model lives in Datastore; here it is Spark-managed keyed
    * state). State per identity = the full pruned address model —
    * every source address previously seen with last-touch timestamp
    * and location — NOT just the latest location: a user alternating
    * between home and office must classify known_ip from both.
    * Entry-age pruning (PruningStrategyEntryAge.java:31-44) bounds
    * the state size; within a micro-batch events process in event-time
    * order, matching the batch operator exactly. */
  /** Per-batch known-IP model scan, shared verbatim by the
    * flatMapGroupsWithState and transformWithState forms. */
  private def authStateScan(key: String, model0: Seq[AuthEntry],
      events: Seq[AuthLogin], pruneUs: Long, maxCenti: Double)
      : (Seq[AuthEntry], Seq[AuthAction]) = {
    val entries = scala.collection.mutable.HashMap.empty[String, AuthEntry]
    model0.foreach(e => entries(e.addr) = e)
    val out = Seq.newBuilder[AuthAction]
    events.sortBy(e => (e.tsUs, e.addr)).foreach { e =>
      entries.filterInPlace((_, en) => e.tsUs - en.tsUs <= pruneUs)
      if (entries.contains(e.addr)) {
        entries(e.addr) = AuthEntry(e.addr, e.tsUs, e.lat, e.lon)
        out += AuthAction(key, e.tsUs, e.addr,
          graft.operators.AuthState.KnownIp, None, None)
      } else {
        val prev = if (entries.isEmpty) None
          else Some(entries.values.maxBy(en => (en.tsUs, en.addr)))
        entries(e.addr) = AuthEntry(e.addr, e.tsUs, e.lat, e.lon)
        prev match {
          case None => out += AuthAction(key, e.tsUs, e.addr,
            graft.operators.AuthState.UnknownGeoFailure, None, None)
          case Some(p) =>
            val kmCenti = math.floor(graft.util.GeoUtil
              .haversineKm(p.lat, p.lon, e.lat, e.lon) * 100 + 0.5).toLong
            val action = if (kmCenti > maxCenti)
              graft.operators.AuthState.UnknownOutsideGeo
            else graft.operators.AuthState.UnknownWithinGeo
            out += AuthAction(key, e.tsUs, e.addr, action,
              Some(kmCenti), Some(p.addr))
        }
      }
    }
    (entries.values.toSeq.sortBy(_.addr), out.result())
  }

  def authStateAnalyze(ds: Dataset[AuthLogin], pruneAgeSeconds: Long,
      maxKmStatic: Double): Dataset[AuthAction] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val pruneUs = pruneAgeSeconds * 1000000L
    val maxCenti = maxKmStatic * 100
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[AuthModel, AuthAction](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[AuthLogin], state: GroupState[AuthModel]) =>
          val (model, out) = authStateScan(key,
            if (state.exists) state.get.entries else Nil,
            it.toSeq, pruneUs, maxCenti)
          state.update(AuthModel(model))
          out.iterator
      }
  }

  /** Known-IP state analysis on the Spark 4 `transformWithState` API
    * (see SuppressProcessor): the per-identity pruned address model is
    * a named `ValueState` with an optional NATIVE TTL, so identities
    * that stop logging in age out of the store entirely — the
    * reference gets this from Datastore entry pruning; entry-level
    * age pruning inside a live model stays in the kernel. Same kernel
    * as `authStateAnalyze`; StreamingSpec pins TWS ≡ fMGWS ≡ batch.
    * Requires the RocksDB state store. */
  class AuthStateProcessor(pruneUs: Long, maxCenti: Double, ttlMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, AuthLogin, AuthAction] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[AuthModel] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      val ttl =
        if (ttlMs > 0)
          org.apache.spark.sql.streaming.TTLConfig(
            java.time.Duration.ofMillis(ttlMs))
        else org.apache.spark.sql.streaming.TTLConfig.NONE
      st = getHandle.getValueState[AuthModel]("model",
        org.apache.spark.sql.Encoders.product[AuthModel], ttl)
    }

    override def handleInputRows(key: String, rows: Iterator[AuthLogin],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[AuthAction] = {
      val (model, out) = authStateScan(key,
        if (st.exists()) st.get().entries else Nil,
        rows.toSeq, pruneUs, maxCenti)
      st.update(AuthModel(model))
      out.iterator
    }
  }

  /** `authStateAnalyze` on transformWithState (see AuthStateProcessor). */
  def authStateAnalyzeTws(ds: Dataset[AuthLogin], pruneAgeSeconds: Long,
      maxKmStatic: Double, stateTtlSeconds: Long = 0): Dataset[AuthAction] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val mode =
      if (stateTtlSeconds > 0)
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
      else org.apache.spark.sql.streaming.TimeMode.None()
    ds.groupByKey(_.key)
      .transformWithState(
        new AuthStateProcessor(pruneAgeSeconds * 1000000L,
          maxKmStatic * 100, stateTtlSeconds * 1000L),
        mode, OutputMode.Append())
  }

  /** Count-aware suppressor (ref s/alert/AlertSuppressorCount.java:
    * 27-35 + AlertSuppressor.java:96-143): like `suppress`, but an
    * element whose count DIFFERS from the last-emitted count re-emits
    * even inside the suppression window (the alert changed — bigger
    * OR smaller — so it is news again); state `(ts, count)` is
    * overwritten on every emission, including the expiry path, and
    * left untouched by suppressed elements. */
  def suppressCount(ds: Dataset[KeyedCount],
      expirySeconds: Long): Dataset[EmittedCount] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val expiryUs = expirySeconds * 1000000L
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[CountState, EmittedCount](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[KeyedCount], state: GroupState[CountState]) =>
          var st = if (state.exists) state.get
            else CountState(Long.MinValue, Long.MinValue)
          val out = Seq.newBuilder[EmittedCount]
          // (ts, count) sort — same tie discipline as the batch twin
          // (Stateful.suppressCount): equal-ts events replay smaller
          // count first, so emit-on-change fires deterministically
          it.toSeq.sortBy(e => (e.tsUs, e.count)).foreach { e =>
            val expired =
              st.lastEmitUs == Long.MinValue || e.tsUs - st.lastEmitUs > expiryUs
            if (expired || e.count != st.lastCount) {
              st = CountState(e.tsUs, e.count)
              out += EmittedCount(key, e.tsUs, e.count)
            }
          }
          if (st.lastEmitUs != Long.MinValue) state.update(st)
          out.result().iterator
      }
  }
}
