package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Sessionize

/** Pioneer exfiltration detection (ref s/pioneer/Pioneer.java:96-219):
  * GCP VPC flow records from port 22, grouped into 30-minute-gap
  * sessions per (source ip, source port); inside a session, a sliding
  * time threshold is scanned — if the bytes sent within
  * `thresholdSeconds` of any flow reach `thresholdBytes`, the session
  * alerts once (at its earliest qualifying flow).
  *
  * Spark re-expression: gap sessionization is the shared analytic
  * pattern (one exchange + sort), and the reference's nested
  * forward-scan is exactly a RANGE window frame — `sum(bytes) OVER
  * (... ORDER BY ts_ms RANGE BETWEEN CURRENT ROW AND threshold
  * FOLLOWING)` — so the whole detector is two window specs over one
  * sort order, no per-group materialization.
  */
object PioneerPipeline {

  /** Exfiltration scan over a generic flow frame. Output: one row per
    * alerting session — (key, session_id, start_ms, end_ms, bytes)
    * where [start_ms, end_ms] is the qualifying byte window. */
  def exfiltration(df: DataFrame, ts: Column, seq: Column, key: Column,
      bytes: Column, gapSeconds: Long, thresholdSeconds: Long,
      thresholdBytes: Long): DataFrame = {
    val sess = Sessionize.assignSessions(
      df.select(ts.as("ts"), seq.as("seq"), key.as("key"),
        bytes.cast("long").as("bytes")),
      col("ts"), col("key"), gapSeconds)
      .withColumn("ts_ms", unix_millis(col("ts")))
    val range = Window.partitionBy(col("key"), col("session_id"))
      .orderBy(col("ts_ms"))
      .rangeBetween(0, thresholdSeconds * 1000)
    val pick = Window.partitionBy(col("key"), col("session_id"))
      .orderBy(col("ts"), col("seq"))
    sess
      .withColumn("win_bytes", sum(col("bytes")).over(range))
      .withColumn("win_end_ms", max(col("ts_ms")).over(range))
      .filter(col("win_bytes") >= thresholdBytes)
      .withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col("key"), col("session_id"),
        col("ts_ms").as("start_ms"), col("win_end_ms").as("end_ms"),
        col("win_bytes").as("bytes"))
  }

  /** [[exfiltration]] composed with the reference's count-aware
    * suppression (ref Pioneer.java:220:
    * `AlertSuppressorCount(thresholdMillis / 1000)` keyed on the
    * "srcip-srcport" session key, with the alert's COUNT metadata set
    * to the byte total, java:195) — a later session's alert for the
    * same key re-emits only past the expiry OR when the byte count
    * changes. The suppression timestamp is the alerting flow's own
    * event time (`start_ms` — the reference outputs at element i of
    * the qualifying scan; its wall-clock alert stamp is replaced by
    * the deterministic event-derived instant, the repo's standing
    * convention). */
  def exfiltrationAlerts(df: DataFrame, ts: Column, seq: Column,
      key: Column, bytes: Column, gapSeconds: Long,
      thresholdSeconds: Long, thresholdBytes: Long): DataFrame =
    graft.operators.Stateful.suppressCountGate(
      exfiltration(df, ts, seq, key, bytes, gapSeconds,
        thresholdSeconds, thresholdBytes),
      timestamp_millis(col("start_ms")), col("key"), col("bytes"),
      expirySeconds = thresholdSeconds)

  /** The reference's concrete filter + keying: GCP VPC flow events
    * with src port 22, keyed "srcip-srcport"
    * (ref Pioneer.java:99-130). Expects the parsed-Event frame. */
  def exfiltrationFromFlows(parsed: DataFrame,
      thresholdSeconds: Long = 60, thresholdBytes: Long = 100000000L,
      gapSeconds: Long = 1800): DataFrame = {
    val flows = parsed
      .filter(col("payloadType") === "gcp_vpc_flow" &&
        element_at(col("fields"), "src_port") === "22" &&
        element_at(col("fields"), "src_ip").isNotNull &&
        element_at(col("fields"), "dest_ip").isNotNull)
    exfiltration(flows, col("timestamp"), col("id"),
      concat_ws("-", element_at(col("fields"), "src_ip"),
        element_at(col("fields"), "src_port")),
      element_at(col("fields"), "bytes_sent").cast("long"),
      gapSeconds, thresholdSeconds, thresholdBytes)
  }
}
