package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Deterministic log-line rendering of the driver's `events` table —
  * used to exercise the real parser end-to-end: events → formatted log
  * text → Parser.parse → normalized columns, which must round-trip to
  * the original event attributes (the DuckDB oracle recomputes the
  * expected projection directly from the table).
  */
object SyntheticLogs {

  /** event_type → HTTP method (mirrored in oracle SQL). */
  private def method = when(col("event_type") === "purchase", "POST")
    .otherwise("GET")

  /** error events render as HTTP 500, everything else 200. */
  private def status = when(col("event_type") === "error", 500).otherwise(200)

  /** user_id → synthetic 10.x.y.z source address (mirrored in oracle). */
  private[graft] def ipOf(uid: org.apache.spark.sql.Column) = concat(
    lit("10."), (uid / 65536).cast("long") % 256, lit("."),
    (uid / 256).cast("long") % 256, lit("."), uid % 256)

  /** Stackdriver LogEntry lines wrapping a GLB httpRequest payload. */
  def glbLines(events: DataFrame): Dataset[String] = {
    val spark = events.sparkSession
    import spark.implicits._
    // render + downstream parse at full parallelism even from a
    // one-row-group events file (no-op when the scan already splits)
    Tables.fanOut(events).select(format_string(
      """{"httpRequest":{"requestMethod":"%s","requestUrl":"https://app.test/e/%s","status":%s,"remoteIp":"%s","userAgent":"ua-%s"},"timestamp":"%s","logName":"projects/graft-test/logs/requests","resource":{"type":"http_load_balancer"}}""",
      method, col("event_id"), status, ipOf(col("user_id")),
      col("user_id"),
      date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")).as("value"))
      .as[String]
  }
}
