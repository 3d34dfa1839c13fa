package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Alert

/** Alert output layer (SURVEY.md §2.1 sinks): violation derivation,
  * deterministic JSON rendering, and pluggable writer traits.
  *
  * The reference writes alerts to BigQuery/PubSub/iprepd/SQS via
  * CompositeOutput (s/CompositeOutput.java:80-119); here the analytic
  * parts (violation mapping s/Violation.java:176-233, stable JSON
  * rendering s/alert/Alert.java:486-530) are pure DataFrame
  * transforms, and transport is a trait with file/console/collecting
  * implementations — streaming callers attach them via foreachBatch.
  */
object Sinks {

  /** Alert subcategory → iprepd violation name (ref Violation.java:
    * 176-233 mapping table, re-expressed as a broadcastable lookup). */
  val ViolationMap: Map[String, String] = Map(
    "hard_limit" -> "fxa:request_rate_violation",
    "threshold" -> "fxa:request_rate_violation",
    "error_rate" -> "fxa:client_error_rate_violation",
    "useragent_blocklist" -> "fxa:blocked_ua_violation",
    "abusive_account" -> "fxa:account_abuse_violation",
    "velocity" -> "fxa:velocity_violation")

  /** Derive violations from alerts: keep alerts whose subcategory maps
    * to a violation and that carry a source address. Pure transform —
    * `when/otherwise` chain over a tiny literal map, no join needed. */
  def violations(alerts: DataFrame, subcategory: Column,
      sourceAddress: Column): DataFrame = {
    val mapping = ViolationMap.foldLeft(lit(null).cast("string")) {
      case (acc, (k, v)) => when(subcategory === k, v).otherwise(acc)
    }
    alerts
      .withColumn("violation", mapping)
      .filter(col("violation").isNotNull && sourceAddress.isNotNull)
      .withColumn("ip", sourceAddress)
  }

  /** Deterministic JSON rendering of alert rows: fixed field order,
    * epoch-ms timestamps (the reference keeps byte-stable JSON for
    * golden tests; we keep field order via to_json over an explicit
    * struct). */
  def alertJson(alerts: Dataset[Alert]): Dataset[String] = {
    val spark = alerts.sparkSession
    import spark.implicits._
    alerts.toDF().select(to_json(struct(
      col("alertId"), unix_millis(col("timestamp")).as("ts_ms"),
      col("summary"), col("category"), col("subcategory"),
      col("severity"), col("metadata"))).as("value")).as[String]
  }

  /** Transport abstraction: batch writers for alert frames. */
  trait AlertWriter {
    def write(alerts: DataFrame): Unit
  }

  /** Append alerts to a parquet directory (the BigQuery-table
    * stand-in; also the cross-run state snapshot format). */
  final class ParquetWriter(path: String) extends AlertWriter {
    def write(alerts: DataFrame): Unit =
      alerts.write.mode("append").parquet(path)
  }

  /** Dev/test sink. */
  final class ConsoleWriter(limit: Int = 20) extends AlertWriter {
    def write(alerts: DataFrame): Unit = alerts.show(limit, false)
  }

  /** Collecting sink for specs (driver-side buffer — test only). */
  final class CollectingWriter extends AlertWriter {
    val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    def write(alerts: DataFrame): Unit = buf ++= alerts.collect()
  }

  /** Attach a writer to a streaming alert frame via foreachBatch. */
  def streamTo(alerts: DataFrame, writer: AlertWriter)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    alerts.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], _: Long) => writer.write(batch.toDF())
    }
}
