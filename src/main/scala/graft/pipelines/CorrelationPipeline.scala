package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Source correlation + post-processing pipelines.
  *
  * SourceCorrelation (ref s/SourceCorrelation.java:202-295): union of
  * addresses seen in events and addresses that alerted → distinct →
  * grouped by network (the reference groups by Maxmind ISP; here the
  * grouping column is pluggable — e.g. /24 prefix or a GeoIP ISP) →
  * alert when a network is big enough and predominantly alerting.
  *
  * PostProcessing (ref s/postprocessing/PostProcessing.java:102-258 +
  * Watchlist): alerts inner-joined against a broadcast watchlist of
  * watched identifiers (the reference batches Datastore RPCs for
  * this; as a broadcast join the batching problem disappears).
  */
object CorrelationPipeline {

  /** eventAddrs: (addr); alertAddrs: (addr). `network` maps an addr
    * column to its grouping key. */
  def sourceCorrelation(eventAddrs: DataFrame, alertAddrs: DataFrame,
      network: Column => Column, minAddrs: Long,
      minAlertedRatio: Double): DataFrame = {
    val ev = eventAddrs.select(col("addr")).withColumn("alerted", lit(0))
    val al = alertAddrs.select(col("addr")).withColumn("alerted", lit(1))
    ev.unionByName(al)
      .groupBy(col("addr"))
      .agg(max(col("alerted")).as("alerted")) // distinct addr, alerted if ever
      .groupBy(network(col("addr")).as("network"))
      .agg(count(lit(1)).as("n_addrs"), sum(col("alerted")).as("n_alerted"))
      .withColumn("ratio", col("n_alerted") / col("n_addrs"))
      .filter(col("n_addrs") >= minAddrs && col("ratio") >= minAlertedRatio)
  }

  /** /24 prefix as a cheap network grouping. */
  def slash24(addr: Column): Column = substring_index(addr, ".", 3)

  /** Watchlist decoration: inner join alerts against watched
    * identifiers (kind: "ip" | "email"), broadcast. watchlist columns:
    * (kind, value, severity_override). */
  def watchlisted(alerts: DataFrame, idCol: Column, kind: String,
      watchlist: DataFrame): DataFrame =
    alerts.join(
      broadcast(watchlist.filter(col("kind") === kind)
        .select(col("value"), col("severity_override"))),
      idCol === col("value"))
      .drop("value")
}
