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

  /** Metadata keys the watchlist scans, per kind (ref PostProcessing
    * .java:130-135: emailKeys = email, username, identity_key; ipKeys
    * = sourceaddress, sourceaddress_previous). */
  val WatchlistEmailKeys: Seq[String] =
    Seq("email", "username", "identity_key")
  val WatchlistIpKeys: Seq[String] =
    Seq("sourceaddress", "sourceaddress_previous")

  /** Full PostProcessing watchlist analysis (ref s/postprocessing/
    * PostProcessing.java:260-374): scan every incoming alert's
    * email-kind metadata keys and ip-kind keys against the watchlist;
    * only EMAIL is declared ValueType.LIST (AlertMeta.java:134), so
    * only that key's value splits on "," (trimmed); USERNAME and
    * IDENTITY_KEY make splitListValues throw and the reference falls
    * back to whole-value matching (PostProcessing.java:278-288).
    * Each (alert, matched key occurrence) emits one
    * escalation alert carrying the watchlist entry's severity,
    * created-by, and the matched key/value, plus a direct-email route
    * chosen by severity.
    *
    * `alerts` is the parsed alert frame (fields map with meta_<key>
    * entries and alert_id); `watchlist` columns: (kind, object,
    * severity, created_by) — tiny, broadcast (the reference batches
    * Datastore lookups; a broadcast hash join removes the RPC
    * batching problem entirely). The key scan is an explode over a
    * static 5-element array — codegen'd, no UDF. */
  def watchlistAnalyze(alerts: DataFrame, watchlist: DataFrame,
      warningEmail: String, criticalEmail: String): DataFrame = {
    val kd =
      WatchlistEmailKeys.map { k =>
        val vals =
          if (k == "email")
            split(element_at(col("fields"), s"meta_$k"), ",")
          else array(element_at(col("fields"), s"meta_$k"))
        struct(lit(k).as("key"), vals.as("vals"),
          lit("email").as("kind"))
      } ++ WatchlistIpKeys.map { k =>
        struct(lit(k).as("key"),
          array(element_at(col("fields"), s"meta_$k")).as("vals"),
          lit("ip").as("kind"))
      }
    val wl = broadcast(watchlist.select(col("kind").as("w_kind"),
      col("object"), col("severity"), col("created_by")))
    alerts
      .withColumn("kd", explode(array(kd: _*)))
      .withColumn("matched_metadata_value", explode_outer(col("kd.vals")))
      .withColumn("matched_metadata_value",
        trim(col("matched_metadata_value")))
      .filter(col("matched_metadata_value").isNotNull)
      .join(wl, col("kd.kind") === col("w_kind") &&
        col("matched_metadata_value") === col("object"))
      .select(
        lit("postprocessing").as("category"),
        lit("watchlist").as("subcategory"),
        concat(lit("matched watchlist object found in alert "),
          element_at(col("fields"), "alert_id")).as("summary"),
        col("severity"),
        when(col("severity") === "warn", warningEmail)
          .when(col("severity") === "critical", criticalEmail)
          .as("notify_email_direct"),
        element_at(col("fields"), "alert_id").as("source_alert"),
        col("kd.key").as("matched_metadata_key"),
        col("matched_metadata_value"),
        col("w_kind").as("matched_type"),
        col("object").as("matched_object"),
        col("created_by").as("watchlist_created_by"))
  }
}
