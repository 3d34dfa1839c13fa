package graft.model

import java.sql.Timestamp

/** Core data model of the engine, re-expressed from the reference's
  * row classes as Spark-encodable case classes.
  *
  * Reference shapes (see SURVEY.md §1):
  *  - Event:      /root/reference/src/main/java/com/mozilla/secops/parser/Event.java:26-48
  *  - Normalized: /root/reference/src/main/java/com/mozilla/secops/parser/Normalized.java:13-57
  *  - Alert:      /root/reference/src/main/java/com/mozilla/secops/alert/Alert.java:21-532
  *  - Violation:  /root/reference/src/main/java/com/mozilla/secops/Violation.java:23-233
  */
object NormalizedType {
  val Auth = "AUTH"
  val AuthSession = "AUTH_SESSION"
  val HttpRequest = "HTTP_REQUEST"
}

/** GeoIP enrichment attached to a source address
  * (ref GeoIP.GeoIPData, s/parser/GeoIP.java:18-150). */
case class Geo(
    city: Option[String] = None,
    country: Option[String] = None,
    timeZone: Option[String] = None,
    latitude: Option[Double] = None,
    longitude: Option[Double] = None,
    isp: Option[String] = None,
    asn: Option[Int] = None,
    asOrg: Option[String] = None)

/** Cross-source normalized view — the column set ~90% of operators read. */
case class Normalized(
    types: Seq[String] = Seq.empty,
    subjectUser: Option[String] = None,
    subjectUserIdentity: Option[String] = None,
    sourceAddress: Option[String] = None,
    geo: Option[Geo] = None,
    requestMethod: Option[String] = None,
    requestUrl: Option[String] = None,
    urlRequestPath: Option[String] = None,
    urlRequestHost: Option[String] = None,
    requestStatus: Option[Int] = None,
    userAgent: Option[String] = None,
    referenceId: Option[String] = None,
    /** Acted-on object for session events (ref Normalized.java `object`
      * — e.g. GCP resource path, "phabricator"). `object` is a Scala
      * keyword, hence the longer name. */
    objectValue: Option[String] = None)

/** A parsed log event. `payloadType` is the tagged-union discriminator
  * (23 variants in the reference, s/parser/Payload.java:10-61); the raw
  * payload fields live in `fields` (string map) plus the normalized view.
  */
case class Event(
    id: String,
    timestamp: Timestamp,
    payloadType: String,
    raw: String,
    normalized: Normalized = Normalized(),
    fields: Map[String, String] = Map.empty,
    stackdriverProject: Option[String] = None,
    stackdriverLabels: Map[String, String] = Map.empty,
    mozlogHostname: Option[String] = None,
    mozlogType: Option[String] = None,
    /** Mozlog `Logger` field (ref Mozlog.java:56) — several payload
      * matchers key on it (amo, private relay, fxa-content, iprepd). */
    mozlogLogger: Option[String] = None)

object AlertSeverity {
  val Info = "info"
  val Warn = "warn"
  val Critical = "critical"
}

/** Structured alert emitted by detectors. Metadata is kept as an ordered
  * sequence of key/value pairs (not a map) so JSON serialization is
  * byte-stable, matching the reference's golden-output discipline. */
case class AlertMetaEntry(key: String, value: String)

case class Alert(
    alertId: String,
    timestamp: Timestamp,
    summary: String,
    category: String,
    subcategory: Option[String] = None,
    severity: String = AlertSeverity.Info,
    payload: Option[String] = None,
    metadata: Seq[AlertMetaEntry] = Seq.empty) {

  def meta(key: String): Option[String] =
    metadata.find(_.key == key).map(_.value)

  def withMeta(key: String, value: String): Alert =
    copy(metadata = metadata :+ AlertMetaEntry(key, value))
}

/** Well-known alert metadata keys — the full registry of the
  * reference's AlertMeta.Key enum (ref s/alert/AlertMeta.java:31-248;
  * template/notification-transport keys included for schema parity
  * even where the transport itself is out of scope). */
object AlertMeta {
  val SourceAddress = "sourceaddress"
  val SourceAddressPrevious = "sourceaddress_previous"
  val Count = "count"
  val MeanValue = "mean"
  val ThresholdModifier = "threshold_modifier"
  val WindowTimestamp = "window_timestamp"
  val Username = "username"
  val Identity = "identity_key"
  val Email = "email"
  val EndpointPattern = "endpoint_pattern"
  val ErrorCount = "error_count"
  val UserAgent = "useragent"
  val NotifyMergeKey = "notify_merge"
  // addon / AMO
  val AddonFilename = "addon_filename"
  val AddonFromApi = "addon_from_api"
  val AddonGuid = "addon_guid"
  val AddonId = "addon_id"
  val AddonSize = "addon_size"
  val AddonUploadHash = "addon_upload_hash"
  val AddonUserId = "addon_user_id"
  val AddonVersion = "addon_version"
  // alert handling / routing
  val AlertHandlingSeverity = "alert_handling_severity"
  val AlertNotificationType = "alert_notification_type"
  val AlertSubcategoryField = "category"
  val AlertIoIgnoreEvent = "alertio_ignore_event"
  val NotifyEmailDirect = "notify_email_direct"
  val NotifyMergedCount = "notify_merged_count"
  val NotifySlackDirect = "notify_slack_direct"
  val NotifySlackSupplementary = "notify_slack_supplementary"
  val SlackSupplementaryMessage = "slack_supplementary_message"
  val TemplateNameEmail = "template_name_email"
  val TemplateNameSlack = "template_name_slack"
  val TemplateNameSlackCatchall = "template_name_slack_catchall"
  val EscalateTo = "escalate_to"
  // auth / identity
  val AuthAlertType = "auth_alert_type"
  val IdentityUntracked = "identity_untracked"
  val EntryKey = "entry_key"
  val StateActionType = "state_action_type"
  val Uid = "uid"
  val Object = "object"
  // aws / gcp
  val AwsAccountId = "aws_account_id"
  val AwsAccountName = "aws_account_name"
  val AwsRegion = "aws_region"
  val ProjectId = "project_id"
  val ProjectNumber = "project_number"
  val Provider = "provider"
  val Resource = "resource"
  val RuleName = "rule_name"
  // findings
  val FindingId = "finding_id"
  val FindingType = "finding_type"
  val Indicator = "indicator"
  val Technique = "technique"
  val UrlToFinding = "url_to_finding"
  val MatchedMetadataKey = "matched_metadata_key"
  val MatchedMetadataValue = "matched_metadata_value"
  val MatchedObject = "matched_object"
  val MatchedType = "matched_type"
  // generic measures
  val Bytes = "bytes"
  val Description = "description"
  val DocLink = "doc_link"
  val EmailContact = "email_contact"
  val EmailSimilar = "email_similar"
  val Start = "start"
  val End = "end"
  val Endpoint = "endpoint"
  val ErrorThreshold = "error_threshold"
  val EventTimestamp = "event_timestamp"
  val EventTimestampSourceLocal = "event_timestamp_source_local"
  val InstanceName = "instance_name"
  val KmDistance = "km_distance"
  val Method = "method"
  val MonitoredResource = "monitored_resource"
  val RealAddressHashActual = "real_address_hash_actual"
  val RealAddressHashExpected = "real_address_hash_expected"
  val ReferenceId = "reference_id"
  val RequestThreshold = "request_threshold"
  val RestrictedValue = "restricted_value"
  val SourceAlert = "source_alert"
  val SourceAddresses = "sourceaddresses"
  val Status = "status"
  val Threshold = "threshold"
  val TimeDeltaSeconds = "time_delta_seconds"
  val TotalAddressCount = "total_address_count"
  val TotalAlertCount = "total_alert_count"
  val WatchlistCreatedBy = "watchlist_created_by"
  // iprepd
  val IprepdExempt = "iprepd_exempt"
  val IprepdExemptCreatedBy = "iprepd_exempt_created_by"
  val IprepdSuppressRecovery = "iprepd_suppress_recovery"
  // geo / minFraud enrichment of the source address
  val SourceAddressAsOrg = "sourceaddress_as_org"
  val SourceAddressAsn = "sourceaddress_asn"
  val SourceAddressCity = "sourceaddress_city"
  val SourceAddressCountry = "sourceaddress_country"
  val SourceAddressIsAnonymous = "sourceaddress_is_anonymous"
  val SourceAddressIsAnonymousVpn = "sourceaddress_is_anonymous_vpn"
  val SourceAddressIsHostingProvider = "sourceaddress_is_hosting_provider"
  val SourceAddressIsLegitimateProxy = "sourceaddress_is_legitimate_proxy"
  val SourceAddressIsPublicProxy = "sourceaddress_is_public_proxy"
  val SourceAddressIsTorExitNode = "sourceaddress_is_tor_exit_node"
  val SourceAddressIsp = "sourceaddress_isp"
  val SourceAddressRiskScore = "sourceaddress_riskscore"
  val SourceAddressTimezone = "sourceaddress_timezone"
  val SourceAddressPreviousAsOrg = "sourceaddress_previous_as_org"
  val SourceAddressPreviousAsn = "sourceaddress_previous_asn"
  val SourceAddressPreviousCity = "sourceaddress_previous_city"
  val SourceAddressPreviousCountry = "sourceaddress_previous_country"
  val SourceAddressPreviousIsp = "sourceaddress_previous_isp"

  /** Keys whose value is a ", "-joined LIST (ref AlertMeta.java
    * ValueType.LIST declarations — EMAIL :134, EMAIL_SIMILAR :136,
    * SOURCEADDRESSES :199; all other keys are single-valued). */
  val ListKeys: Set[String] = Set(Email, EmailSimilar, SourceAddresses)

  /** Join values for a list-typed key (ref joinListValues :33-40 —
    * the reference joins with ", " and errors on non-list keys). */
  def joinListValues(key: String, values: Seq[String]): String = {
    require(ListKeys.contains(key), s"key $key for join is not of type list")
    values.mkString(", ")
  }

  /** Split a list-typed value (ref splitListValues :49-56; the
    * splitter is comma-based, whitespace-trimming, empty-dropping). */
  def splitListValues(key: String, value: String): Seq[String] = {
    require(ListKeys.contains(key), s"key $key for split is not of type list")
    value.split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq
  }
}

/** Alert → reputation violation mapping (ref s/Violation.java:176-233). */
case class Violation(
    ip: Option[String],
    email: Option[String],
    violation: String,
    suppressRecovery: Option[Int] = None)
