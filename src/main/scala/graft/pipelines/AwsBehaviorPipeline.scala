package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** awsbehavior: configured CloudTrail event-matching rules → critical
  * alerts (ref s/awsbehavior/AwsBehavior.java:75-147,
  * CloudtrailMatcher.java:30-76, CloudtrailMatcherManager.java).
  *
  * A matcher is a conjunction of (field, regex) terms over the
  * CloudTrail payload plus an optional resource path to surface in the
  * alert. The reference builds one EventFilter per matcher and
  * flattens N filtered PCollections; here all matchers compile into a
  * single projection — `explode(array(when(pred_i, struct_i)...))` —
  * so the event stream is scanned ONCE regardless of matcher count,
  * and every predicate stays inside whole-stage codegen.
  */
object AwsBehaviorPipeline {

  /** One configured matcher (ref event_matchers JSON:
    * description / resource / fields [[field, regex], ...]). */
  case class Matcher(description: String,
      fields: Seq[(String, String)], resource: Option[String] = None)

  /** CloudTrail matcher-field name → column over the parsed-Event
    * frame (ref CloudtrailMatcher.fieldToStringProperty). */
  def cloudtrailField(name: String): Column = {
    val key = name match {
      case "eventName" => "event_name"
      case "eventSource" => "event_source"
      case "recipientAccountId" => "recipient_account_id"
      case "userIdentity.invokedBy" => "invoked_by"
      case "userIdentity.sessionContext.attributes.mfaAuthenticated" =>
        "mfa_authenticated"
      case "requestParameters.userName" => "request_username"
      case other => other
    }
    element_at(col("fields"), key)
  }

  /** Apply all matchers in one pass. Output: (ts_ms, username,
    * description, resource) per (event, matched rule) — an event
    * matching k rules emits k alerts, as the reference's flattened
    * per-matcher collections do. */
  def matchAlerts(df: DataFrame, ts: Column, matchers: Seq[Matcher],
      resolve: String => Column = cloudtrailField,
      user: Column = col("normalized.subjectUser")): DataFrame = {
    val arms = matchers.map { m =>
      // the reference's EventFilterPayload regex terms are FULL
      // matches (Matcher.matches(), EventFilterPayload.java:116) —
      // anchor like Pattern.matches so "123456789" cannot partially
      // match a longer account id
      val pred = m.fields.map { case (f, re) =>
        resolve(f).rlike("^(?:" + re + ")$")
      }.reduceOption(_ && _).getOrElse(lit(false))
      when(pred, struct(
        lit(m.description).as("description"),
        m.resource.map(resolve).getOrElse(lit(null).cast("string"))
          .as("resource")))
    }
    df.withColumn("m", explode(array(arms: _*)))
      .filter(col("m").isNotNull)
      .select(unix_millis(ts).as("ts_ms"), user.as("username"),
        col("m.description").as("description"),
        col("m.resource").as("resource"),
        lit("critical").as("severity"))
  }

  /** The full pipeline slice: parsed lines → cloudtrail events →
    * matcher alerts (ref AwsBehavior.java:204-211). */
  def analyze(parsed: DataFrame, matchers: Seq[Matcher]): DataFrame =
    matchAlerts(parsed.filter(col("payloadType") === "cloudtrail"),
      col("timestamp"), matchers)
}
