package graft.sinks

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Alert notification rendering — the analytic (deterministic-text)
  * half of the reference's mail/Slack delivery path, re-expressed as
  * Column expressions so rendering runs inside codegen over the alert
  * frame (alerts are the small end of every pipeline; no UDF, no
  * driver round-trip). Transport (SMTP/Slack API) stays out of scope
  * exactly like the other SURVEY §2.1 connector transports.
  *
  * Reference behavior mirrored:
  *  - payload assembly: alert payload + "Alert metadata:" block with
  *    one "key = value" line per metadata entry, in metadata order
  *    (reference alert/Alert.java:86-98)
  *  - Slack message text: "summary (alertId)"
  *    (reference alert/AlertSlack.java:93)
  *  - template rendering: substitution of ${key} variables, where the
  *    variable map is the alert metadata key/value set
  *    (reference alert/TemplateManager.java:32-44,
  *    alert/Alert.java:532-539); the template itself is a plan-time
  *    constant, so the substitution compiles to a codegen'd chain of
  *    replace() calls — one per referenced variable, not an
  *    interpreter over the text.
  */
object Notify {

  /** Metadata entries are (k, v) structs in an array column so entry
    * ORDER is preserved — the reference emits them in insertion order,
    * and a map column would lose that. */
  def metaEntry(k: Column, v: Column): Column = struct(k.as("k"), v.as("v"))

  /** payload + "\n\nAlert metadata:\nk = v\n..." (one line per entry;
    * entries render in array order). Null/empty metadata renders the
    * bare payload, like the reference's null-metadata branch. The
    * transform lambda runs once per ALERT over a handful of entries —
    * not a per-event hot path. */
  def assembledPayload(payload: Column, meta: Column): Column = {
    val lines = array_join(
      transform(meta, m => concat(m("k"), lit(" = "), m("v"), lit("\n"))), "")
    when(meta.isNull || size(meta) === 0, payload)
      .otherwise(concat(payload, lit("\n\nAlert metadata:\n"), lines))
  }

  /** "summary (alertId)" — the Slack message text. */
  def slackText(summary: Column, alertId: Column): Column =
    format_string("%s (%s)", summary, alertId)

  /** Render a plan-time template by substituting `${key}` markers from
    * the given variable columns; markers with no binding are left
    * as-is (the reference's Freemarker setup would error — leaving the
    * marker visible is the debuggable batch-side equivalent). Missing
    * (null) values render empty. */
  def renderTemplate(template: String, vars: Map[String, Column]): Column =
    vars.foldLeft(lit(template): Column) { case (acc, (k, v)) =>
      replace(acc, lit("${" + k + "}"), coalesce(v.cast("string"), lit("")))
    }

  /** Email document for one alert: subject = summary, text body =
    * assembled payload, html body = rendered template (reference
    * alert/AlertMailer.java:37,57-58,114-123). */
  def emailDoc(summary: Column, payload: Column, meta: Column,
      template: String, vars: Map[String, Column]): Column =
    struct(
      summary.as("subject"),
      assembledPayload(payload, meta).as("text_body"),
      renderTemplate(template, vars).as("html_body"))

  /** AuthProfile new-source Slack notification body, byte-compatible
    * with the reference's rendered slack/authprofile.ftlh output (the
    * engine-produced goldens under its testdata/templateoutput/slack
    * — FixtureReplaySpec pins every state-action variant against
    * them at test time). One codegen'd concat per alert: the
    * action-specific middle paragraph and the within-geo closing
    * variant select with `when`.
    *
    * Every interpolated column is null-coalesced to "unknown" (the
    * same degradation the city/country fields always had): `concat`
    * is null-propagating, so a single null field would otherwise
    * silently null the ENTIRE notification body instead of producing
    * a degraded-but-deliverable one. */
  def authProfileSlackText(username: Column, objectValue: Column,
      src: Column, city: Column, country: Column, eventTs: Column,
      eventTsLocal: Column, actionType: Column, docLink: Column,
      contactEmail: Column, alertId: Column): Column = {
    def nn(c: Column): Column = coalesce(c.cast("string"), lit("unknown"))
    val (username0, objectValue0, src0, eventTs0, eventTsLocal0) =
      (nn(username), nn(objectValue), nn(src), nn(eventTs), nn(eventTsLocal))
    val (docLink0, contactEmail0, alertId0) =
      (nn(docLink), nn(contactEmail), nn(alertId))
    val head = concat(
      lit("An authentication event for user "), username0,
      lit(" was detected to access "), objectValue0,
      lit(" from "), src0,
      lit(" ["), coalesce(city, lit("unknown")), lit("/"),
      coalesce(country, lit("unknown")),
      lit("].\n\nThis event occurred at "), eventTs0, lit(".\n\n"))
    val middle = when(actionType === "unknown_ip_anon_network",
        lit("The source address appears to be associated with a known " +
          "anonymity network.\n\n"))
      .when(actionType === "unknown_ip_hosting_provider",
        lit("The source address appears to be associated with a hosting " +
          "provider.\n\n"))
      .when(actionType === "unknown_ip_outside_geo",
        lit("The source address was new, and does not appear to be near " +
          "any previously known location.\n\n"))
      .when(actionType === "unknown_ip_within_geo",
        lit("The source address was new, however is near a previously " +
          "known location so this message is informational.\n\n"))
      .otherwise(lit(""))
    val tsPara = concat(
      lit("Timestamp for event based on source address time zone was "),
      eventTsLocal0, lit(".\n\n"))
    val tail = when(actionType === "unknown_ip_within_geo",
        concat(lit("If this was not you, or you have any questions about " +
            "this alert, email us at "), contactEmail0,
          lit(" with the alert id.\n\nAs well, you can refer to our user " +
            "guide: "), docLink0, lit("\n\nalert id: "), alertId0))
      .otherwise(concat(
        lit("If you have any questions about this alert, please refer to " +
          "our user guide: "), docLink0, lit("\n\nalert id: "), alertId0))
    concat(head, middle, tsPara, tail)
  }
}
