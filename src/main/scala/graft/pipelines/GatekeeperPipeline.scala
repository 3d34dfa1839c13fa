package graft.pipelines

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.operators.{Heuristics, Stateful}
import graft.parse.Parser

/** Gatekeeper pipeline (ref s/gatekeeper/GuardDutyTransforms.java /
  * ETDTransforms.java): cloud findings pass through configured
  * matcher bucketing (GuardDutyFindingMatcher.java — regex over the
  * finding type routes a finding to ignore or high-priority) and a
  * severity mapping into alerts, with per-(finding type, account)
  * suppression so repeated findings don't re-alert inside the expiry
  * window. */
object GatekeeperPipeline {

  case class Config(
      suppressSeconds: Long = 900,
      /** Finding-type regexes to drop entirely (ref ignore matchers). */
      ignorePatterns: Seq[String] = Nil,
      /** Finding-type regexes forced to critical (ref escalation
        * matchers). */
      escalatePatterns: Seq[String] = Nil)

  private def anyMatch(c: org.apache.spark.sql.Column,
      patterns: Seq[String]): org.apache.spark.sql.Column =
    if (patterns.isEmpty) lit(false)
    else c.rlike(patterns.map(p => s"(?:$p)").mkString("^(?:", "|", ")$"))

  /** GuardDuty numeric severity → alert severity (ref GuardDuty docs
    * thresholds used by the reference's mapping). */
  def severityOf(sev: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(sev >= 7.0, "critical").when(sev >= 4.0, "warn").otherwise("info")

  /** One GuardDuty finding matcher (ref GuardDutyFindingMatcher.java):
    * a CONJUNCTION of whichever fields are set — finding-type regex
    * (full match, like Java's Matcher.matches), exact account id,
    * tag key → value-regex pairs (tags land in the parsed fields map
    * as tag:<key>), exact dns-action domain. A matcher with nothing
    * set matches everything; a matcher list is OR'd. */
  case class GdMatcher(
      findingType: Option[String] = None,
      accountId: Option[String] = None,
      awsTags: Map[String, String] = Map.empty,
      domainName: Option[String] = None) {
    def toColumn: org.apache.spark.sql.Column = {
      val conds =
        findingType.map(re =>
          coalesce(col("finding_type").rlike(s"^(?:$re)$$"), lit(false))).toSeq ++
        accountId.map(a =>
          coalesce(col("account") === a, lit(false))).toSeq ++
        domainName.map(d =>
          coalesce(col("domain") === d, lit(false))).toSeq ++
        awsTags.map { case (k, vre) =>
          coalesce(element_at(col("fields"), s"tag:$k")
            .rlike(s"^(?:$vre)$$"), lit(false))
        }
      conds.reduceOption(_ && _).getOrElse(lit(true))
    }
  }

  private def anyMatcher(ms: Seq[GdMatcher]): org.apache.spark.sql.Column =
    ms.map(_.toColumn).reduceOption(_ || _).getOrElse(lit(false))

  /** GuardDuty branch (ref GuardDutyTransforms): parse findings,
    * drop ignore-matcher hits, mark high-severity-matcher hits with
    * handling=high (the reference's escalation email path), suppress
    * repeats of the SAME FINDING ID inside the expiry window (ref
    * GuardDutyTransforms.java:274 — the suppression state key is the
    * finding id). All emitted alerts are critical, category
    * gatekeeper:aws. */
  def guardDutyAlerts(lines: Dataset[String],
      ignore: Seq[GdMatcher] = Nil, high: Seq[GdMatcher] = Nil,
      suppressSeconds: Long = 900): DataFrame = {
    val findings = Parser.parse(lines.filter(Parser.fastFilter("guardduty")))
      .toDF()
      .filter(col("payloadType") === "guardduty")
      .select(col("timestamp"), col("fields"),
        element_at(col("fields"), "finding_type").as("finding_type"),
        element_at(col("fields"), "severity").cast("double").as("sev"),
        element_at(col("fields"), "account").as("account"),
        element_at(col("fields"), "region").as("region"),
        element_at(col("fields"), "finding_id").as("finding_id"),
        element_at(col("fields"), "domain").as("domain"))
      .filter(!anyMatcher(ignore))
      .withColumn("handling",
        when(anyMatcher(high), lit("high")).otherwise(lit("low")))
      .withColumn("ts_us", unix_micros(col("timestamp")))
    val emitted = Stateful.suppress(findings, col("timestamp"),
        col("finding_id"), suppressSeconds)
      .withColumnRenamed("key", "finding_id")
    // duplicates at the SAME instant share (key, ts_us): still one
    // alert, like the reference's keyed suppression. Two DISTINCT
    // findings colliding on (finding_id, ts_us) must not collapse to
    // an arbitrarily-chosen row (dropDuplicates' pick is partition-
    // order dependent): take the lexicographic minimum of the content
    // columns instead — same single alert, deterministic pick.
    findings.join(emitted, Seq("finding_id", "ts_us"))
      .groupBy(col("finding_id"), col("ts_us"))
      .agg(min(struct(col("finding_type"), col("account"), col("region"),
        col("handling"), col("timestamp"))).as("r"))
      .select(
        concat(lit("suspicious activity detected in aws account "),
          col("r.account")).as("summary"),
        lit("gatekeeper:aws").as("category"),
        lit("critical").as("severity"),
        col("r.finding_type").as("finding_type"), col("finding_id"),
        col("r.account").as("account"),
        col("r.region").as("region"), col("r.handling").as("handling"),
        // console deep-link, emitted only when the region is known
        // (ref GuardDutyTransforms.java:134-141, 168-176)
        when(col("r.region").isNotNull, concat(
          lit("https://"), col("r.region"),
          lit(".console.aws.amazon.com/guardduty/home?region="),
          col("r.region"), lit("#/findings?fId="), col("finding_id")))
          .as("url_to_finding"),
        unix_millis(col("r.timestamp")).as("ts_ms"))
  }

  /** ETD branch (ref ETDTransforms): parse findings, drop rule-name
    * regex ignores, suppress repeats of the same (project, rule,
    * technique, indicator) — the reference's concatenated suppression
    * state key (ETDTransforms.java:263-274). Category gatekeeper:gcp,
    * critical. */
  def etdAlerts(lines: Dataset[String],
      ignoreRuleRegexes: Seq[String] = Nil,
      suppressSeconds: Long = 900): DataFrame = {
    val findings = Parser.parse(lines.filter(Parser.fastFilter("etd")))
      .toDF()
      .filter(col("payloadType") === "etd")
      .select(col("timestamp"),
        element_at(col("fields"), "project_number").as("project_number"),
        element_at(col("fields"), "rule_name").as("rule_name"),
        element_at(col("fields"), "technique").as("technique"),
        element_at(col("fields"), "indicator").as("indicator"))
      .filter(!anyMatch(col("rule_name"), ignoreRuleRegexes))
      .withColumn("skey", concat_ws("-", col("project_number"),
        col("rule_name"), col("technique"), col("indicator")))
      .withColumn("ts_us", unix_micros(col("timestamp")))
    val emitted = Stateful.suppress(findings, col("timestamp"), col("skey"),
        suppressSeconds)
      .withColumnRenamed("key", "skey")
    // deterministic tie-break for same-(skey, ts_us) collisions, as in
    // guardDutyAlerts above
    findings.join(emitted, Seq("skey", "ts_us"))
      .groupBy(col("skey"), col("ts_us"))
      .agg(min(struct(col("project_number"), col("rule_name"),
        col("technique"), col("indicator"), col("timestamp"))).as("r"))
      .select(
        concat(lit("suspicious activity detected in gcp org "),
          col("r.project_number")).as("summary"),
        lit("gatekeeper:gcp").as("category"),
        lit("critical").as("severity"),
        col("r.project_number").as("project_number"),
        col("r.rule_name").as("rule_name"),
        col("r.technique").as("technique"),
        col("r.indicator").as("indicator"),
        unix_millis(col("r.timestamp")).as("ts_ms"))
  }

  def analyze(lines: Dataset[String], cfg: Config = Config()): DataFrame = {
    val findings = Parser.parse(lines.filter(Parser.fastFilter("finding")))
      .toDF()
      .filter(col("payloadType") === "finding")
      .select(col("timestamp"),
        element_at(col("fields"), "finding_type").as("finding_type"),
        element_at(col("fields"), "severity").cast("double").as("sev"),
        element_at(col("fields"), "account").as("account"),
        element_at(col("fields"), "region").as("region"))
      .filter(!anyMatch(col("finding_type"), cfg.ignorePatterns))
      .withColumn("sev", when(anyMatch(col("finding_type"),
        cfg.escalatePatterns), lit(9.0)).otherwise(col("sev")))
      .withColumn("skey", concat_ws("|", col("finding_type"), col("account")))
      .withColumn("ts_us", unix_micros(col("timestamp")))
    val emitted = Stateful.suppress(findings, col("timestamp"), col("skey"),
        cfg.suppressSeconds)
      .withColumnRenamed("key", "skey")
    findings.join(emitted, Seq("skey", "ts_us"))
      .select(
        col("finding_type").as("summary"),
        lit("gatekeeper").as("category"),
        col("finding_type").as("subcategory"),
        severityOf(col("sev")).as("severity"),
        col("account"), col("region"),
        unix_millis(col("timestamp")).as("ts_ms"))
  }
}
