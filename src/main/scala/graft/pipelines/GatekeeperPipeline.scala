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
