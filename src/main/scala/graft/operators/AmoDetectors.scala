package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Functions

/** The AMO (addons.mozilla.org) abuse detector suite (SURVEY.md §2.3/
  * §2.5), over AmoDocker events.
  *
  * References:
  *  - AddonMatcher: s/amo/AddonMatcher.java:66-157 — mounted file
  *    uploads matching a (filename regex, size range) criteria list.
  *  - AddonMultiMatch: s/amo/AddonMultiMatch.java:62-151 — the same
  *    upload hash submitted by several distinct accounts in a window.
  *  - AddonMultiSubmit: s/amo/AddonMultiSubmit.java:66-156 — many
  *    distinct accounts submitting files in the same rounded-size
  *    bucket in a window.
  *  - AddonCloudSubmission: s/amo/AddonCloudSubmission.java:40-117 —
  *    new-version submissions from cloud-provider address space.
  *  - ReportRestriction: s/amo/ReportRestriction.java:36-77.
  *  - FxaAccountAbuseAlias: s/amo/FxaAccountAbuseAlias.java:66-151 —
  *    many plus/dot aliases of one normalized account in a session.
  *  - FxaAccountAbuseNewVersion ban patterns:
  *    s/amo/FxaAccountAbuseNewVersion.java:104-160.
  *
  * Scale design: every detector is either a pure narrow projection
  * (matcher, restriction, cloud submission — the CIDR check is the
  * broadcast-radix codegen expression) or one distinct + one
  * hash-aggregate keyed by the abuse dimension (hash / size bucket /
  * normalized email). Nothing joins event payloads; the alias
  * sessionizer reuses the single-exchange analytic sessionization.
  */
object AmoDetectors {

  /** One AddonMatcher criterion: anchored filename regex + byte range
    * (ref option format `<regex>:<minbytes>:<maxbytes>`). */
  case class MatchCriterion(pattern: String, minBytes: Long, maxBytes: Long)

  /** AddonMatcher: mounted-file uploads whose (filename, size) matches
    * any criterion. The predicate is one OR-chain of anchored rlikes +
    * range checks — fully codegen'd, no per-row regex list scan. */
  def addonMatcher(df: DataFrame, ts: Column, fileName: Column,
      bytes: Column, addr: Column, email: Column,
      criteria: Seq[MatchCriterion]): DataFrame = {
    val matched = criteria.map { c =>
      fileName.rlike(s"^(?:${c.pattern})$$") &&
        bytes >= c.minBytes && bytes <= c.maxBytes
    }.reduceOption(_ || _).getOrElse(lit(false))
    df.filter(fileName.isNotNull && bytes.isNotNull && matched)
      .select(unix_millis(ts).as("ts_ms"), addr.as("src"),
        email.as("email"),
        Functions.normalizeEmailPlus(email).as("email_normalized"),
        fileName.as("file_name"), bytes.cast("long").as("bytes"))
  }

  /** AddonMultiMatch: distinct accounts per upload hash per window;
    * `alertOn`+ distinct submitters alert. */
  def addonMultiMatch(df: DataFrame, ts: Column, uploadHash: Column,
      email: Column, window: String, alertOn: Long): DataFrame =
    df.filter(uploadHash.isNotNull && email.isNotNull)
      .select(unix_millis(org.apache.spark.sql.functions
          .window(ts, window).getField("start")).as("window_start_ms"),
        uploadHash.as("upload_hash"), email.as("email"))
      .distinct()
      .groupBy(col("window_start_ms"), col("upload_hash"))
      .agg(count(lit(1)).as("n_emails"))
      .filter(col("n_emails") >= alertOn)

  /** The reference's size rounding: up to the next 10000 boundary
    * (ref AddonMultiSubmit.java:62-67). */
  def roundSize(bytes: Column): Column =
    when(bytes % 10000 === 0, bytes)
      .otherwise(bytes + (lit(10000) - bytes % 10000))

  /** AddonMultiSubmit: distinct accounts per rounded-size bucket per
    * window; uploads of 3000 bytes or less are ignored. */
  def addonMultiSubmit(df: DataFrame, ts: Column, bytes: Column,
      email: Column, window: String, alertOn: Long): DataFrame =
    df.filter(email.isNotNull && bytes.isNotNull && bytes > 3000)
      .select(unix_millis(org.apache.spark.sql.functions
          .window(ts, window).getField("start")).as("window_start_ms"),
        roundSize(bytes.cast("long")).as("size_bucket"),
        email.as("email"))
      .distinct()
      .groupBy(col("window_start_ms"), col("size_bucket"))
      .agg(count(lit(1)).as("n_emails"))
      .filter(col("n_emails") >= alertOn)

  /** AddonCloudSubmission: new-version submissions from cloud address
    * space, labeled with the provider (aws checked before gcp, as the
    * reference does). CIDR containment is the broadcast-radix native
    * expression — no shuffle, no UDF. */
  def addonCloudSubmission(df: DataFrame, ts: Column, addr: Column,
      guid: Column, email: Column, awsCidrs: Seq[String],
      gcpCidrs: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val aws = Functions.broadcastCidrs(spark, awsCidrs)
    val gcp = Functions.broadcastCidrs(spark, gcpCidrs)
    df.withColumn("provider",
        when(Functions.cidrMatch(aws)(addr), "aws")
          .when(Functions.cidrMatch(gcp)(addr), "gcp"))
      .filter(col("provider").isNotNull)
      .select(unix_millis(ts).as("ts_ms"), addr.as("src"),
        col("provider"), guid.as("addon_guid"), email.as("email"))
  }

  /** ReportRestriction: pass through reputation-restricted requests. */
  def reportRestriction(df: DataFrame, ts: Column, addr: Column,
      restrictedValue: Column): DataFrame =
    df.filter(restrictedValue.isNotNull)
      .select(unix_millis(ts).as("ts_ms"), addr.as("src"),
        restrictedValue.as("restricted_value"))

  /** FxaAccountAbuseAlias: logins whose address is a plus/dot alias of
    * the normalized account, sessionized per normalized account with
    * `gapSeconds`; more than `maxAliases` distinct aliases in one
    * session alert. `sharded = true` flips the session assignment to
    * the slice-and-mend path (result-identical by the sessionizer's
    * own contract; q176 shares q52's oracle as the hash proof) — the
    * escape hatch when the skew card reads one normalized account
    * hot (an alias flood is EXACTLY a hot normalized key: thousands
    * of plus-aliases collapsing onto one `norm`). */
  def fxaAccountAbuseAlias(df: DataFrame, ts: Column, email: Column,
      gapSeconds: Long, maxAliases: Long,
      sharded: Boolean = false): DataFrame = {
    val aliased = df
      .select(ts.as("ts"), email.as("email"),
        Functions.normalizeEmailPlusDotStrip(email).as("norm"))
      .filter(col("norm").isNotNull && col("email") =!= col("norm"))
    val sessions =
      if (sharded)
        Sessionize.assignSessionsSharded(aliased, col("ts"), col("norm"),
          gapSeconds)
      else
        Sessionize.assignSessions(aliased, col("ts"), col("norm"),
          gapSeconds)
    sessions
      .groupBy(col("norm").as("email_normalized"), col("session_id"))
      .agg(countDistinct(col("email")).as("n_aliases"),
        unix_millis(min(col("ts"))).as("session_start_ms"))
      .filter(col("n_aliases") > maxAliases)
  }

  /** FxaAccountAbuseNewVersion ban patterns: logins from accounts
    * matching a configured (anchored, full-match) pattern list. */
  def fxaBanPatterns(df: DataFrame, ts: Column, email: Column,
      addr: Column, banPatterns: Seq[String]): DataFrame = {
    val pat = banPatterns.map(p => s"(?:$p)").mkString("^(?:", "|", ")$")
    df.filter(email.isNotNull && email.rlike(pat))
      .select(unix_millis(ts).as("ts_ms"), email.as("email"),
        addr.as("src"))
  }

  /** FxaAccountAbuseNewVersion login reputation gate (ref s/amo/
    * FxaAccountAbuseNewVersion.java:179-209): FXALOGIN events whose
    * account EMAIL reputation is at or below 50 alert. The reference
    * queries iprepd per event; the Spark-first stand-in is a small
    * broadcast (kind, value, score) reputation table — the same seam
    * the iprepd violation sink writes into, so state written by the
    * sink is joinable back here. */
  def newVersionLogin(df: DataFrame, ts: Column, email: Column,
      addr: Column, reputation: DataFrame): DataFrame =
    df.filter(email.isNotNull)
      .select(unix_millis(ts).as("ts_ms"), email.as("email"),
        addr.as("src"))
      .join(broadcast(reputation.filter(col("kind") === "email")
        .select(col("value").as("email"), col("score"))), Seq("email"))
      .filter(col("score") <= 50)
      .drop("score")

  /** FxaAccountAbuseNewVersion submission reputation gate (ref
    * FxaAccountAbuseNewVersion.java:209-240): NEWVERSION/FILEUPLOAD
    * events whose source-IP reputation is at or below 50 alert. */
  def newVersionSubmission(df: DataFrame, ts: Column, addr: Column,
      addonId: Column, addonVersion: Column,
      reputation: DataFrame): DataFrame =
    df.select(unix_millis(ts).as("ts_ms"), addr.as("src"),
        addonId.as("addon_id"), addonVersion.as("addon_version"))
      .join(broadcast(reputation.filter(col("kind") === "ip")
        .select(col("value").as("src"), col("score"))), Seq("src"))
      .filter(col("score") <= 50)
      .drop("score")

  /** AddonMultiIpLogin (ref s/amo/AddonMultiIpLogin.java:36,113-235):
    * per account, logins from `alertOn`+ distinct COUNTRIES within a
    * gap-based SESSION (the reference sessionizes with a 15-minute
    * gap, not a fixed window); accounts full-matching an
    * `aggMatchers` regex alert on the country bound alone, everyone
    * else must also reach `alertOnIp` distinct addresses; accounts
    * full-matching an `acctExceptions` regex are dropped before
    * analysis. Regexes are anchored to whole-string matches like the
    * reference's `Matcher.matches()`.
    *
    * Scale shape: exception filters are codegen'd rlike predicates on
    * the scan; sessionization is one exchange + sort per account key
    * (see [[Sessionize.assignSessions]]); the distinct counts are one
    * hash aggregate per (account, session). Geo arrives as a column
    * so the MMDB lookup cost sits in enrichment, not the detector. */
  def multiIpLogin(df: DataFrame, ts: Column, email: Column,
      addr: Column, country: Column, gapSeconds: Long, alertOn: Long,
      alertOnIp: Long, acctExceptions: Seq[String] = Nil,
      aggMatchers: Seq[String] = Nil): DataFrame = {
    def fullMatch(c: Column, re: String): Column =
      c.rlike("^(?:" + re + ")$")
    val base0 = df
      .filter(email.isNotNull && addr.isNotNull && country.isNotNull)
      .select(ts.as("__ts"), email.as("email"), addr.as("__a"),
        country.as("__c"))
    val filtered = acctExceptions.foldLeft(base0) { (d, re) =>
      d.filter(!fullMatch(col("email"), re))
    }
    val aggMatch = aggMatchers.map(fullMatch(col("email"), _))
      .reduceOption(_ || _).getOrElse(lit(false))
    Sessionize.assignSessions(filtered, col("__ts"), col("email"),
        gapSeconds)
      .groupBy(col("email"), col("session_id"))
      .agg(unix_millis(min(col("__ts"))).as("session_start_ms"),
        countDistinct(col("__c")).as("n_countries"),
        countDistinct(col("__a")).as("n_addrs"))
      .filter(col("n_countries") >= alertOn &&
        (aggMatch || col("n_addrs") >= alertOnIp))
      .select(col("email"), col("session_start_ms"),
        col("n_countries"), col("n_addrs"))
  }
}
