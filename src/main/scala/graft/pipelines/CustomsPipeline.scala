package graft.pipelines

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.Functions
import graft.parse.Parser

/** The Customs pipeline (ref EP3, s/customs/Customs.java:601-702):
  * FxA auth events keyed three ways — source address, email,
  * email domain — through fixed feature windows, then per-keying
  * detectors over the windowed counts:
  *  - source login failure (SourceLoginFailure: failures per source)
  *  - account-creation abuse (CustomsAccountCreation: creations/source)
  *  - password-reset abuse (CustomsPasswordResetAbuse: resets/email)
  *  - distributed account creation (CustomsAccountCreationDist:
  *    similar normalized emails across distinct sources)
  *
  * One parsed+cached frame feeds all keyings (the reference's
  * CustomsPreFilter tag-split becomes three filters over the cache);
  * every detector is a single windowed hash-aggregate + threshold,
  * and the similar-email clustering joins only within an email-domain
  * group (bounded pair blow-up, same trick as the reference's
  * per-address grouping).
  */
object CustomsPipeline {

  case class Config(
      window: String = "10 minutes",
      maxLoginFailuresPerSource: Long = 5,
      maxCreationsPerSource: Long = 3,
      maxResetsPerEmail: Long = 3,
      distMinSources: Long = 3,
      distMaxEditDistance: Long = 2)

  /** Parse raw lines, keep FxA auth-session events. Fast-match
    * pushdown ("fxa-auth" substring) prunes before the parse. */
  def parsedFxa(lines: Dataset[String]): DataFrame =
    Parser.parse(lines.filter(Parser.fastFilter("fxaauth"))).toDF()
      .filter(col("payloadType") === "fxaauth")

  private def alert(df: DataFrame, subcategory: String, keyKind: String): DataFrame =
    df.select(
      lit("customs").as("category"),
      lit(subcategory).as("subcategory"),
      lit("warn").as("severity"),
      lit(keyKind).as("key_kind"),
      col("key").cast("string").as("key"),
      col("n").cast("long").as("count"),
      col("window_start_ms"))

  def analyze(lines: Dataset[String], cfg: Config = Config()): DataFrame = {
    val fxa = parsedFxa(lines)
      .select(col("timestamp"),
        element_at(col("fields"), "email").as("email"),
        element_at(col("fields"), "action").as("action"),
        element_at(col("fields"), "status").as("status"),
        col("normalized.sourceAddress").as("src"))
      .withColumn("norm_email", Functions.normalizeEmailPlus(lower(col("email"))))
      .withColumn("domain", Functions.emailDomain(col("norm_email")))
      .cache()

    def windowed(pred: org.apache.spark.sql.Column,
        key: org.apache.spark.sql.Column, minN: Long): DataFrame =
      fxa.filter(pred)
        .groupBy(unix_millis(window(col("timestamp"), cfg.window)
          .getField("start")).as("window_start_ms"), key.as("key"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= minN)

    val loginFailure = alert(windowed(
      col("action") === "loginFailure", col("src"),
      cfg.maxLoginFailuresPerSource), "source_login_failure", "sourceaddress")

    val creationAbuse = alert(windowed(
      col("action") === "accountCreate", col("src"),
      cfg.maxCreationsPerSource), "account_creation_abuse", "sourceaddress")

    val resetAbuse = alert(windowed(
      col("action") === "passwordReset", col("norm_email"),
      cfg.maxResetsPerEmail), "password_reset_abuse", "email")

    // distributed creation: similar emails (edit distance on the local
    // part) created from >= distMinSources distinct sources within a
    // domain — pair join bounded by the domain group
    val creations = fxa.filter(col("action") === "accountCreate")
      .select(col("domain"), col("norm_email"), col("src"))
      .dropDuplicates()
    val a = creations.toDF("domain", "email_a", "src_a")
    val b = creations.toDF("domain", "email_b", "src_b")
    val dist = a.join(b, Seq("domain"))
      .filter(col("email_a") < col("email_b") &&
        col("src_a") =!= col("src_b") &&
        levenshtein(substring_index(col("email_a"), "@", 1),
          substring_index(col("email_b"), "@", 1)) <= cfg.distMaxEditDistance)
      // count sources across BOTH sides of the similar pairs
      .select(col("domain"), explode(array(col("src_a"), col("src_b"))).as("s"))
      .groupBy(col("domain").as("key"))
      .agg(countDistinct(col("s")).as("n"))
      .filter(col("n") >= cfg.distMinSources)
      .withColumn("window_start_ms", lit(null).cast("long"))
    val distAlert = alert(dist, "account_creation_dist", "domain")

    loginFailure.unionByName(creationAbuse).unionByName(resetAbuse)
      .unionByName(distAlert)
  }
}
