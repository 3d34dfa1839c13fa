package graft.parse

import org.apache.spark.sql.Dataset
import graft.model.Event

/** minFraud Insights enrichment (ref s/Minfraud.java:24-113,
  * s/parser/Normalized.java:574-590 — the reference queries the
  * MaxMind Insights API for addresses it has not seen before and
  * attaches risk score / anonymity / hosting-provider flags to the
  * normalized event; AuthProfile escalates unknown-address logins on
  * those flags).
  *
  * No external API exists in this environment, so the bundled resolver
  * is a deterministic fake derived from the address bytes — stable
  * across runs and engines, which keeps every consumer testable. A
  * production implementation subclasses `InsightsResolver` (per-
  * partition construction, same as the GeoIP reader pattern) and
  * nothing else changes.
  */
object Minfraud {

  /** Subset of Insights the reference consumes
    * (Normalized.java:574-590). */
  case class Insights(
      riskScore: Double,
      isAnonymous: Boolean,
      isHostingProvider: Boolean)

  trait InsightsResolver extends Serializable {
    def lookup(ip: String): Option[Insights]
  }

  /** Deterministic fake: flags keyed off the last address octet —
    * octet 9 mod 10 ⇒ anonymity network, octet 7 mod 10 ⇒ hosting
    * provider, risk score = octet / 2.56 (0..100). */
  final class FakeResolver extends InsightsResolver {
    def lookup(ip: String): Option[Insights] = {
      val parts = ip.split("\\.")
      if (parts.length != 4) None
      else
        try {
          val last = parts(3).toInt
          Some(Insights(
            riskScore = math.floor(last / 2.56 * 100) / 100,
            isAnonymous = last % 10 == 9,
            isHostingProvider = last % 10 == 7))
        } catch { case _: NumberFormatException => None }
    }
  }

  /** Resolver over cached Insights RESPONSE documents — the
    * reference's own test seam (Minfraud.cacheInsightsResource,
    * Minfraud.java:79) pre-loads per-address response JSON exactly
    * like this. Parses the real MaxMind response shape the reference
    * consumes (Normalized.insightsEnrichment, Normalized.java:574-590:
    * risk from `ip_address.risk`, the trait booleans from
    * `ip_address.traits`); only the HTTP transport stays out of
    * scope. */
  final class JsonInsightsResolver(cached: Map[String, String])
      extends InsightsResolver {
    @transient private lazy val mapper =
      new com.fasterxml.jackson.databind.ObjectMapper()
    def lookup(ip: String): Option[Insights] = cached.get(ip).flatMap { js =>
      try {
        val root = mapper.readTree(js)
        val ipNode = root.path("ip_address")
        val traits = ipNode.path("traits")
        Some(Insights(
          riskScore = ipNode.path("risk").asDouble(0.0),
          isAnonymous = traits.path("is_anonymous").asBoolean(false),
          isHostingProvider =
            traits.path("is_hosting_provider").asBoolean(false)))
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Enrich parsed events: attach insights for the source address as
    * event fields (minfraud_risk_score / minfraud_anonymous /
    * minfraud_hosting). One resolver per partition, matching the
    * reference's per-worker API client. */
  def enrich(events: Dataset[Event], resolver: InsightsResolver): Dataset[Event] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.mapPartitions { it =>
      it.map { e =>
        e.normalized.sourceAddress.flatMap(resolver.lookup) match {
          case None => e
          case Some(ins) => e.copy(fields = e.fields ++ Map(
            "minfraud_risk_score" -> ins.riskScore.toString,
            "minfraud_anonymous" -> ins.isAnonymous.toString,
            "minfraud_hosting" -> ins.isHostingProvider.toString))
        }
      }
    }
  }
}
