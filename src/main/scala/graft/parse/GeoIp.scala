package graft.parse

import org.apache.spark.sql.Dataset
import graft.model.{Event, Geo}
import graft.util.CidrUtil

/** GeoIP enrichment (ref s/parser/GeoIP.java:18-300; the reference
  * holds a per-worker Maxmind reader because the handle is not
  * serializable — same pattern here: the resolver is built lazily
  * per partition from a small serializable spec).
  *
  * No Maxmind database ships in this environment, so the bundled
  * resolver is a longest-prefix CIDR table (fully functional, exact);
  * a Maxmind-backed implementation would subclass `GeoIpResolver` and
  * nothing else changes.
  */
object GeoIp {

  trait GeoIpResolver extends Serializable {
    def lookup(ip: String): Option[Geo]
  }

  /** Longest-prefix-match over a static CIDR→Geo table. */
  final class CidrTableResolver(entries: Seq[(String, Geo)]) extends GeoIpResolver {
    private val parsed: Seq[(Long, Int, Geo)] = entries.map { case (cidr, geo) =>
      val (base, bits) = CidrUtil.parseCidr(cidr)
      (base, bits, geo)
    }.sortBy(-_._2) // longest prefix first

    def lookup(ip: String): Option[Geo] =
      CidrUtil.ipToLong(ip).flatMap { v =>
        parsed.collectFirst {
          case (base, bits, geo)
              if bits == 0 || (v >>> (32 - bits)) == (base >>> (32 - bits)) =>
            geo
        }
      }
  }

  /** Enrich parsed events with geo data for their source address.
    * One resolver instance per partition (the Maxmind pattern). */
  def enrich(events: Dataset[Event], resolver: GeoIpResolver): Dataset[Event] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.mapPartitions { it =>
      it.map { e =>
        val geo = e.normalized.sourceAddress.flatMap(resolver.lookup)
        if (geo.isEmpty) e
        else e.copy(normalized = e.normalized.copy(geo = geo))
      }
    }
  }
}
