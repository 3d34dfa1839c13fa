package graft

import scala.collection.mutable.ArrayBuffer
import org.scalatest.funsuite.AnyFunSuite
import graft.parse.MaxmindDb

/** Tests the MMDB binary reader against a minimal database built
  * byte-by-byte from the public MaxMind DB format spec (v2.0) —
  * ip_version 4, record size 24, two /24 networks, shared string via
  * a pointer, city + isp record shapes. */
class MaxmindDbSpec extends AnyFunSuite {

  // ---- data-section encoding helpers (control byte = type<<5 | size) ----
  private def str(s: String): Array[Byte] = {
    val b = s.getBytes("UTF-8")
    require(b.length < 285)
    if (b.length < 29) Array(((2 << 5) | b.length).toByte) ++ b
    else Array(((2 << 5) | 29).toByte, (b.length - 29).toByte) ++ b
  }
  private def dbl(d: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(d)
    Array(((3 << 5) | 8).toByte) ++
      (7 to 0 by -1).map(i => ((bits >> (8 * i)) & 0xff).toByte)
  }
  private def uint32(v: Long): Array[Byte] =
    Array(((6 << 5) | 4).toByte) ++
      (3 to 0 by -1).map(i => ((v >> (8 * i)) & 0xff).toByte)
  private def uint16(v: Int): Array[Byte] =
    Array(((5 << 5) | 2).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def ptr(offset: Int): Array[Byte] = {
    require(offset < 2048)
    Array(((1 << 5) | ((offset >> 8) & 0x7)).toByte, (offset & 0xff).toByte)
  }
  private def mapHdr(n: Int): Array[Byte] = {
    require(n < 29)
    Array(((7 << 5) | n).toByte)
  }

  // ---- the data section ----
  // offset 0: shared "GB" string (referenced by pointer from the city map)
  private val gbString = str("GB")
  // offset 3: city record
  private val cityRecord =
    mapHdr(3) ++
      str("city") ++ (mapHdr(1) ++ str("names") ++
        (mapHdr(1) ++ str("en") ++ str("London"))) ++
      str("country") ++ (mapHdr(1) ++ str("iso_code") ++ ptr(0)) ++
      str("location") ++ (mapHdr(3) ++
        str("latitude") ++ dbl(51.5) ++
        str("longitude") ++ dbl(-0.1) ++
        str("time_zone") ++ str("Europe/London"))
  private val cityOffset = gbString.length
  // isp record after the city record
  private val ispRecord =
    mapHdr(3) ++
      str("isp") ++ str("TestNet") ++
      str("autonomous_system_number") ++ uint32(15169) ++
      str("autonomous_system_organization") ++ str("Google")
  private val ispOffset = cityOffset + cityRecord.length
  private val dataSection = gbString ++ cityRecord ++ ispRecord

  // ---- binary search tree over 24-bit prefixes ----
  private val Empty = -1
  private def buildTree(entries: Seq[(Long, Int, Int)]): (Array[Byte], Int) = {
    // entries: (network base as ip long, prefix bits, data offset)
    val nodes = ArrayBuffer(Array(Empty, Empty)) // node 0
    val dataMark = -1000000 // dataMark - offset encodes a data record
    for ((base, bits, dataOff) <- entries) {
      var cur = 0
      for (b <- 0 until bits) {
        val side = ((base >>> (31 - b)) & 1L).toInt
        if (b == bits - 1) nodes(cur)(side) = dataMark - dataOff
        else {
          if (nodes(cur)(side) == Empty) {
            nodes += Array(Empty, Empty)
            nodes(cur)(side) = nodes.length - 1
          }
          cur = nodes(cur)(side)
        }
      }
    }
    val nodeCount = nodes.length
    val out = ArrayBuffer.empty[Byte]
    for (n <- nodes; side <- 0 to 1) {
      val raw = n(side)
      val value =
        if (raw == Empty) nodeCount
        else if (raw <= dataMark) nodeCount + 16 + (dataMark - raw)
        else raw
      out += ((value >> 16) & 0xff).toByte
      out += ((value >> 8) & 0xff).toByte
      out += (value & 0xff).toByte
    }
    (out.toArray, nodeCount)
  }

  private def ipLong(s: String): Long =
    graft.util.CidrUtil.ipToLong(s).get

  private lazy val mmdb: MaxmindDb = {
    val (tree, nodeCount) = buildTree(Seq(
      (ipLong("81.2.69.0"), 24, cityOffset),
      (ipLong("8.8.8.0"), 24, ispOffset)))
    val metadata =
      Array(0xab.toByte, 0xcd.toByte, 0xef.toByte) ++
        "MaxMind.com".getBytes("UTF-8") ++
        mapHdr(3) ++
        str("node_count") ++ uint32(nodeCount) ++
        str("record_size") ++ uint16(24) ++
        str("ip_version") ++ uint16(4)
    new MaxmindDb(tree ++ Array.fill(16)(0.toByte) ++ dataSection ++ metadata)
  }

  test("metadata parses") {
    assert(mmdb.recordSizeBits == 24)
    assert(mmdb.ipVersion == 4)
    assert(mmdb.nodeCount > 0)
  }

  test("city lookup resolves nested maps and the shared pointer") {
    val geo = mmdb.lookup("81.2.69.142").map(MaxmindDb.toGeo)
    assert(geo.isDefined)
    assert(geo.get.city.contains("London"))
    assert(geo.get.country.contains("GB")) // via pointer
    assert(geo.get.latitude.contains(51.5))
    assert(geo.get.longitude.contains(-0.1))
    assert(geo.get.timeZone.contains("Europe/London"))
  }

  test("isp lookup resolves asn fields") {
    val geo = mmdb.lookup("8.8.8.8").map(MaxmindDb.toGeo)
    assert(geo.get.isp.contains("TestNet"))
    assert(geo.get.asn.contains(15169))
    assert(geo.get.asOrg.contains("Google"))
  }

  test("unmapped address returns none") {
    assert(mmdb.lookup("1.2.3.4").isEmpty)
    assert(mmdb.lookup("81.2.70.1").isEmpty) // sibling /24
    assert(mmdb.lookup("not-an-ip").isEmpty)
  }

  test("MmdbResolver plugs into GeoIp.enrich") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val events = Seq(
      graft.model.Event("e1", new java.sql.Timestamp(0), "raw", "x",
        normalized = graft.model.Normalized(
          sourceAddress = Some("81.2.69.142")))).toDS()
    val out = graft.parse.GeoIp.enrich(events,
      new MaxmindDb.MmdbResolver(mmdb)).collect()
    assert(out.head.normalized.geo.flatMap(_.city).contains("London"))
  }
}
