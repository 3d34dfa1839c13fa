package graft.util

/** IPv4 / CIDR helpers (ref s/CidrUtil.java:126-380 — same surface:
  * parse, membership, well-known private ranges).
  */
object CidrUtil {

  /** "1.2.3.4" → unsigned 32-bit value in a Long, or None if malformed. */
  def ipToLong(addr: String): Option[Long] = {
    if (addr == null) return None
    val parts = addr.split('.')
    if (parts.length != 4) return None
    var acc = 0L
    var i = 0
    while (i < 4) {
      val p = parts(i)
      if (p.isEmpty || p.length > 3 || !p.forall(_.isDigit)) return None
      val v = p.toInt
      if (v > 255) return None
      acc = (acc << 8) | v
      i += 1
    }
    Some(acc)
  }

  def longToIp(v: Long): String =
    s"${(v >>> 24) & 0xff}.${(v >>> 16) & 0xff}.${(v >>> 8) & 0xff}.${v & 0xff}"

  /** "10.0.0.0/8" → (base address, prefix length); bare IP → /32.
    * Throws IllegalArgumentException on malformed input (construction
    * time, driver side — fail fast). */
  def parseCidr(cidr: String): (Long, Int) = {
    val (ipPart, bits) = cidr.indexOf('/') match {
      case -1 => (cidr, 32)
      case i => (cidr.substring(0, i), cidr.substring(i + 1).toInt)
    }
    require(bits >= 0 && bits <= 32, s"bad prefix length in $cidr")
    val ip = ipToLong(ipPart)
      .getOrElse(throw new IllegalArgumentException(s"bad address in $cidr"))
    val masked = if (bits == 0) 0L else ip & (0xffffffffL << (32 - bits)) & 0xffffffffL
    (masked, bits)
  }

  /** Single-CIDR membership (no trie). */
  def cidrContains(cidr: String, addr: String): Boolean = {
    val (base, bits) = parseCidr(cidr)
    ipToLong(addr) match {
      case Some(ip) =>
        val shift = 32 - bits
        if (bits == 0) true else (ip >>> shift) == (base >>> shift)
      case None => false
    }
  }

  /** Protocol-agnostic CIDR membership (IPv4 AND IPv6) via address
    * byte-prefix comparison — needed for named-subnet entry keys,
    * which the reference declares as v6 CIDRs (identitymanager
    * named_subnets, e.g. fd00::/48). Inputs must be literal
    * addresses: `InetAddress.getByName` performs no DNS lookup for a
    * valid literal, and anything malformed returns false. */
  def cidrContainsAny(cidr: String, addr: String): Boolean = try {
    // refuse non-literal input up front: getByName on a hostname
    // would fall through to DNS resolution
    if (!(addr.contains(':') || isValidIpv4(addr))) return false
    val Array(baseS, lenS) = cidr.split("/")
    val plen = lenS.toInt
    val base = java.net.InetAddress.getByName(baseS).getAddress
    val a = java.net.InetAddress.getByName(addr).getAddress
    if (a.length != base.length || plen < 0 || plen > a.length * 8) false
    else {
      val fullBytes = plen / 8
      val remBits = plen % 8
      (0 until fullBytes).forall(i => a(i) == base(i)) && (remBits == 0 || {
        val mask = (0xff00 >> remBits) & 0xff
        (a(fullBytes) & mask) == (base(fullBytes) & mask)
      })
    }
  } catch { case _: Exception => false }

  /** RFC1918 + loopback + link-local, as the reference's internal-address
    * exclusion set (ref s/CidrUtil.java:298-380). */
  val privateRanges: Seq[String] = Seq(
    "10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16",
    "127.0.0.0/8", "169.254.0.0/16")

  lazy val privateTrie: InetRadix = InetRadix(privateRanges)

  def isPrivate(addr: String): Boolean = privateTrie.contains(addr)

  def isValidIpv4(addr: String): Boolean = ipToLong(addr).isDefined

  /** Forward-confirmed reverse DNS resolver surface: ip → canonical
    * hostname, hostname → addresses. Pluggable so the check is
    * testable without real DNS; `JvmDnsResolver` is the production
    * implementation over InetAddress. */
  trait DnsResolver extends Serializable {
    def canonicalHostName(ip: String): Option[String]
    def addressesOf(host: String): Seq[String]
  }

  /** InetAddress-backed resolver (what the reference calls,
    * s/CidrUtil.java:75-93). */
  final class JvmDnsResolver extends DnsResolver {
    def canonicalHostName(ip: String): Option[String] =
      try Option(java.net.InetAddress.getByName(ip).getCanonicalHostName)
      catch { case _: java.net.UnknownHostException => None }
    def addressesOf(host: String): Seq[String] =
      try java.net.InetAddress.getAllByName(host).toSeq.map(_.getHostAddress)
      catch { case _: java.net.UnknownHostException => Seq.empty }
  }

  /** Forward-confirmed reverse-DNS canonical host check (ref
    * s/CidrUtil.java:71-124): resolve the address to its canonical
    * hostname; a bare echo of the address means the lookup failed;
    * forward-confirm the hostname resolves back to the address; then
    * apply the (full-match) pattern. Used by AuthProfile's GCP-source
    * classification (`.*\.google\.com$`). */
  def resolvedCanonicalHostMatches(ip: String, pattern: String,
      resolver: DnsResolver = new JvmDnsResolver): Boolean =
    resolver.canonicalHostName(ip) match {
      case Some(hn) if hn != ip =>
        resolver.addressesOf(hn).contains(ip) && hn.matches(pattern)
      case _ => false
    }
}
