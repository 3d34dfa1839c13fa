package graft.util

/** Binary radix (patricia-style, bitwise) trie over IPv4 space for
  * O(32) CIDR membership tests (ref s/InetRadix.java:13-116 — same
  * capability, written fresh as a bit trie).
  *
  * Used driver-side to build a small immutable structure that is then
  * broadcast to executors; lookups are allocation-free.
  */
final class InetRadix extends Serializable {

  private final class Node extends Serializable {
    var zero: Node = _
    var one: Node = _
    var terminal: Boolean = false
  }

  private val root = new Node

  /** Insert a CIDR like "10.0.0.0/8" (or a bare IP = /32). */
  def add(cidr: String): Unit = {
    val (ip, bits) = CidrUtil.parseCidr(cidr)
    var n = root
    var i = 31
    val stop = 32 - bits
    while (i >= stop) {
      val b = (ip >>> i) & 1L
      if (b == 0) {
        if (n.zero == null) n.zero = new Node
        n = n.zero
      } else {
        if (n.one == null) n.one = new Node
        n = n.one
      }
      i -= 1
    }
    n.terminal = true
  }

  /** True if the address falls inside any inserted CIDR. */
  def contains(addr: String): Boolean = {
    CidrUtil.ipToLong(addr) match {
      case Some(ip) => containsLong(ip)
      case None => false
    }
  }

  def containsLong(ip: Long): Boolean = {
    var n = root
    var i = 31
    while (i >= 0) {
      if (n.terminal) return true
      n = if (((ip >>> i) & 1L) == 0) n.zero else n.one
      if (n == null) return false
      i -= 1
    }
    n.terminal
  }

  def isEmpty: Boolean = root.zero == null && root.one == null && !root.terminal
}

object InetRadix {
  def apply(cidrs: Iterable[String]): InetRadix = {
    val t = new InetRadix
    cidrs.foreach(t.add)
    t
  }
}
