package graft.util

import java.security.MessageDigest
import java.util.Locale

/** Row-local 32-bit SimHash — the pure-JVM mirror of the batch
  * aggregate form (graft.operators.Dedup.simhash): unigram tokens
  * (lowercase, space-split, empties dropped), tf-weighted ±1 votes per
  * bit, bit j of a token taken from hex digit j/4 of md5(token).
  * DedupSpec pins bit-for-bit equality with the batch operator.
  *
  * The batch form is an aggregation (explode + groupBy) because it
  * shares the shuffle-free doc_id fan-out with the other dedup
  * operators; per-document streaming ingestion wants the same hash
  * computed row-locally (one document per row), where an aggregation
  * would force a per-doc shuffle for no reason. */
object SimHash {

  private val Divisors = Array(8, 4, 2, 1)

  def of(text: String): Long = {
    val toks = text.toLowerCase(Locale.ROOT).split(" ").filter(_.nonEmpty)
    if (toks.isEmpty) return 0L
    val votes = new Array[Long](32)
    val md = MessageDigest.getInstance("MD5")
    toks.groupBy(identity).foreach { case (tok, occ) =>
      val w = occ.length.toLong
      val digest = md.digest(tok.getBytes("UTF-8"))
      val hex = digest.map("%02x".format(_)).mkString
      var j = 0
      while (j < 32) {
        val digit = Character.digit(hex.charAt(j / 4), 16)
        val bit = (digit / Divisors(j % 4)) % 2
        votes(j) += (2L * bit - 1L) * w
        j += 1
      }
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}
