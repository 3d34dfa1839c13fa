package graft.util

import scala.collection.mutable

/** Aho–Corasick multi-pattern matcher — ONE left-to-right pass over
  * the text finds every occurrence of every term, vs the |terms|
  * separate scans of a `contains`/`rlike` chain. This is the
  * scan-speed kernel under the banned-term screen: blocklists run to
  * thousands of terms, and at corpus scale the per-document cost must
  * not multiply with the list length.
  *
  * Standard construction (Aho & Corasick 1975): a trie over the terms,
  * BFS failure links, and per-node output sets PRE-MERGED along the
  * failure chain at build time so the scan never chases fail links for
  * outputs. Matching is case-exact — callers lowercase text and terms
  * on their own (engine-parity: Spark's and DuckDB's `lower` are the
  * proven pair in the oracles).
  *
  * Immutable after construction, so thread-safe; built once per plan
  * and shared by every task via the expression's reference object. */
final class AhoCorasick private (
    next: Array[mutable.LongMap[Int]],
    fail: Array[Int],
    out: Array[Array[Int]],
    val nTerms: Int) extends Serializable {

  @inline private def step(state: Int, c: Char): Int = {
    var s = state
    while (true) {
      val t = next(s).getOrElse(c.toLong, -1)
      if (t >= 0) return t
      if (s == 0) return 0
      s = fail(s)
    }
    0 // unreachable
  }

  /** Ordinals (ascending, distinct) of every term occurring in `text`
    * at least once; early-exits once all terms have been seen. */
  def distinctTerms(text: String): Array[Int] = {
    if (nTerms == 0 || text == null) return Array.emptyIntArray
    val seen = new java.util.BitSet(nTerms)
    var found = 0
    var s = 0
    var i = 0
    val n = text.length
    while (i < n && found < nTerms) {
      s = step(s, text.charAt(i))
      val o = out(s)
      var j = 0
      while (j < o.length) {
        if (!seen.get(o(j))) { seen.set(o(j)); found += 1 }
        j += 1
      }
      i += 1
    }
    val res = new Array[Int](found)
    var b = seen.nextSetBit(0)
    var k = 0
    while (b >= 0) { res(k) = b; k += 1; b = seen.nextSetBit(b + 1) }
    res
  }
}

object AhoCorasick {
  /** Build from the term list; empty terms are rejected (an empty
    * needle "matches" everywhere in no useful sense), duplicate terms
    * alias the FIRST copy's ordinal. */
  def apply(terms: Seq[String]): AhoCorasick = {
    require(terms.forall(t => t != null && t.nonEmpty),
      "banned terms must be non-empty")
    val next = mutable.ArrayBuffer(mutable.LongMap.empty[Int])
    val termAt = mutable.ArrayBuffer(-1) // term ordinal ending at node
    terms.zipWithIndex.foreach { case (t, ord) =>
      var s = 0
      t.foreach { c =>
        val existing = next(s).getOrElse(c.toLong, -1)
        s = if (existing >= 0) existing
        else {
          next += mutable.LongMap.empty[Int]
          termAt += -1
          next(s)(c.toLong) = next.size - 1
          next.size - 1
        }
      }
      if (termAt(s) < 0) termAt(s) = ord
    }
    val n = next.size
    val fail = new Array[Int](n)
    val out = Array.fill(n)(mutable.ArrayBuffer.empty[Int])
    (0 until n).foreach(s => if (termAt(s) >= 0) out(s) += termAt(s))
    val queue = mutable.Queue.empty[Int]
    next(0).foreach { case (_, child) => fail(child) = 0; queue += child }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      // BFS order: fail(s) is shallower, so its outputs are already
      // fully merged when s merges them
      out(s) ++= out(fail(s))
      next(s).foreach { case (c, child) =>
        var f = fail(s)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        // child sits strictly deeper than any state reachable from f,
        // so this lookup can never return child itself
        fail(child) = next(f).getOrElse(c, 0)
        queue += child
      }
    }
    new AhoCorasick(next.toArray, fail,
      out.map(_.distinct.sorted.toArray).toArray, terms.size)
  }
}
