package graft.util

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint kernel (Schleimer, Wilkerson & Aiken, SIGMOD
  * 2003 — the MOSS local algorithm): hash every codepoint `k`-gram,
  * slide a window of `w` consecutive hashes, keep the minimum of each
  * window, and return the DISTINCT selected hash values. The static
  * JVM mirror of the declarative definition that
  * [[graft.operators.Dedup.winnowingFingerprints]] used to build from
  * explode + a doc-keyed Window — that shape shuffles ~30× the corpus
  * text volume (one row per character through a hash(doc_id)
  * exchange) once the bench-scale fan-out pre-partition no-ops at
  * cluster scale, while the selection itself is a pure per-document
  * function needing no distribution at all. Same
  * kernel-behind-codegen move as [[GearCdc]].
  *
  * Fingerprint VALUE semantics match the DuckDB oracle exactly:
  * `substr(md5(substr(t, i, k)), 1, 8)` — the first 8 lowercase hex
  * chars of the md5 of the gram's UTF-8 bytes, positions counted in
  * codepoints (both engines' `substr` semantics). Lexicographic min
  * over those hex strings equals unsigned-int min over the digest's
  * first 4 bytes, so the window minimum runs on primitive ints with a
  * monotone deque — one O(n) pass per document. Tie positions inside
  * a window don't change the value set (the paper's robust-winnowing
  * remark), keeping the selection engine-portable.
  */
object WinnowFp {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private val Empty = new GenericArrayData(new Array[AnyRef](0))

  /** Distinct window-minimum gram hashes of `text`, in first-selection
    * order, as 8-hex-char strings. Empty when the text has fewer than
    * k+w-1 codepoints (no complete window — matching the declarative
    * form's `i <= n-(w-1)` cutoff). */
  def fingerprints(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val bytes = text.getBytes
    // codepoint start offsets (UTF-8 lead-byte walk), plus end sentinel
    val offB = new scala.collection.mutable.ArrayBuilder.ofInt
    var p = 0
    while (p < bytes.length) {
      offB += p
      val b = bytes(p) & 0xFF
      p += (if (b < 0x80) 1 else if (b < 0xE0) 2 else if (b < 0xF0) 3 else 4)
    }
    offB += bytes.length
    val off = offB.result()
    val nChars = off.length - 1
    val n = nChars - (k - 1) // gram count
    if (n < w) return Empty

    val md = md5.get()
    val h = new Array[Int](n)
    var i = 0
    while (i < n) {
      md.reset()
      md.update(bytes, off(i), off(i + k) - off(i))
      val d = md.digest()
      h(i) = ((d(0) & 0xFF) << 24) | ((d(1) & 0xFF) << 16) |
        ((d(2) & 0xFF) << 8) | (d(3) & 0xFF)
      i += 1
    }

    // monotone deque sliding minimum over windows [j-w+1, j]
    val seen = new java.util.HashSet[Integer]
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef]
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0
    var j = 0
    while (j < n) {
      while (tail > head &&
          java.lang.Integer.compareUnsigned(h(dq(tail - 1)), h(j)) >= 0)
        tail -= 1
      dq(tail) = j
      tail += 1
      if (dq(head) <= j - w) head += 1
      if (j >= w - 1) {
        val m = h(dq(head))
        if (seen.add(m))
          out += UTF8String.fromString(f"${m & 0xFFFFFFFFL}%08x")
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }
}
