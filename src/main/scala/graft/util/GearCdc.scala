package graft.util

/** Gear content-defined chunking kernel (the rolling hash under
  * FastCDC, Xia et al. ATC'16) — the static JVM mirror of the
  * windowed-sum definition in [[graft.operators.Dedup.gearChunks]]'s
  * scaladoc, shared by the batch Column path and the oracle spec.
  *
  * The mod-2^32 windowed sum Σ_{k=1..min(i,w)} gear[c_{i-k+1}]·2^(k-1)
  * telescopes into the classic O(1)-per-char recurrence
  * `h = (h·2 + gear[c_in]) − gear[c_out]·2^w  (mod 2^32)` (at w = 32
  * the subtraction is a no-op: the outgoing term has been shifted out
  * of the low 32 bits), so the kernel is one primitive-long pass over
  * the codepoints — about three orders of magnitude faster than
  * evaluating the same sum as nested interpreted higher-order
  * functions, which is why [[graft.functions.GearCutsExpr]] exists.
  *
  * Codepoint semantics (not UTF-16 chars): positions and the `% 256`
  * table index match both engines' `substr`/`ascii`, which count
  * codepoints. */
object GearCdc {

  /** 256-entry gear table generated from md5 of the byte index — no
    * transcribed random table, any engine rebuilds it identically. */
  val Gear: Array[Long] = (0 until 256).map { b =>
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$b:gear".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8), 16)
  }.toArray

  /** 1-based codepoint positions whose trailing-window gear hash has
    * its low `maskBits` bits zero. */
  def cuts(text: String, maskBits: Int, window: Int): Array[Int] = {
    val cps = text.codePoints().toArray
    val mask = (1L << maskBits) - 1
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    var h = 0L
    var i = 0
    while (i < cps.length) {
      h = ((h << 1) + Gear(cps(i) % 256)) & 0xFFFFFFFFL
      if (window < 32 && i >= window)
        h = (h - ((Gear(cps(i - window) % 256) << window) & 0xFFFFFFFFL)) &
          0xFFFFFFFFL
      if ((h & mask) == 0L) out += (i + 1)
      i += 1
    }
    out.result()
  }

  /** [[cuts]] boxed into Catalyst array data, for codegen call sites. */
  def cutsArray(text: org.apache.spark.unsafe.types.UTF8String,
      maskBits: Int, window: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      cuts(text.toString, maskBits, window))
}
