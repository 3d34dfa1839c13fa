package graft.util

import java.text.Normalizer

/** Unicode normalization kernel shared by the codegen expression and
  * any JVM-side caller (the [[SimHash]]/[[GearCdc]] static-kernel
  * pattern: the expression's generated code calls straight into this,
  * so batch, streaming and SQL paths are bit-identical by
  * construction).
  *
  * Normalization forms are the four standard ones (UAX #15). The JDK
  * implements the Unicode normalization algorithm exactly — NFC of a
  * string is fully determined by the standard, so any conforming
  * engine (DuckDB's utf8proc `nfc_normalize`, ICU, the JDK) produces
  * byte-identical output, which is what makes NFC dedup oracle-able
  * across engines. */
object UnicodeNorm {
  /** Parse once at plan construction — an invalid form fails the
    * query at build time, not per row. */
  def formOf(name: String): Normalizer.Form = name.toUpperCase match {
    case "NFC" => Normalizer.Form.NFC
    case "NFD" => Normalizer.Form.NFD
    case "NFKC" => Normalizer.Form.NFKC
    case "NFKD" => Normalizer.Form.NFKD
    case other => throw new IllegalArgumentException(
      s"unknown normalization form '$other' (want NFC/NFD/NFKC/NFKD)")
  }

  /** `Normalizer.isNormalized` is a cheap scan that skips the rebuild
    * for already-normalized text — the overwhelmingly common case in
    * a mostly-ASCII corpus (ASCII is normalization-invariant in all
    * four forms). */
  def normalize(s: String, form: Normalizer.Form): String =
    if (Normalizer.isNormalized(s, form)) s
    else Normalizer.normalize(s, form)
}
