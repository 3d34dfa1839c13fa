package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Functions
import graft.operators.Dedup

class UnicodeNormSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // composed U+00E9 / U+00EF vs decomposed base + U+0301 / U+0308 —
  // byte-distinct, canonically equivalent
  private val composed = "caf\u00e9 na\u00efve"
  private val decomposed = "cafe\u0301 nai\u0308ve"

  test("kernel: NFC composes, NFD decomposes, ASCII is a no-op, " +
      "NFKC folds compatibility characters, bad form throws") {
    import java.text.Normalizer.Form
    assert(composed != decomposed) // the premise: bytes differ
    assert(graft.util.UnicodeNorm.normalize(decomposed, Form.NFC) == composed)
    assert(graft.util.UnicodeNorm.normalize(composed, Form.NFD) == decomposed)
    val ascii = "plain ascii text 123"
    assert(graft.util.UnicodeNorm.normalize(ascii, Form.NFC) eq ascii)
    // published NFKC mappings: U+FB01 ligature fi, U+FF21 full-width A,
    // U+2460 circled one
    assert(graft.util.UnicodeNorm.normalize("ﬁle", Form.NFKC) == "file")
    assert(graft.util.UnicodeNorm.normalize("ＡBC", Form.NFKC) == "ABC")
    assert(graft.util.UnicodeNorm.normalize("①", Form.NFKC) == "1")
    // NFC leaves compatibility characters alone
    assert(graft.util.UnicodeNorm.normalize("ﬁle", Form.NFC) == "ﬁle")
    intercept[IllegalArgumentException] {
      graft.util.UnicodeNorm.formOf("NFX")
    }
  }

  test("expression: NFC equates the twin forms, null -> null, " +
      "non-BMP text passes through, invalid form fails at build") {
    val df = Seq(composed, decomposed, "plain", null,
      "emoji 😀 stays").toDF("t")
    val out = df.select(
      Functions.unicodeNormalize(col("t")).as("nfc"),
      Functions.unicodeNormalize(col("t"), "NFKD").as("nfkd")).collect()
    assert(out(0).getString(0) == composed)
    assert(out(1).getString(0) == composed) // decomposed -> composed
    assert(out(0).getString(1) == decomposed) // NFKD decomposes
    assert(out(2).getString(0) == "plain")
    assert(out(3).isNullAt(0) && out(3).isNullAt(1))
    assert(out(4).getString(0) == "emoji 😀 stays")
    intercept[IllegalArgumentException] {
      Functions.unicodeNormalize(col("t"), "NOPE")
    }
  }

  test("expression stays inside whole-stage codegen; no ScalaUDF node") {
    val df = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(Functions.unicodeNormalize(col("text")).as("n"))
    val planStr = df.queryExecution.executedPlan.toString
    assert(!planStr.toLowerCase.contains("scalaudf"))
    assert(planStr.contains("*(1) Project")) // codegen stage marker
    assert(df.count() > 0)
  }

  test("unicodeDedup: NFC-equivalent twins collapse where exactDedup " +
      "misses them; min-id election; NFKC catches full-width twins too") {
    val docs = Seq(
      (10L, "a " + composed + " story"),
      (11L, "a " + decomposed + " story"), // canonical twin of 10
      (12L, "an unrelated document"),
      (13L, "ＡＢＣ wide"), // full-width ABC
      (14L, "ABC wide") // NFKC twin of 13, NOT an NFC twin
    ).toDF("doc_id", "text")
    // byte-exact dedup sees 5 singleton groups
    assert(Dedup.exactDedup(docs, col("doc_id"), col("text"))
      .filter(col("n_copies") >= 2).count() == 0)
    val nfc = Dedup.unicodeDedup(docs, col("doc_id"), col("text"))
      .collect()
    assert(nfc.length == 1)
    assert(nfc(0).getAs[Long]("canonical_id") == 10L)
    assert(nfc(0).getAs[Long]("n_copies") == 2L)
    val nfkc = Dedup.unicodeDedup(docs, col("doc_id"), col("text"),
      form = "NFKC").collect()
    assert(nfkc.map(_.getAs[Long]("canonical_id")).toSet == Set(10L, 13L))
  }

  test("unicodeDedup plan: one hash-aggregate exchange, the exactDedup shape") {
    val df = Dedup.unicodeDedup(
      graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"),
      col("doc_id"), col("text"))
    val p = df.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).length == 1, p)
    assert(!p.contains("rangepartitioning"), p)
  }
}
