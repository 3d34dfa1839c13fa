package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Hand-computed cases for the training-data text operators added in
  * round 7: PII detection/scrubbing, benchmark decontamination and
  * Gopher-style repetition signals. */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("piiScrub counts and redacts each PII type; clean text untouched") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a@b.co and c.d+x@e-f.org, ip 10.0.0.1, " +
        "call 555-123-4567, ssn 123-45-6789"),
      (2L, "no pii here, just words and numbers 12345"),
      (3L, "9.9.9.9 9.9.9.9") // repeated type
    ).toDF("id", "t")
    val out = TextAnalysis.piiScrub(df, col("id"), col("t"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1).getAs[Long]("n_email") == 2L)
    assert(out(1).getAs[Long]("n_ipv4") == 1L)
    assert(out(1).getAs[Long]("n_phone") == 1L)
    assert(out(1).getAs[Long]("n_ssn") == 1L)
    assert(out(1).getAs[Long]("n_pii") == 5L)
    assert(out(1).getAs[Boolean]("has_pii"))
    assert(out(1).getAs[String]("scrubbed") ==
      "mail [EMAIL] and [EMAIL], ip [IPV4], call [PHONE], ssn [SSN]")
    assert(out(2).getAs[Long]("n_pii") == 0L)
    assert(!out(2).getAs[Boolean]("has_pii"))
    assert(out(2).getAs[String]("scrubbed") ==
      "no pii here, just words and numbers 12345")
    assert(out(3).getAs[Long]("n_ipv4") == 2L)
    assert(out(3).getAs[String]("scrubbed") == "[IPV4] [IPV4]")
  }

  test("piiScrub: ssn and phone patterns never cross-match") {
    import spark.implicits._
    val out = TextAnalysis.piiScrub(
      Seq((1L, "s 123-45-6789 p 555-123-4567")).toDF("id", "t"),
      col("id"), col("t")).head()
    assert(out.getAs[Long]("n_ssn") == 1L)
    assert(out.getAs[Long]("n_phone") == 1L)
    assert(out.getAs[String]("scrubbed") == "s [SSN] p [PHONE]")
  }

  test("decontaminate flags docs covering a benchmark item's shingles") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox sat still"), // shares a prefix
      (3L, "completely different words entirely here now")
    ).toDF("id", "t")
    val bench = Seq(
      (100L, "the quick brown fox jumps") // 3 trigrams
    ).toDF("bid", "bt")
    val out = TextAnalysis.decontaminate(corpus, col("id"), col("t"),
        bench, col("bid"), col("bt"), n = 3, minOverlapFrac = 0.5)
      .collect().map(r => (r.getAs[Long]("corpus_id"),
        r.getAs[Long]("bench_id"), r.getAs[Long]("n_overlap"),
        r.getAs[Double]("overlap_frac"))).toSet
    // doc 1 contains all 3 of the bench trigrams; doc 2 shares 2 of 3
    // ("the quick brown", "quick brown fox"); doc 3 shares none
    assert(out == Set((1L, 100L, 3L, 1.0), (2L, 100L, 2L, 2.0 / 3.0)))
  }

  test("repetitionStats: dup lines and top-bigram concentration gate") {
    import spark.implicits._
    val df = Seq(
      // 3 lines, 2 distinct -> dup_line_frac 1/3; bigrams across the
      // \n-joined text: tokens include the "c\na" seam token
      (1L, "a b c\na b c\nx y z"),
      // heavy bigram repetition, single line
      (2L, "go go go go go go"),
      (3L, "clean text with several distinct words here")
    ).toDF("id", "t")
    val out = TextAnalysis.repetitionStats(df, col("id"), col("t"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1).getAs[Long]("n_lines") == 3L)
    assert(out(1).getAs[Long]("n_distinct_lines") == 2L)
    assert(out(1).getAs[Double]("dup_line_frac") == 1.0 / 3.0)
    // "go go" appears 5 times out of 5 bigrams -> frac 1.0, gated out
    assert(out(2).getAs[Long]("n_grams") == 5L)
    assert(out(2).getAs[Long]("top_gram_n") == 5L)
    assert(out(2).getAs[Double]("top_gram_frac") == 1.0)
    assert(!out(2).getAs[Boolean]("repetition_ok"))
    assert(out(3).getAs[Boolean]("repetition_ok"))
  }

  test("repetitionStats: a doc shorter than n grams still gates ok") {
    import spark.implicits._
    val out = TextAnalysis.repetitionStats(
      Seq((1L, "word")).toDF("id", "t"), col("id"), col("t")).head()
    assert(out.getAs[Long]("n_grams") == 0L)
    assert(out.getAs[Boolean]("repetition_ok"))
  }

  test("surprisalScore: hand-computed integer goldens, OOV floor, lossless minCount=2 pruning") {
    import spark.implicits._
    // corpus bigram counts: "a b"=3, "b a"=1, "b c"=1 -> T=5, ilog2=2
    // model at minCount=2 keeps only "a b" (c=3, ilog2=1); the pruned
    // singletons come back through the OOV floor at c=1 (ilog2=0) —
    // exactly their true contribution
    val docs = Seq((1L, "a b a b"), (2L, "a B c"), (3L, "x"))
      .toDF("id", "t")
    val out = TextAnalysis.surprisalScore(docs, col("id"), col("t"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_ngrams"), r.getAs[Long]("surprisal"),
          r.getAs[Long]("mean_x1000"))).toMap
    assert(out(1L) == ((3L, 4L, 1333L))) // 1 + 2 + 1; floor(4000/3)
    assert(out(2L) == ((2L, 3L, 1500L))) // "a b"->1, "b c"->2
    assert(!out.contains(3L)) // < n tokens: nothing to score
    // pruning losslessness: minCount=1 (full model) gives identical rows
    val full = TextAnalysis.surprisalScore(docs, col("id"), col("t"),
      minCount = 1).collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_ngrams"), r.getAs[Long]("surprisal"),
          r.getAs[Long]("mean_x1000"))).toMap
    assert(full == out)
  }

  test("llrQualityScore: hand-computed integer LLR goldens, OOV scores zero, strict > gate") {
    import spark.implicits._
    // model from the labeled pair: good(2,0) nice(1,0) bad(0,2)
    // ugly(0,1); T_pos = T_neg = 3 (ilog2 = 1)
    // s(good) = (ilog2(3)-1) - (ilog2(1)-1) = 1;  s(nice) = 1
    // s(bad) = -1; s(ugly) = -1; OOV "meh" = (0-1)-(0-1) = 0
    val corpus = Seq((1L, "good good nice"), (2L, "bad bad ugly"),
      (3L, "good bad meh")).toDF("id", "t")
    val labeled = Seq(("good good nice", true), ("bad bad ugly", false))
      .toDF("lt", "lab")
    val out = TextAnalysis.llrQualityScore(corpus, col("id"), col("t"),
        labeled, col("lt"), col("lab"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("score"),
          r.getAs[Boolean]("pred_quality")))).toMap
    assert(out(1L) == ((3L, 3L, true)))
    assert(out(2L) == ((3L, -3L, false)))
    // mixed doc lands exactly on 0: the gate is strictly positive
    assert(out(3L) == ((3L, 0L, false)))
  }

  test("llrQualityScore separates classes it was trained on") {
    import spark.implicits._
    // 40 docs, half marker-laden, half plain; train on the even half,
    // score everything — every marker doc must outscore every plain doc
    val docs = (1L to 40L).map { i =>
      val t = if (i % 2 == 0) "vector stream batch vector data row"
      else "the a slow small data row"
      (i, t)
    }.toDF("id", "t")
    val labeled = docs.filter(col("id") <= 20L)
      .withColumn("lab", col("t").contains("vector"))
    val rows = TextAnalysis.llrQualityScore(docs, col("id"), col("t"),
        labeled, col("t"), col("lab")).collect()
    val (marker, plain) = rows.partition(_.getAs[Long]("doc_id") % 2 == 0)
    assert(marker.map(_.getAs[Long]("score")).min >
      plain.map(_.getAs[Long]("score")).max)
    assert(marker.forall(_.getAs[Boolean]("pred_quality")))
  }

  test("bpeTrainMerges: the Sennrich low/lower example, ties on pair order") {
    import spark.implicits._
    // word counts: low x2, lower x1, new x1, newer x1
    // pair counts r1: l-o 3, o-w 3, w-e 2, e-r 2, n-e 2, e-w 2
    //  -> tie at 3 breaks to '<l> <o>' (asc) -> lo
    // r2: lo-w 3 -> low;  r3: tie at 2 -> er;  r4: tie at 2 -> ew
    val docs = Seq((1L, "low lower low"), (2L, "new newer")).toDF("id", "t")
    val merges = TextAnalysis.bpeTrainMerges(docs, col("t"), nMerges = 4)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(merges.toSeq == Seq(
      (1L, "l", "o", "lo", 3L),
      (2L, "lo", "w", "low", 3L),
      (3L, "e", "r", "er", 2L),
      (4L, "e", "w", "ew", 2L)))
  }

  test("bpeTrainMerges: fully-merged vocabulary ends training early") {
    import spark.implicits._
    // 'ab' merges to one symbol in round 1; round 2 has no pairs left
    val docs = Seq((1L, "ab ab")).toDF("id", "t")
    assert(TextAnalysis.bpeTrainMerges(docs, col("t"), 5).count() == 1L)
    // single-char words have no pairs at all: zero learnable merges
    val single = Seq((1L, "a b a b")).toDF("id", "t")
    assert(TextAnalysis.bpeTrainMerges(single, col("t"), 5).count() == 0L)
  }

  test("chunkDocuments: window/overlap arithmetic, short docs, rejects bad overlap") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
      (2L, "a b"),
      (3L, "")).toDF("id", "t")
    val out = TextAnalysis.chunkDocuments(docs, col("id"), col("t"),
        maxTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_no").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3)))).toMap
    // stride 3: starts 0, 3, 6 — ceil((10-4)/3)+1 = 3 chunks, the
    // overlap token shared between consecutive windows
    assert(out((1L, 0L)) == ((4L, "t1 t2 t3 t4")))
    assert(out((1L, 1L)) == ((4L, "t4 t5 t6 t7")))
    assert(out((1L, 2L)) == ((4L, "t7 t8 t9 t10")))
    // short doc: exactly itself as chunk 0
    assert(out((2L, 0L)) == ((2L, "a b")))
    // empty doc yields nothing; no other chunks exist
    assert(out.size == 4)
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkDocuments(docs, col("id"), col("t"), 4, 4)
    }
    // map-only: no exchange anywhere in the plan
    val plan = TextAnalysis.chunkDocuments(docs, col("id"), col("t"), 4, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("bpeEncodeCounts: per-doc token costs under the trained merges") {
    import spark.implicits._
    val docs = Seq((1L, "low lower low"), (2L, "new newer")).toDF("id", "t")
    val merges = Seq("l" -> "o", "lo" -> "w", "e" -> "r", "e" -> "w")
    val out = TextAnalysis.bpeEncodeCounts(docs, col("id"), col("t"), merges)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // low -> <low> (1), lower -> <low> <er> (2): 3 words, 4 tokens
    assert(out(1L) == ((3L, 4L)))
    // new -> <n> <ew> (2), newer -> <n> <ew> <er> (3): 2 words, 5 tokens
    assert(out(2L) == ((2L, 5L)))
  }
}
