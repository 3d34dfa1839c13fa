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

  test("decontaminateBloom: bloom prunes map-side, exact join decides — equal to decontaminate") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox sat still"),
      (3L, "completely different words entirely here now"),
      (4L, "spark shuffles wide tables across many executors tonight")
    ).toDF("id", "t")
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("bid", "bt")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("corpus_id"), r.getAs[Long]("bench_id"),
        r.getAs[Long]("n_overlap"), r.getAs[Long]("n_bench_sh"),
        r.getAs[Double]("overlap_frac"))).toSet
    val exact = rows(TextAnalysis.decontaminate(corpus, col("id"),
      col("t"), bench, col("bid"), col("bt"), n = 3, minOverlapFrac = 0.5))
    val bloom = TextAnalysis.decontaminateBloom(corpus, col("id"),
      col("t"), bench, col("bid"), col("bt"), n = 3, minOverlapFrac = 0.5)
    assert(rows(bloom) == exact)
    // the prefilter is IN the plan, map-side, before the gram join
    val p = bloom.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), s"bloom prefilter missing:\n$p")
    // an undersized bloom (capacity 1 for ~dozens of grams -> high
    // fpp) must change NOTHING: the sketch prunes, the exact join
    // decides
    val tiny = rows(TextAnalysis.decontaminateBloom(corpus, col("id"),
      col("t"), bench, col("bid"), col("bt"), n = 3, minOverlapFrac = 0.5,
      expectedGrams = 1L))
    assert(tiny == exact)
  }

  test("bpeFertility: per-stratum tokens-per-word permille under a merge table") {
    import spark.implicits._
    // merges fuse 'a b' -> 'ab': words "ab" cost 1 token, others
    // cost |chars| tokens
    val docs = Seq(
      (1L, "X", "ab ab cd"),  // 2*1 + 2 = 4 bpe over 3 words
      (2L, "Y", "ab xyz")     // 1 + 3 = 4 bpe over 2 words
    ).toDF("id", "src", "t")
    val out = TextAnalysis.bpeFertility(docs, col("id"), col("src"),
        col("t"), Seq("a" -> "b")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("X") == (3L, 4L, 1333L))
    assert(out("Y") == (2L, 4L, 2000L))
  }

  test("scriptMix: codepoint-range counts and dominant family, hand-computed") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abc 12"),          // 3 latin, 2 digit, 1 space(other) -> latin
      (2L, "你好世界 ok"),      // 4 cjk, 2 latin, 1 other -> cjk
      (3L, "Привет!"),         // 6 cyrillic, 1 other -> cyrillic
      (4L, "café"),            // é = U+00E9 counts latin (extended range)
      (5L, ""),                // empty
      (6L, "... ---")          // all other
    ).toDF("id", "t")
    val out = TextAnalysis.scriptMix(docs, col("id"), col("t"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_cp"), r.getAs[Long]("n_latin"),
         r.getAs[Long]("n_digit"), r.getAs[Long]("n_cyrillic"),
         r.getAs[Long]("n_cjk"), r.getAs[Long]("n_other"),
         r.getAs[String]("main_script"))).toMap
    assert(out(1L) == (6L, 3L, 2L, 0L, 0L, 1L, "latin"))
    assert(out(2L) == (7L, 2L, 0L, 0L, 4L, 1L, "cjk"))
    assert(out(3L) == (7L, 0L, 0L, 6L, 0L, 1L, "cyrillic"))
    assert(out(4L) == (4L, 4L, 0L, 0L, 0L, 0L, "latin"))
    assert(out(5L) == (0L, 0L, 0L, 0L, 0L, 0L, "empty"))
    assert(out(6L) == (7L, 0L, 0L, 0L, 0L, 7L, "other"))
    // null text counts as empty, never a -1 size poisoning
    val withNull = Seq((9L, Option.empty[String])).toDF("id", "t")
    val n = TextAnalysis.scriptMix(withNull, col("id"), col("t")).head()
    assert(n.getAs[Long]("n_cp") == 0L &&
      n.getAs[String]("main_script") == "empty")
  }

  test("ngramDiversity: hand-computed per-stratum type-token and top-gram share") {
    import spark.implicits._
    val docs = Seq(
      // stratum A bigrams: "a b","b a","a b" + "a b" -> total 4,
      // distinct 2 {"a b":3, "b a":1}: ttr 500, top 750
      ("A", "a b a b"), ("A", "a b"),
      // stratum B: all distinct bigrams -> ttr 1000, top 333
      ("B", "x y z w"),
      // stratum C: single token, no bigrams -> no row
      ("C", "solo")
    ).toDF("src", "t")
    val out = TextAnalysis.ngramDiversity(docs, col("src"), col("t"), n = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.keySet == Set("A", "B"))
    assert(out("A") == (4L, 2L, 500L, 750L))
    assert(out("B") == (3L, 3L, 1000L, 333L))
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

  test("bpeTrainMergesBatched: batch equals the greedy prefix where pairs are disjoint with distinct counts") {
    import spark.implicits._
    // four symbol-disjoint dominant pairs with strictly distinct
    // counts and no merge-created pair outranking them: the regime
    // where batched-accept provably reproduces greedy order
    val docs = Seq((1L,
      (Seq.fill(50)("ab") ++ Seq.fill(40)("cd") ++ Seq.fill(30)("ef") ++
        Seq.fill(20)("gh")).mkString(" "))).toDF("id", "t")
    val greedy = TextAnalysis.bpeTrainMerges(docs, col("t"), nMerges = 4)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    val batched = TextAnalysis.bpeTrainMergesBatched(docs, col("t"),
        batchSize = 4, maxRounds = 1)
      .orderBy("merge_no").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(5)))
    // ONE round learns all four merges, in greedy's exact order
    assert(batched.map(_._2).toSet == Set(1L))
    assert(batched.map(b => (b._3, b._4, b._5)).toSeq == greedy)
    assert(batched.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("bpeTrainMergesBatched: symbol conflicts defer to the next round") {
    import spark.implicits._
    // 'aaa'x10: top pair <a> <a> (cnt 20); every other <a>-touching
    // candidate in the window is rejected this round — the follow-up
    // <aa> <a> merge must wait for round 2's recount
    val docs = Seq((1L, Seq.fill(10)("aaa").mkString(" "))).toDF("id", "t")
    val out = TextAnalysis.bpeTrainMergesBatched(docs, col("t"),
        batchSize = 8, maxRounds = 2)
      .orderBy("merge_no").collect()
      .map(r => (r.getLong(1), r.getString(4), r.getLong(5)))
    assert(out.toSeq == Seq((1L, "aa", 20L), (2L, "aaa", 10L)))
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

  test("bm25TopK: hand-computed integer Okapi scores and ranking") {
    import spark.implicits._
    // N=4, tot=12, avgdl = 12 DIV 4 = 3; w(tf,dl) =
    // (1320000*tf) DIV (60*tf + 18 + 18*dl)
    val docs = Seq(
      (1L, "apple banana apple"),          // dl=3
      (2L, "apple cherry"),                // dl=2
      (3L, "banana banana banana banana"), // dl=4
      (4L, "durian elder fig")             // dl=3
    ).toDF("id", "t")
    val out = TextAnalysis.bm25TopK(docs, col("id"), col("t"),
        Seq("qa" -> "apple banana",
          "qb" -> "apple banana cherry durian"), k = 10)
      .collect()
      .map(r => (r.getAs[String]("query_id"), r.getAs[Long]("rank")) ->
        ((r.getAs[Long]("doc_id"), r.getAs[Long]("score")))).toMap
    // qa: idf(apple)=idf(banana)=ilog2(4 DIV 2)=1
    //   d1: apple tf=2,dl=3 -> 2640000 DIV 192 = 13750; banana -> 10000
    //   d2: apple tf=1,dl=2 -> 1320000 DIV 114 = 11578
    //   d3: banana tf=4,dl=4 -> 5280000 DIV 330 = 16000
    assert(out(("qa", 1L)) == ((1L, 23750L)))
    assert(out(("qa", 2L)) == ((3L, 16000L)))
    assert(out(("qa", 3L)) == ((2L, 11578L)))
    // qb adds cherry/durian at idf=ilog2(4)=2
    assert(out(("qb", 1L)) == ((2L, 11578L + 2 * 11578L)))
    assert(out(("qb", 2L)) == ((1L, 23750L)))
    assert(out(("qb", 3L)) == ((4L, 2 * 10000L)))
    assert(out(("qb", 4L)) == ((3L, 16000L)))
    assert(out.size == 7)
  }

  test("bm25TopK: majority-term idf clamps to 0; k truncates; ties break on doc_id") {
    import spark.implicits._
    val docs = Seq((1L, "x the"), (2L, "y the"), (3L, "z the"),
      (4L, "w q")).toDF("id", "t")
    val all = TextAnalysis.bm25TopK(docs, col("id"), col("t"),
        Seq("q" -> "the x"), k = 10).collect()
      .map(r => r.getAs[Long]("rank") ->
        ((r.getAs[Long]("doc_id"), r.getAs[Long]("score")))).toMap
    // 'the' is in 3 of 4 docs: idf = ilog2(4 DIV 3) = 0 — docs 2,3
    // surface as candidates but score exactly 0, ranked by doc_id
    assert(all(1L)._1 == 1L && all(1L)._2 > 0L)
    assert(all(2L) == ((2L, 0L)))
    assert(all(3L) == ((3L, 0L)))
    assert(all.size == 3) // doc 4 shares no query term
    val trunc = TextAnalysis.bm25TopK(docs, col("id"), col("t"),
      Seq("q" -> "the x"), k = 2).collect()
    assert(trunc.length == 2)
  }

  test("c4Filters: each published rule fires on its own line/page") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq(
        "this line has six words here.",      // keep
        "too short.",                          // < 5 words
        "no terminal punctuation at all here", // no punctuation
        "javascript makes this line get dropped now.", // javascript
        "another good line with six words!",   // keep
        "quoted lines can end with a quote\"", // keep (closing quote)
        "we should avoid using bare javascript." // trailing-punct strip
      ).mkString("\n")),
      (2L, Seq( // 3 kept lines but the page has the lorem phrase
        "this page looks quite acceptable today.",
        "but lorem ipsum appears right here sadly.",
        "a third acceptable line appears here too.").mkString("\n")),
      (3L, "function f() { return 1; } is code."), // curly bracket
      (4L, "some heinous content appears in this line today."), // bad word
      (5L, "two acceptable lines are not enough sadly.\n\n" + // blank line
        "since the threshold requires three kept lines.")
    ).toDF("id", "t")
    val out = TextAnalysis.c4Filters(docs, col("id"), col("t"),
        badWords = Seq("heinous")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_lines") == 7L)
    assert(out(1L).getAs[Long]("n_kept") == 3L)
    assert(out(1L).getAs[Boolean]("page_ok"))
    assert(out(1L).getAs[String]("cleaned_text") == Seq(
      "this line has six words here.",
      "another good line with six words!",
      "quoted lines can end with a quote\"").mkString("\n"))
    assert(out(2L).getAs[Long]("n_kept") == 3L &&
      !out(2L).getAs[Boolean]("page_ok")) // lorem ipsum page drop
    assert(!out(3L).getAs[Boolean]("page_ok")) // curly bracket page drop
    assert(!out(4L).getAs[Boolean]("page_ok")) // blocklist page drop
    assert(out(5L).getAs[Long]("n_lines") == 2L) // blank line skipped
    assert(out(5L).getAs[Long]("n_kept") == 2L &&
      !out(5L).getAs[Boolean]("page_ok")) // below minKeptLines
    // a page with zero kept lines reports null cleaned_text
    val empty = TextAnalysis.c4Filters(
      Seq((9L, "no punctuation anywhere on this page")).toDF("id", "t"),
      col("id"), col("t")).head()
    assert(empty.getAs[Long]("n_kept") == 0L)
    assert(empty.isNullAt(empty.fieldIndex("cleaned_text")))
    // empty / all-blank pages surface as page_ok=false, never vanish
    val blanks = TextAnalysis.c4Filters(
      Seq((7L, ""), (8L, "\n\n\n")).toDF("id", "t"),
      col("id"), col("t")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(blanks.keySet == Set(7L, 8L))
    for (r <- blanks.values) {
      assert(r.getAs[Long]("n_lines") == 0L)
      assert(r.getAs[Long]("n_kept") == 0L)
      assert(!r.getAs[Boolean]("page_ok"))
      assert(r.isNullAt(r.fieldIndex("cleaned_text")))
    }
  }

  /** Independent scalar reference for [[TextAnalysis.dsirWeights]]:
    * same published method, computed with plain JVM collections. */
  private def dsirReference(raw: Seq[(Long, String)], target: Seq[String])
      : Map[Long, (Long, Long, Long)] = {
    def grams(t: String): Seq[String] = {
      val ws = t.toLowerCase.split(" ").filter(_.nonEmpty)
      ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
    }
    def bucket(g: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 3), 16)
    }
    def ilog2(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    val tg = target.flatMap(grams).map(bucket)
    val rgAll = raw.map { case (id, t) => id -> grams(t).map(bucket) }
    val rg = rgAll.flatMap(_._2)
    val ct = tg.groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val cr = rg.groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val (ttot, rtot) = (tg.size.toLong, rg.size.toLong)
    def lam(b: Long): Long =
      (ilog2(ct.getOrElse(b, 0L) + 1) - ilog2(ttot)) -
        (ilog2(cr(b) + 1) - ilog2(rtot))
    rgAll.filter(_._2.nonEmpty).map { case (id, bs) =>
      val logw = bs.map(lam).sum
      id -> ((bs.size.toLong, logw,
        math.floor(logw * 1000.0 / bs.size).toLong))
    }.toMap
  }

  test("dsirWeights matches an independent scalar implementation exactly") {
    import spark.implicits._
    val raw = Seq(
      (1L, "spark streams batch data very fast today"),
      (2L, "cats purr softly near warm windows"),
      (3L, "spark streams batch data"),
      (4L, "one"), // < 2 tokens: absent from output
      (5L, "cats purr spark streams"))
    val target = Seq("spark streams batch data pipelines",
      "streams batch data flows")
    val out = TextAnalysis.dsirWeights(
        raw.toDF("id", "t"), col("id"), col("t"),
        target.map(Tuple1(_)).toDF("tt"), col("tt"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("logw"),
          r.getAs[Long]("mean_x1000")))).toMap
    val ref = dsirReference(raw, target)
    assert(out == ref)
    assert(!out.contains(4L))
    // target-aligned doc outranks the off-domain doc of equal length
    assert(out(3L)._3 > out(2L)._3)
  }

  test("misra-gries aggregator: decrement step, merge offset, survivor guarantee") {
    import graft.functions.{HeavyHittersAggregator, MgBuf}
    val mg = new HeavyHittersAggregator(2)
    // stream a a a b c d with k=2: c arrives on a full buffer and
    // decrements everything; d then takes the freed slot
    val buf = Seq("a", "a", "a", "b", "c", "d")
      .foldLeft(mg.zero)(mg.reduce)
    val m = buf.items.zip(buf.counts).toMap
    assert(m == Map("a" -> 2L, "d" -> 1L))
    // merge: counts sum, then the (k+1)-th largest count is
    // subtracted from all (the mergeable-summaries offset)
    val merged = mg.merge(MgBuf(Seq("a", "b"), Seq(5L, 3L)),
      MgBuf(Seq("c", "d"), Seq(4L, 2L)))
    assert(merged.items.zip(merged.counts).toMap == Map("a" -> 2L, "c" -> 1L))
    // guarantee on an adversarial stream: 100 distinct singletons
    // cannot evict an item holding > N/(k+1) of the mass
    val n = 100
    val stream = Seq.fill(60)("hot") ++ (1 to n).map(i => s"r$i")
    val out = scala.util.Random.shuffle(stream)
      .foldLeft(new HeavyHittersAggregator(4).zero)(
        new HeavyHittersAggregator(4).reduce)
    assert(out.items.contains("hot"))
    // counts under-estimate, never over
    assert(out.items.zip(out.counts).toMap.apply("hot") <= 60L)
  }

  test("heavyTerms: sketch prunes, exact recount decides — exact counts out") {
    import spark.implicits._
    // true frequencies: x=50, y=30, plus 40 singletons; N=120,
    // k=5 -> threshold N/6 = 20: exactly {x:50, y:30}
    val words = Seq.fill(50)("x") ++ Seq.fill(30)("y") ++
      (1 to 40).map(i => s"rare$i")
    val docs = scala.util.Random.shuffle(words).grouped(8).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("id", "t")
    val out = TextAnalysis.heavyTerms(docs, col("t"), k = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("x" -> 50L, "y" -> 30L))
    // raising k admits nothing new here but keeps counts exact
    val out2 = TextAnalysis.heavyTerms(docs, col("t"), k = 50)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out2("x") == 50L && out2("y") == 30L)
    assert(out2.values.forall(c => c * 51 > 120))
  }

  test("ngramNovelty: exact seen fraction vs the reference gram set") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon", true),   // ref
      (2L, "zeta eta theta iota kappa", true),        // ref
      (3L, "alpha beta gamma delta epsilon", false),  // clone of ref: novelty 0
      (4L, "completely fresh words never seen anywhere", false),
      // 4 grams, first 3 from ref doc 1, last one fresh
      (5L, "alpha beta gamma delta epsilon zzz", false),
      (6L, "xy", false)                               // < n tokens: no row
    ).toDF("id", "t", "ref")
    val out = TextAnalysis.ngramNovelty(df, col("id"), col("t"), col("ref"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(3L, 4L, 5L))
    assert(out(3L).getAs[Double]("novelty") == 0.0)
    assert(out(4L).getAs[Double]("novelty") == 1.0)
    assert(out(5L).getAs[Long]("n_grams") == 4L)
    assert(out(5L).getAs[Long]("n_seen") == 3L)
    assert(out(5L).getAs[Double]("novelty") == 0.25)
    // the membership probe must degrade to a gram-keyed shuffle join
    // when the reference is too big to broadcast (it is corpus-sized)
    val saved = SparkTestSession.spark.conf
      .get("spark.sql.autoBroadcastJoinThreshold")
    try {
      SparkTestSession.spark.conf
        .set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = TextAnalysis.ngramNovelty(df, col("id"), col("t"), col("ref"))
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), p)
    } finally SparkTestSession.spark.conf
      .set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("encodingQuality: counts replacement chars, mojibake digraphs, C0 controls") {
    import spark.implicits._
    val df = Seq(
      (1L, "perfectly clean ascii text"),
      (2L, "café résumé naïve"),        // real accents: NOT mojibake
      (3L, "double decoded cafÃ© and rÃ©sumÃ©"),            // 3 mojibake digraphs
      (4L, "lost � chars �� here"),          // 3 replacement chars
      (5L, "bell and escape but tab\t ok\nline\r")
    ).toDF("id", "t")
    val out = TextAnalysis.encodingQuality(df, col("id"), col("t"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1).getAs[Boolean]("encoding_ok"))
    // properly-encoded accents trip nothing
    assert(out(2).getAs[Boolean]("encoding_ok"),
      out(2).toString)
    assert(out(3).getAs[Long]("n_mojibake") == 3L)
    assert(!out(3).getAs[Boolean]("encoding_ok"))
    assert(out(4).getAs[Long]("n_replacement") == 3L)
    assert(out(5).getAs[Long]("n_control") == 2L) // tab/LF/CR exempt
    assert(!out(5).getAs[Boolean]("encoding_ok"))
  }

  test("lengthQuantiles: type-1 inverse-CDF selection, hand-computed") {
    import spark.implicits._
    // stratum a: lengths 1..10 (one doc each): p50 = 5 (cum 5 >= 5),
    // p90 = 9, p99 = 10, mean = 55 DIV 10 = 5
    // stratum b: lengths {2 x5, 7 x5}: p50 = 2 (cum 5 >= 5), p90 = 7
    val docs = ((1 to 10).map(i => ("a", (1 to i).map(j => s"w$j").mkString(" "))) ++
      (1 to 5).map(_ => ("b", "x y")) ++
      (1 to 5).map(_ => ("b", "a b c d e f g"))).zipWithIndex
      .map { case ((s, t), i) => (i.toLong, s, t) }.toDF("id", "src", "t")
    val out = TextAnalysis.lengthQuantiles(docs, col("src"), col("t"))
      .collect().map(r => r.getAs[String]("stratum") -> r).toMap
    assert(out("a").getAs[Long]("n_docs") == 10L)
    assert(out("a").getAs[Long]("mean_tokens") == 5L)
    assert(out("a").getAs[Long]("p50") == 5L)
    assert(out("a").getAs[Long]("p90") == 9L)
    assert(out("a").getAs[Long]("p99") == 10L)
    assert(out("a").getAs[Long]("max_tokens") == 10L)
    assert(out("b").getAs[Long]("p50") == 2L)
    assert(out("b").getAs[Long]("p90") == 7L)
    assert(out("b").getAs[Long]("mean_tokens") == (5 * 2 + 5 * 7) / 10L)
    // the histogram aggregate is partial (map-side combined): the
    // corpus-sized stage never shuffles raw values, only
    // (stratum, v, partial count) triples
    val plan = TextAnalysis.lengthQuantiles(docs, col("src"), col("t"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"), plan)
  }

  test("gridQuantiles: hand-computed buckets and lower bounds; " +
      "degenerate one-value stratum; error bounded by bucket width") {
    import spark.implicits._
    // stratum a: v = 0, 10, 20, ..., 990 (100 rows), 4 buckets over
    // [0, 990] width ceil(991/4): bucket = v*4 DIV 991 -> v<248 b0,
    // v<496 b1, v<744 b2, else b3 (25/25/25/25 rows). Type-1 p50 =
    // smallest bucket with cum >= 50 -> b1; p50_lo = 0 + 1*991 DIV 4
    // = 247. p90 -> b3 (cum 100 >= 90 needs... cum(b2)=75 < 90) ->
    // p90_lo = 3*991 DIV 4 = 743. mean = (0+...+990)/100 = 495.
    val a = (0 until 100).map(i => ("a", i * 10L))
    val b = Seq(("b", 7L), ("b", 7L), ("b", 7L)) // degenerate min==max
    val df = (a ++ b).toDF("src", "v")
    val out = TextAnalysis.gridQuantiles(df, col("src"), col("v"),
        buckets = 4, qs = Seq(50, 90))
      .collect().map(r => r.getAs[String]("stratum") -> r).toMap
    val ra = out("a")
    assert(ra.getAs[Long]("n_rows") == 100L)
    assert(ra.getAs[Long]("v_min") == 0L && ra.getAs[Long]("v_max") == 990L)
    assert(ra.getAs[Long]("mean_v") == 495L)
    assert(ra.getAs[Long]("p50_lo") == 247L)
    assert(ra.getAs[Long]("p90_lo") == 743L)
    val rb = out("b")
    assert(rb.getAs[Long]("v_min") == 7L && rb.getAs[Long]("v_max") == 7L)
    assert(rb.getAs[Long]("p50_lo") == 7L && rb.getAs[Long]("p90_lo") == 7L)
    // property: every reported lower bound sits within one bucket
    // width below the exact Type-1 quantile (true p50 of a = 490,
    // true p90 = 890), and never above it
    val width = (990L - 0L + 1L) / 4L + 1L
    assert(ra.getAs[Long]("p50_lo") <= 490L &&
      490L < ra.getAs[Long]("p50_lo") + width)
    assert(ra.getAs[Long]("p90_lo") <= 890L &&
      890L < ra.getAs[Long]("p90_lo") + width)
  }

  test("gridQuantiles: negative values and a high-cardinality stream " +
      "stay within the bucket-width bound of the exact quantiles") {
    import spark.implicits._
    // deterministic pseudo-random values in [-5000, 5000], all
    // distinct-ish: v = ((i*2654435761) mod 10001) - 5000
    val vs = (0 until 2000).map(i =>
      (((i * 2654435761L) % 10001L) - 5000L))
    val df = vs.map(v => ("s", v)).toDF("src", "v")
    val out = TextAnalysis.gridQuantiles(df, col("src"), col("v"),
      buckets = 128, qs = Seq(50, 99)).collect()(0)
    val sorted = vs.sorted
    def exact(q: Int) = sorted((q * vs.size + 99) / 100 - 1)
    val range = out.getAs[Long]("v_max") - out.getAs[Long]("v_min") + 1L
    val width = range / 128L + 1L
    for (q <- Seq(50, 99)) {
      val lo = out.getAs[Long](s"p${q}_lo")
      assert(lo <= exact(q) && exact(q) < lo + width,
        s"p$q: lo=$lo exact=${exact(q)} width=$width")
    }
    assert(out.getAs[Long]("v_min") == vs.min &&
      out.getAs[Long]("v_max") == vs.max)
  }

  test("gridQuantiles plan: no range partitioning; the value stream " +
      "collapses to bounded frames before any window sort") {
    import spark.implicits._
    val df = (0 until 500).map(i => (s"s${i % 3}", i * 37L)).toDF("src", "v")
    val p = TextAnalysis.gridQuantiles(df, col("src"), col("v"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("rangepartitioning"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("globalRank: hand-computed competition ranks with ties, both " +
      "directions, a degenerate all-equal column, and negatives") {
    import spark.implicits._
    // desc sorted: 20,20,20,10,7,5 -> ranks 1,1,1,4,5,6
    val df = Seq(("a", 10L), ("b", 20L), ("c", 20L), ("d", 5L),
      ("e", 20L), ("f", 7L)).toDF("id", "v")
    val desc = TextAnalysis.globalRank(df, col("v"), buckets = 4)
      .collect().map(r => r.getAs[String]("id") -> r.getAs[Long]("rank")).toMap
    assert(desc == Map("a" -> 4L, "b" -> 1L, "c" -> 1L, "d" -> 6L,
      "e" -> 1L, "f" -> 5L))
    val asc = TextAnalysis.globalRank(df, col("v"), descending = false,
        buckets = 4)
      .collect().map(r => r.getAs[String]("id") -> r.getAs[Long]("rank")).toMap
    assert(asc == Map("d" -> 1L, "f" -> 2L, "a" -> 3L, "b" -> 4L,
      "c" -> 4L, "e" -> 4L))
    // degenerate: every value equal -> everyone rank 1
    val eq = TextAnalysis.globalRank(
        Seq(("x", 7L), ("y", 7L)).toDF("id", "v"), col("v"))
      .collect().map(_.getAs[Long]("rank"))
    assert(eq.forall(_ == 1L))
    // negatives cross the grid origin cleanly
    val neg = TextAnalysis.globalRank(
        Seq(("x", -5L), ("y", 0L), ("z", -100L)).toDF("id", "v"),
        col("v"), buckets = 8)
      .collect().map(r => r.getAs[String]("id") -> r.getAs[Long]("rank")).toMap
    assert(neg == Map("y" -> 1L, "x" -> 2L, "z" -> 3L))
  }

  test("globalRank: 600-value property — rank == 1 + count(strictly " +
      "better) for every row, duplicates included") {
    import spark.implicits._
    // deterministic values with forced collisions (mod 97 keeps ~6 of
    // each) and a skewed head (every 10th row pinned to one value)
    val vs = (0 until 600).map(i =>
      if (i % 10 == 0) 42L else ((i * 2654435761L) % 97L))
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val got = TextAnalysis.globalRank(df, col("v"), buckets = 16)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank")).toMap
    vs.zipWithIndex.foreach { case (v, i) =>
      val expect = 1L + vs.count(_ > v)
      assert(got(i.toLong) == expect, s"id=$i v=$v")
    }
  }

  test("globalRank/rankFusion null semantics: null-valued rows keep " +
      "their columns with a null rank; a null signal contributes 0 to " +
      "the fused score, never drops the doc") {
    import spark.implicits._
    val df = Seq((1L, Some(10L)), (2L, None), (3L, Some(4L)))
      .toDF("id", "v")
    val r = TextAnalysis.globalRank(df, col("v")).collect()
      .map(x => x.getAs[Long]("id") ->
        (if (x.isNullAt(x.fieldIndex("rank"))) None
         else Some(x.getAs[Long]("rank")))).toMap
    assert(r == Map(1L -> Some(1L), 2L -> None, 3L -> Some(2L)))
    val f = TextAnalysis.rankFusion(
        Seq((1L, Some(10L), Some(7L)), (2L, None, Some(9L)),
          (3L, Option.empty[Long], Option.empty[Long]))
          .toDF("doc_id", "a", "b"),
        col("doc_id"), Seq("a" -> col("a"), "b" -> col("b")))
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(f.keySet == Set(1L, 2L, 3L)) // the all-null doc survives
    assert(f(2L).isNullAt(f(2L).fieldIndex("rank_a")) &&
      f(2L).getAs[Long]("rank_b") == 1L)
    assert(f(2L).getAs[Long]("rrf_score") == 1000000000L / 61)
    assert(f(3L).getAs[Long]("rrf_score") == 0L)
  }

  test("gridQuantiles: mean_v is FLOOR division (DuckDB //) on a " +
      "negative-sum stratum, not Spark's truncating DIV") {
    import spark.implicits._
    // sum = -7 over 2 rows: floor(-3.5) = -4 (truncation would say -3)
    val df = Seq(("s", -3L), ("s", -4L)).toDF("src", "v")
    val out = TextAnalysis.gridQuantiles(df, col("src"), col("v"),
      buckets = 2, qs = Seq(50)).collect()(0)
    assert(out.getAs[Long]("mean_v") == -4L)
  }

  test("rankFusion: hand-computed RRF scores; ties share a signal rank") {
    import spark.implicits._
    val df = Seq((1L, 10L, 1L), (2L, 5L, 5L), (3L, 5L, 2L))
      .toDF("doc_id", "a", "b")
    val out = TextAnalysis.rankFusion(df, col("doc_id"),
        Seq("a" -> col("a"), "b" -> col("b")))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("rank_a") == 1L &&
      out(1L).getAs[Long]("rank_b") == 3L)
    assert(out(2L).getAs[Long]("rank_a") == 2L &&
      out(2L).getAs[Long]("rank_b") == 1L)
    assert(out(3L).getAs[Long]("rank_a") == 2L &&
      out(3L).getAs[Long]("rank_b") == 2L)
    // scale DIV (60 + rank), truncating
    assert(out(1L).getAs[Long]("rrf_score") ==
      1000000000L / 61 + 1000000000L / 63)
    assert(out(2L).getAs[Long]("rrf_score") ==
      1000000000L / 62 + 1000000000L / 61)
    assert(out(3L).getAs[Long]("rrf_score") == 2 * (1000000000L / 62))
  }

  test("globalRank plan: no range partitioning — the corpus never " +
      "funnels through a global sort") {
    import spark.implicits._
    val df = (0 until 500).map(i => (i.toLong, (i * 37L) % 211L))
      .toDF("id", "v")
    val p = TextAnalysis.globalRank(df, col("v"))
      .queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("rangepartitioning"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("stripHtml: tags unweld words, script payloads vanish, entity " +
      "decode order is correct, encoded brackets survive as text") {
    import spark.implicits._
    val cases = Seq(
      (1L, "<p>alpha</p><p>beta</p>", "alpha beta"),
      (2L, "x<script>var a = \"<p>hidden</p>\";</script>y", "x y"),
      (3L, "a<!-- note\nmultiline -->b", "a b"),
      // &amp;lt; is the TEXT "&lt;"; &lt;b&gt; is the TEXT "<b>" —
      // neither re-strips after decode
      (4L, "&amp;lt;x&amp;gt; and &lt;b&gt;", "&lt;x&gt; and <b>"),
      (5L, "one&nbsp;two &quot;q&quot; it&#39;s", "one two \"q\" it's"),
      (6L, "plain prose stays", "plain prose stays"),
      (7L, "<div class=\"a > b\">edge</div>", "b\">edge")) // regex-level strip: documented degradation shape
    val out = TextAnalysis.stripHtml(col("t"))
    val got = cases.map(c => (c._1, c._2)).toDF("id", "t")
      .select(col("id"), out.as("clean")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (id, _, want) =>
      if (id != 7L) assert(got(id) == want, s"case $id") }
    // case 7: a '>' inside an attribute value ends the tag early —
    // text is kept (with attribute residue), never silently lost
    assert(got(7L).contains("edge"))
  }

  test("bannedTermScreen: phrase hits, needle-inside-needle, case " +
      "folding, null first ordinal on clean docs; map-only plan") {
    import spark.implicits._
    val df = Seq(
      (1L, "the Window faces the DOWnstream meadow"), // window + dow
      (2L, "a SLOW SCAN of the ledger"),              // phrase, folded
      (3L, "perfectly clean prose"),
      (4L, "dowel rods and a dup entry")              // dow + dup
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bannedTermScreen(df, col("doc_id"), col("text"),
        Seq("slow scan", "big query", "dup", "window", "dow", "merge batch"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_banned") == 2L &&
      out(1L).getAs[Long]("first_ordinal") == 3L &&
      out(1L).getAs[Boolean]("flagged"))
    assert(out(2L).getAs[Long]("n_banned") == 1L &&
      out(2L).getAs[Long]("first_ordinal") == 0L)
    assert(out(3L).getAs[Long]("n_banned") == 0L &&
      out(3L).isNullAt(out(3L).fieldIndex("first_ordinal")) &&
      !out(3L).getAs[Boolean]("flagged"))
    assert(out(4L).getAs[Long]("n_banned") == 2L &&
      out(4L).getAs[Long]("first_ordinal") == 2L)
    // map-only: the screen fuses into the scan, nothing shuffles
    val plan = TextAnalysis.bannedTermScreen(df, col("doc_id"),
        col("text"), Seq("dup"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("bannedTermStats: per-term doc counts count a doc once however " +
      "often the term repeats; zero-hit terms still report") {
    import spark.implicits._
    val df = Seq(
      (1L, "dow dow dow and a window"),   // dow + window (dow once)
      (2L, "clean"),
      (3L, "the window again")).toDF("id", "t")
    val out = TextAnalysis.bannedTermStats(df, col("t"),
        Seq("window", "dow", "zyzzyva"))
      .collect().map(r => r.getAs[String]("term") ->
        (r.getAs[Long]("ordinal"), r.getAs[Long]("n_docs"))).toMap
    assert(out("window") == ((0L, 2L)))
    assert(out("dow") == ((1L, 2L)))   // doc 1 counted once, doc 3 via 'window'
    assert(out("zyzzyva") == ((2L, 0L)))
  }

  test("fimSplit: PSM rearrangement is lossless and deterministic") {
    import spark.implicits._
    val df = (1 to 40).map(i => (i.toLong, s"document number $i body " + ("x" * i)))
      .toDF("id", "t")
    val out = TextAnalysis.fimSplit(df, col("id"), col("t"), fimRate = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val orig = (1 to 40).map(i =>
      i.toLong -> (s"document number $i body " + ("x" * i))).toMap
    var nFim = 0
    out.foreach { case (id, r) =>
      val t = orig(id)
      if (r.getAs[Boolean]("do_fim")) {
        nFim += 1
        val (u, v) = (r.getAs[Long]("split_u").toInt, r.getAs[Long]("split_v").toInt)
        assert(0 <= u && u <= v && v <= t.length)
        // PSM render decomposes back to the original text exactly
        assert(r.getAs[String]("text_out") ==
          s"<PRE>${t.substring(0, u)}<SUF>${t.substring(v)}<MID>${t.substring(u, v)}")
      } else {
        assert(r.getAs[String]("text_out") == t)
        assert(r.isNullAt(r.fieldIndex("split_u")))
      }
    }
    // md5-gated rate: ~50% of 40 docs; bound loosely (binomial tail)
    assert(nFim >= 10 && nFim <= 30, s"nFim=$nFim")
    // deterministic: a second run yields the identical plan
    val again = TextAnalysis.fimSplit(df, col("id"), col("t"), fimRate = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text_out")).toMap
    assert(again == out.map { case (k, r) => k -> r.getAs[String]("text_out") })
    // rate 0 -> no doc transformed; rate 1 -> all transformed
    assert(TextAnalysis.fimSplit(df, col("id"), col("t"), fimRate = 0.0)
      .filter(col("do_fim")).count() == 0L)
    assert(TextAnalysis.fimSplit(df, col("id"), col("t"), fimRate = 1.0)
      .filter(!col("do_fim")).count() == 0L)
  }

  test("fimSplit: unicode and edge lengths stay lossless at rate 1.0") {
    import spark.implicits._
    // BMP unicode (single UTF-16 units — Spark's substr counts code
    // points, the driver check counts units; they agree on BMP)
    val texts = Seq("é", "a", "xy", "ü ß 漢字 done", "três çãs naïve")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    val out = TextAnalysis.fimSplit(df, col("id"), col("t"), fimRate = 1.0)
      .collect()
    assert(out.length == texts.length)
    out.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id").toInt)
      val (u, v) = (r.getAs[Long]("split_u").toInt, r.getAs[Long]("split_v").toInt)
      assert(r.getAs[String]("text_out") ==
        s"<PRE>${t.substring(0, u)}<SUF>${t.substring(v)}<MID>${t.substring(u, v)}")
    }
    // empty docs are out of scope by contract (no split points exist)
    val empty = Seq((9L, "")).toDF("id", "t")
    assert(TextAnalysis.fimSplit(empty, col("id"), col("t"), 1.0).count() == 0)
  }

  test("spanCorruptionPlan: threshold doc sizes — one span at n=20, none below") {
    import spark.implicits._
    val at = (1 to 20).map(i => s"t$i").mkString(" ")   // n_spans = 1
    val below = (1 to 19).map(i => s"t$i").mkString(" ") // n_spans = 0
    val df = Seq((1L, at), (2L, below)).toDF("id", "t")
    val rows = TextAnalysis.spanCorruptionPlan(df, col("id"), col("t"))
      .collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == Set(1L))
    assert(rows.length == 1)
    val s = rows.head.getAs[Long]("start_tok")
    assert(s >= 1 && s + 2 <= 20)
  }

  test("spanCorruptionPlan: non-overlapping strided spans; sentinel renders round-trip") {
    import spark.implicits._
    val words = (1 to 60).map(i => s"w$i").mkString(" ") // 60 tokens
    val df = Seq((7L, words), (8L, "only three words"),
      (9L, "a b c d e f g h i j k l m n o p q r s t")).toDF("id", "t")
    val rows = TextAnalysis.spanCorruptionPlan(df, col("id"), col("t"))
      .collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    // doc 8: n=3 -> floor(3*0.15/3)=0 spans -> filtered out entirely
    assert(!byDoc.contains(8L))
    // doc 7: n=60 -> n_spans = floor(60*.15/3) = 3, stride 20
    val d7 = byDoc(7L).sortBy(_.getAs[Long]("span_no"))
    assert(d7.length == 3)
    d7.zipWithIndex.foreach { case (r, k) =>
      val s = r.getAs[Long]("start_tok")
      assert(r.getAs[Long]("len_tok") == 3L)
      // span k lies inside stride k: [k*20+1, (k+1)*20-2] so the
      // 3-token span never crosses the stride boundary
      assert(s >= k * 20 + 1 && s + 2 <= (k + 1) * 20, s"k=$k s=$s")
    }
    // renders: corrupted input has one sentinel per span plus the
    // closing one; target is sentinel + 3 tokens per span
    val inp = d7.head.getAs[String]("corrupted_input").split(" ")
    val tgt = d7.head.getAs[String]("target_output").split(" ")
    assert((0 to 2).forall(i => inp.contains(s"<extra_id_$i>")))
    assert(inp.length == 60 - 9 + 3) // 60 toks - 3 spans*3 + 3 sentinels
    assert(tgt.length == 3 * 4)      // per span: sentinel + 3 tokens
    // splicing target spans back into input sentinels reconstructs doc
    val spansByK = tgt.grouped(4).map(g => g.head -> g.tail).toMap
    val rebuilt = inp.flatMap(w => spansByK.getOrElse(w, Array(w)))
    assert(rebuilt.mkString(" ") == words)
    // doc 9: n=20 -> n_spans=1, stride 20; exactly one span
    assert(byDoc(9L).length == 1)
  }

  test("langId: matches an independent Scala replay of the " +
      "Cavnar-Trenkle out-of-place method exactly, breaks distance " +
      "ties toward the smaller lang, and excludes gramless docs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two synthetic languages with sharply different trigram stats
    val seed = Seq(
      ("aa", "the cat sat on the mat the cat"),
      ("aa", "the rat ate the oat and the hat"),
      ("bb", "zum zug zieht zwei zuge zum zug"),
      ("bb", "zwei zuge zogen zum zug und zug")).toDF("lang", "text")
    val docs = Seq(
      (1L, "the cat and the rat sat"),   // clearly aa
      (2L, "zum zug zogen zwei zuge"),   // clearly bb
      (3L, "qqq xxx qqq xxx"),           // absent from BOTH -> tie -> aa
      (4L, "1234 !!! 99")                // no letters -> unclassifiable
    ).toDF("doc_id", "text")
    val m = 8; val d = 6
    val profiles = TextAnalysis.langIdProfiles(seed, col("lang"),
      col("text"), m = m)
    val got = TextAnalysis.langId(docs, col("doc_id"), col("text"),
        profiles, penalty = m, d = d)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2))).toMap
    // independent replay, plain Scala
    def norm(t: String) =
      " " + t.toLowerCase.replaceAll("[^a-z]+", " ").trim + " "
    def grams(t: String): Seq[String] = {
      val s = norm(t)
      if (s.length < 3) Nil
      else (0 to s.length - 3).map(i => s.substring(i, i + 3))
    }
    def rank(gs: Seq[String], top: Int): Map[String, Long] =
      gs.groupBy(identity).view.mapValues(_.size).toSeq
        .sortBy { case (g, c) => (-c, g) }.take(top)
        .zipWithIndex.map { case ((g, _), i) => g -> (i + 1L) }.toMap
    val seedRows = Seq(
      "aa" -> Seq("the cat sat on the mat the cat",
        "the rat ate the oat and the hat"),
      "bb" -> Seq("zum zug zieht zwei zuge zum zug",
        "zwei zuge zogen zum zug und zug"))
    val lp = seedRows.map { case (l, ts) =>
      l -> rank(ts.flatMap(grams), m) }.toMap
    val want = Seq(
      1L -> "the cat and the rat sat",
      2L -> "zum zug zogen zwei zuge",
      3L -> "qqq xxx qqq xxx").map { case (idv, t) =>
      val dp = rank(grams(t), d)
      val scores = lp.map { case (l, prof) =>
        l -> dp.map { case (g, rd) =>
          prof.get(g).map(rl => math.abs(rd - rl)).getOrElse(m.toLong)
        }.sum }
      val (bl, bd) = scores.toSeq.sortBy { case (l, s) => (s, l) }.head
      idv -> (bl, bd)
    }.toMap
    assert(got == want, s"got $got want $want")
    assert(got(1L)._1 == "aa" && got(2L)._1 == "bb")
    // the tie case really is a tie, decided lexicographically
    assert(got(3L)._1 == "aa")
    // doc 4 normalizes to nothing -> no trigrams -> excluded
    assert(!got.contains(4L))
    // optimization r17: classification is one zero-shuffle kernel map
    // pass over (doc_id, text) with the broadcast in-memory model —
    // no exchange, no join, no Window (the model trained once,
    // collected eagerly at call time exactly as before)
    val p = TextAnalysis.langId(docs, col("doc_id"), col("text"),
      profiles, penalty = m, d = d).queryExecution.executedPlan.toString
    assert(p.contains("MapPartitions"), p)
    assert(!p.contains("Exchange") && !p.contains("Window"), p)
    // the documented one-row-per-doc precondition is LOAD-BEARING
    // (r17 advisory): the kernel classifies each input row
    // independently, so duplicate ids yield one row PER DUPLICATE —
    // a caller that feeds them diverges loudly in row count, never
    // silently in prediction (each duplicate's row is the correct
    // classification of its own text)
    val dup = Seq((1L, "the cat and the rat sat"),
      (1L, "zum zug zogen zwei zuge")).toDF("doc_id", "text")
    val dupRows = TextAnalysis.langId(dup, col("doc_id"), col("text"),
      profiles, penalty = m, d = d).collect()
    assert(dupRows.length == 2, dupRows.mkString(","))
    assert(dupRows.map(_.getString(1)).sorted.toSeq == Seq("aa", "bb"))
  }

  test("langIdProfiles: the bounded lang-keyed top-k (aggregator " +
      "form) equals an independent replay of the row_number window " +
      "semantics — count desc, gram asc, rank 1..m — on the real " +
      "corpus") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val d = sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 < 3)
    val m = 64
    val got = TextAnalysis.langIdProfiles(d, col("lang"), col("text"),
        m = m)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // independent replay through Spark's own unicode kernels (the
    // langIdKernel discipline: same substring/lowercase semantics)
    def norm(t: String): String = {
      val lowered = org.apache.spark.unsafe.types.UTF8String
        .fromString(t).substringSQL(1, 4096).toLowerCase.toString
      " " + lowered.replaceAll("[^a-z]+", " ").trim + " "
    }
    def grams(t: String): Seq[String] = {
      val s = norm(t)
      if (s.length < 3) Nil
      else (0 to s.length - 3).map(i => s.substring(i, i + 3))
    }
    val rows = d.select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = rows.groupBy(_._1).flatMap { case (l, ts) =>
      ts.toSeq.flatMap(t => grams(t._2))
        .groupBy(identity).view.mapValues(_.size).toSeq
        .sortBy { case (g, c) => (-c, g) }.take(m)
        .zipWithIndex.map { case ((g, _), i) => (l, g, (i + 1).toLong) }
    }.toSet
    assert(got == want,
      s"diff: ${(got diff want).take(3)} / ${(want diff got).take(3)}")
  }

  test("langIdKernel: the per-row classifier agrees with the " +
      "declarative langId on every real document (prediction AND " +
      "distance) — the equivalence langIdStream stands on") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val d = sources.Tables.documents(spark, sf)
    val profiles = TextAnalysis.langIdProfiles(
      d.filter(col("doc_id") % 10 < 3), col("lang"), col("text"), m = 64)
    val declarative = TextAnalysis.langId(d, col("doc_id"), col("text"),
        profiles, penalty = 64, d = 32)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2))).toMap
    val model = TextAnalysis.langIdModel(profiles)
    val kernel = TextAnalysis.langIdKernel(model, penalty = 64, d = 32) _
    val docs = d.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val viaKernel = docs.flatMap { case (idv, t) =>
      kernel(t).map(idv -> _) }.toMap
    assert(viaKernel == declarative,
      s"kernel and declarative classifier disagree on " +
        s"${(viaKernel.toSet diff declarative.toSet).take(3)} ...")
    // and both exclude the same (gramless) docs
    assert(viaKernel.keySet == declarative.keySet)
  }

  test("langIdKernel: seeded random-unicode sweep — kernel and " +
      "declarative classifier agree on adversarial input (surrogate " +
      "pairs, combining marks, locale-sensitive case, empty)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val seed = Seq(
      ("aa", "the cat sat on the mat the cat the rat"),
      ("bb", "zum zug zieht zwei zuge zum zug und zug")).toDF("lang", "text")
    val profiles = TextAnalysis.langIdProfiles(seed, col("lang"),
      col("text"), m = 8)
    val model = TextAnalysis.langIdModel(profiles)
    val kernel = TextAnalysis.langIdKernel(model, penalty = 8, d = 6) _
    val rnd = new scala.util.Random(20260815)
    // alphabet mixing the hazards: ASCII letters/digits, composed and
    // decomposed accents, Turkish dotted/dotless I (locale-sensitive
    // lowercase), German sharp s, full-width letters (case-folding
    // width), CJK, an emoji surrogate pair, combining marks, controls
    val alphabet: IndexedSeq[String] = ("abcdefghijklmnopqrstuvwxyz" +
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 .,").map(_.toString) ++
      Seq("é", "é", "İ", "ı", "I", "ß",
        "Ａ", "ａ", "中", "文", "😀",
        "́", " ", "\t", "\n")
    val docs = (0 until 300).map { i =>
      val n = rnd.nextInt(60)
      (i.toLong, (0 until n).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    } :+ (300L, "") :+ (301L, "   ") :+ (302L, "İİİİ")
    val df = docs.toDF("doc_id", "text")
    val declarative = TextAnalysis.langId(df, col("doc_id"), col("text"),
        profiles, penalty = 8, d = 6)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2))).toMap
    val viaKernel = docs.flatMap { case (idv, t) =>
      kernel(t).map(idv -> _) }.toMap
    assert(viaKernel == declarative,
      s"disagreement: ${(viaKernel.toSet diff declarative.toSet).take(3)} / " +
        s"${(declarative.toSet diff viaKernel.toSet).take(3)}")
    assert(viaKernel.keySet == declarative.keySet)
  }

  test("langId prefix cap: classification reads exactly the first " +
      "maxChars CODE POINTS — declarative, kernel, and a pre-truncated " +
      "run agree, including across an astral-plane boundary") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val seed = Seq(
      ("aa", "the cat sat on the mat the cat the rat"),
      ("bb", "zum zug zieht zwei zuge zum zug und zug")).toDF("lang", "text")
    val profiles = TextAnalysis.langIdProfiles(seed, col("lang"),
      col("text"), m = 8)
    val model = TextAnalysis.langIdModel(profiles)
    val cap = 40
    val kernel = TextAnalysis.langIdKernel(model, penalty = 8, d = 6,
      maxChars = cap) _
    // doc 1: an aa head inside the cap, then a bb tail past it — only
    // a capped classifier calls this aa. doc 2: emoji surrogate pairs
    // straddling the cap boundary — a UTF-16-unit truncation would
    // split a pair / shift the window; code-point counting must not.
    val docs = Seq(
      (1L, "the cat sat on the mat the cat the "
        + "zum zug zieht zwei zuge zum zug " * 40),
      (2L, "😀😀" * 18 + "the cat " + "zum zug " * 30),
      (3L, "the cat and the rat sat"))
    val df = docs.toDF("doc_id", "text")
    val declarative = TextAnalysis.langId(df, col("doc_id"), col("text"),
        profiles, penalty = 8, d = 6, maxChars = cap)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2))).toMap
    assert(declarative(1L)._1 == "aa",
      "the bb tail past the cap must be invisible")
    // pre-truncating by code points and classifying UNCAPPED must be
    // identical — the cap is exactly a code-point prefix
    def cpTake(s: String, n: Int): String = {
      val cps = s.codePointCount(0, s.length)
      s.substring(0, s.offsetByCodePoints(0, math.min(cps, n)))
    }
    val truncated = TextAnalysis.langId(
        docs.map { case (i, t) => (i, cpTake(t, cap)) }
          .toDF("doc_id", "text"),
        col("doc_id"), col("text"), profiles, penalty = 8, d = 6,
        maxChars = 4096)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2))).toMap
    assert(declarative == truncated,
      s"cap must equal code-point pre-truncation: $declarative vs $truncated")
    val viaKernel = docs.flatMap { case (idv, t) =>
      kernel(t).map(idv -> _) }.toMap
    assert(viaKernel == declarative,
      s"kernel cap must match: $viaKernel vs $declarative")
  }

  test("langId megadoc: a >= 10 MB single document classifies under " +
      "the default cap — per-row work is bounded by maxChars, not " +
      "document length") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val seed = Seq(
      ("aa", "the cat sat on the mat the cat the rat"),
      ("bb", "zum zug zieht zwei zuge zum zug und zug")).toDF("lang", "text")
    val profiles = TextAnalysis.langIdProfiles(seed, col("lang"),
      col("text"), m = 8)
    // 11 MB of aa-shaped text in ONE row — the concatenated-logs /
    // minified-JS shape the cap exists for (pre-cap, this row alone
    // held ~11M three-char gram strings)
    val mega = "the quick brown fox jumps over the lazy dog " * 250000
    assert(mega.length > 10 * 1024 * 1024)
    val df = Seq((1L, mega), (2L, "zum zug zieht zwei")).toDF("doc_id", "text")
    val got = TextAnalysis.langId(df, col("doc_id"), col("text"),
        profiles, penalty = 8, d = 6)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "aa", 2L -> "bb"), got.toString)
    // the kernel agrees on the same megadoc (same cap, same method)
    val model = TextAnalysis.langIdModel(profiles)
    assert(TextAnalysis.langIdKernel(model, penalty = 8, d = 6)(mega)
      .map(_._1).contains("aa"))
  }

  test("langId distance-key guard: a (d, penalty, model-depth) combo " +
      "whose true distance bound overflows the 6-digit sortable key " +
      "is rejected up front — lpad would silently truncate and " +
      "corrupt the argmin") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "the cat")).toDF("doc_id", "text")
    // the r14 advisory shape: penalty small, trained ranks deep —
    // d * penalty fits 6 digits but d * (maxRank - 1) does not
    val deep = Seq(("aa", "abc", 4096L), ("aa", "bcd", 1L))
      .toDF("lang", "gram", "rank")
    val e1 = intercept[IllegalArgumentException] {
      TextAnalysis.langId(df, col("doc_id"), col("text"), deep,
        penalty = 1, d = 300)
    }
    assert(e1.getMessage.contains("6-digit"), e1.getMessage)
    // sanity: the same deep model is fine at a small d — the bound is
    // d * max(penalty, maxRank - 1) = 6 * 4095, well inside 6 digits
    val ok = TextAnalysis.langId(df, col("doc_id"), col("text"), deep,
      penalty = 8, d = 6)
    assert(ok.columns.toSeq == Seq("doc_id", "pred_lang", "dist"))
    // and an empty model is a loud contract error, not a maxBy crash
    val e2 = intercept[IllegalArgumentException] {
      TextAnalysis.langId(df, col("doc_id"), col("text"),
        deep.filter(col("lang") === "zz"), penalty = 8, d = 6)
    }
    assert(e2.getMessage.contains("at least one language"), e2.getMessage)
  }

  test("langMixDrift: hand-computed pane compare — predecessor join, " +
      "missing-half skip, truncated integer percent, strict-> tiers, " +
      "and the volume floor on the LARGER half (a collapse alerts)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val counts = Seq(
      (0L, "aa", 10L), (0L, "bb", 10L), (0L, "dd", 2L),
      (600000L, "aa", 14L),  // +40% -> warn
      (600000L, "bb", 17L),  // +70% -> critical
      (600000L, "dd", 1L),   // -50% but max(2,1)=2 < 3 -> floored out
      (1200000L, "aa", 14L), // 0% -> silent
      (1200000L, "cc", 5L),  // no predecessor -> skipped
      (1800000L, "aa", 1L),  // |1-14|*100 DIV 14 = 92 -> critical;
                             // new_n=1 < 3, old_n=14 carries the floor
      (1800000L, "cc", 2L)   // |2-5|*100 DIV 5 = 60: > 30, NOT > 60
    ).toDF("window_start_ms", "pred_lang", "n_docs")
    val got = operators.TextAnalysis.langMixDrift(counts,
        windowMs = 600000L, warnPct = 30, critPct = 60, minCount = 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))).toSet
    assert(got == Set(
      (600000L, "aa", 10L, 14L, 40L, "warn"),
      (600000L, "bb", 10L, 17L, 70L, "critical"),
      (1800000L, "aa", 14L, 1L, 92L, "critical"),
      (1800000L, "cc", 5L, 2L, 60L, "warn")), got.toString)
    // guard rails
    assertThrows[IllegalArgumentException] {
      operators.TextAnalysis.langMixDrift(counts, 600000L,
        warnPct = 50, critPct = 40, minCount = 0)
    }
  }

  test("q163 per-language quality calibration: one row per predicted " +
      "language, quantiles monotone, mass equals the classified " +
      "tokenful corpus") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q163_lang_quality_calibration")(
      spark, sf).collect()
    val d = sources.Tables.documents(spark, sf)
    val profiles = TextAnalysis.langIdProfiles(
      d.filter(col("doc_id") % 10 < 3), col("lang"), col("text"), m = 64)
    val pred = TextAnalysis.langId(d, col("doc_id"), col("text"),
      profiles, penalty = 64, d = 32)
    val classified = TextAnalysis.qualityScore(d, col("doc_id"),
        col("text")).filter(col("n_tokens") >= 1)
      .join(pred, Seq("doc_id")).collect()
    assert(rows.map(_.getString(0)).toSet ==
      classified.map(_.getAs[String]("pred_lang")).toSet)
    assert(rows.map(_.getAs[Long]("n_rows")).sum == classified.length)
    for (r <- rows) {
      val (p50, p90, p99, mx) = (r.getAs[Long]("p50"),
        r.getAs[Long]("p90"), r.getAs[Long]("p99"),
        r.getAs[Long]("max_v"))
      assert(p50 <= p90 && p90 <= p99 && p99 <= mx,
        s"non-monotone quantiles in ${r.getString(0)}: $p50 $p90 $p99 $mx")
    }
  }

  test("q161 per-language data card: strata are exactly the predicted " +
      "languages, doc mass adds up to the classified corpus, and the " +
      "card's rates stay in [0, 1000] permille") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val card = SparkEntry.queries("q161_lang_data_card")(spark, sf)
      .collect()
    val d = sources.Tables.documents(spark, sf)
    val profiles = TextAnalysis.langIdProfiles(
      d.filter(col("doc_id") % 10 < 3), col("lang"), col("text"), m = 64)
    val pred = TextAnalysis.langId(d, col("doc_id"), col("text"),
      profiles, penalty = 64, d = 32).collect()
    assert(card.map(_.getString(0)).toSet ==
      pred.map(_.getString(1)).toSet,
      "card strata must be exactly the predicted language set")
    assert(card.map(_.getAs[Long]("n_docs")).sum == pred.length,
      "every classified doc lands in exactly one language row")
    for (r <- card; c <- Seq("quality_ok_permille", "pii_permille",
        "dup_copy_permille")) {
      val v = r.getAs[Long](c)
      assert(v >= 0 && v <= 1000, s"$c out of range: $v")
    }
  }

  test("saveLangModel/loadLangModel: the shipped artifact drives " +
      "langId, langIdStream and multilingualBuild bit-identically " +
      "(train -> ship -> serve), and a wrong or doctored artifact " +
      "fails loudly at load") {
    import spark.implicits._
    import graft.sources.Tables
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-langmodel").toString
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
    val live = TextAnalysis.langIdProfiles(
      docs.filter(col("doc_id") % 10 < 3), col("lang"), col("text"),
      m = 64)
    TextAnalysis.saveLangModel(live, s"$tmp/model")
    val loaded = TextAnalysis.loadLangModel(spark, s"$tmp/model")

    // the artifact itself round-trips bit-exactly
    def profRows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("lang").cast("string"), col("gram").cast("string"),
        col("rank").cast("long"))
      .orderBy(col("lang"), col("rank"))
      .collect().map(_.toSeq).toSeq
    assert(profRows(loaded) == profRows(live) && profRows(loaded).nonEmpty)

    // batch serve: the declarative classifier from the loaded
    // artifact equals the live-trained path on the whole corpus
    def classify(p: org.apache.spark.sql.DataFrame) =
      TextAnalysis.langId(docs, col("doc_id"), col("text"), p,
        penalty = 64, d = 32).collect().map(_.toSeq).toSet
    assert(classify(loaded) == classify(live))

    // streaming serve: the collected per-row kernel model is equal,
    // and an actual MemoryStream drive off the LOADED model matches
    // the batch classifier over the same documents
    assert(TextAnalysis.langIdModel(loaded) == TextAnalysis.langIdModel(live))
    implicit val sqlCtx = spark.sqlContext
    val fiveTexts = docs.orderBy(col("doc_id")).limit(5)
      .select(col("text")).as[String].collect().toSeq
    val t0 = 1700000000L // on a 10-min window boundary's window
    val events = fiveTexts.zipWithIndex
      .map { case (t, i) => (t0 + 10L * i, t) }
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.Streaming.langIdStream(
        in.toDS().select(timestamp_seconds(col("_1")).as("ts"),
          col("_2").as("text")),
        "ts", col("text"), TextAnalysis.langIdModel(loaded),
        penalty = 64, d = 32, "10 minutes", "30 seconds")
      .writeStream.format("memory").queryName("langmodel_rt")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    try {
      in.addData(events: _*); q.processAllAvailable()
      in.addData((t0 + 3600L, "the end")) // watermark pusher
      q.processAllAvailable()
      val streamed = spark.table("langmodel_rt")
        .filter(col("window_start_ms") === (t0 / 600) * 600 * 1000)
        .select(col("pred_lang"), col("n_docs"))
        .as[(String, Long)].collect().toMap
      val batchTwin = TextAnalysis.langId(
          fiveTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
            .toDF("doc_id", "text"),
          col("doc_id"), col("text"), loaded, penalty = 64, d = 32)
        .groupBy(col("pred_lang")).agg(count(lit(1)).as("n_docs"))
        .as[(String, Long)].collect().toMap
      assert(streamed == batchTwin && streamed.nonEmpty,
        s"streamed $streamed vs batch $batchTwin")
    } finally q.stop()

    // composed serve: the train-once build from the loaded artifact
    // equals the build from the live frame, leg by leg
    def build(p: org.apache.spark.sql.DataFrame) =
      pipelines.CorpusPipeline.multilingualBuild(docs,
        col("doc_id"), col("text"), p,
        arrivalWindowMs =
          expr("(1700000000 + doc_id * 60) DIV 600 * 600 * 1000"),
        weights = Map("en" -> 0.35, "de" -> 0.15, "es" -> 0.15,
          "fr" -> 0.15, "zh" -> 0.10),
        defaultWeight = 0.05, budget = 100000L)
    val (bLive, bLoaded) = (build(live), build(loaded))
    try {
      assert(bLoaded.mixture.collect().map(_.toSeq).toSeq ==
        bLive.mixture.collect().map(_.toSeq).toSeq)
    } finally { bLive.close(); bLoaded.close() }

    // loud failures at the artifact boundary
    Seq((1L, "x")).toDF("a", "b").write.parquet(s"$tmp/wrong")
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.loadLangModel(spark, s"$tmp/wrong")
    }.getMessage.contains("not a langIdProfiles artifact"))
    live.filter(col("rank") =!= 1L) // doctored: rank 1 removed
      .write.parquet(s"$tmp/doctored")
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.loadLangModel(spark, s"$tmp/doctored")
    }.getMessage.contains("non-contiguous"))
  }

  test("saveBpeMerges/loadBpeMerges: the shipped tokenizer artifact " +
      "drives encode and fertility bit-identically (train -> ship -> " +
      "serve); gaps, duplicates and doctored merge symbols are " +
      "refused at load") {
    import spark.implicits._
    import graft.sources.Tables
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-bpe-model").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val live = TextAnalysis.bpeTrainMerges(docs, col("text"), nMerges = 6)
    TextAnalysis.saveBpeMerges(live, s"$tmp/m")
    val loaded = TextAnalysis.loadBpeMerges(spark, s"$tmp/m")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy(col("round")).collect().map(_.toSeq).toSeq
    assert(rows(loaded) == rows(live.select(col("round"),
      col("pair_a"), col("pair_b"), col("merged"), col("cnt"))))
    // the ordered pair list the fold consumes
    val livePairs = live.orderBy(col("round")).collect()
      .map(r => r.getString(1) -> r.getString(2)).toSeq
    assert(TextAnalysis.bpeMergePairs(loaded) == livePairs &&
      livePairs.size == 6)
    // serve: encode and fertility from the loaded artifact
    def enc(ms: Seq[(String, String)]) =
      TextAnalysis.bpeEncodeCounts(docs, col("doc_id"), col("text"), ms)
        .collect().map(_.toSeq).toSet
    assert(enc(TextAnalysis.bpeMergePairs(loaded)) == enc(livePairs))
    def fert(ms: Seq[(String, String)]) =
      TextAnalysis.bpeFertility(docs, col("doc_id"), col("source"),
        col("text"), ms).collect().map(_.toSeq).toSet
    assert(fert(TextAnalysis.bpeMergePairs(loaded)) == fert(livePairs))
    // the batched trainer ships through the same boundary after the
    // canonical rename
    val batched = TextAnalysis.bpeTrainMergesBatched(docs, col("text"),
      batchSize = 4, maxRounds = 2)
    TextAnalysis.saveBpeMerges(
      batched.withColumnRenamed("merge_no", "round"), s"$tmp/mb")
    assert(TextAnalysis.loadBpeMerges(spark, s"$tmp/mb").count() ==
      batched.count())
    // loud failures: wrong schema, a round gap, a doctored symbol
    Seq((1L, "x")).toDF("a", "b").write.parquet(s"$tmp/wrong")
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.loadBpeMerges(spark, s"$tmp/wrong")
    }.getMessage.contains("not a bpeTrainMerges artifact"))
    live.filter(col("round") =!= 3L).write.parquet(s"$tmp/gap")
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.loadBpeMerges(spark, s"$tmp/gap")
    }.getMessage.contains("non-contiguous"))
    live.withColumn("merged", concat(col("merged"), lit("zz")))
      .write.parquet(s"$tmp/doctored_bpe")
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.loadBpeMerges(spark, s"$tmp/doctored_bpe")
    }.getMessage.contains("not pair_a || pair_b"))
    // an EMPTY table is legal (a zero-merge tokenizer: chars only)
    live.filter(col("round") > 100L).write.parquet(s"$tmp/empty")
    assert(TextAnalysis.loadBpeMerges(spark, s"$tmp/empty").count() == 0L)
  }

  test("llr/surprisal/dsir artifacts: each trained quality model " +
      "ships as validated parquet and serves bit-identically to its " +
      "fused train+score form; doctored tables are refused at load") {
    import spark.implicits._
    import graft.sources.Tables
    import graft.operators.Dedup
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-quality-models").toString
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet

    // LLR classifier (q94's derivation)
    val labeled = d.filter(col("doc_id") % 2 === 0)
      .withColumn("lab", size(filter(Dedup.tokens(col("text")),
        t => t.isin("vector", "stream", "batch"))) >= 3)
    val fusedLlr = rows(TextAnalysis.llrQualityScore(d, col("doc_id"),
      col("text"), labeled, col("text"), col("lab")))
    TextAnalysis.saveLlrModel(
      TextAnalysis.llrTrain(labeled, col("text"), col("lab")),
      s"$tmp/llr")
    assert(rows(TextAnalysis.llrScoreWith(d, col("doc_id"), col("text"),
      TextAnalysis.loadLlrModel(spark, s"$tmp/llr"))) == fusedLlr &&
      fusedLlr.nonEmpty)
    // refusals: duplicate tokens; a one-class table
    val llr = TextAnalysis.loadLlrModel(spark, s"$tmp/llr")
    llr.union(llr).write.parquet(s"$tmp/llr_dup")
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.loadLlrModel(spark, s"$tmp/llr_dup")
    }.getMessage.contains("duplicate token"))
    llr.withColumn("c_neg", lit(0L)).write.parquet(s"$tmp/llr_onecls")
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.loadLlrModel(spark, s"$tmp/llr_onecls")
    }.getMessage.contains("both classes"))

    // surprisal LM (q89's derivation)
    val fusedSur = rows(TextAnalysis.surprisalScore(d, col("doc_id"),
      col("text"), n = 2, minCount = 2))
    val surModel = TextAnalysis.surprisalTrain(d, col("doc_id"),
      col("text"), n = 2, minCount = 2)
    TextAnalysis.saveSurprisalModel(surModel, s"$tmp/sur")
    val surLoaded = TextAnalysis.loadSurprisalModel(spark, s"$tmp/sur")
    assert(surLoaded.totalGrams == surModel.totalGrams &&
      surLoaded.n == 2)
    assert(rows(TextAnalysis.surprisalScoreWith(d, col("doc_id"),
      col("text"), surLoaded)) == fusedSur && fusedSur.nonEmpty)
    // refusal: a gram count above the stored total
    surLoaded.grams.withColumn("c", lit(surModel.totalGrams + 1))
      .write.parquet(s"$tmp/sur_bad/grams")
    spark.read.parquet(s"$tmp/sur/meta")
      .write.parquet(s"$tmp/sur_bad/meta")
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.loadSurprisalModel(spark, s"$tmp/sur_bad")
    }.getMessage.contains("outside [1, total_grams]"))

    // DSIR lambda (q102's derivation)
    val fusedDsir = rows(TextAnalysis.dsirWeights(d, col("doc_id"),
      col("text"), d.filter(col("source") === "src0"), col("text")))
    TextAnalysis.saveDsirLambda(
      TextAnalysis.dsirLambda(d, col("text"),
        d.filter(col("source") === "src0"), col("text")),
      s"$tmp/dsir")
    val dsirLoaded = TextAnalysis.loadDsirLambda(spark, s"$tmp/dsir")
    assert(rows(TextAnalysis.dsirScoreWith(d, col("doc_id"),
      col("text"), dsirLoaded)) == fusedDsir && fusedDsir.nonEmpty)
    // refusal: an out-of-range bucket id
    dsirLoaded.withColumn("b", col("b") + 10000L)
      .write.parquet(s"$tmp/dsir_oob")
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.loadDsirLambda(spark, s"$tmp/dsir_oob")
    }.getMessage.contains("outside [0, 4095]"))
  }
}
