package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 0 and 1 are exact copies; 2 is a near-dup of 0 (one word changed);
  // 3 and 4 are unrelated.
  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again today"),
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox leaps over the lazy dog again and again today"),
    (3L, "completely different words about spark catalyst tungsten codegen engine"),
    (4L, "yet another unrelated document mentioning parquet shuffle partitions")
  ).toDF("doc_id", "text")

  test("exactDedup groups identical texts, keeps min id") {
    val r = Dedup.exactDedup(docs, col("doc_id"), col("text"))
      .orderBy("canonical_id").collect()
    assert(r.length == 4)
    val dup = r.find(_.getAs[Long]("n_copies") == 2).get
    assert(dup.getAs[Long]("canonical_id") == 0L)
  }

  test("ngramJaccardPairs finds exact + near dup pairs, not unrelated") {
    val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
        n = 3, minJaccard = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))  // exact copy: jaccard 1.0
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash signature of identical docs is identical; est_jaccard=1 for copies") {
    val pairs = Dedup.minhashLshPairs(docs, col("doc_id"), col("text"),
        n = 3, numHashes = 16, bands = 8, minEstJaccard = 0.5)
      .collect().map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        r.getAs[Double]("est_jaccard"))).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs.contains((0L, 2L)))
    assert(!pairs.keys.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical docs equal; near-dups close in hamming; 32-bit range") {
    val h = Dedup.simhash(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(h(0L) == h(1L))
    assert(h.values.forall(v => v >= 0 && v < (1L << 32)))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(0L), h(2L)) <= 8)          // one word changed
    assert(ham(h(0L), h(3L)) >= 6)          // unrelated
  }

  test("simhashPairs links copies and near-dups only") {
    val pairs = Dedup.simhashPairs(docs, col("doc_id"), col("text"), maxHamming = 8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("degenerate docs (empty, single-token, sub-n) flow through all ops") {
    val weird = Seq(
      (10L, ""), (11L, "one"), (12L, "two words"),
      (13L, "three tokens here"), (14L, "three tokens here")
    ).toDF("doc_id", "text")
    // exact dedup: empty string is a valid group; 13/14 collapse
    assert(Dedup.exactDedup(weird, col("doc_id"), col("text")).count() == 4)
    // shingle ops: docs with < n tokens simply produce no candidates
    val j = Dedup.ngramJaccardPairs(weird, col("doc_id"), col("text"), 3, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(j == Set((13L, 14L)))
    val m = Dedup.minhashLshPairs(weird, col("doc_id"), col("text"), 3, 16, 8, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(m == Set((13L, 14L)))
    // simhash: defined for any doc with >= 1 token
    val h = Dedup.simhash(weird, col("doc_id"), col("text")).count()
    assert(h == 4) // empty doc has no tokens -> no row
  }

  test("maxShingleFreq drops hot shingles from candidates but keeps sizes exact") {
    // with cap=1 no shingle shared by 2+ docs survives -> no pairs at all
    val r = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      n = 3, minJaccard = 0.1, maxShingleFreq = 1)
    assert(r.count() == 0)
  }

  test("url canonicalization: case, fragment, trailing slash, utm, param order") {
    import spark.implicits._
    val urls = Seq(
      "http://Example.COM/A/b/",
      "http://example.com/A/b#frag",
      "https://site.org/x?utm_source=a&ref=1&b=2",
      "https://site.org/x?b=2&ref=1",
      "https://site.org/x",
      "http://host.net/p?utm_campaign=z")
    val got = urls.toDF("u")
      .select(Dedup.canonicalizeUrl(col("u")).as("c")).as[String].collect()
    assert(got(0) == "http://example.com/A/b")
    assert(got(1) == "http://example.com/A/b") // same canonical
    assert(got(2) == "https://site.org/x?b=2&ref=1")
    assert(got(3) == "https://site.org/x?b=2&ref=1")
    assert(got(4) == "https://site.org/x")
    assert(got(5) == "http://host.net/p") // utm-only query drops
    // 6 urls collapse to 4 canonical groups
    assert(Dedup.urlDedup(urls.zipWithIndex.toDF("u", "i"),
      col("i"), col("u")).count() == 4)
  }

  test("connected components: chains merge, components stay separate") {
    import spark.implicits._
    // component {1,2,3,4} as a chain (diameter 3 — needs propagation
    // beyond one hop), component {10,11}, pair duplicated both ways
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 10L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.nearDupClusters(pairs, col("doc_a"), col("doc_b"))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (4L, 1L, false),
      (10L, 10L, true), (11L, 10L, false)))
    val sizes = Dedup.clusterSummary(
      Dedup.connectedComponents(pairs, col("doc_a"), col("doc_b")))
      .as[(Long, Long)].collect().toMap
    assert(sizes == Map(1L -> 4L, 10L -> 2L))
  }

  test("connected components: empty pair input yields empty labels") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(none, col("doc_a"), col("doc_b"))
      .count() == 0)
  }

  test("connected components: long chain converges to the global minimum") {
    import spark.implicits._
    // a 12-vertex path: worst case for min-label propagation (deep
    // diameter, multiple loop rounds after the fused init)
    val chain = (0L until 11L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(chain, col("doc_a"), col("doc_b"))
      .as[(Long, Long)].collect().toMap
    assert(labels == (0L to 11L).map(_ -> 0L).toMap)
  }

  test("star-contraction CC: identical labels to min-label propagation on every fixture shape") {
    import spark.implicits._
    def labelsOf(df: org.apache.spark.sql.DataFrame) = {
      val byProp = Dedup.connectedComponents(df, col("doc_a"), col("doc_b"))
        .as[(Long, Long)].collect().toMap
      val byStar = Dedup.connectedComponentsStars(df, col("doc_a"), col("doc_b"))
        .as[(Long, Long)].collect().toMap
      assert(byStar == byProp, s"star vs propagation diverged")
      byStar
    }
    // the chain+pair fixture, duplicated edges included
    labelsOf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 10L))
      .toDF("doc_a", "doc_b"))
    // a dense clique plus a triangle sharing no vertices
    labelsOf((for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j))
      .++(Seq((20L, 21L), (21L, 22L), (22L, 20L))).toDF("doc_a", "doc_b"))
    // reversed-orientation edges and self-loops
    labelsOf(Seq((5L, 3L), (3L, 1L), (7L, 7L), (9L, 8L))
      .toDF("doc_a", "doc_b"))
    // empty input
    assert(Dedup.connectedComponentsStars(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"),
      col("doc_a"), col("doc_b")).count() == 0)
    // the same API switch on the cluster former
    val starClusters = Dedup.nearDupClusters(
      Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b"),
      col("doc_a"), col("doc_b"), useStarContraction = true)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(starClusters == Set((1L, 1L, true), (2L, 1L, false),
      (3L, 1L, false)))
  }

  test("star-contraction CC: O(log n) rounds on a 64-vertex path where propagation needs O(diameter)") {
    import spark.implicits._
    // diameter 63: min-label propagation moves the label one hop per
    // round (its default 25-round budget cannot even finish); the
    // contraction halves star depth per round
    val path = (0L until 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponentsStars(path,
      col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toMap
    assert(labels == (0L to 63L).map(_ -> 0L).toMap)
    val rounds = Dedup.starContractionRounds(path, col("doc_a"), col("doc_b"))
    assert(rounds <= 12, s"expected O(log n) rounds, took $rounds")
    // the propagation form must REFUSE rather than silently return
    // truncated (wrong) labels when the diameter exceeds its budget
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(path, col("doc_a"), col("doc_b")).count()
    }
    assert(e.getMessage.contains("connectedComponentsStars"))
    // the star form holds itself to the same contract: labels derived
    // from a non-star edge set are wrong, so an exhausted budget must
    // throw, not return
    val e2 = intercept[IllegalStateException] {
      Dedup.connectedComponentsStars(path, col("doc_a"), col("doc_b"),
        maxIter = 1)
    }
    assert(e2.getMessage.contains("star fixed point"))
  }

  test("exact substring pairs: copied passage caught, window count exact, hot cap drops boilerplate") {
    import spark.implicits._
    // doc 2 embeds a verbatim 100-char passage from doc 1 at a
    // stride-aligned offset; doc 3 is unrelated; docs 4/5/6 share a
    // boilerplate window (hot-cap fodder)
    // non-repeating passage: its stride windows are pairwise distinct,
    // so each shared window has corpus frequency exactly 2
    val passage = (0 until 100).map(i => ('a' + i % 26).toChar).mkString
    val boiler = "b" * 50
    val docs = Seq(
      (1L, passage + ("u" * 100)),
      (2L, ("v" * 50) + passage + ("w" * 25)),
      (3L, "z" * 300),
      (4L, boiler + "1" * 50), (5L, boiler + "2" * 50),
      (6L, boiler + "3" * 50)
    ).toDF("doc_id", "text")
    val pairs = Dedup.sharedSubstringPairs(docs, col("doc_id"),
      col("text"), windowSize = 50, stride = 25).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // passage[0:50] / [25:75] / [50:100] each appear once per doc
    // (doc1 offsets 0/25/50; doc2 offsets 50/75/100) -> 3 shared windows
    assert(pairs((1L, 2L)) == 3L)
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))
    // boilerplate trio pairs up without the cap...
    assert(pairs.contains((4L, 5L)) && pairs.contains((4L, 6L)))
    // ...and the hot-window cap (freq > 2) removes exactly those
    val capped = Dedup.sharedSubstringPairs(docs, col("doc_id"),
      col("text"), windowSize = 50, stride = 25, maxWindowFreq = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)))
    // plan: inverted-index equi-join, never all-pairs
    val plan = Dedup.sharedSubstringPairs(docs, col("doc_id"),
      col("text")).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("winnowing: shared-substring guarantee, sparse density, pair sweep") {
    import spark.implicits._
    val passage = "the winnowing guarantee holds for shared strings"
    val wdocs = Seq(
      (1L, "left filler aaaa " + passage + " right filler bbbb"),
      (2L, "totally different prefix " + passage),
      (3L, "unrelated content about spark plans and shuffles entirely"),
      (4L, "zz")
    ).toDF("doc_id", "text")
    val fp = Dedup.winnowingFingerprints(wdocs, col("doc_id"), col("text"),
      k = 8, w = 4)
    // the paper's guarantee: a shared substring of length >= k+w-1
    // yields at least one shared fingerprint
    val f1 = fp.filter(col("doc_id") === 1L).select("mh").as[String].collect().toSet
    val f2 = fp.filter(col("doc_id") === 2L).select("mh").as[String].collect().toSet
    assert((f1 & f2).nonEmpty)
    // density: winnowing SELECTS, it doesn't keep every gram (expected
    // ~2/(w+1) of positions; allow slack, assert clearly sparse)
    val grams1 = wdocs.filter(col("doc_id") === 1L)
      .select((length(col("text")) - 7).as("n")).head().getInt(0)
    assert(f1.size < grams1 / 2)
    // sub-k docs contribute nothing
    assert(fp.filter(col("doc_id") === 4L).count() == 0L)
    // pair sweep: the passage-sharing pair survives, the stranger doesn't
    val pairs = Dedup.winnowingPairs(wdocs, col("doc_id"), col("text"),
      k = 8, w = 4, minShared = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    val plan = Dedup.winnowingPairs(wdocs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("winnowingPairs: corpus-wide boilerplate fingerprints are capped out of the sweep") {
    import spark.implicits._
    // 40 otherwise-unrelated docs share one long boilerplate passage
    // (a license header); one genuine verbatim pair shares RARE
    // content. The r10 scale probe measured the uncapped sweep at
    // k^1.5 — one hot fingerprint value is a d^2 join bucket.
    val boiler = "permission is hereby granted free of charge to any " +
      "person obtaining a copy of this software and associated " +
      "documentation files to deal in the software without restriction"
    val essay = "the genuinely copied essay text appears here verbatim " +
      "with enough length that several fingerprints are selected from it"
    val docs = ((1L to 40L).map(i =>
      (i, s"unique body number $i nothing shared here " + boiler)) ++
      Seq((100L, essay), (101L, essay))).toDF("doc_id", "text")
    def pairSet(cap: Long) = Dedup.winnowingPairs(docs, col("doc_id"),
        col("text"), k = 8, w = 4, minShared = 2, maxFpFreq = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairSet(1000) // cap can't fire at 42 docs
    val capped = pairSet(16)
    // uncapped: the boilerplate manufactures pairs among the 40
    assert(uncapped.exists(p => p._1 <= 40L && p._2 <= 40L))
    // capped: every boilerplate-only pair dies (its fingerprints sit
    // in 40 > 16 docs)...
    assert(!capped.exists(p => p._1 <= 40L && p._2 <= 40L))
    // ...while the genuine rare-content pair survives in both
    assert(uncapped.contains((100L, 101L)) && capped.contains((100L, 101L)))
  }

  test("overlapMeasures: both Broder measures off one shingle join, equal to the union of the twins") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"), // near-twin of 1
      (3L, "alpha beta gamma delta"), // contained in 1 (low jaccard)
      (4L, "totally unrelated words about spark executors shuffling")
    ).toDF("doc_id", "text")
    val both = Dedup.overlapMeasures(docs, col("doc_id"), col("text"),
      n = 3, minJaccard = 0.5, minContainment = 0.6)
    val rows = both.collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5)))).toMap
    // the combined frame carries exactly q16 ∪ q115's pairs...
    val jac = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      n = 3, minJaccard = 0.5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    val con = Dedup.containmentPairs(docs, col("doc_id"), col("text"),
      n = 3, minContainment = 0.6).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rows.keySet == (jac.keySet ++ con.keySet))
    assert(jac.keySet.contains((1L, 2L)) && !jac.keySet.contains((1L, 3L)))
    assert(con.keySet.contains((1L, 3L))) // the jaccard-blind wrapped copy
    // ...with measures matching the single-purpose twins exactly
    for ((k, (sh, j)) <- jac) {
      assert(rows(k)._1 == sh && rows(k)._2 == j)
    }
    for ((k, (sh, cd, c)) <- con) {
      assert(rows(k)._1 == sh && rows(k)._3 == cd && rows(k)._4 == c)
    }
    // ...from a SINGLE scan of the shingle self-join: exactly one join
    // keyed on the shingle column in the physical plan
    val p = both.queryExecution.executedPlan.toString
    // AQE prints the Initial Plan after the Final Plan — count only
    // the final one
    val finalP = p.split("== Initial Plan ==")(0)
    val shingleJoins = finalP.linesIterator.count(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin")) && l.contains("[s#"))
    assert(shingleJoins == 1, s"expected 1 shingle join, got $shingleJoins:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("chunkDedupRewrite: later chunk occurrences cut, first kept, unique docs untouched") {
    import spark.implicits._
    val passage = graft.SparkEntry.GearPassage
    val cdocs = Seq(
      (1L, "first document body " + passage + " trailing tail here"),
      (2L, "second unrelated prefix " + passage), // shares interior chunks
      (3L, "a wholly unique document about nothing shared at all"),
      (4L, ""), // empty + null docs: no chunks, NO output row (the
      (5L, null.asInstanceOf[String]) // gearChunks length>=1 gate)
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedupRewrite(cdocs, col("doc_id"), col("text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept"),
         r.getAs[String]("cleaned_text"))).toMap
    // doc 1 (lower id) keeps everything: it owns the first occurrences
    assert(out(1L)._1 == out(1L)._2)
    assert(out(1L)._3 == "first document body " + passage +
      " trailing tail here")
    // doc 2 loses its copies of the shared interior chunks
    assert(out(2L)._2 < out(2L)._1, "doc 2 must lose duplicated chunks")
    assert(out(2L)._3.length <
      ("second unrelated prefix " + passage).length)
    assert(out(2L)._3.startsWith("second unrelated prefix"))
    // the unique doc reassembles byte-identically
    assert(out(3L)._1 == out(3L)._2)
    assert(out(3L)._3 ==
      "a wholly unique document about nothing shared at all")
    // rewrite is conservative: concatenating every doc's kept chunks
    // never loses non-duplicated bytes (total kept >= unique mass)
    assert(out.values.map(_._2).sum > 0)
    // empty/null docs are gated out entirely — the q138 oracle's
    // final LEFT JOIN builds from the length>=1 CTE, so an output row
    // for them would be a row-count mismatch
    assert(out.keySet == Set(1L, 2L, 3L))
  }

  test("chunk patch-set path makes identical rewrites to chunkDedupRewrite") {
    import spark.implicits._
    val passage = graft.SparkEntry.GearPassage
    val cdocs = Seq(
      (1L, "first document body " + passage + " trailing tail here"),
      (2L, "second unrelated prefix " + passage),
      (3L, "a wholly unique document about nothing shared at all"),
      (4L, ""), // gated out on both paths
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept"),
         r.getAs[String]("cleaned_text"))).toMap
    val classic = rows(Dedup.chunkDedupRewrite(cdocs, col("doc_id"),
      col("text")))
    val patched = rows(Dedup.chunkRewriteViaPatches(cdocs, col("doc_id"),
      col("text")))
    assert(patched == classic)
    // the patch frame itself: only docs losing chunks, 0-based
    // ordinals, and doc 1 (first occurrences) never appears
    val p = Dedup.chunkDedupPatches(cdocs, col("doc_id"), col("text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[Long]]("dropped_nos")).toMap
    assert(p.contains(2L) && !p.contains(1L) && !p.contains(3L))
    assert(p(2L) == p(2L).sorted && p(2L).forall(_ >= 0))
  }

  test("dupDegree: hub surfaces with its degree and best measure") {
    import spark.implicits._
    // pair graph: hub 1 pairs with 2,3,4; isolated pair (5,6)
    val pairs = Seq(
      (1L, 2L, 0.9), (1L, 3L, 0.6), (1L, 4L, 0.7), (5L, 6L, 0.55)
    ).toDF("doc_a", "doc_b", "est")
    val deg = Dedup.dupDegree(pairs, col("doc_a"), col("doc_b"),
        col("est"), minDegree = 1).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_partners"), r.getAs[Double]("max_est"))).toMap
    assert(deg(1L) == (3L, 0.9))
    assert(deg(2L) == (1L, 0.9) && deg(5L) == (1L, 0.55))
    assert(deg.size == 6)
    // degree threshold isolates the hub
    val hubs = Dedup.dupDegree(pairs, col("doc_a"), col("doc_b"),
      col("est"), minDegree = 2).collect()
    assert(hubs.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
  }

  test("patch-set line dedup makes identical decisions to lineDedup") {
    import spark.implicits._
    val lineDocs = Seq(
      (1L, "alpha beta\nFOOTER LINE\ngamma"),
      (2L, "FOOTER LINE\ndelta"),
      (3L, "FOOTER LINE"),
      (4L, "epsilon\nok"),
      (5L, "ok\nzeta\nok"),
      (6L, ""),
      (7L, null.asInstanceOf[String]) // null text: both paths (0,0,0,'')
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("n_kept"),
         r.getAs[Long]("n_dropped"), r.getAs[String]("cleaned_text")))
      .toMap
    val classic = rows(Dedup.lineDedup(lineDocs, col("doc_id"),
      col("text"), maxLineFreq = 1, minLineChars = 3))
    val patched = rows(Dedup.lineDedupViaPatches(lineDocs, col("doc_id"),
      col("text"), maxLineFreq = 1, minLineChars = 3))
    assert(patched == classic)
    // the patch frame itself: only docs with drops, 0-based ordinals
    val p = Dedup.lineDedupPatches(lineDocs, col("doc_id"), col("text"),
        maxLineFreq = 1, minLineChars = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[Long]]("dropped_nos")).toMap
    assert(p.keySet == Set(1L, 2L, 3L)) // FOOTER LINE repeats 3x
    assert(p(1L) == Seq(1L) && p(2L) == Seq(0L) && p(3L) == Seq(0L))
  }

  test("patch paths make the classic paths' decisions on a seeded randomized corpus") {
    import spark.implicits._
    // 80 random docs from a tiny vocabulary — dense with repeated
    // lines and shared chunks — plus empty and null texts; both patch
    // families must agree with their text-shipping twins row for row
    val rnd = new scala.util.Random(42)
    val words = Seq("alpha", "beta", "gamma", "ok", "x",
      "footer", "line", "zz")
    def mkLine() = Seq.fill(rnd.nextInt(6) + 1)(
      words(rnd.nextInt(words.length))).mkString(" ")
    val docs = (1L to 80L).map { i =>
      val t =
        if (i % 17 == 0) null
        else Seq.fill(rnd.nextInt(8))(mkLine()).mkString("\n")
      (i, t)
    }.toDF("doc_id", "text")
    def lineRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("n_kept"),
         r.getAs[Long]("n_dropped"), r.getAs[String]("cleaned_text")))
      .toMap
    assert(lineRows(Dedup.lineDedupViaPatches(docs, col("doc_id"),
        col("text"), maxLineFreq = 2, minLineChars = 3)) ==
      lineRows(Dedup.lineDedup(docs, col("doc_id"), col("text"),
        maxLineFreq = 2, minLineChars = 3)))
    def chunkRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept"),
         r.getAs[String]("cleaned_text"))).toMap
    // maskBits=4: ~1/16 cut rate, so even short docs get several
    // chunks and the tiny vocabulary guarantees cross-doc dup chunks
    assert(chunkRows(Dedup.chunkRewriteViaPatches(docs, col("doc_id"),
        col("text"), maskBits = 4)) ==
      chunkRows(Dedup.chunkDedupRewrite(docs, col("doc_id"),
        col("text"), maskBits = 4)))
  }

  test("winnowing kernel property: random unicode strings match the naive definition") {
    // scalacheck-driven sweep over adversarial strings (mixed-plane
    // unicode, repeats, whitespace) and parameter pairs — the fixed
    // samples below pin known edges; this pins the general case
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    def naive(text: String, k: Int, w: Int): Set[String] = {
      val cps = text.codePoints().toArray
      val n = cps.length - (k - 1)
      if (n < w) return Set.empty
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = (0 until n).map { i =>
        md.reset()
        md.digest(new String(cps, i, k).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 8)
      }
      (0 to n - w).map(j => h.slice(j, j + w).min).toSet
    }
    val charGen = Gen.frequency(
      (6, Gen.alphaNumChar),
      (2, Gen.const(' ')),
      (1, Gen.oneOf('é', 'ß', 'Ж', '你', '界')),
      (1, Gen.const('a'))) // tie pressure
    val emoji = new String(Character.toChars(0x1F600)) // astral: 4-byte UTF-8
    val strGen = for {
      n <- Gen.chooseNum(0, 60)
      s <- Gen.stringOfN(n, charGen)
      splice <- Gen.oneOf(true, false)
      at <- Gen.chooseNum(0, math.max(0, s.length))
    } yield if (splice) s.substring(0, at) + emoji + s.substring(at) else s
    val prop = Prop.forAll(strGen, Gen.chooseNum(1, 9),
        Gen.chooseNum(1, 6)) { (s: String, k: Int, w: Int) =>
      val got = graft.util.WinnowFp
        .fingerprints(org.apache.spark.unsafe.types.UTF8String.fromString(s),
          k, w)
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSet
      got == naive(s, k, w)
    }
    val res = check(Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("winnowing kernel matches the declarative definition exactly") {
    // naive mirror of the oracle SQL: h_i = first 8 hex chars of
    // md5(codepoint k-gram), fingerprints = distinct min over every
    // w-window — the native deque kernel must produce the same SET
    def naive(text: String, k: Int, w: Int): Set[String] = {
      val cps = text.codePoints().toArray
      val n = cps.length - (k - 1)
      if (n < w) return Set.empty
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = (0 until n).map { i =>
        val gram = new String(cps, i, k)
        md.reset()
        md.digest(gram.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 8)
      }
      (0 to n - w).map(j => h.slice(j, j + w).min).toSet
    }
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaa", // all-tie windows: one distinct value
      "café naïve résumé 你好世界 mixed multibyte text here",
      "short", // below k
      "exactly-k+w-2-no-window".take(10))
    for (s <- samples; (k, w) <- Seq((8, 4), (16, 8), (3, 1))) {
      val got = graft.util.WinnowFp
        .fingerprints(org.apache.spark.unsafe.types.UTF8String.fromString(s),
          k, w)
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSet
      assert(got == naive(s, k, w), s"mismatch for '$s' k=$k w=$w")
    }
  }

  test("line dedup: corpus-hot lines drop, short lines exempt, order survives") {
    import spark.implicits._
    val lineDocs = Seq(
      (1L, "alpha beta\nFOOTER LINE\ngamma"),
      (2L, "FOOTER LINE\ndelta"),
      (3L, "FOOTER LINE"),
      (4L, "epsilon\nok"),
      (5L, "ok\nzeta\nok"),
      (6L, "")
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(lineDocs, col("doc_id"), col("text"),
        maxLineFreq = 2, minLineChars = 3)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap
    // "FOOTER LINE" occurs in 3 docs (freq 3 > 2): dropped everywhere
    assert(out(1L) == ((3L, 2L, 1L, "alpha beta\ngamma")))
    assert(out(2L) == ((2L, 1L, 1L, "delta")))
    // a doc that was ONLY boilerplate survives as an empty shell
    assert(out(3L) == ((1L, 0L, 1L, "")))
    // "ok" occurs 3 times corpus-wide but is 2 chars < minLineChars:
    // exempt, kept — including both copies of the in-doc duplicate,
    // in original positions
    assert(out(4L) == ((2L, 2L, 0L, "epsilon\nok")))
    assert(out(5L) == ((3L, 3L, 0L, "ok\nzeta\nok")))
    // a document with no non-empty lines still gets its output row
    assert(out(6L) == ((0L, 0L, 0L, "")))
  }

  test("line dedup: freq == maxLineFreq is kept (strict > drop), plan never all-pairs") {
    import spark.implicits._
    val lineDocs = Seq(
      (1L, "twice line\na1"), (2L, "twice line\nb1")
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(lineDocs, col("doc_id"), col("text"),
        maxLineFreq = 2)
      .orderBy("doc_id").collect()
    assert(out.forall(_.getAs[Long]("n_dropped") == 0L))
    val plan = Dedup.lineDedup(lineDocs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  /** Independent scalar reference for [[Dedup.gearChunks]]. */
  private def gearRef(t: String, maskBits: Int, window: Int = 32)
      : Seq[(Long, Long, Long, String)] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val gear = (0 until 256)
      .map(b => java.lang.Long.parseLong(md5hex(s"$b:gear").take(8), 16))
    val mask = (1L << maskBits) - 1
    val cuts = (1 to t.length).filter { i =>
      val h = (1 to math.min(i, window)).map { k =>
        (gear(t.charAt(i - k).toInt % 256) & ((1L << (33 - k)) - 1)) *
          (1L << (k - 1))
      }.sum
      (h & mask) == 0
    }
    val ends = (cuts :+ t.length).distinct.sorted
    ends.zipWithIndex.map { case (e, idx) =>
      val st = if (idx == 0) 1 else ends(idx - 1) + 1
      (idx.toLong, st.toLong, (e - st + 1).toLong,
        md5hex(t.substring(st - 1, e)))
    }
  }

  test("gear chunks: exact match vs an independent scalar reference; chunks tile the text") {
    import spark.implicits._
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and " +
        "again while the slow red panda watches from a nearby tree"),
      (2L, "a"), // shorter than the window: chunk = whole text
      (3L, "completely different content with other words here"))
    val out = Dedup.gearChunks(texts.toDF("id", "t"), col("id"),
        col("t"), maskBits = 4)
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (d, rs) => d -> rs.sortBy(_.getAs[Long]("chunk_no"))
        .map(r => (r.getAs[Long]("chunk_no"), r.getAs[Long]("start"),
          r.getAs[Long]("chunk_len"), r.getAs[String]("chunk_md5"))).toSeq }
    texts.foreach { case (id, t) =>
      assert(out(id) == gearRef(t, maskBits = 4), s"doc $id")
      // chunks tile the text exactly: starts chain, lengths sum to n
      val rs = out(id)
      assert(rs.head._2 == 1L)
      assert(rs.map(_._3).sum == t.length.toLong)
      rs.sliding(2).foreach {
        case Seq(a, b) => assert(b._2 == a._2 + a._3)
        case _ =>
      }
    }
  }

  test("gear chunks are shift-resistant: shared passage at different offsets yields shared chunks") {
    import spark.implicits._
    val passage = SparkEntry.GearPassage
    val docs = Seq(
      (1L, "xy " + passage),
      (2L, "a much longer and entirely different document prefix " +
        "goes here before the common part today " + passage)).toDF("id", "t")
    val chunks = Dedup.gearChunks(docs, col("id"), col("t"), maskBits = 6)
    val byDoc = chunks.collect().groupBy(_.getAs[Long]("doc_id"))
      .map { case (d, rs) => d -> rs.map(_.getAs[String]("chunk_md5")).toSet }
    val shared = byDoc(1L).intersect(byDoc(2L))
    // the passage's interior boundaries re-align regardless of prefix
    assert(shared.size >= 4, s"expected >=4 shared chunks, got $shared")
    // fixed-stride fingerprinting at these offsets shares nothing:
    // the prefixes differ in length by a non-multiple of any stride>1
    val dup = Dedup.gearDupChunks(docs, col("id"), col("t"), maskBits = 6)
      .collect()
    assert(dup.nonEmpty)
    assert(dup.forall(r => r.getAs[Long]("n_docs") == 2L))
    // map-only: the chunker itself never shuffles
    val plan = Dedup.gearChunks(docs, col("id"), col("t"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("gear chunks: parameter bounds rejected") {
    import spark.implicits._
    val d = Seq((1L, "abc")).toDF("id", "t")
    intercept[IllegalArgumentException] {
      Dedup.gearChunks(d, col("id"), col("t"), maskBits = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.gearChunks(d, col("id"), col("t"), maskBits = 6, window = 33)
    }
  }

  test("sourcePairMatrix: unordered cells, internal vs cross-source counts") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (1L, 6L))
      .toDF("doc_a", "doc_b")
    val strata = Seq((1L, "web"), (2L, "web"), (3L, "books"),
      (4L, "books"), (5L, "web"), (6L, "code")).toDF("id", "src")
    val out = Dedup.sourcePairMatrix(pairs, strata, col("id"), col("src"))
      .collect().map(r => (r.getAs[String]("src_a"),
        r.getAs[String]("src_b")) -> r.getAs[Long]("n_pairs")).toMap
    // (1,3) is web-books, (2,3) books-web, (4,5) books-web: one cell
    assert(out == Map(
      ("web", "web") -> 1L,       // (1,2)
      ("books", "web") -> 3L,     // (1,3), (2,3), (4,5) — unordered
      ("code", "web") -> 1L))     // (1,6)
  }

  test("templateDedup: entity-differing twins collapse; real content differences don't") {
    import spark.implicits._
    val docs = Seq(
      (1L, "invoice 1001 issued 2026-01-02 to alice@shop.com total 95 dollars"),
      (2L, "invoice 2002 issued 2026-03-04 to bob@mail.org total 120 dollars"),
      (3L, "invoice 1001 issued 2026-01-02 to alice@shop.com total 95 euros"),
      (4L, "see https://example.com/a/1 and https://other.net/b/22 for details"),
      (5L, "see https://мир.example/x and https://site.io/9 for details"),
      (6L, "a genuinely different page about something else entirely")
    ).toDF("id", "t")
    val out = Dedup.templateDedup(docs, col("id"), col("t"))
      .collect().map(r => r.getAs[Long]("canonical_id") ->
        r.getAs[Long]("n_copies")).toMap
    // 1 and 2 share the masked template (numbers/emails differ only);
    // 3 differs in a real word (euros), 6 is unrelated
    assert(out == Map(1L -> 2L, 4L -> 2L))
    // sanity: dropping the mask threshold to 1 reports every group
    val all = Dedup.templateDedup(docs, col("id"), col("t"), minCopies = 1)
      .collect()
    assert(all.map(_.getAs[Long]("n_copies")).sum == 6L)
  }

  test("minhashLshPairs: hot-band cap drops the boilerplate bucket, keeps real pairs") {
    import spark.implicits._
    val boiler = "identical boilerplate page repeated verbatim across " +
      "the whole crawl with nothing else inside it at all"
    val real = "a genuine pair of near duplicate documents sharing " +
      "most of their shingles but not their trailing words here"
    val docs = ((1L to 20L).map(i => (i, boiler)) ++
      Seq((100L, real), (101L, real + " tail"))).toDF("id", "t")
    // uncapped: the 20 boilerplate clones alone cost C(20,2) = 190 pairs
    val un = Dedup.minhashLshPairs(docs, col("id"), col("t"), 3, 16, 8, 0.5)
      .collect()
    assert(un.length == 190 + 1)
    // capped at 10 docs/bucket: every boilerplate bucket is hot (all 20
    // clones share every band), so the clone pairs vanish; the real
    // pair's buckets hold 2 docs and survive
    val capped = Dedup.minhashLshPairs(docs, col("id"), col("t"), 3, 16, 8,
        0.5, maxBandFreq = 10)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(capped.toSeq == Seq((100L, 101L)))
  }

  test("containmentPairs: wrapped doc found at containment 1.0 where jaccard misses") {
    import spark.implicits._
    val article = "seventeen violinists rehearse quietly beneath " +
      "the old stone bridge while the river carries their tune away"
    val wrapper = "aggregator page header with site navigation and " +
      "trending links plus further teaser paragraphs " + article +
      " related stories comments section footer copyright notice " +
      "subscribe banner and a very long tail of unrelated boilerplate " +
      "text that keeps growing the shingle set of this page"
    val docs = Seq((1L, article), (2L, wrapper),
      (3L, "entirely unrelated document about spark physical plans " +
        "and exchange reuse across stages")).toDF("id", "t")
    val out = Dedup.containmentPairs(docs, col("id"), col("t"), n = 3,
      minContainment = 0.6).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Long]("contained_doc") == 1L) // the smaller set
    assert(r.getAs[Double]("containment") == 1.0) // every shingle of 1 in 2
    // the same pair is jaccard-invisible at any useful threshold
    val j = Dedup.ngramJaccardPairs(docs, col("id"), col("t"), n = 3,
      minJaccard = 0.5).collect()
    assert(j.isEmpty)
  }

  test("incrementalIngest: exact + near screens against the old side only") {
    import spark.implicits._
    val passage = "the quick brown fox jumps over the lazy dog while " +
      "seventeen violinists rehearse quietly beneath the old stone bridge"
    val docs = Seq(
      (1L, passage, false),                       // corpus
      (2L, passage, false),                       // corpus-internal clone
      (3L, "completely different corpus text about distributed " +
        "query engines and their shuffle boundaries in production", false),
      (101L, passage, true),                      // exact dup of 1 (and 2)
      (102L, "completely different corpus text about distributed " +
        "query engines and their shuffle boundaries in practice", true),
      (103L, "a wholly novel document sharing no phrasing with " +
        "anything already ingested by this pipeline at all", true)
    ).toDF("id", "t", "fresh")
    val out = Dedup.incrementalIngest(docs, col("id"), col("t"),
        col("fresh"), n = 3, numHashes = 16, bands = 8,
        minEstJaccard = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // one row per NEW doc; the corpus-internal clone pair (1,2) is
    // never examined, let alone emitted
    assert(out.keySet == Set(101L, 102L, 103L))
    assert(out(101L).getAs[Boolean]("exact_dup"))
    assert(!out(101L).getAs[Boolean]("keep"))
    // 101's best near match: full signature agreement, lowest old id
    assert(out(101L).getAs[Long]("near_dup_of") == 1L)
    assert(out(101L).getAs[Long]("n_match") == 16L)
    assert(!out(102L).getAs[Boolean]("exact_dup"))
    assert(out(102L).getAs[Long]("near_dup_of") == 3L)
    assert(out(102L).getAs[Double]("est_jaccard") >= 0.5)
    assert(!out(102L).getAs[Boolean]("keep"))
    assert(out(103L).getAs[Boolean]("keep"))
    assert(out(103L).isNullAt(out(103L).fieldIndex("near_dup_of")))
  }

  test("clusterKeepBest: highest score survives, ties break to lowest id") {
    import spark.implicits._
    // clusters: {1,2,3} and {10,11}; singleton 20 never appears in
    // pair output so (like nearDupClusters) it is out of scope here
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    // doc 2 longest in cluster 1; docs 10/11 tie -> 10 wins
    val quality = Seq((1L, 50L), (2L, 90L), (3L, 90L), (10L, 70L),
      (11L, 70L), (20L, 99L)).toDF("id", "len")
    val out = Dedup.clusterKeepBest(clusters, quality, col("id"), col("len"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_members"),
         r.getAs[Long]("q_score"), r.getAs[Boolean]("is_kept"))).toMap
    assert(out.size == 5)
    // tie at 90 between docs 2 and 3 -> lower id 2 kept
    assert(out(2L) == (1L, 3L, 90L, true))
    assert(out(3L) == (1L, 3L, 90L, false))
    assert(out(1L) == (1L, 3L, 50L, false))
    assert(out(10L) == (10L, 2L, 70L, true))
    assert(out(11L) == (10L, 2L, 70L, false))
    // exactly one survivor per cluster
    assert(out.values.count(_._4) == 2)
    // scale-shape pin: argmax is a max_by hash aggregate, no Window
    val plan = Dedup.clusterKeepBest(clusters, quality, col("id"), col("len"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    // a clustered doc MISSING a quality row keeps its row (null
    // q_score, counted in n_members) and never beats a scored member
    val sparse = Seq((1L, 50L), (10L, 70L), (11L, 70L)).toDF("id", "len")
    val out2 = Dedup.clusterKeepBest(clusters, sparse, col("id"), col("len"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_members"),
         if (r.isNullAt(r.fieldIndex("q_score"))) None
         else Some(r.getAs[Long]("q_score")),
         r.getAs[Boolean]("is_kept"))).toMap
    assert(out2.size == 5)
    assert(out2(1L) == (3L, Some(50L), true)) // only scored member wins
    assert(out2(2L) == (3L, None, false))
    assert(out2(3L) == (3L, None, false))
  }
}
