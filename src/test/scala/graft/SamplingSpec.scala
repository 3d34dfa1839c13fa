package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling
import graft.sources.Tables

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("stratified sample: rate 1.0 keeps everything, 0.0 keeps nothing") {
    val docs = Tables.documents(spark, sf)
    val all = Sampling.stratifiedSample(docs, col("doc_id"), col("source"),
      rates = Map.empty, defaultRate = 1.0)
    assert(all.count() == docs.count())
    val none = Sampling.stratifiedSample(docs, col("doc_id"), col("source"),
      rates = Map.empty, defaultRate = 0.0)
    assert(none.count() == 0L)
  }

  test("stratified sample: per-stratum rates apply and are deterministic") {
    val docs = Tables.documents(spark, sf)
    val rates = Map("src0" -> 1.0, "src1" -> 0.5)
    val s1 = Sampling.stratifiedSample(docs, col("doc_id"), col("source"),
      rates, defaultRate = 0.25)
    val s2 = Sampling.stratifiedSample(docs, col("doc_id"), col("source"),
      rates, defaultRate = 0.25)
    // deterministic: identical id set on re-execution (no RNG state)
    assert(s1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      s2.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // src0 at rate 1.0 is kept whole
    val src0All = docs.filter(col("source") === "src0").count()
    assert(s1.filter(col("source") === "src0").count() == src0All)
    // sampled rates land near their targets (md5 bucket is uniform;
    // wide tolerance — this is a smoke bound, not a statistics test)
    val src1All = docs.filter(col("source") === "src1").count().toDouble
    val src1Kept = s1.filter(col("source") === "src1").count().toDouble
    assert(src1Kept / src1All > 0.2 && src1Kept / src1All < 0.8)
  }

  test("stratified sample is a subset filter, not a rewrite") {
    val docs = Tables.documents(spark, sf)
    val s = Sampling.stratifiedSample(docs, col("doc_id"), col("source"),
      Map("src0" -> 0.5), defaultRate = 0.5)
    // anti-join back: every sampled row exists verbatim in the source
    assert(s.exceptAll(docs).count() == 0L)
  }

  test("stratified sample plan: map-only predicate on the scan, no exchange") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"))
    val plan = Sampling.stratifiedSample(docs, col("doc_id"), col("source"),
      Map("src0" -> 0.5), defaultRate = 0.25)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"sampling must not shuffle:\n$plan")
  }

  test("mixture plan: thresholds are exact bucket math, then drive the sampler") {
    val docs = Tables.documents(spark, sf)
    val weights = Map("src0" -> 0.30, "src1" -> 0.20)
    val plan = Sampling.mixturePlan(docs, col("source"), col("n_chars"),
      weights, defaultWeight = 0.05, budget = 100000L).collect()
      .map(r => r.getAs[String]("stratum") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("available"),
          r.getAs[Long]("target"), r.getAs[Long]("bucket_threshold"))).toMap
    // recompute the threshold contract per stratum
    plan.foreach { case (s, (nDocs, avail, target, thr)) =>
      val w = weights.getOrElse(s, 0.05)
      assert(nDocs > 0 && avail > 0)
      assert(target == math.floor(100000L.toDouble * w).toLong)
      assert(thr == math.min(256L,
        math.floor(target * 256 / avail.toDouble).toLong), s)
    }
    // composition: feed the planned thresholds back through the sampler
    // (threshold/256 = rate) and check realized char mass lands near the
    // target for uncapped strata — loose bound, 500-doc hash uniformity
    val rates = plan.map { case (s, (_, _, _, thr)) =>
      s -> thr.toDouble / 256.0 }
    val sampled = Sampling.stratifiedSample(docs, col("doc_id"),
        col("source"), rates, defaultRate = 0.0)
      .groupBy(col("source")).agg(sum(col("n_chars")).as("got"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("got"))
      .toMap
    // per-stratum strata here are ~25 docs, so the binomial 3-sigma
    // deviation is ~30% of available — this is a smoke bound on the
    // composition wiring, not a statistics test (the md5 bucket's
    // uniformity itself is pinned in the rate test above)
    plan.foreach { case (s, (_, avail, target, thr)) =>
      if (thr >= 256L) assert(sampled(s) == avail) // capped: keep all
      else {
        val got = sampled.getOrElse(s, 0L).toDouble
        assert(got <= avail)
        assert(math.abs(got - target) < avail * 0.35,
          s"$s: got $got vs target $target (available $avail)")
      }
    }
  }

  test("rates outside [0,1] are rejected") {
    val docs = Tables.documents(spark, sf)
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(docs, col("doc_id"), col("source"),
        Map("src0" -> 1.5), defaultRate = 0.5)
    }
  }

  test("packing plan: hand-computed offsets, bins and boundary crossings") {
    import spark.implicits._
    val docs = Seq(
      ("a", 1L, 300L), ("a", 2L, 300L), ("a", 3L, 500L),
      ("b", 10L, 512L), ("b", 11L, 1L)
    ).toDF("src", "id", "nt")
    val rows = Sampling.packingPlan(docs, col("id"), col("nt"), col("src"),
        ctxLen = 512L)
      .orderBy("shard", "doc_id")
      .select("shard", "doc_id", "start_offset", "bin_first", "bin_last",
        "crosses")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(rows.toSeq == Seq(
      // shard a: [0,299] bin 0; [300,599] crosses 0->1; [600,1099] 1->2
      ("a", 1L, 0L, 0L, 0L, false),
      ("a", 2L, 300L, 0L, 1L, true),
      ("a", 3L, 600L, 1L, 2L, true),
      // shard b restarts at offset 0: [0,511] fills bin 0 exactly
      ("b", 10L, 0L, 0L, 0L, false),
      ("b", 11L, 512L, 1L, 1L, false)))
  }

  test("packing plan: zero-token docs hold one slot and don't advance the stream") {
    import spark.implicits._
    val docs = Seq(("a", 1L, 0L), ("a", 2L, 100L)).toDF("src", "id", "nt")
    val rows = Sampling.packingPlan(docs, col("id"), col("nt"), col("src"),
        ctxLen = 512L)
      .orderBy("doc_id").collect()
    // doc 1: zero tokens, occupies [0,0] via the greatest(n,1) floor
    assert(rows(0).getAs[Long]("start_offset") == 0L &&
      rows(0).getAs[Long]("bin_first") == 0L &&
      !rows(0).getAs[Boolean]("crosses"))
    // doc 2 starts at 0 too: the empty doc contributed no tokens
    assert(rows(1).getAs[Long]("start_offset") == 0L)
  }

  test("packing plan: layout is a pure function of the data, not the partitioning") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (s"s${i % 3}", i, i % 37 + 1)).toDF("src", "id", "nt")
    val a = Sampling.packingPlan(docs, col("id"), col("nt"), col("src"), 64L)
      .orderBy("shard", "doc_id").collect().toSeq
    val b = Sampling.packingPlan(docs.repartition(7).sortWithinPartitions(desc("id")),
        col("id"), col("nt"), col("src"), 64L)
      .orderBy("shard", "doc_id").collect().toSeq
    assert(a == b)
  }

  test("packing plan shape: one shard-keyed exchange, no global sort") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (s"s${i % 3}", i, i % 7 + 1)).toDF("src", "id", "nt")
    val plan = Sampling.packingPlan(docs, col("id"), col("nt"), col("src"), 64L)
      .queryExecution.executedPlan.toString
    // windows partitioned by the shard key: hash exchange, not a
    // range-partitioned global sort
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
    assert(!plan.contains("rangepartitioning"), plan)
  }

  test("packing plan rejects a non-positive context length") {
    import spark.implicits._
    val docs = Seq(("a", 1L, 5L)).toDF("src", "id", "nt")
    intercept[IllegalArgumentException] {
      Sampling.packingPlan(docs, col("id"), col("nt"), col("src"), 0L)
    }
  }

  test("split assignment: deterministic, exhaustive, near the fractions, map-only") {
    val docs = Tables.documents(spark, sf)
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val s1 = Sampling.assignSplit(docs, col("doc_id"), fr)
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    // every doc gets exactly one split; proportions land near targets
    assert(counts.keySet == Set("train", "val", "test"))
    assert(total == docs.count().toDouble)
    assert(counts("train") / total > 0.7 && counts("train") / total < 0.9)
    // pure function of (id, salt): identical on re-run
    val s2 = Sampling.assignSplit(docs, col("doc_id"), fr)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    s1.select("doc_id", "split").collect().foreach { r =>
      assert(s2(r.getLong(0)) == r.getString(1))
    }
    // a different salt reshuffles assignments (split and sampling
    // decisions stay independent)
    val salted = Sampling.assignSplit(docs, col("doc_id"), fr, salt = "other")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s2.exists { case (id, sp) => salted(id) != sp })
    // map-only predicate: no exchange
    val plan = Sampling.assignSplit(docs.select(col("doc_id")),
      col("doc_id"), fr).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // invalid fraction sets rejected
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(docs, col("doc_id"), Seq("a" -> 0.9, "b" -> 0.3))
    }
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(docs, col("doc_id"), Seq.empty)
    }
  }

  test("exact-k sample: deterministic, exactly min(k, |stratum|) rows, salt-independent draws") {
    import spark.implicits._
    val docs = (0L until 60L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    def run(salt: String) = Sampling.exactKSample(docs, col("id"),
        col("src"), k = 10, salt = salt).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val a = run("exactk")
    assert(a.sameElements(run("exactk"))) // pure function of the data
    val perStratum = a.groupBy(_._1)
    assert(perStratum.keySet == Set("s0", "s1", "s2"))
    perStratum.values.foreach { rows =>
      assert(rows.length == 10)
      assert(rows.map(_._2).sorted.sameElements(1L to 10L))
    }
    // a stratum smaller than k yields all of it
    val small = Sampling.exactKSample(docs.filter(col("id") < 4),
      col("id"), col("src"), k = 10).collect()
    assert(small.length == 4)
    // a different salt is an independent draw
    assert(!a.sameElements(run("other-salt")))
  }

  test("exact-k sample: aggregator ranking matches the row_number window form exactly") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"s${i % 4}")).toDF("id", "src")
    val got = Sampling.exactKSample(docs, col("id"), col("src"), k = 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // independent window form ordering by the md5 HEX STRING — the
    // oracle's formulation; fixed-width lowercase hex sorts like the
    // numeric rank the aggregator uses
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src"))
      .orderBy(substring(md5(concat(col("id").cast("string"),
        lit(":exactk:"), col("src"))), 1, 12), col("id"))
    val want = docs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 7)
      .collect().map(r => (r.getAs[String]("src"),
        r.getAs[Int]("rk").toLong, r.getAs[Long]("id"))).toSet
    assert(got == want)
    // scale-shape pin: the aggregator form has no Window, and ranks
    // ride an object hash aggregate with partial (map-side) buffers
    val plan = Sampling.exactKSample(docs, col("id"), col("src"), k = 7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("lengthBucketPlan: power-of-two buckets with exact waste ledger") {
    import spark.implicits._
    // lengths: 1 -> b0; 2,3 -> b1; 5,7 -> b2; 9 -> b3; 0 dropped
    val docs = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 5L), (5L, 7L),
      (6L, 9L), (7L, 0L)).toDF("id", "nt")
    val out = Sampling.lengthBucketPlan(docs, col("id"), col("nt"))
      .collect().map(r => r.getAs[Long]("bucket") -> r).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L))
    assert(out(1L).getAs[Long]("n_docs") == 2L)
    assert(out(1L).getAs[Long]("min_tokens") == 2L)
    assert(out(1L).getAs[Long]("max_tokens") == 3L)
    assert(out(1L).getAs[Long]("token_mass") == 5L)
    assert(out(1L).getAs[Long]("padded_mass") == 6L)
    // (6-5)*1000 DIV 6 = 166
    assert(out(1L).getAs[Long]("waste_permille") == 166L)
    // bucket 2: docs 5,7 -> padded 14, mass 12 -> 142
    assert(out(2L).getAs[Long]("waste_permille") == 142L)
    // a single-doc bucket wastes nothing
    assert(out(3L).getAs[Long]("waste_permille") == 0L)
  }

  test("splitLeakage: reports exactly the near-dup pairs that straddle splits") {
    import spark.implicits._
    val passage = "seventeen violinists rehearse quietly beneath the " +
      "old stone bridge while the river carries their tune away " +
      "and the audience listens in contented silence tonight"
    // clones of one passage across many ids: some id pairs land in
    // the same split, some straddle — the audit must return exactly
    // the straddling subset of the near-dup pairs
    val docs = (1L to 12L).map(i => (i, passage))
      .toDF("id", "t")
    val fr = Seq("train" -> 0.5, "test" -> 0.5)
    val out = Sampling.splitLeakage(docs, col("id"), col("t"), fr,
        n = 3, numHashes = 16, bands = 8, minEstJaccard = 0.5)
      .collect()
    val splits = Sampling.assignSplit(docs, col("id"), fr)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("split")).toMap
    val pairs = graft.operators.Dedup.minhashLshPairs(docs, col("id"),
        col("t"), 3, 16, 8, 0.5)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val wantLeaks = pairs.filter { case (a, b) => splits(a) != splits(b) }.toSet
    assert(wantLeaks.nonEmpty && wantLeaks.size < pairs.length,
      s"fixture must mix same-split and cross-split pairs: $splits")
    assert(out.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      == wantLeaks)
    // evidence columns carry the assignment and full-signature match
    out.foreach { r =>
      assert(r.getAs[String]("split_a") != r.getAs[String]("split_b"))
      assert(r.getAs[Long]("n_match") == 16L) // exact clones
    }
  }

  test("temperatureWeights: α=1/2 smoothing up-weights the tail, hand-computed") {
    import spark.implicits._
    // 900 "web" docs, 90 "books", 10 "code": raw 90/9/1 %
    val docs = ((1 to 900).map(i => (i.toLong, "web")) ++
      (901 to 990).map(i => (i.toLong, "books")) ++
      (991 to 1000).map(i => (i.toLong, "code"))).toDF("id", "src")
    val out = Sampling.temperatureWeights(docs, col("src"), budget = 1000L)
      .collect().map(r => r.getAs[String]("stratum") -> r).toMap
    // s_i = floor(sqrt(n)*65536): 900 -> 1966080, 90 -> 621772, 10 -> 207243
    val s = Map("web" -> math.floor(math.sqrt(900.0) * 65536).toLong,
      "books" -> math.floor(math.sqrt(90.0) * 65536).toLong,
      "code" -> math.floor(math.sqrt(10.0) * 65536).toLong)
    val sTot = s.values.sum
    for ((k, si) <- s) {
      assert(out(k).getAs[Long]("weight_ppm") == si * 1000000L / sTot, k)
      assert(out(k).getAs[Long]("expected_docs") ==
        1000L * (si * 1000000L / sTot) / 1000000L, k)
    }
    assert(out("web").getAs[Long]("raw_ppm") == 900000L)
    // smoothing: head down-weighted, tail up-weighted
    assert(!out("web").getAs[Boolean]("upweighted"))
    assert(out("books").getAs[Boolean]("upweighted"))
    assert(out("code").getAs[Boolean]("upweighted"))
    assert(out("web").getAs[Long]("weight_ppm") < 900000L)
    assert(out("code").getAs[Long]("weight_ppm") > 10000L)
    // weights still sum to ~1 (ppm floor loss < #strata)
    val wSum = out.values.map(_.getAs[Long]("weight_ppm")).sum
    assert(wSum > 1000000L - 3 && wSum <= 1000000L)
  }

  test("budgetSelect: greedy (score desc, id asc) prefix under the budget, boundary class split exactly") {
    import spark.implicits._
    // classes: score 9 -> docs 1,2 (10+10 tok); score 5 -> docs
    // 3,4,5 (10 each); score 1 -> doc 6 (10). budget 45 takes all of
    // class 9 (20), then docs 3,4 of class 5 (40), rejects doc 5
    // (would hit 50) and the whole class 1
    val docs = Seq(
      (1L, 9L, 10L), (2L, 9L, 10L),
      (3L, 5L, 10L), (4L, 5L, 10L), (5L, 5L, 10L),
      (6L, 1L, 10L)).toDF("id", "score", "tok")
    val out = Sampling.budgetSelect(docs, col("id"), col("score"),
        col("tok"), budget = 45L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("selected")).toMap
    assert(out == Map(1L -> true, 2L -> true, 3L -> true, 4L -> true,
      5L -> false, 6L -> false))
    // prefix-cumsum reference on the full order (the contract is the
    // maximal PREFIX under budget — a doc that does not fit also
    // blocks every lower-ranked doc, matching the SQL window form),
    // for a denser random-ish case
    val dense = (1L to 60L).map(i => (i, (i * 7) % 13, (i % 5) + 1))
      .toDF("id", "score", "tok")
    val got = Sampling.budgetSelect(dense, col("id"), col("score"),
        col("tok"), budget = 70L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("selected")).toMap
    var run = 0L
    val want = (1L to 60L).map(i => (i, (i * 7) % 13, (i % 5) + 1))
      .sortBy { case (i, s, _) => (-s, i) }
      .map { case (i, _, t) =>
        val sel = run + t <= 70L
        run += t
        i -> sel
      }.toMap
    assert(got == want)
    // scale pin: no corpus-wide range sort — the only per-doc window
    // partitions by the boundary score class
    val p = Sampling.budgetSelect(dense, col("id"), col("score"),
      col("tok"), budget = 70L).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange rangepartitioning"),
      s"budgetSelect must not global-sort the corpus:\n$p")
    // ...and no union of filtered scan copies (the funnel
    // discipline): wholesale classes decide in ONE pass via the
    // boundary literal, only the boundary class joins back
    assert(!p.contains("Union"),
      s"budgetSelect must not union filtered copies of the corpus:\n$p")
    // all-fits edge: no boundary class exists, everything selected
    val allIn = Sampling.budgetSelect(dense, col("id"), col("score"),
        col("tok"), budget = 1000000L).collect()
    assert(allIn.length == 60 &&
      allIn.forall(_.getAs[Boolean]("selected")))
    // budget 0: nothing fits (first class is the boundary)
    val none = Sampling.budgetSelect(dense, col("id"), col("score"),
        col("tok"), budget = 0L).collect()
    assert(none.length == 60 && !none.exists(_.getAs[Boolean]("selected")))
  }

  test("epochShuffle: every doc once per epoch, contiguous positions, " +
      "exact running offsets, epochs reshuffle independently") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, i % 13 + 1)).toDF("id", "nt")
    val plan = Sampling.epochShuffle(docs, col("id"), col("nt"),
      epochs = 3, nShards = 4)
    val rows = plan.orderBy("epoch", "shard", "pos").collect()
    assert(rows.length == 600)
    // each epoch holds the full corpus exactly once
    val byEpoch = rows.groupBy(_.getAs[Long]("epoch"))
    assert(byEpoch.keySet == Set(0L, 1L, 2L))
    byEpoch.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("doc_id")).toSet == (1L to 200L).toSet)
    }
    // positions are 1..n within each (epoch, shard) and the offset is
    // the exact running token sum in position order
    rows.groupBy(r => (r.getAs[Long]("epoch"), r.getAs[Long]("shard")))
      .values.foreach { rs =>
        val sorted = rs.sortBy(_.getAs[Long]("pos"))
        assert(sorted.map(_.getAs[Long]("pos")).toSeq ==
          (1L to sorted.length).toSeq)
        var run = 0L
        sorted.foreach { r =>
          assert(r.getAs[Long]("start_offset") == run)
          run += r.getAs[Long]("n_tokens")
        }
      }
    // consecutive epochs produce genuinely different orders (the
    // epoch number is hashed with the id, so shard assignment and
    // within-shard rank both reshuffle)
    def order(e: Long) = rows.filter(_.getAs[Long]("epoch") == e)
      .sortBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("pos")))
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(order(0L) != order(1L) && order(1L) != order(2L))
  }

  test("epochShuffle: order is a pure function of the data, not the partitioning") {
    import spark.implicits._
    val docs = (1L to 120L).map(i => (i, i % 7 + 1)).toDF("id", "nt")
    val a = Sampling.epochShuffle(docs, col("id"), col("nt"), 2, 8)
      .orderBy("epoch", "shard", "pos").collect().toSeq
    val b = Sampling.epochShuffle(
        docs.repartition(7).sortWithinPartitions(desc("id")),
        col("id"), col("nt"), 2, 8)
      .orderBy("epoch", "shard", "pos").collect().toSeq
    assert(a == b)
  }

  test("epochShuffle shape: one hash exchange + one Window (both window " +
      "expressions share the sort), no global sort") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (i, i % 7 + 1)).toDF("id", "nt")
    val p = Sampling.epochShuffle(docs, col("id"), col("nt"), 3, 16)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).length == 1, p)
    // row_number and the running sum may split into two Window nodes
    // (different frames) but must share ONE exchange + ONE sort
    assert("\\bSort \\[".r.findAllIn(p).length == 1, p)
    assert(!p.contains("rangepartitioning"), p)
  }

  test("epochShuffle rejects non-positive epochs and shard counts") {
    import spark.implicits._
    val docs = Seq((1L, 5L)).toDF("id", "nt")
    intercept[IllegalArgumentException] {
      Sampling.epochShuffle(docs, col("id"), col("nt"), 0, 4)
    }
    intercept[IllegalArgumentException] {
      Sampling.epochShuffle(docs, col("id"), col("nt"), 1, 0)
    }
  }

  test("mixtureInterleave: stride schedule interleaves strata at their " +
      "weights from the first prefix (hand-computed stratum sequence)") {
    import spark.implicits._
    // 8 docs of 'a' at 750000 ppm (stride 4/3), 4 of 'b' at 250000
    // (stride 4): vtimes a = 1,2,4,5,6,8,9,10; b = 4,8,12,16; merged
    // by (vtime, stratum) the stratum sequence is fixed regardless of
    // which doc holds which rank
    val docs = ((1L to 8L).map(i => (i, "a")) ++
      (9L to 12L).map(i => (i, "b"))).toDF("id", "src")
    val out = Sampling.mixtureInterleave(docs, col("id"), col("src"),
        weightsPpm = Map("a" -> 750000L, "b" -> 250000L),
        defaultPpm = 0L, nShards = 1)
      .orderBy("shard", "pos").collect()
    assert(out.length == 12)
    assert(out.map(_.getAs[Long]("pos")).toSeq == (1L to 12L).toSeq)
    assert(out.map(_.getAs[String]("stratum")).toSeq ==
      Seq("a", "a", "a", "b", "a", "a", "a", "b", "a", "a", "b", "b"))
    // any prefix carries ~3:1 a:b — the property concatenation lacks
    val firstFour = out.take(4).map(_.getAs[String]("stratum"))
    assert(firstFour.count(_ == "a") == 3 && firstFour.count(_ == "b") == 1)
  }

  test("mixtureInterleave: zero-weight strata are dropped; " +
      "deterministic under repartitioning") {
    import spark.implicits._
    val docs = ((1L to 20L).map(i => (i, "keep")) ++
      (21L to 30L).map(i => (i, "dead"))).toDF("id", "src")
    val out = Sampling.mixtureInterleave(docs, col("id"), col("src"),
      weightsPpm = Map("keep" -> 500000L, "dead" -> 0L),
      defaultPpm = 100000L, nShards = 2)
    val rows = out.orderBy("shard", "pos").collect()
    assert(rows.forall(_.getAs[String]("stratum") == "keep"))
    assert(rows.length == 20)
    val again = Sampling.mixtureInterleave(
        docs.repartition(5).sortWithinPartitions(desc("id")),
        col("id"), col("src"),
        weightsPpm = Map("keep" -> 500000L, "dead" -> 0L),
        defaultPpm = 100000L, nShards = 2)
      .orderBy("shard", "pos").collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("mixtureInterleave shape: two narrow hash exchanges " +
      "((shard, stratum) rank then shard position), no global sort") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val p = Sampling.mixtureInterleave(docs, col("id"), col("src"),
        weightsPpm = Map.empty, defaultPpm = 100000L, nShards = 4)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).length == 2, p)
    assert(!p.contains("rangepartitioning"), p)
  }

  test("mixtureInterleave rejects negative weights and bad shard counts") {
    import spark.implicits._
    val docs = Seq((1L, "a")).toDF("id", "src")
    intercept[IllegalArgumentException] {
      Sampling.mixtureInterleave(docs, col("id"), col("src"),
        Map("a" -> -1L), 0L, 1)
    }
    intercept[IllegalArgumentException] {
      Sampling.mixtureInterleave(docs, col("id"), col("src"),
        Map.empty, 0L, 0)
    }
  }

  test("systematicPps: hand-computed stride walk — heavy doc sampled " +
      "twice, sum of copies == k, non-positive weights dropped") {
    import spark.implicits._
    // weights 5,1,4,2,8 (total 20), k=4 -> step 5, offset 3,
    // thresholds 3,8,13,18: doc 1 takes t=3, doc 3 takes t=8,
    // doc 5 takes t=13 AND t=18 (twice its share of the line)
    val df = Seq((1L, 5L), (2L, 1L), (3L, 4L), (4L, 2L), (5L, 8L),
      (6L, 0L), (7L, -3L)).toDF("id", "w")
    val out = Sampling.systematicPps(df, col("id"), col("w"), k = 4,
        buckets = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("wt"),
        r.getAs[Long]("cum_before"), r.getAs[Long]("n_copies")))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1L, 5L, 0L, 1L), (3L, 4L, 6L, 1L),
      (5L, 8L, 12L, 2L)))
    // property: 300 hash-derived weights, several k — total copies
    // is exactly k and every count is within its PPS ceiling
    val vs = (0 until 300).map(i => (i.toLong, (i * 2654435761L) % 97L + 1L))
    val vdf = vs.toDF("id", "w")
    val total = vs.map(_._2).sum
    for (k <- Seq(1, 7, 50)) {
      val sel = Sampling.systematicPps(vdf, col("id"), col("w"), k)
        .collect().map(r => r.getAs[Long]("wt") -> r.getAs[Long]("n_copies"))
      assert(sel.map(_._2).sum == k.toLong, s"k=$k")
      val step = math.max(total / k, 1L)
      assert(sel.forall { case (w, n) => n <= w / step + 1 }, s"k=$k")
    }
    // plan: grid cumsum, never a global range sort
    val p = Sampling.systematicPps(vdf, col("id"), col("w"), 10)
      .queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("rangepartitioning"), p)
  }

  test("hashReservoir: matches the window-rank definition exactly, " +
      "dedups repeated ids, and plans as a bounded partial aggregate") {
    import spark.implicits._
    // 3 strata of uneven sizes (one below k), with repeated ids
    val rows = (0 until 500).map(i => ("big", i.toLong)) ++
      (0 until 500).map(i => ("big", i.toLong)) ++ // exact repeats
      (1000 until 1040).map(i => ("mid", i.toLong)) ++
      (2000 until 2003).map(i => ("tiny", i.toLong))
    val df = rows.toDF("src", "id")
    val out = Sampling.hashReservoir(df, col("src"), col("id"), k = 8)
      .collect().map(r => (r.getAs[String]("stratum"),
        r.getAs[Long]("rank"), r.getAs[Long]("id")))
    // reference: per-stratum rank over (md5-prefix, padded-hex-id)
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(i: Long) = md.digest(i.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(14) + "-" + f"$i%016X"
    def ref(ids: Seq[Long]) = ids.distinct.sortBy(key).take(8)
      .zipWithIndex.map { case (i, p) => (p + 1L, i) }
    val want = (ref(0L until 500L).map { case (r, i) => ("big", r, i) } ++
      ref(1000L until 1040L).map { case (r, i) => ("mid", r, i) } ++
      ref(2000L until 2003L).map { case (r, i) => ("tiny", r, i) }).toSet
    assert(out.toSet == want)
    // tiny stratum (3 < k) keeps all 3, exactly once despite nothing
    assert(out.count(_._1 == "tiny") == 3)
    // shape: no per-stratum window sort; bounded object aggregate
    val p = Sampling.hashReservoir(df, col("src"), col("id"), 8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(p.contains("ObjectHashAggregate") && p.contains("partial_"), p)
  }

  test("hashReservoir id contract: non-castable and negative ids raise " +
      "instead of silently dropping/corrupting; castable numeric " +
      "strings sample identically to their long form") {
    import spark.implicits._
    // a string-keyed corpus previously lost EVERY row through the
    // null-after-cast filter — now it fails loudly
    val strKeyed = Seq(("s", "doc-a"), ("s", "doc-b")).toDF("src", "id")
    val ex = intercept[Exception] {
      Sampling.hashReservoir(strKeyed, col("src"), col("id"), 4).collect()
    }
    assert(ex.getMessage.contains("non-negative integer"),
      s"unexpected: ${ex.getMessage}")
    // a negative id hex-packs to 16 chars but conv(..,16,10) of it
    // exceeds Long.MaxValue — NULL under Spark's non-ANSI cast where
    // the DuckDB mirror errors; the contract check fires first
    val neg = Seq(("s", 5L), ("s", -3L)).toDF("src", "id")
    val ex2 = intercept[Exception] {
      Sampling.hashReservoir(neg, col("src"), col("id"), 4).collect()
    }
    assert(ex2.getMessage.contains("non-negative integer"),
      s"unexpected: ${ex2.getMessage}")
    // numeric strings cast cleanly and draw exactly like longs
    val asStr = Seq.tabulate(40)(i => ("s", i.toString)).toDF("src", "id")
    val asLong = Seq.tabulate(40)(i => ("s", i.toLong)).toDF("src", "id")
    val a = Sampling.hashReservoir(asStr, col("src"), col("id"), 6)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val b = Sampling.hashReservoir(asLong, col("src"), col("id"), 6)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(a == b && a.size == 6)
  }

  test("q157 composed ingest selection: draws exactly k, admits no " +
      "banned doc, and never selects a decomposed twin whose composed " +
      "sibling survived the strip identically") {
    val sel = SparkEntry.queries("q157_ingest_select")(spark,
        "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_copies")))
    // the PPS draw is exactly k = 30 copies over the survivors
    assert(sel.map(_._2).sum == 30L, s"sum ${sel.map(_._2).sum}")
    // decomposed twins (+400000) are NFC-dups of their composed
    // sibling (+300000) UNLESS the HTML injection wrapped exactly one
    // of the pair (making post-strip texts differ): wrapped iff
    // id % 7 == 0 (self) or (id - 100000) % 7 == 0 (sibling). Any
    // other decomposed id surviving into the draw means the NFC
    // dedup stage leaked
    val leaked = sel.map(_._1)
      .filter(i => i >= 400000L && i < 500000L)
      .filterNot(i => i % 7 == 0 || (i - 100000) % 7 == 0)
    assert(leaked.isEmpty, s"NFC-dup twins leaked into the draw: " +
      leaked.mkString(","))
    // and the blocklist gate held: recompute the screen over the
    // selected ids' stripped text — zero hits
    import org.apache.spark.sql.functions._
    val ids = sel.map(_._1).toSet
    val base = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val twins = base.filter(col("doc_id") % 13 === 0)
    val d = base
      .union(twins.select((col("doc_id") + 300000L).as("doc_id"),
        concat(lit("caf\u00e9 preface: "), col("text")).as("text")))
      .union(twins.select((col("doc_id") + 400000L).as("doc_id"),
        concat(lit("cafe\u0301 preface: "), col("text")).as("text")))
      .filter(col("doc_id").isin(ids.toSeq: _*))
    val hits = graft.operators.TextAnalysis.bannedTermScreen(
        d.select(col("doc_id"),
          graft.operators.TextAnalysis.stripHtml(col("text")).as("t")),
        col("doc_id"), col("t"),
        Seq("slow scan", "big query", "merge batch"))
      .filter(col("flagged")).count()
    assert(hits == 0L, "a banned doc reached the training draw")
  }
}
