package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.sources.Tables

class SimilaritySpec extends AnyFunSuite {

  test("native quantize is bit-identical to the HOF form on real vectors") {
    val spark = SparkTestSession.spark
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val both = emb.select(
      org.apache.spark.sql.functions.col("vec_id"),
      Similarity.quantize(org.apache.spark.sql.functions.col("embedding"))
        .as("native"),
      Similarity.quantizeHof(org.apache.spark.sql.functions.col("embedding"))
        .as("hof"))
    assert(both.filter(org.apache.spark.sql.functions
      .expr("native <> hof")).count() == 0)
  }
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val queryIds = Seq(0L, 1L, 2L, 3L, 4L)

  private def topSets(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap

  test("brute-force top-k: k rows per query, self excluded, cosine in [-1,1]") {
    val rows = Similarity.bruteForceTopK(Tables.embeddings(spark, sf),
      col("vec_id"), col("embedding"), queryIds, k = 5).collect()
    assert(rows.length == queryIds.size * 5)
    assert(rows.forall(r => r.getAs[Long]("vec_id") != r.getAs[Long]("query_id")))
    assert(rows.forall(r => math.abs(r.getAs[Double]("cosine")) <= 1.0001))
  }

  test("brute-force picks the true maximum-cosine neighbor first") {
    val emb = Tables.embeddings(spark, sf)
    val top1 = Similarity.bruteForceTopK(emb, col("vec_id"), col("embedding"),
      Seq(0L), k = 1).head()
    // independently recompute: max cosine over all candidates for query 0
    val base = emb.select(col("vec_id"),
      Similarity.quantize(col("embedding")).as("qv"))
    val q = base.filter(col("vec_id") === 0L).head().getAs[scala.collection.Seq[Long]]("qv")
    val best = base.filter(col("vec_id") =!= 0L).collect().map { r =>
      val v = r.getAs[scala.collection.Seq[Long]]("qv")
      val dot = q.zip(v).map { case (a, b) => a * b }.sum
      val cos = dot / math.sqrt(
        (q.map(x => x * x).sum * v.map(x => x * x).sum).toDouble)
      (r.getAs[Long]("vec_id"), cos)
    }.maxBy(_._2)
    assert(top1.getAs[Long]("vec_id") == best._1)
    assert(top1.getAs[Double]("cosine") == best._2)
  }

  test("LSH top-k is exactly brute-force ranking restricted to the query's bucket") {
    val emb = Tables.embeddings(spark, sf)
    val base = emb.select(col("vec_id"),
      Similarity.bucketCol(Similarity.quantize(col("embedding")), 4, 64).as("b"))
    val buckets = base.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("b")).toMap
    val approx = Similarity.lshTopK(emb, col("vec_id"), col("embedding"),
      queryIds, k = 5).collect()
    // every returned candidate shares its query's bucket
    assert(approx.forall(r =>
      buckets(r.getAs[Long]("vec_id")) == buckets(r.getAs[Long]("query_id"))))
    // and ranks are consecutive from 1 within each query
    val byQ = approx.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.values.forall(rs =>
      rs.map(_.getAs[Long]("rank")).sorted.sameElements(1L to rs.length)))
    // recall vs brute force is nonzero (random data: expected ~0.6^4 per pair)
    val exact = topSets(Similarity.bruteForceTopK(emb, col("vec_id"),
      col("embedding"), queryIds, k = 5))
    val approxSets = topSets(Similarity.lshTopK(emb, col("vec_id"),
      col("embedding"), queryIds, k = 5))
    val hits = queryIds.map(q =>
      (exact(q) & approxSets.getOrElse(q, Set.empty)).size).sum
    assert(hits > 0)
  }

  test("bounded top-k aggregator (default path) matches the row_number window twin exactly") {
    val emb = Tables.embeddings(spark, sf)
    val win = Similarity.bruteForceTopKWindow(emb, col("vec_id"),
      col("embedding"), queryIds, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val agg = Similarity.bruteForceTopK(emb, col("vec_id"), col("embedding"),
      queryIds, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(agg == win)
  }

  test("aggregator and window twin agree on a zero-norm (degenerate) vector") {
    import spark.implicits._
    // vec 3 is all-zero. Under ANSI (the Spark 4 default) its cosine
    // raises DIVIDE_BY_ZERO, so no NaN ever reaches either rank path;
    // with ANSI off Spark's Divide yields NULL (not IEEE NaN). Either
    // way the two rank forms must agree row-for-row — this pins the
    // non-ANSI NULL case (NaN itself is unreachable through cosine(),
    // but the aggregator's Double.compare order matches Spark's
    // NaN-greatest sort if one ever appears).
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val rows = Seq(
        (0L, Array(1.0f, 0.0f, 0.0f)),
        (1L, Array(0.9f, 0.1f, 0.0f)),
        (2L, Array(0.0f, 1.0f, 0.0f)),
        (3L, Array(0.0f, 0.0f, 0.0f)),
        (4L, Array(-1.0f, 0.0f, 0.0f)))
      val emb = rows.toDF("vec_id", "embedding")
      def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .toSet
      val agg = canon(Similarity.bruteForceTopK(emb, col("vec_id"),
        col("embedding"), Seq(0L), k = 4))
      val win = canon(Similarity.bruteForceTopKWindow(emb, col("vec_id"),
        col("embedding"), Seq(0L), k = 4))
      assert(agg == win, s"agg=$agg win=$win")
      // the degenerate vector ranks in NEITHER form (no defined cosine)
      assert(!agg.exists(_._3 == 3L) && agg.size == 3)
    } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
  }

  test("top-k aggregator rejects non-positive k") {
    intercept[IllegalArgumentException] {
      new graft.functions.TopKAggregator(0)
    }
  }

  test("refined IVF: valid ranks, determinism, recall comparable to seed IVF") {
    val emb = Tables.embeddings(spark, sf)
    val refined = Similarity.ivfTopKRefined(emb, col("vec_id"),
      col("embedding"), queryIds, k = 5, nCells = 16, iters = 2)
    val rows = refined.collect()
    assert(rows.forall(r => r.getAs[Long]("vec_id") != r.getAs[Long]("query_id")))
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.values.forall(rs =>
      rs.map(_.getAs[Long]("rank")).sorted.sameElements(1L to rs.length)))
    // deterministic: a second full evaluation returns identical rows
    val again = Similarity.ivfTopKRefined(emb, col("vec_id"),
      col("embedding"), queryIds, k = 5, nCells = 16, iters = 2).collect()
    assert(rows.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
    // recall vs brute force is nonzero (cell-restricted search)
    val exact = topSets(Similarity.bruteForceTopK(emb, col("vec_id"),
      col("embedding"), queryIds, k = 5))
    val approx = rows.groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val hits = queryIds.map(q =>
      (exact(q) & approx.getOrElse(q, Set.empty)).size).sum
    assert(hits > 0)
  }

  test("top-k aggregator: bounded buffer, tie-break on vec_id, merge-order invariance") {
    import graft.functions.{TopEntry, TopBuf, TopKAggregator}
    val agg = new TopKAggregator(3)
    val entries = Seq(
      TopEntry(5L, 0.9), TopEntry(2L, 0.9), // cosine tie -> lower id first
      TopEntry(7L, 0.95), TopEntry(9L, 0.1), TopEntry(1L, 0.5))
    val single = entries.foldLeft(agg.zero)(agg.reduce)
    assert(single.items == Seq(
      TopEntry(7L, 0.95), TopEntry(2L, 0.9), TopEntry(5L, 0.9)))
    // merging partials in any order gives the same top-3
    val parts = entries.map(e => agg.reduce(agg.zero, e))
    val l2r = parts.reduceLeft(agg.merge)
    val r2l = parts.reduceRight(agg.merge)
    assert(l2r == single && r2l == single)
    // buffer never exceeds k
    assert(entries.scanLeft(agg.zero)(agg.reduce).forall(_.items.length <= 3))
  }

  test("top-k aggregator plan uses partial aggregation (map-side combine)") {
    val df = Similarity.bruteForceTopKAgg(Tables.embeddings(spark, sf),
      col("vec_id"), col("embedding"), queryIds, k = 5)
    val p = df.queryExecution.executedPlan.toString
    // typed Aggregator over groupByKey plans as ObjectHashAggregate
    // with a partial pass before the exchange
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"expected object aggregate:\n$p")
    assert(p.contains("partial"), s"expected partial aggregation:\n$p")
  }

  test("cosine near-dup: exact clones found at cosine 1.0, strangers excluded") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    // clone vectors 0..9 under shifted ids: every clone pair must be
    // found (same bucket by construction, cosine exactly 1.0)
    val clones = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 5000L).as("vec_id"), col("embedding"))
    val pairs = Similarity.cosineNearDupPairs(
      emb.select(col("vec_id"), col("embedding")).union(clones),
      col("vec_id"), col("embedding"), minCosine = 0.999).collect()
    val found = pairs.map(r =>
      (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert((0L until 10L).forall(i => found.contains((i, i + 5000L))))
    assert(pairs.forall(_.getAs[Double]("cosine") >= 0.999))
    // no natural pair in this corpus clears 0.999 (max cosine ~0.48)
    assert(found.size == 10)
  }

  test("cosine near-dup pairs all share a bucket and clear the threshold") {
    val emb = Tables.embeddings(spark, sf)
    val base = emb.select(col("vec_id"),
      Similarity.bucketCol(Similarity.quantize(col("embedding")), 4, 64).as("b"))
    val buckets = base.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("b")).toMap
    val pairs = Similarity.cosineNearDupPairs(emb, col("vec_id"),
      col("embedding"), minCosine = 0.3).collect()
    assert(pairs.nonEmpty) // low threshold: same-bucket moderate pairs exist
    assert(pairs.forall(r =>
      buckets(r.getAs[Long]("vec_a")) == buckets(r.getAs[Long]("vec_b"))))
    assert(pairs.forall(r => r.getAs[Double]("cosine") >= 0.3))
    assert(pairs.forall(r => r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b")))
  }

  test("multi-plane-set near-dup: recall is a superset of the single set, pairs verified once") {
    val emb = Tables.embeddings(spark, sf)
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val single = pairSet(Similarity.cosineNearDupPairs(emb, col("vec_id"),
      col("embedding"), minCosine = 0.3))
    val multi = pairSet(Similarity.cosineNearDupPairsMulti(emb,
      col("vec_id"), col("embedding"), minCosine = 0.3, planeSets = 3))
    // set 0 of the multi scheme IS the single scheme's plane set, so
    // the OR can only add pairs — and with 3 independent sets on
    // random vectors it should find strictly more
    assert(single.subsetOf(multi))
    assert(multi.size > single.size)
    // every pair appears exactly once despite agreeing in several sets
    val rows = Similarity.cosineNearDupPairsMulti(emb, col("vec_id"),
      col("embedding"), minCosine = 0.3, planeSets = 3).collect()
    assert(rows.length == rows.map(r =>
      (r.getLong(0), r.getLong(1))).distinct.length)
    // plan stays an equi-join on (set, bucket): no cartesian product
    val p = Similarity.cosineNearDupPairsMulti(emb, col("vec_id"),
      col("embedding"), minCosine = 0.3, planeSets = 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("bucketCol assigns every vector to a bucket in range") {
    val emb = Tables.embeddings(spark, sf)
    val buckets = emb.select(
      Similarity.bucketCol(Similarity.quantize(col("embedding")), 4, 64)
        .as("b")).agg(min("b"), max("b"), countDistinct("b")).head()
    assert(buckets.getLong(0) >= 0 && buckets.getLong(1) <= 15)
    assert(buckets.getLong(2) > 1) // vectors actually spread across buckets
  }

  test("embedding decontamination: exact clones flagged, bench broadcast, corpus never shuffles vectors") {
    val emb = Tables.embeddings(spark, sf)
    val bench = emb.filter(col("vec_id") % 50 === 0)
    // corpus = the rest + exact copies of the bench vectors (cosine 1.0)
    val clones = bench.select((col("vec_id") + 5000000L).as("vec_id"),
      col("embedding"))
    val corpus = emb.filter(col("vec_id") % 50 =!= 0)
      .select(col("vec_id"), col("embedding")).union(clones)
    val out = Similarity.embeddingDecontaminate(corpus, col("vec_id"),
      col("embedding"), bench, col("vec_id"), col("embedding"),
      minCosine = 0.999)
    val rows = out.collect().map(r => r.getAs[Long]("vec_id") ->
      (r.getAs[Long]("n_bench_hits"), r.getAs[Double]("max_cosine"))).toMap
    val benchIds = bench.select("vec_id").collect().map(_.getLong(0))
    // every injected clone is caught with cosine exactly 1.0
    benchIds.foreach { id =>
      val (hits, maxCos) = rows.getOrElse(id + 5000000L,
        fail(s"clone of bench vector $id not flagged"))
      assert(hits >= 1L && maxCos == 1.0)
    }
    // recall is exact by construction (brute force vs bench): nothing
    // below the threshold sneaks in
    assert(rows.values.forall(_._2 >= 0.999))
    // plan shape: the bench side is broadcast (no shuffle of corpus
    // vectors to candidate reducers), and the only exchange is the
    // (vec_id, count, max) partial-agg collapse
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("semantic dedup: within-cell near-dups drop to the minimum id, cross-cell pairs untouched") {
    import spark.implicits._
    val none = org.apache.spark.storage.StorageLevel.NONE
    // 2 seed centroids (ids 0, 1) on orthogonal axes; 10/11 are a
    // near-identical pair in cell 0; 12 lives in cell 1
    val vecs = Seq(
      0L -> Array(1f, 0f, 0f, 0f),
      1L -> Array(0f, 1f, 0f, 0f),
      10L -> Array(0.99f, 0.12f, 0f, 0f),
      11L -> Array(0.98f, 0.13f, 0f, 0f),
      12L -> Array(0.12f, 0.99f, 0f, 0f)
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(vecs, col("vec_id"), col("embedding"),
        minCosine = 0.999, nCells = 2, storage = none)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    // cells: centroid ids label their own cells
    assert(out(0L)._1 == 0L && out(10L)._1 == 0L && out(11L)._1 == 0L)
    assert(out(1L)._1 == 1L && out(12L)._1 == 1L)
    // 11 is the only vector with a smaller-id near-twin above 0.999
    // (10 vs the centroid is ~0.993: below threshold, kept)
    assert(!out(11L)._3 && out(11L)._2 >= 1L)
    assert(Seq(0L, 1L, 10L, 12L).forall(id => out(id)._3 && out(id)._2 == 0L))
    // hot-cell cap is conservative: cell 0 holds 3 vectors, so at
    // maxCellSize = 2 it is excluded from comparison and 11 is KEPT
    val capped = Similarity.semanticDedup(vecs, col("vec_id"),
        col("embedding"), minCosine = 0.999, nCells = 2, maxCellSize = 2,
        storage = none)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(capped.values.forall(identity),
      "capping a hot cell must keep, never drop")
  }

  test("semantic dedup on the corpus: injected clones drop, survivors keep min id, cell-keyed plan") {
    val emb = Tables.embeddings(spark, sf)
    // q93's construction: dim-0 sign-flipped clone of every 25th vector
    val clones = emb.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, -x).otherwise(x)).as("embedding"))
    val corpus = emb.select(col("vec_id"), col("embedding")).union(clones)
    val out = Similarity.semanticDedup(corpus, col("vec_id"),
      col("embedding"), minCosine = 0.85, nCells = 16)
    val rows = out.collect()
    val dropped = rows.filter(!_.getAs[Boolean]("keep"))
      .map(_.getAs[Long]("vec_id")).toSet
    val nClones = clones.count()
    // every clone lands in its original's cell and is dropped (the
    // original has the smaller id); no original is dropped for a clone
    assert(dropped.size == nClones.toInt)
    assert(dropped.forall(_ >= 1000000L))
    // dropped rows carry their evidence; kept rows carry none
    rows.foreach { r =>
      if (r.getAs[Boolean]("keep")) assert(r.getAs[Long]("n_dup_smaller") == 0L)
      else assert(r.getAs[Long]("n_dup_smaller") >= 1L &&
        r.getAs[Double]("max_cosine") >= 0.85)
    }
    // the pair comparison is an equi-join on the cell key — never a
    // cartesian across cells (the only nested-loop is the broadcast
    // centroid assignment, same as the IVF plans)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("recallAtK: exact hit counting, zero for an absent query") {
    import spark.implicits._
    val exact = Seq(
      (1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L),
      (2L, 1L, 20L), (2L, 2L, 21L), (2L, 3L, 22L))
      .toDF("query_id", "rank", "vec_id")
    // query 1: 2 of 3 right (order irrelevant); query 2: none returned
    val approx = Seq((1L, 1L, 12L), (1L, 2L, 99L), (1L, 3L, 10L))
      .toDF("query_id", "rank", "vec_id")
    val out = Similarity.recallAtK(exact, approx)
      .collect().map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("k"), r.getAs[Long]("n_hits"),
         r.getAs[Double]("recall"))).toMap
    assert(out(1L) == ((3L, 2L, 2.0 / 3.0)))
    assert(out(2L) == ((3L, 0L, 0.0)))
    // end to end: PQ recall vs brute force on the real table is the
    // intersection the driver can recompute
    val emb = Tables.embeddings(spark, sf)
    val e = Similarity.bruteForceTopK(emb, col("vec_id"),
      col("embedding"), queryIds, 5)
    val a = Similarity.pqAdcTopK(emb, col("vec_id"), col("embedding"),
      queryIds, 5)
    val got = Similarity.recallAtK(e, a).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("n_hits")).toMap
    val eSets = topSets(e)
    val aSets = topSets(a)
    queryIds.foreach { q =>
      assert(got(q) == (eSets(q) & aSets.getOrElse(q, Set.empty)).size.toLong)
    }
  }

  test("groupDispersion: identical group pins at 10000 permyriad, spread group lower") {
    import spark.implicits._
    val tightVec = Array(0.6f, 0.8f, 0.0f, 0.0f)
    val spread = Seq(
      Array(1.0f, 0.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f, 0.0f),
      Array(0.0f, 0.0f, 1.0f, 0.0f), Array(0.0f, 0.0f, 0.0f, 1.0f))
    val rows = (1L to 5L).map(i => (i, "tight", tightVec)) ++
      spread.zipWithIndex.map { case (v, i) => (10L + i, "spread", v) }
    val out = Similarity.groupDispersion(rows.toDF("vec_id", "grp0", "v"),
        col("vec_id"), col("v"), col("grp0"))
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(out("tight").getAs[Long]("n_vecs") == 5L)
    // all members equal their centroid: cosine exactly 1
    assert(out("tight").getAs[Long]("mean_cos_pmy") == 10000L)
    // orthogonal members vs the all-equal centroid: cos = 1/2 each
    assert(out("spread").getAs[Long]("n_vecs") == 4L)
    assert(out("spread").getAs[Long]("mean_cos_pmy") == 5000L)
    assert(out("spread").getAs[Long]("mean_cos_pmy") <
      out("tight").getAs[Long]("mean_cos_pmy"))
  }

  test("pqCodes: codebook vectors code to themselves; codes complete and in range") {
    val emb = Tables.embeddings(spark, sf)
    val rows = Similarity.pqCodes(emb, col("vec_id"), col("embedding"))
      .collect()
    val n = emb.count()
    // every vector gets exactly 8 sub-space codes
    assert(rows.length == n * 8)
    assert(rows.forall(r => r.getAs[Long]("code") >= 0L &&
      r.getAs[Long]("code") < 16L))
    // a codebook member's sub-vector is its own nearest entry (L2 = 0)
    rows.filter(_.getAs[Long]("vec_id") < 16L).foreach { r =>
      assert(r.getAs[Long]("code") == r.getAs[Long]("vec_id"),
        s"vec ${r.getAs[Long]("vec_id")} m ${r.getAs[Long]("m")}")
    }
    // no window rank, no join, no re-aggregation: the argmin runs as
    // a literal-codebook projection in the scan (the only Exchange
    // left is fanOut's scan repartition)
    val plan = Similarity.pqCodes(emb, col("vec_id"), col("embedding"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("HashAggregate"), plan)
    assert(plan.contains("array_min(array(struct"), plan)
  }

  test("pqAdcTopK: valid ranks, self excluded, adc exact vs driver recomputation") {
    val emb = Tables.embeddings(spark, sf)
    val out = Similarity.pqAdcTopK(emb, col("vec_id"), col("embedding"),
      queryIds, k = 5).collect()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == queryIds.toSet)
    assert(byQ.values.forall(rs =>
      rs.map(_.getAs[Long]("rank")).sorted.sameElements(1L to rs.length)))
    assert(out.forall(r => r.getAs[Long]("vec_id") != r.getAs[Long]("query_id")))
    // independently recompute adc in the driver from raw vectors
    val q = emb.select(col("vec_id"),
        Similarity.quantize(col("embedding")).as("qv")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[collection.Seq[Long]]("qv").toSeq).toMap
    def sub(v: Seq[Long], m: Int) = v.slice(m * 8, m * 8 + 8)
    def l2(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def code(v: Seq[Long], m: Int): Long =
      (0L until 16L).minBy(c => (l2(sub(v, m), sub(q(c), m)), c))
    out.foreach { r =>
      val (qid, vid) = (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))
      val want = (0 until 8).map { m =>
        val c = code(q(vid), m)
        l2(sub(q(qid), m), sub(q(c), m))
      }.sum
      assert(r.getAs[Long]("adc") == want, s"q$qid v$vid")
    }
    // PQ is an approximation of the true neighbor order: recall vs
    // brute force must be nonzero
    val exact = topSets(Similarity.bruteForceTopK(emb, col("vec_id"),
      col("embedding"), queryIds, k = 5))
    val approx = byQ.view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet)
    val hits = queryIds.map(qi => (exact(qi) & approx(qi)).size).sum
    assert(hits > 0)
  }

  test("randomProject: signs agree with the LSH bucket, cosine survives the projection") {
    val emb = Tables.embeddings(spark, sf)
    val proj = Similarity.randomProject(emb, col("vec_id"), col("embedding"))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[collection.Seq[Long]]("proj").toSeq).toMap
    assert(proj.values.forall(_.length == 16))
    // bit p of the 16-plane LSH bucket IS sign(proj_p): the projection
    // refines the bucketing, it cannot disagree with it
    val buckets = emb.select(col("vec_id"), Similarity.bucketCol(
        Similarity.quantize(col("embedding")), planes = 16, dims = 64)
        .as("b")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("b")).toMap
    proj.foreach { case (id, ps) =>
      ps.zipWithIndex.foreach { case (v, p) =>
        assert(((buckets(id) >> p) & 1L) == (if (v > 0) 1L else 0L),
          s"vec $id plane $p: proj=$v bucket=${buckets(id)}")
      }
    }
    // JL property, calibrated to what 16 output dims actually give
    // (estimator std ~ 1/sqrt(16) = 0.25 for near-orthogonal pairs,
    // concentrating as cosine -> 1):
    val q = emb.select(col("vec_id"),
        Similarity.quantize(col("embedding")).as("qv")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[collection.Seq[Long]]("qv").toSeq).toMap
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      d / math.sqrt(a.map(x => x * x).sum.toDouble *
        b.map(x => x * x).sum.toDouble)
    }
    // (a) random pairs: mean |projected - true| stays inside ~1.5 std
    val ids = proj.keys.toSeq.sorted.take(201)
    val errs = ids.sliding(2).map { case Seq(i, j) =>
      math.abs(cos(q(i), q(j)) - cos(proj(i), proj(j)))
    }.toSeq
    assert(errs.sum / errs.size < 0.3,
      s"mean JL distortion too high: ${errs.sum / errs.size}")
    // (b) the property ANN actually relies on: near-duplicate pairs
    // KEEP high projected cosine. Clone every 10th vector with one
    // perturbed component (true cosine ~0.99) — the projected cosine
    // must still clearly separate clones from random pairs.
    val clones = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(0.2f)).otherwise(x))
          .as("embedding"))
    val pboth = Similarity.randomProject(emb.select(col("vec_id"),
        col("embedding")).union(clones), col("vec_id"), col("embedding"))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[collection.Seq[Long]]("proj").toSeq).toMap
    val cloneCos = pboth.keys.filter(_ >= 1000000L).toSeq.map { cid =>
      cos(pboth(cid - 1000000L), pboth(cid))
    }
    assert(cloneCos.forall(_ > 0.6), s"clone pair lost similarity: $cloneCos")
    assert(cloneCos.sum / cloneCos.size > 0.9,
      s"mean clone projected cosine: ${cloneCos.sum / cloneCos.size}")
    // map-only: no keyed shuffle (the only exchange is fanOut's
    // round-robin scan parallelization on the single sf0.001 file)
    val plan = Similarity.randomProject(emb, col("vec_id"), col("embedding"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"), plan)
  }

  test("kCenterSelect: hand-computed greedy farthest-point order, " +
      "exact integer radii, id tie-break, early stop past the corpus") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val none = org.apache.spark.storage.StorageLevel.NONE
    // one line of points: 0 at the origin, 3 far right, 1 between,
    // 2 nearest the origin — greedy order must be 0, 3, 1, 2 with
    // radii 0, (1e5)^2, (1e4)^2, (5e3)^2 on the x10000 grid
    val vecs = Seq(
      0L -> Array(0f, 0f),
      1L -> Array(1f, 0f),
      2L -> Array(0.5f, 0f),
      3L -> Array(10f, 0f)
    ).toDF("vec_id", "embedding")
    val out = Similarity.kCenterSelect(vecs, col("vec_id"),
        col("embedding"), m = 4, storage = none)
      .collect().map(r => (r.getAs[Long]("sel_round"),
        r.getAs[Long]("vec_id"), r.getAs[Long]("min_dist2")))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L),
      (2L, 3L, 100000L * 100000L),
      (3L, 1L, 10000L * 10000L),
      (4L, 2L, 5000L * 5000L)))
    // duplicate farthest points: the LOWER id is chosen at the tie
    val dup = Seq(
      5L -> Array(0f, 0f),
      7L -> Array(2f, 0f),
      6L -> Array(2f, 0f)
    ).toDF("vec_id", "embedding")
    val o2 = Similarity.kCenterSelect(dup, col("vec_id"),
        col("embedding"), m = 2, storage = none)
      .collect().map(r => r.getAs[Long]("vec_id"))
    assert(o2.toSeq == Seq(5L, 6L))
    // m beyond the corpus: stops at the corpus size, no null rows
    val o3 = Similarity.kCenterSelect(dup, col("vec_id"),
        col("embedding"), m = 10, storage = none)
      .collect()
    assert(o3.length == 3 &&
      o3.map(_.getAs[Long]("vec_id")).toSet == Set(5L, 6L, 7L))
  }

  test("IVF centroid artifact: train -> ship -> serve round-trips " +
      "bit-identically to ivfTopKRefined; duplicate cells and " +
      "doctored norms are refused at load; no cached frame outlives " +
      "training") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val cents = Similarity.ivfCentroids(emb, col("vec_id"),
      col("embedding"), nCells = 16, iters = 2)
    // training materializes eagerly and releases its scan
    assert((spark.sparkContext.getPersistentRDDs.keySet --
      persistedBefore).isEmpty, "ivfCentroids stranded a cached frame")
    def canonOut(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val refined = canonOut(Similarity.ivfTopKRefined(emb, col("vec_id"),
      col("embedding"), queryIds, k = 5, nCells = 16, iters = 2,
      storage = org.apache.spark.storage.StorageLevel.NONE))
    // live serve == the fused train+search form
    val liveServe = canonOut(Similarity.ivfTopKWith(emb, col("vec_id"),
      col("embedding"), queryIds, k = 5, cents = cents,
      storage = org.apache.spark.storage.StorageLevel.NONE))
    assert(liveServe == refined && refined.nonEmpty)
    // shipped serve: parquet round-trip, exact content pinned
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-ivf-model").toString
    Similarity.saveIvfCentroids(cents, s"$tmp/c")
    val loaded = Similarity.loadIvfCentroids(spark, s"$tmp/c")
    assert(loaded.orderBy(col("cent_id")).collect().map(_.toSeq).toSeq ==
      cents.orderBy(col("cent_id")).collect().map(_.toSeq).toSeq)
    val shippedServe = canonOut(Similarity.ivfTopKWith(emb,
      col("vec_id"), col("embedding"), queryIds, k = 5, cents = loaded,
      storage = org.apache.spark.storage.StorageLevel.NONE))
    assert(shippedServe == refined)
    // loud failures at the artifact boundary
    Seq((1L, "x")).toDF("a", "b").write.parquet(s"$tmp/wrong")
    assert(intercept[IllegalArgumentException] {
      Similarity.loadIvfCentroids(spark, s"$tmp/wrong")
    }.getMessage.contains("not an ivfCentroids artifact"))
    cents.union(cents).write.parquet(s"$tmp/dup")
    assert(intercept[IllegalArgumentException] {
      Similarity.loadIvfCentroids(spark, s"$tmp/dup")
    }.getMessage.contains("duplicate cent_id"))
    cents.withColumn("c_nrm", col("c_nrm") + 1L)
      .write.parquet(s"$tmp/doctored")
    assert(intercept[IllegalArgumentException] {
      Similarity.loadIvfCentroids(spark, s"$tmp/doctored")
    }.getMessage.contains("self-dot-product"))
  }

  test("PQ codebook artifact: train -> ship -> serve round-trips " +
      "bit-identically to pqAdcTopK; gapped sub-spaces and doctored " +
      "norms are refused at load") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    def canonOut(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val fused = canonOut(Similarity.pqAdcTopK(emb, col("vec_id"),
      col("embedding"), queryIds, k = 5,
      storage = org.apache.spark.storage.StorageLevel.NONE))
    val cb = Similarity.pqCodebook(emb, col("vec_id"), col("embedding"))
    assert(cb.count() == 8L * 16L) // m x codes, eager local frame
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-pq-model").toString
    Similarity.savePqCodebook(cb, s"$tmp/cb")
    val loaded = Similarity.loadPqCodebook(spark, s"$tmp/cb")
    assert(loaded.orderBy(col("m"), col("code")).collect().map(_.toSeq)
      .toSeq == cb.select(col("m"), col("code"), col("cv"),
        col("c_nrm2")).orderBy(col("m"), col("code")).collect()
      .map(_.toSeq).toSeq)
    val served = canonOut(Similarity.pqAdcTopKWith(emb, col("vec_id"),
      col("embedding"), queryIds, k = 5, codebook = loaded,
      storage = org.apache.spark.storage.StorageLevel.NONE))
    assert(served == fused && fused.nonEmpty)
    // refusals: a missing sub-space, a doctored norm
    cb.filter(col("m") =!= 3L).write.parquet(s"$tmp/gap")
    assert(intercept[IllegalArgumentException] {
      Similarity.loadPqCodebook(spark, s"$tmp/gap")
    }.getMessage.contains("contiguous"))
    cb.withColumn("c_nrm2", col("c_nrm2") + 1L)
      .write.parquet(s"$tmp/badnrm")
    assert(intercept[IllegalArgumentException] {
      Similarity.loadPqCodebook(spark, s"$tmp/badnrm")
    }.getMessage.contains("self-dot-product"))
    // a LIVE empty codebook refuses like the loaded one (no NPE)
    assert(intercept[IllegalArgumentException] {
      Similarity.pqAdcTopKWith(emb, col("vec_id"), col("embedding"),
        queryIds, k = 5, codebook = cb.filter(col("m") < 0L))
    }.getMessage.contains("empty"))
  }
}
