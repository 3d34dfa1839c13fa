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
}
