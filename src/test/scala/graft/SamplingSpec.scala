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

  test("rates outside [0,1] are rejected") {
    val docs = Tables.documents(spark, sf)
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(docs, col("doc_id"), col("source"),
        Map("src0" -> 1.5), defaultRate = 0.5)
    }
  }
}
