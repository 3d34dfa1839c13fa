package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed feature-vector aggregation (ref CustomsFeatures +
  * CustomsFeaturesCombiner, s/customs/CustomsFeatures.java:61-140,
  * CustomsFeaturesCombiner.java:30-77): per key, accumulate counters
  * per event-summary type and derive a variance index over the
  * per-type counts at extract time.
  *
  * Implemented as a Spark `Aggregator[IN, BUF, OUT]` — Catalyst runs
  * it with partial aggregation (map-side combine before the shuffle),
  * the same contract as the reference's CombineFn
  * (createAccumulator/addInput/mergeAccumulators/extractOutput).
  *
  * Determinism note: the variance is computed in `finish` over the
  * class list in sorted-name order with a fixed left-fold, so the
  * double result is a fixed expression tree — reproducible in any
  * engine (the oracle SQL spells out the same tree).
  */
object Features {

  /** Known event classes, sorted; missing classes count 0. */
  val Classes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  case class TypeCounts(counts: Map[String, Long], total: Long)

  case class FeatureRow(
      key: String,
      n_click: Long, n_error: Long, n_purchase: Long,
      n_signup: Long, n_view: Long,
      total: Long, variance: Double)

  /** IN = (key, class); BUF/OUT carry the count map. */
  class TypeCountAggregator extends Aggregator[(String, String), TypeCounts, TypeCounts] {
    def zero: TypeCounts = TypeCounts(Map.empty, 0L)
    def reduce(b: TypeCounts, in: (String, String)): TypeCounts =
      TypeCounts(b.counts.updated(in._2, b.counts.getOrElse(in._2, 0L) + 1), b.total + 1)
    def merge(a: TypeCounts, b: TypeCounts): TypeCounts =
      TypeCounts(
        (a.counts.keySet ++ b.counts.keySet).map(k =>
          k -> (a.counts.getOrElse(k, 0L) + b.counts.getOrElse(k, 0L))).toMap,
        a.total + b.total)
    def finish(r: TypeCounts): TypeCounts = r
    def bufferEncoder: Encoder[TypeCounts] = Encoders.product[TypeCounts]
    def outputEncoder: Encoder[TypeCounts] = Encoders.product[TypeCounts]
  }

  /** Variance of the per-class counts (fixed-order left fold). */
  def varianceIndex(counts: Map[String, Long]): Double = {
    val cs = Classes.map(c => counts.getOrElse(c, 0L))
    val m = cs.sum / Classes.length.toDouble
    cs.foldLeft(0.0)((acc, c) => acc + (c - m) * (c - m)) / Classes.length
  }

  /** Per-key feature extraction as pure built-ins: one codegen'd
    * hash aggregate of conditional counts (flat longs shuffle — no
    * serialized map buffers), variance as the same fixed expression
    * tree the scalar fold produces (bit-identical doubles). Use this
    * in production plans; `typeFeatures` below keeps the typed
    * Aggregator as the §2.8 CombineFn demonstration and as the
    * pattern for feature sets with genuinely dynamic class keys. */
  def typeFeaturesNative(df: DataFrame, key: org.apache.spark.sql.Column,
      cls: org.apache.spark.sql.Column): DataFrame = {
    val counts = Classes.map(c => count(when(cls === c, 1)).as(s"n_$c"))
    val m = col("total") / lit(Classes.length.toDouble)
    val varExpr = Classes.map(c => (col(s"n_$c") - m) * (col(s"n_$c") - m))
      .reduce(_ + _) / lit(Classes.length.toDouble)
    df.groupBy(key.cast("string").as("key"))
      .agg(counts.head, counts.tail: _*)
      .withColumn("total", Classes.map(c => col(s"n_$c")).reduce(_ + _))
      .withColumn("variance", varExpr)
  }

  /** The reference's own variance INDEX — a path-diversity score, not
    * a statistical variance (ref s/customs/CustomsFeatures.java:65-84,
    * 303-325): per key, count distinct request paths and distinct
    * paths that saw at least one 200; when more than one distinct
    * path exists, index = n_paths + 10 * n_success_paths, clamped at
    * 100; a single-path key scores 0. `nominal` marks index >= 33
    * (NOMINAL_VARIANCE_INDEX) — the gate customs detectors use to
    * exempt organically-browsing clients.
    *
    * One hash aggregate of two distinct counts — the per-event
    * HashMap bookkeeping of the reference's CombineFn collapses into
    * `countDistinct` with partial aggregation. Output: (key, n_paths,
    * n_success_paths, variance_index, nominal). */
  def pathVarianceIndex(df: DataFrame,
      key: org.apache.spark.sql.Column,
      path: org.apache.spark.sql.Column,
      status: org.apache.spark.sql.Column): DataFrame = {
    val raw = col("n_paths") + lit(10L) * col("n_success_paths")
    df.filter(path.isNotNull)
      .groupBy(key.cast("string").as("key"))
      .agg(countDistinct(path).as("n_paths"),
        countDistinct(when(status === 200, path)).as("n_success_paths"))
      .withColumn("variance_index",
        when(col("n_paths") > 1, least(raw, lit(100L))).otherwise(lit(0L)))
      .withColumn("nominal", col("variance_index") >= 33)
  }

  /** [[pathVarianceIndex]] over fixed windows — the shape the customs
    * detectors consume (CustomsFeaturesCombiner runs per 10-minute
    * window per source). Output: (window_start_ms, key, n_paths,
    * n_success_paths, variance_index, nominal). */
  def pathVarianceIndexWindowed(df: DataFrame,
      ts: org.apache.spark.sql.Column, window: String,
      key: org.apache.spark.sql.Column,
      path: org.apache.spark.sql.Column,
      status: org.apache.spark.sql.Column): DataFrame = {
    val raw = col("n_paths") + lit(10L) * col("n_success_paths")
    df.filter(path.isNotNull)
      .groupBy(
        unix_millis(org.apache.spark.sql.functions.window(ts, window)
          .getField("start")).as("window_start_ms"),
        key.cast("string").as("key"))
      .agg(countDistinct(path).as("n_paths"),
        countDistinct(when(status === 200, path)).as("n_success_paths"))
      .withColumn("variance_index",
        when(col("n_paths") > 1, least(raw, lit(100L))).otherwise(lit(0L)))
      .withColumn("nominal", col("variance_index") >= 33)
  }

  /** Per-key feature extraction over (key, class) pairs. */
  def typeFeatures(df: DataFrame, key: org.apache.spark.sql.Column,
      cls: org.apache.spark.sql.Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new TypeCountAggregator().toColumn
    df.select(key.cast("string").as("key"), cls.as("cls"))
      .as[(String, String)]
      .groupByKey(_._1)
      .agg(agg.name("f"))
      .map { case (k, f) =>
        val g = (c: String) => f.counts.getOrElse(c, 0L)
        FeatureRow(k, g("click"), g("error"), g("purchase"), g("signup"),
          g("view"), f.total, varianceIndex(f.counts))
      }
      .toDF()
  }
}
