package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100×-scale skew story for the windowed per-key detectors,
  * asserted with real task metrics, not hand-waving.
  *
  * The scenario the reference meets in production (and guards via
  * DetectNat): ONE NAT'd /32 carries a large multiple of any other
  * client's traffic, so `groupBy(window, sourceAddress)` sees a hot
  * key. For the counting detectors (hard limit, error rate, status
  * rate, threshold, distinct cardinality) the guard is Spark's
  * map-side partial aggregation — each map task collapses the hot key
  * to ONE partial row before the exchange, so the shuffle moves
  * O(distinct keys) records regardless of skew and no reduce task
  * ever receives the hot key's raw rows. That is the same effect a
  * hand-salted two-phase aggregate would buy, for free, and it is why
  * these plans survive a single key holding 10% of 100 TB.
  *
  * (The analytic-scan detectors that partition a WINDOW FUNCTION by
  * key — sessionize, per-key lag scans — cannot partial-aggregate;
  * for those the engine mirrors the reference's own answer: exclude
  * known NATs upstream (the broadcast left-anti suppression of q09)
  * or detect them first via `distinctCardinality`, whose own plan IS
  * partial-aggregated, as proven here.)
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Collects per-task shuffle metrics for everything run inside
    * `body`, draining the async listener bus before returning. */
  private def withTaskMetrics[A](body: => A)
      : (A, Long, Long, Long) = {
    val written = new AtomicLong
    val maxRead = new AtomicLong
    val maxRunMs = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          written.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          maxRead.getAndUpdate(c =>
            math.max(c, m.shuffleReadMetrics.recordsRead))
          maxRunMs.getAndUpdate(c => math.max(c, m.executorRunTime))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val a = body
      // the listener bus is async: poll until the totals go quiet
      var prev = -1L
      var spins = 0
      while (prev != written.get + maxRead.get && spins < 50) {
        prev = written.get + maxRead.get
        Thread.sleep(100)
        spins += 1
      }
      (a, written.get, maxRead.get, maxRunMs.get)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  /** 32× skew fixture: one hot IP with 32 000 rows vs 1 000 cold IPs
    * with one row each (the hot key alone is 32× ALL cold traffic). */
  private def skewedEvents = {
    import spark.implicits._
    val spread = spark.range(32000)
      .select(lit("10.9.9.9").as("addr"),
        timestamp_seconds(lit(1700000000L) + col("id") % 60).as("ts"))
    val cold = spark.range(1000)
      .select(concat(lit("10.0."), (col("id") / 256).cast("int"),
          lit("."), (col("id") % 256).cast("int")).as("addr"),
        timestamp_seconds(lit(1700000000L) + col("id") % 60).as("ts"))
    // spark.range splits both ranges across the session's default
    // parallelism, so the hot key appears in every map partition with
    // NO extra shuffle (a repartition here would pollute the measured
    // shuffle-record counts with its own raw-row exchange)
    spread.union(cold)
  }

  test("hard limit under a 32x hot key: partial agg bounds shuffle and task sizes") {
    val df = graft.operators.Heuristics.hardLimit(
      skewedEvents, col("ts"), col("addr"), "1 hour", limit = 1000)
    val (rows, written, maxRead, _) = withTaskMetrics(df.collect())
    // correctness: exactly the hot key trips the limit, full count
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("key") == "10.9.9.9")
    assert(rows(0).getAs[Long]("n") == 32000L)
    // the shuffle carries partial aggregates, not raw rows: at most
    // (distinct keys) x (map partitions) records vs 33 000 input rows
    // — in practice ~1 032 + the hot key's one partial per map task
    assert(written > 0, "expected a shuffle to measure")
    assert(written <= 3000,
      s"partial aggregation failed to collapse the hot key: $written " +
        "shuffle records for 33000 input rows")
    // no reduce task ever sees the hot key's 32 000 raw rows — only
    // one partial row per map task can reach its reducer
    assert(maxRead <= 2000,
      s"a reduce task read $maxRead records — hot key not combined")
  }

  test("distinct cardinality (NAT detection) under the same skew stays partial-aggregated") {
    // the NAT detector itself — countDistinct(attr) per (window, key)
    // — expands to (key, attr) pairs which dedup map-side, so even
    // the detector that FINDS hot NATs survives them
    val withUa = skewedEvents.withColumn("ua",
      concat(lit("agent-"), (rand(7) * 40).cast("int")))
    val df = graft.operators.Heuristics.distinctCardinality(
      withUa, col("ts"), col("addr"), col("ua"), "1 hour",
      minDistinct = 30)
    val (rows, written, maxRead, _) = withTaskMetrics(df.collect())
    // only the hot IP accumulates >= 30 distinct agents
    assert(rows.length == 1 && rows(0).getAs[String]("key") == "10.9.9.9")
    // shuffle moves per-map (key, window, attr) partials (<= 41
    // distinct attrs x 32 maps + 1000 colds), never the raw rows
    assert(written <= 6000,
      s"distinct expansion not combined map-side: $written records")
    assert(maxRead <= 4000, s"skewed reduce task read $maxRead records")
  }

  test("hard-limit plan shape: partial HashAggregate precedes the exchange") {
    val df = graft.operators.Heuristics.hardLimit(
      skewedEvents, col("ts"), col("addr"), "1 hour", limit = 1000)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString
    val agg = p.linesIterator.indexWhere(l =>
      l.contains("HashAggregate") && l.contains("partial_count"))
    val ex = p.linesIterator.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(agg >= 0, s"no partial aggregate in plan:\n$p")
    // plan trees print parent-first: the partial aggregate must be a
    // CHILD of the exchange (printed below it) — i.e. it runs map-side
    // before any data moves
    assert(ex >= 0 && agg > ex,
      s"partial aggregate must run upstream of the exchange:\n$p")
  }
}
