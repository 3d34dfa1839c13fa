package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure q80's cache-vs-recompute trade at a given corpus scale:
  * the parsed-frame cache wins while the frame fits the storage pool
  * and loses (spill pressure, or UNABLE_TO_ACQUIRE_MEMORY outright)
  * once it doesn't — the knob `HttpRequestPipeline.analyze(...,
  * cacheParsed)` exists for the second regime, and this main is the
  * instrument that measured it (SCALING.md round-13).
  *
  * runMain graft.tools.Q80Probe <sfDir> <cacheParsed: true|false> */
object Q80Probe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, cacheStr) = args
    val cpus = Runtime.getRuntime.availableProcessors
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // the q80 render, verbatim
    val lines = graft.sources.Tables.fanOut(
      graft.sources.Tables.events(spark, sfDir)).select(format_string(
      """{"httpRequest":{"requestMethod":"GET","requestUrl":"https://app.test/e/%s","status":%s,"remoteIp":"%s","userAgent":"ua-%s"},"timestamp":"%s","logName":"projects/graft-test/logs/requests","resource":{"type":"http_load_balancer"}}""",
      col("event_id"),
      when(col("event_type") === "error", 404).otherwise(200),
      concat(lit("10.0.0."), col("user_id") % 37),
      col("user_id"),
      date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"))
      .as("value")).as[String]
    val cfg = graft.pipelines.HttpRequestPipeline.Config(window = "1 day",
      hardLimit = 5, thresholdModifier = 1.5, errorMaxCount = 2,
      natMinDistinctUserAgents = 4, sessionGapSeconds = 2700,
      maxSessionEvents = 3)
    val cache = cacheStr.toBoolean
    val t0 = System.nanoTime()
    val n = graft.pipelines.HttpRequestPipeline
      .analyze(lines, cfg, cacheParsed = cache).count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"Q80PROBE sf=$sfDir cache=$cache rows=$n t=$dt%.1f s " +
      s"heap=${Runtime.getRuntime.maxMemory() / (1 << 20)}m")
    spark.stop()
  }
}
