package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a single SparkEntry query: one warmup + 3 timed runs.
  * runMain graft.tools.QTime <name> <sfDir> */
object QTime {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args
    val cpus = Runtime.getRuntime.availableProcessors
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).count() // warmup (codegen + JIT)
    spark.catalog.clearCache()
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    println(f"QTIME $name min=${times.min}%.3f runs=${times.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
