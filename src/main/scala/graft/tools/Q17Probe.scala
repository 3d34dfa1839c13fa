package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-8 measurement probe for the q17 noise question (VERDICT r7
  * item 4): the judge measured q17_minhash_lsh at 1.58s vs 0.55-0.84s
  * official history on an unchanged plan, both runs contended
  * (cr >= 1.18). Times q17 plus two plan-adjacent controls (q16, q18)
  * back-to-back on the current host so contention shows up as a
  * uniform shift, not a q17-specific one. Dev tool; not part of the
  * driver contract. */
object Q17Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("q16_ngram_jaccard", "q17_minhash_lsh", "q18_simhash")
    // warmup (JIT + codegen) on the small sf
    names.foreach(n =>
      graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    spark.catalog.clearCache()
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "5").toInt
    for (n <- names) {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }.sorted
      println(f"PROBE $n%-20s min ${ts.head}%6.3f  med ${ts(ts.length / 2)}%6.3f  max ${ts.last}%6.3f  ($runs runs)")
    }
    spark.stop()
  }
}
