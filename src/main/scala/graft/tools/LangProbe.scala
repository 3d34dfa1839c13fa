package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-timing probe for the langId family (round 14). */
object LangProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft-scale/1x"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[probe] $label: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val d = graft.sources.Tables.documents(spark, dir)
    d.count() // warm the scan
    val profiles = time("train profiles (lazy frame)") {
      graft.operators.TextAnalysis.langIdProfiles(
        d.filter(col("doc_id") % 10 < 3), col("lang"), col("text"), m = 64)
    }
    val pred = time("langId construction (model collect)") {
      graft.operators.TextAnalysis.langId(d, col("doc_id"), col("text"),
        profiles, penalty = 64, d = 32)
    }
    time("langId score+collect")(pred.collect().length)
    val pred2 = graft.operators.TextAnalysis.langId(d, col("doc_id"),
      col("text"), profiles, penalty = 64, d = 32)
    time("langId warm rerun (incl model re-collect)")(pred2.collect().length)
    val dp = d.select(col("doc_id"),
        concat(lit(" "), trim(regexp_replace(lower(col("text")),
          "[^a-z]+", " ")), lit(" ")).as("s"))
      .select(col("doc_id"), explode(when(length(col("s")) >= 3,
        transform(sequence(lit(1), length(col("s")) - 2),
          i => col("s").substr(i, lit(3))))
        .otherwise(array())).as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("cnt"))
    time("doc explode+agg only")(dp.count())
    spark.stop()
  }
}
