package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multiplexed input (ref s/input/Input.java:51-96 — N named log
  * streams read together, routed per element; the reference tags each
  * record with its element name and splits with TupleTags).
  *
  * Spark-first shape: ONE DataFrame with a `resource` column; routing
  * is `filter($"resource" === name)` over the shared (cached) frame,
  * and per-resource configuration is a driver-side map consulted when
  * building each branch — Catalyst prunes each branch's scan to its
  * own predicate, so "multiplex" costs one column, not N pipelines.
  */
object Multiplex {

  /** Attach a resource name to a stream of raw lines. */
  def named(lines: Dataset[String], resource: String): DataFrame =
    lines.toDF("value").withColumn("resource", lit(resource))

  /** Union N named streams into the single multiplexed frame. */
  def union(streams: Seq[DataFrame]): DataFrame =
    streams.reduce(_.unionByName(_))

  /** One branch of the multiplex: the named resource's lines. */
  def branch(mux: DataFrame, resource: String): Dataset[String] = {
    val spark = mux.sparkSession
    import spark.implicits._
    mux.filter(col("resource") === resource).select(col("value")).as[String]
  }

  /** Apply a per-resource analysis to every configured branch and
    * union the results, tagging each with its resource. `analyses`
    * maps resource name → (lines → result frame). */
  def analyzeAll(mux: DataFrame,
      analyses: Map[String, Dataset[String] => DataFrame]): DataFrame = {
    val cached = mux.cache()
    analyses.toSeq.sortBy(_._1).map { case (name, fn) =>
      fn(branch(cached, name)).withColumn("resource", lit(name))
    }.reduce(_.unionByName(_))
  }
}
