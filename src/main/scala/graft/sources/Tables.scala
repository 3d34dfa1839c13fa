package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables
  * (`/root/testdata/sf*`; see TESTDATA.md).
  *
  * Scale notes: these are plain `spark.read.parquet` scans so Catalyst
  * keeps predicate pushdown + column pruning; at 100 TB the same code
  * works because every downstream operator filters/projects on the
  * DataFrame (pushed into the scan) rather than materializing rows.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table, adapting `events.ts` to whatever physical type the
    * current testdata generation used. Two shapes have been observed:
    *
    *  - parquet TIMESTAMP(NANOS): Spark cannot map nanos to its µs
    *    TimestampType, so we read it as a long (legacy conf) and
    *    truncate ns→µs, matching DuckDB's `epoch_ns(ts)//1000` exactly
    *    (both floor for positive epochs).
    *  - parquet TIMESTAMP(MICROS) (isAdjustedToUTC=false → TIMESTAMP_NTZ
    *    in Spark): cast to the session TimestampType. The session TZ is
    *    pinned to UTC everywhere in this engine, so NTZ→timestamp is
    *    value-preserving and agrees bit-for-bit with DuckDB.
    *
    * Branching on the ANALYZED schema (not a config) means the next
    * testdata regeneration that keeps either shape keeps working, and a
    * third shape fails one named spec (SchemaProbeSpec) instead of 55
    * scattered analysis errors.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // integer division: ts is ~1.7e18 ns, above 2^53 — a double
          // division here would round and shift some stamps by ±µs
          df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case org.apache.spark.sql.types.TimestampType => df
        case _ => df.withColumn("ts", col("ts").cast("timestamp"))
      }
    else df
  }

  /** Estimate how many scan partitions the file sources under `df`'s
    * ANALYZED logical plan will produce, using the same split-size
    * formula as Spark's file-partition planner (maxSplitBytes =
    * min(maxPartitionBytes, max(openCost, bytesPerCore))). Derived
    * from the logical plan only: no `df.rdd`, which would force a
    * physical-planning pass per call and — under AQE — eagerly
    * execute any upstream shuffle stages just to read a count.
    * Returns None when the plan has no file scan (in-memory test
    * frames, streaming): fan-out is a raw-scan concern only. */
  private def scanPartitionEstimate(df: DataFrame): Option[Long] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val conf = df.sparkSession.sessionState.conf
    val parallelism = df.sparkSession.sparkContext.defaultParallelism.toLong
    val rels = df.queryExecution.analyzed.collect {
      case l: LogicalRelation if l.relation.isInstanceOf[HadoopFsRelation] =>
        l.relation.asInstanceOf[HadoopFsRelation]
    }
    if (rels.isEmpty) None
    else Some(rels.map { rel =>
      val openCost = conf.filesOpenCostInBytes
      val nFiles = rel.location.inputFiles.length.toLong
      val bytes = rel.location.sizeInBytes + nFiles * openCost
      val maxSplit = math.min(conf.filesMaxPartitionBytes,
        math.max(openCost, bytes / math.max(1L, parallelism)))
      math.max(1L, (bytes + maxSplit - 1) / maxSplit)
    }.sum)
  }

  /** Fan a narrow frame out to the session's parallelism when its scan
    * has fewer partitions — a small unsplittable file (one parquet row
    * group) otherwise runs the whole downstream map side (parse,
    * tokenize, per-row scoring) as ONE task. No-op at scale, where the
    * source already has at least as many splits as cores; the shuffle
    * it adds at bench scale moves well under a megabyte. Expects a
    * raw scan / projection (the estimate reads the plan's file
    * relations); frames with no file scan pass through untouched. */
  def fanOut(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // partitioning is the source's concern
    val p = df.sparkSession.sparkContext.defaultParallelism
    scanPartitionEstimate(df) match {
      case Some(n) if n < p => df.repartition(p)
      case _ => df
    }
  }

  /** fanOut variant that hash-partitions by `keys` so a downstream
    * groupBy/dropDuplicates on a superset of those keys needs no
    * further shuffle (subset-of-clustering satisfies the required
    * distribution). */
  def fanOutBy(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    if (df.isStreaming) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    scanPartitionEstimate(df) match {
      case Some(n) if n < p => df.repartition(p, keys: _*)
      case _ => df
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
