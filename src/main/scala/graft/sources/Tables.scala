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

  /** Read one table. `events.ts` is parquet TIMESTAMP(NANOS) which Spark
    * cannot map to its microsecond TimestampType; we read it as a long
    * (legacy conf) and truncate ns→µs, which matches DuckDB's
    * `epoch_ns(ts)//1000` exactly (both floor for positive epochs).
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      // integer division: ts is ~1.7e18 ns, above 2^53 — a double
      // division here would round and shift some stamps by ±µs
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
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
