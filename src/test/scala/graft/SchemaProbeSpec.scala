package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Testdata-drift tripwire: asserts the exact canonical POST-LOAD schema
  * (names + types, in order) of every driver-provided table at sf0.001.
  *
  * Why it exists: the round-7 testdata regeneration silently changed
  * `events.ts` from parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and the
  * breakage surfaced as 69 scattered analysis failures and 55 missing
  * correctness rows. The NEXT regeneration that shifts a type should fail
  * HERE, as one named test with a readable expected-vs-actual diff.
  *
  * Conventions pinned (and relied on downstream):
  *  - `events.ts` is TimestampType after load — `Tables.load` adapts the
  *    raw physical shape (ns-as-long, µs NTZ, or tz-adjusted µs) to the
  *    session-UTC TimestampType all event operators expect.
  *  - `o_orderdate` / `l_shipdate` are TIMESTAMP_NTZ as the current data
  *    writes them (tz=None µs); queries use them comparison-only, and the
  *    DuckDB oracle agrees on values under the pinned UTC session.
  */
class SchemaProbeSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq(
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType))

  for (name <- Tables.all) {
    test(s"$name post-load schema is canonical") {
      val actual = Tables.load(spark, sf, name).schema
        .map(f => f.name -> f.dataType)
      val want = expected(name)
      assert(actual == want,
        s"\nTESTDATA DRIFT in $name:\n  expected: ${want.map { case (n, t) => s"$n:${t.simpleString}" }.mkString(", ")}\n  actual:   ${actual.map { case (n, t) => s"$n:${t.simpleString}" }.mkString(", ")}\nIf the driver regenerated /root/testdata with new physical types, adapt Tables.load (and this spec) — see the events.ts ns->us->ntz history in Tables.scala.")
    }
  }

  test("events load is type-adaptive: long ns input takes the ns->us path") {
    // simulate the OLD testdata shape (ts as raw nanosecond long) and
    // check Tables.load still converts it to the same TimestampType
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("schemaprobe").toString
    try {
      Seq((1L, 1700000001234567891L, 5L, "login", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val df = Tables.load(spark, dir, "events")
      assert(df.schema("ts").dataType == TimestampType)
      val micros = df.selectExpr("unix_micros(ts)").head().getLong(0)
      assert(micros == 1700000001234567L) // floor(ns / 1000)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
