package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Functions

class CidrMatchExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val trie = Functions.broadcastCidrs(spark,
    Seq("10.0.0.0/8", "192.168.0.0/16", "8.8.8.8"))

  test("expression and UDF agree on membership incl. null/malformed") {
    import spark.implicits._
    val df = Seq("10.1.2.3", "11.0.0.1", "192.168.9.9", "8.8.8.8",
      "8.8.8.9", "garbage", null).toDF("ip")
    val rows = df.select(
      Functions.cidrMatch(trie)(col("ip")).as("native"),
      Functions.cidrMatchUdf(trie)(col("ip")).as("viaUdf")).collect()
    rows.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1)))
    assert(rows.map(_.getBoolean(0)).toSeq ==
      Seq(true, false, true, true, false, false, false))
  }

  test("native expression stays inside whole-stage codegen; no ScalaUDF node") {
    val df = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ip", graft.sources.SyntheticLogs.ipOf(col("user_id")))
      .filter(Functions.cidrMatch(trie)(col("ip")))
    val planStr = df.queryExecution.executedPlan.toString
    assert(!planStr.toLowerCase.contains("scalaudf"))
    // "*(1) Filter cidr_match(...)" — the star marks the codegen stage
    assert(planStr.contains("*(1) Filter cidr_match"))
    assert(df.count() > 0)
  }

  test("filter pushes through and evaluates distributed over a real table") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ip", graft.sources.SyntheticLogs.ipOf(col("user_id")))
    val native = ev.filter(Functions.cidrMatch(trie)(col("ip"))).count()
    val viaUdf = ev.filter(Functions.cidrMatchUdf(trie)(col("ip"))).count()
    assert(native == viaUdf)
    assert(native > 0) // all synthetic ips are 10.x.y.z
  }
}
