package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("saltedJoin: identical pairs to the plain join, key spread over salts") {
    // one hot key (90% of rows) + a tail; profile side has multiple
    // rows per key so the join is 1:n on both paths
    val big = ((1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k${i % 7}", i.toLong))).toDF("key", "v")
    val small = Seq(("hot", "H1"), ("hot", "H2"), ("k1", "A"),
      ("k2", "B"), ("zzz", "never")).toDF("key", "p")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("key", "v", "p").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
    val plain = canon(big.join(small, Seq("key")))
    val salted = canon(Skew.saltedJoin(big, small, Seq("key"), salts = 8))
    assert(salted.length == plain.length && salted.sameElements(plain))
    // the physical join keys must include the salt (the whole point)
    val p = Skew.saltedJoin(big, small, Seq("key"), salts = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("_salt"), s"salt column absent from plan:\n$p")
    // determinism: same salts on a re-run (pure row function)
    val s1 = Skew.saltedJoin(big, small, Seq("key"), 8).collect().length
    val s2 = Skew.saltedJoin(big, small, Seq("key"), 8).collect().length
    assert(s1 == s2)
    // salts = 1 degenerates to the plain join exactly
    assert(canon(Skew.saltedJoin(big, small, Seq("key"), 1))
      .sameElements(plain))
    // and the hot key really spreads: >1 distinct salt among hot rows
    val hotSalts = big.filter(col("key") === "hot")
      .withColumn("_salt",
        pmod(xxhash64(col("key"), col("v")), lit(8L)))
      .select("_salt").distinct().count()
    assert(hotSalts > 1, "hot key must land on multiple salts")
  }
}
