package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Functions
import graft.util.GeoUtil

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("levenshteinRatio column matches scala impl") {
    val rows = Seq(("kitten", "sitting"), ("", ""), ("abc", "abc"), ("abcd", "abce"))
      .toDF("a", "b")
      .select(Functions.levenshteinRatio(col("a"), col("b")).as("r"))
      .as[Double].collect()
    assert(rows(0) == 3.0 / 7)
    assert(rows(1) == 0.0)
    assert(rows(2) == 0.0)
    assert(rows(3) == 0.25)
  }

  test("haversineKm column agrees with scala impl") {
    val got = Seq((51.5074, -0.1278, 48.8566, 2.3522))
      .toDF("lat1", "lon1", "lat2", "lon2")
      .select(Functions.haversineKm(col("lat1"), col("lon1"), col("lat2"), col("lon2")).as("km"))
      .as[Double].head()
    val want = GeoUtil.haversineKm(51.5074, -0.1278, 48.8566, 2.3522)
    assert(math.abs(got - want) < 1e-9)
  }

  test("email column functions") {
    val r = Seq("user+tag@host.com").toDF("e")
      .select(Functions.normalizeEmailPlus(col("e")).as("n"),
        Functions.emailDomain(col("e")).as("d"))
      .as[(String, String)].head()
    assert(r == (("user@host.com", "host.com")))
  }

  test("cidrMatch + xffClientAddress over broadcast trie") {
    val trusted = Functions.broadcastCidrs(spark, Seq("10.0.0.0/8", "192.168.0.0/16"))
    val df = Seq(
      "203.0.113.7, 10.0.0.1, 10.0.0.2",     // client behind two proxies
      "198.51.100.9",                          // direct
      "10.1.1.1, 192.168.1.1"                  // all proxies -> null
    ).toDF("xff")
    val got = df.select(Functions.xffClientAddress(col("xff"), trusted).as("c"))
      .as[Option[String]].collect()
    assert(got(0).contains("203.0.113.7"))
    assert(got(1).contains("198.51.100.9"))
    assert(got(2).isEmpty)
  }

  test("ipv4ToLong: valid, ordering, malformed -> null") {
    val got = Seq("0.0.0.0", "10.0.0.1", "255.255.255.255", "256.1.1.1", "x")
      .toDF("ip").select(Functions.ipv4ToLong(col("ip")).as("v"))
      .as[Option[Long]].collect()
    assert(got(0).contains(0L))
    assert(got(1).contains(167772161L))
    assert(got(2).contains(4294967295L))
    assert(got(3).isEmpty)
    assert(got(4).isEmpty)
  }

  test("native long-array dot product: values, nulls, negative terms") {
    import graft.operators.Similarity
    val got = Seq(
      (Seq(1L, 2L, 3L), Option(Seq(4L, 5L, 6L))), // 4+10+18
      (Seq(-2L, 7L), Option(Seq(3L, -1L))), // -6-7
      (Seq(1L, 1L), None))
      .toDF("a", "b")
      .select(Similarity.dotQ(col("a"), col("b")).as("d"))
      .as[Option[Long]].collect()
    assert(got(0).contains(32L))
    assert(got(1).contains(-13L))
    assert(got(2).isEmpty)
  }

  test("normalizeEmailPlusDotStrip column matches the scalar twin") {
    val cases = Seq("u.s.e.r+t@host.com", "user@host.com", "nodomain",
      "a.b+c.d@x.y")
    val got = cases.toDF("e")
      .select(Functions.normalizeEmailPlusDotStrip(col("e")).as("n"))
      .as[String].collect()
    assert(got.toSeq == cases.map(graft.util.MiscUtil.normalizeEmailPlusDotStrip))
  }

  test("email normalization columns match the scalar twins on every reference edge vector") {
    // the reference's TestMiscUtil vectors plus multi-@ splices — the
    // Column expressions must agree with the scalar algorithm exactly
    val cases = Seq("test@mozilla.com", "test+x@mozilla.com",
      "test+x+x@mozilla.com", "test+@mozilla.com", "+@mozilla.com",
      "test", "test@", "test+x@", "+", "", ".@mozilla.com",
      "..@mozilla.com", "test.+x@mozilla.com",
      "test+test.test@mozilla.com", "a@b+c@d", "a+b@c+d@e")
    val got = cases.toDF("e")
      .select(Functions.normalizeEmailPlus(col("e")).as("p"),
        Functions.normalizeEmailPlusDotStrip(col("e")).as("pd"))
      .as[(String, String)].collect()
    assert(got.map(_._1).toSeq ==
      cases.map(graft.util.MiscUtil.normalizeEmailPlus))
    assert(got.map(_._2).toSeq ==
      cases.map(graft.util.MiscUtil.normalizeEmailPlusDotStrip))
  }

  test("arrayCountIn is bit-identical to the interpreted HOF form it replaced") {
    // multiset semantics (duplicates count), null elements skipped,
    // null array -> null, empty set -> 0 — each pinned against
    // size(filter(arr, t => array_contains(lit(terms), t)))
    val terms = Seq("the", "a", "and", "of", "to", "in")
    val df = Seq(
      Some(Seq[String]("the", "cat", "the", "in", "hat")),
      Some(Seq[String]("xyz")),
      Some(Seq[String]()),
      None,
      Some(Seq[String]("the", null, "of"))
    ).toDF("ws")
    val sw = typedlit(terms)
    val got = df.select(
        Functions.arrayCountIn(col("ws"), terms).as("fast"),
        size(filter(col("ws"), t => array_contains(sw, t))).as("slow"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), r.toString)
      if (!r.isNullAt(0)) assert(r.getInt(0) == r.getInt(1), r.toString)
    }
    assert(got(0).getInt(0) == 3)      // duplicates counted
    assert(got(4).getInt(0) == 2)      // null element skipped
    val empty = df.limit(1)
      .select(Functions.arrayCountIn(col("ws"), Seq.empty).as("c"))
      .collect()(0)
    assert(empty.getInt(0) == 0)
  }
}
