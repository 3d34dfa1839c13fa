package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The native expressions are reachable from plain SQL once the
  * extension is installed. A dedicated session (same SparkContext) is
  * built because extensions bind at session construction. */
class GraftExtensionsSpec extends AnyFunSuite {

  private def withExtSession[A](f: SparkSession => A): A = {
    val base = SparkTestSession.spark // ensures a SparkContext exists
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder()
        .master(base.sparkContext.master)
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      try f(s)
      finally {
        SparkSession.clearDefaultSession()
        SparkSession.clearActiveSession()
      }
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("dot_q and quantize_vec are callable from SQL") {
    withExtSession { s =>
      val r = s.sql(
        "SELECT dot_q(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").head()
      assert(r.getLong(0) == 32L)
      val q = s.sql(
        "SELECT quantize_vec(array(CAST(0.12345 AS FLOAT)), 10000) AS q")
        .head().getSeq[Long](0)
      assert(q == Seq(1235L)) // floor(0.12345*10000 + 0.5); float widening
      val qd = s.sql(
        "SELECT quantize_vec(array(CAST(0.5 AS FLOAT))) AS q")
        .head().getSeq[Long](0)
      assert(qd == Seq(5000L)) // default engine scale
    }
  }

  test("unicode_norm is callable from SQL, defaulting to NFC") {
    withExtSession { s =>
      // 'cafe' + combining acute (U+0301) composes to caf + U+00E9;
      // SQL-literal \u escape (Spark chr() is ASCII-only)
      val r = s.sql(
        "SELECT unicode_norm('cafe\\u0301') AS nfc, " +
          "unicode_norm('ﬁle', 'NFKC') AS folded")
        .head()
      assert(r.getString(0) == "caf\u00e9")
      assert(r.getString(1) == "file") // ligature fi folds under NFKC
      intercept[Exception] {
        s.sql("SELECT unicode_norm('x', 'BAD')").collect()
      }
    }
  }

  test("multi_contains is callable from SQL with a constant term array") {
    withExtSession { s =>
      val r = s.sql(
        "SELECT multi_contains('the window shade', " +
          "array('dow', 'shade', 'absent')) AS hits").head()
      assert(r.getSeq[Int](0) == Seq(0, 1))
      // non-constant term array: the automaton needs plan-time terms
      intercept[Exception] {
        s.sql("SELECT multi_contains('x', array(repeat('a', id)))" +
          " FROM range(2)").collect()
      }
    }
  }

  test("optimizer rule rewrites bound levenshtein to the banded threshold form") {
    import org.apache.spark.sql.functions.{col, levenshtein, lit}
    // a parquet-backed frame: a LocalRelation would be folded away at
    // plan time, hiding the rewritten expression
    val baseline = graft.sources.Tables
      .customer(SparkTestSession.spark, "/root/testdata/sf0.001")
      .filter(levenshtein(col("c_name"), lit("Customer#000000000100")) <= 3)
      .select(col("c_name")).collect().map(_.getString(0)).toSet
    assert(baseline.nonEmpty) // names differing in <= 3 digits exist
    withExtSession { s =>
      val c = graft.sources.Tables.customer(s, "/root/testdata/sf0.001")
      val q = c.filter(
        levenshtein(col("c_name"), lit("Customer#000000000100")) <= 3)
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("Some(3)") && opt.contains("levenshtein"),
        s"threshold form missing from optimized plan:\n$opt")
      // identical rows to the unbounded form on the baseline session
      assert(q.select(col("c_name")).collect()
        .map(_.getString(0)).toSet == baseline)
      // strict < rewrites to the k-1 band
      val q2 = c.filter(
        levenshtein(col("c_name"), lit("Customer#000000000100")) < 3)
      assert(q2.queryExecution.optimizedPlan.toString.contains("Some(2)"))
    }
  }

  test("SQL form matches the Column API bit-for-bit on real vectors") {
    withExtSession { s =>
      val emb = graft.sources.Tables.embeddings(s, "/root/testdata/sf0.001")
      emb.select(org.apache.spark.sql.functions.col("embedding")).limit(50)
        .createOrReplaceTempView("v")
      val sqlNorms = s.sql(
        "SELECT dot_q(quantize_vec(embedding), quantize_vec(embedding)) n FROM v")
        .collect().map(_.getLong(0)).toSeq
      val colNorms = emb.limit(50).select(
        graft.operators.Similarity.dotQ(
          graft.operators.Similarity.quantize(
            org.apache.spark.sql.functions.col("embedding")),
          graft.operators.Similarity.quantize(
            org.apache.spark.sql.functions.col("embedding"))).as("n"))
        .collect().map(_.getLong(0)).toSeq
      assert(sqlNorms == colNorms)
    }
  }
}
