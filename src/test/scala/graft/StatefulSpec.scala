package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Features, Stateful}

class StatefulSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("suppress: first emits, re-emits strictly after expiry, per key") {
    val df = Seq(
      ("a", ts(0)), ("a", ts(10)), ("a", ts(599)),   // suppressed
      ("a", ts(600)),    // STILL suppressed: ref isExpired is strict >
      ("a", ts(650)),    // re-emits (gap 650 > 600)
      ("a", ts(1300)),   // re-emits (gap 650 from the 650s emission)
      ("b", ts(5))                                     // separate key
    ).toDF("k", "t")
    val got = Stateful.suppress(df, col("t"), col("k"), expirySeconds = 600)
      .select(col("key"), (col("ts_us") / 1000000L).cast("long").as("s"))
      .as[(String, Long)].collect().toSet
    assert(got == Set(("a", 0L), ("a", 650L), ("a", 1300L), ("b", 5L)))
  }

  test("suppress handles duplicate timestamps (second copy suppressed)") {
    val df = Seq(("a", ts(0)), ("a", ts(0)), ("a", ts(1))).toDF("k", "t")
    val got = Stateful.suppress(df, col("t"), col("k"), 600).count()
    assert(got == 1)
  }

  test("suppressSession: suppressed events extend the gap; fixed suppress re-emits") {
    // a steady drip every 500s with a 600s gap: the session form emits
    // only the first (each drip extends the session), while the
    // fixed-expiry form re-emits once 600s accumulate from the last
    // EMITTED event — the distinguishing case for the two reference
    // suppressors (AlertSuppressor vs AlertSuppressorSession)
    val df = Seq(("a", ts(0)), ("a", ts(500)), ("a", ts(1000)),
      ("a", ts(1500)), ("a", ts(2000))).toDF("k", "t")
    val session = Stateful.suppressSession(df, col("t"), col("k"), 600)
      .select((col("ts_us") / 1000000L).cast("long")).as[Long].collect().sorted
    assert(session.toSeq == Seq(0L))
    val fixed = Stateful.suppress(df, col("t"), col("k"), 600)
      .select((col("ts_us") / 1000000L).cast("long")).as[Long].collect().sorted
    assert(fixed.toSeq == Seq(0L, 1000L, 2000L))
    // strict >: a gap of exactly 600s still suppresses in session form
    val edge = Seq(("a", ts(0)), ("a", ts(600)), ("a", ts(1201))).toDF("k", "t")
    val got = Stateful.suppressSession(edge, col("t"), col("k"), 600)
      .select((col("ts_us") / 1000000L).cast("long")).as[Long].collect().sorted
    assert(got.toSeq == Seq(0L, 1201L))
  }

  test("suppressCount matches a literal transliteration of the reference state machine") {
    // Independently-derived expected output: a direct port of the
    // reference's processElement flow (s/alert/AlertSuppressor.java:
    // 96-143) with AlertSuppressorCount.shouldSuppress (java:27-35).
    // State = last EMITTED (ts, count); expired = gap STRICTLY > the
    // expiry (isExpired, java:71-77); inside the window suppress iff
    // the count equals the stored one; state overwritten on every
    // emission (both the expiry and the count-change path). This is
    // written from the Java, not from the repo operator or the q141
    // oracle — so a green run is not self-confirming.
    def referenceSuppress(events: Seq[(String, Long, Long)], expiryUs: Long)
        : Set[(String, Long, Long)] = {
      val state = scala.collection.mutable.Map[String, (Long, Long)]()
      val out = Set.newBuilder[(String, Long, Long)]
      events.foreach { case (k, t, c) =>
        val emit = state.get(k) match {
          case None => true
          case Some((st, sc)) => (t - st) > expiryUs || sc != c
        }
        if (emit) { state(k) = (t, c); out += ((k, t, c)) }
      }
      out.result()
    }
    // randomized fixture with exact-boundary gaps (steps of exactly
    // the 600s expiry) and frequently-repeating counts, replayed in
    // the documented (key, ts, count) order for both forms
    val rnd = new scala.util.Random(42)
    val evs = (for (k <- Seq("a", "b", "c", "d")) yield {
      var t = 0L
      (0 until 40).map { _ =>
        t += Seq(100L, 600L, 600L, 700L)(rnd.nextInt(4)) * 1000000L
        (k, t, (rnd.nextInt(4) + 1).toLong)
      }
    }).flatten.sortBy(e => (e._1, e._2, e._3))
    val expected = referenceSuppress(evs, 600000000L)
    val got = Stateful.suppressCount(evs.toDF("k", "t_us", "c"),
        timestamp_micros(col("t_us")), col("k"), col("c"),
        expirySeconds = 600)
      .as[(String, Long, Long)].collect().toSet
    assert(expected.size > 20 && expected.size < evs.size,
      s"fixture must exercise both emit and suppress: ${expected.size}/${evs.size}")
    assert(got == expected)
  }

  test("geoVelocity flags impossible travel only") {
    val df = Seq(
      // key a: London -> Paris in 1 hour (~344 km/h) then Paris->Paris
      ("a", ts(0), 51.5074, -0.1278),
      ("a", ts(3600), 48.8566, 2.3522),
      ("a", ts(7200), 48.8566, 2.3522),
      // key b: London -> London (speed 0)
      ("b", ts(0), 51.5074, -0.1278),
      ("b", ts(3600), 51.5074, -0.1278)
    ).toDF("k", "t", "lat", "lon")
    val got = Stateful.geoVelocity(df, col("t"), col("k"), col("lat"),
      col("lon"), maxKmh = 300.0).collect()
    assert(got.length == 1)
    assert(got(0).getAs[String]("key") == "a")
    val v = got(0).getAs[Long]("speed_kmh")
    assert(v > 330 && v < 350)
  }

  test("feature aggregator counts per class + deterministic variance") {
    val df = Seq(
      ("u1", "click"), ("u1", "click"), ("u1", "view"),
      ("u2", "error")
    ).toDF("k", "c")
    val rows = Features.typeFeatures(df, col("k"), col("c"))
      .collect().map(r => r.getAs[String]("key") -> r).toMap
    val u1 = rows("u1")
    assert(u1.getAs[Long]("n_click") == 2 && u1.getAs[Long]("n_view") == 1)
    assert(u1.getAs[Long]("total") == 3)
    // counts (2,0,0,0,1), mean 0.6 -> var = (1.96+0.36*3+0.16)/5
    assert(math.abs(u1.getAs[Double]("variance") -
      Features.varianceIndex(Map("click" -> 2, "view" -> 1))) == 0.0)
    assert(rows("u2").getAs[Long]("n_error") == 1)
  }
}
