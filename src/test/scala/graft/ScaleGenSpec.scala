package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale-probe generator's contract: each copy is an ISOMETRY of
  * the source corpus (within-copy structure exact, cross-copy overlap
  * ~zero) — the property that makes the measured exponents about the
  * ENGINE rather than about manufactured data pathologies. */
class ScaleGenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("embK cap: text replicates past the embedding-shift period, " +
      "embeddings honestly stop below the vector dim") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-scalegen-embk").toString
    ScaleGen.generate(spark, "/root/testdata/sf0.001", out, 3,
      embKOverride = Some(2))
    val src = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val se = sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    assert(spark.read.parquet(s"$out/documents.parquet").count() ==
      3 * src.count())
    assert(spark.read.parquet(s"$out/embeddings.parquet").count() ==
      2 * se.count())
    // the period guard still refuses a dishonest embedding k
    val dim = se.select(org.apache.spark.sql.functions.size(
      col("embedding"))).head().getInt(0)
    val e = intercept[IllegalArgumentException] {
      ScaleGen.generate(spark, "/root/testdata/sf0.001",
        out + "-bad", dim + 1)
    }
    assert(e.getMessage.contains("cyclic"))
  }

  test("k-fold corpus: copy 0 byte-identical, copies disjoint, structure preserved") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-scalegen").toString
    ScaleGen.generate(spark, "/root/testdata/sf0.001", out, 3)
    val src = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val gen = spark.read.parquet(s"$out/documents.parquet")
    assert(gen.count() == 3 * src.count())
    // copy 0 is byte-identical to the source
    val mismatch = gen.filter(col("doc_id") < 10000000L)
      .select(col("doc_id"), col("text").as("t2"))
      .join(src.select(col("doc_id"), col("text")), Seq("doc_id"))
      .filter(col("t2") =!= col("text")).count()
    assert(mismatch == 0, "copy 0 must be byte-identical")
    // the rotation is an isometry: per-copy length sums equal
    val lens = gen.groupBy((col("doc_id") / 10000000L).cast("int").as("copy"))
      .agg(sum(length(col("text"))).as("chars"),
        count(lit(1)).as("docs"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(lens.size == 3 && lens.values.toSet.size == 1,
      s"copies must have identical length mass: $lens")
    // n_chars column matches the (possibly rotated) text
    assert(gen.filter(length(col("text")) =!= col("n_chars")).count() == 0)
    // cross-copy content is disjoint (no md5 collision between copies)
    val byCopy = gen.select(
      (col("doc_id") / 10000000L).cast("int").as("copy"),
      md5(col("text")).as("h"))
    val cross = byCopy.alias("a").join(byCopy.alias("b"),
        col("a.h") === col("b.h") && col("a.copy") < col("b.copy"))
      .count()
    assert(cross == 0, "rotated copies must not share any document text")
    // within-copy dup structure preserved: each copy has the same
    // number of distinct texts as the source
    val srcDistinct = src.select(md5(col("text"))).distinct().count()
    val perCopy = byCopy.groupBy(col("copy"))
      .agg(count_distinct(col("h")).as("d")).collect()
      .map(_.getLong(1)).toSet
    assert(perCopy == Set(srcDistinct),
      s"within-copy distinct-text structure must be preserved: $perCopy vs $srcDistinct")
    // embeddings: 3x rows, shift preserves the component multiset
    val se = sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val ge = spark.read.parquet(s"$out/embeddings.parquet")
    assert(ge.count() == 3 * se.count())
    val sortedSum = (df: org.apache.spark.sql.DataFrame, idBase: Long) =>
      df.filter(col("vec_id") >= idBase && col("vec_id") < idBase + 10000000L)
        .select(sum(expr(
          "aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + x)")))
        .head().getDouble(0)
    val s0 = sortedSum(ge, 0L)
    val s2 = sortedSum(ge, 20000000L)
    assert(math.abs(s0 - s2) < 1e-3,
      "cyclic shift must preserve component sums (isometry)")
    // events: 3x rows; copy 0 byte-identical; copies key-disjoint with
    // identical per-copy behavior (timestamps/types/values untouched)
    val sev = sources.Tables.events(spark, "/root/testdata/sf0.001")
    val gev = spark.read.parquet(s"$out/events.parquet")
    assert(gev.count() == 3 * sev.count())
    val evMismatch = gev.filter(col("event_id") < 10000000L)
      .select(col("event_id"), col("user_id").as("u2"),
        col("event_type").as("et2"))
      .join(sev.select(col("event_id"), col("user_id"), col("event_type")),
        Seq("event_id"))
      .filter(col("u2") =!= col("user_id") ||
        col("et2") =!= col("event_type")).count()
    assert(evMismatch == 0, "events copy 0 must be byte-identical")
    // user key spaces are disjoint across copies...
    val copyOfUser = (col("user_id") / 10000000L).cast("int")
    assert(gev.select(copyOfUser.as("c")).distinct().count() == 3)
    // ...while each copy carries the source's exact per-type activity
    // (the event_type keys stay shared — the KMV/HLL hot-key regime)
    val srcPerType = sev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), count_distinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val genPerType = gev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), count_distinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(genPerType == srcPerType.map { case (t, (n, u)) =>
      t -> (3 * n, 3 * u) },
      s"per-type mass and distinct users must scale exactly 3x: " +
        s"$genPerType vs $srcPerType")
  }

  test("depth mode: constant actors, k-fold per-key events inside the " +
      "same session structure, events pairwise distinct, text tables " +
      "passed through unchanged") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-scalegen-depth").toString
    ScaleGen.generate(spark, "/root/testdata/sf0.001", out, 3,
      depth = true)
    val sev = sources.Tables.events(spark, "/root/testdata/sf0.001")
    val gev = spark.read.parquet(s"$out/events.parquet")
    assert(gev.count() == 3 * sev.count())
    // the DEPTH contract, inverse of breadth striding: the actor set
    // is IDENTICAL (no new keys) and every actor carries exactly 3x
    // their source event count
    val srcPerUser = sev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val genPerUser = gev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(genPerUser == srcPerUser.map { case (u, n) => u -> (3 * n) },
      "every key must deepen exactly 3x with no new keys")
    // events stay pairwise distinct in (event_id) and in (user, ts):
    // the MICROSECOND jitter separates copies without moving any
    // session boundary (2 µs ceiling at k=3; 0.1 s even at the
    // k=100000 guard limit vs >= 120 s gaps — the old ms jitter
    // reached 0.83x of the smallest gap at the guard's limit)
    assert(gev.select(col("event_id")).distinct().count() == gev.count())
    assert(gev.select(col("user_id"), col("ts"), col("event_id") % 10000000L)
      .distinct().count() == gev.count())
    // the time horizon is the source's (+ <= (k-1) µs, sub-ms at this
    // k) — depth densifies, never lengthens
    val (sMin, sMax) = sev.agg(min(col("ts")), max(col("ts"))).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime))
      .head
    val (gMin, gMax) = gev.agg(min(col("ts")), max(col("ts"))).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime))
      .head
    assert(gMin == sMin && gMax >= sMax && gMax <= sMax + 1,
      s"horizon must not move: src [$sMin,$sMax] gen [$gMin,$gMax]")
    // and the jitter is truly micro: copy c of an event sits exactly
    // c MICROSECONDS after its copy-0 twin
    val jitterBad = gev
      .select((col("event_id") % 10000000L).as("eid"),
        (col("event_id") / 10000000L).cast("long").as("copy"),
        unix_micros(col("ts")).as("us"))
      .groupBy(col("eid"))
      .agg((max(col("us") - col("copy")) =!=
        min(col("us") - col("copy"))).as("bad"))
      .filter(col("bad")).count()
    assert(jitterBad == 0, "per-copy jitter must be exactly `copy` µs")
    // copy 0 byte-identical (event_id below the stride)
    val evMismatch = gev.filter(col("event_id") < 10000000L)
      .select(col("event_id"), col("user_id").as("u2"),
        col("ts").as("ts2"))
      .join(sev.select(col("event_id"), col("user_id"), col("ts")),
        Seq("event_id"))
      .filter(col("u2") =!= col("user_id") || col("ts2") =!= col("ts"))
      .count()
    assert(evMismatch == 0, "depth copy 0 must be byte-identical")
    // text tables pass through unchanged (1x, same content)
    val src = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val gd = spark.read.parquet(s"$out/documents.parquet")
    assert(gd.count() == src.count())
    assert(gd.select(md5(col("text"))).except(
      src.select(md5(col("text")))).count() == 0)
    assert(spark.read.parquet(s"$out/embeddings.parquet").count() ==
      sources.Tables.embeddings(spark, "/root/testdata/sf0.001").count())
    // breadth-mode knobs are rejected in depth mode
    val e = intercept[IllegalArgumentException] {
      ScaleGen.generate(spark, "/root/testdata/sf0.001", out + "-bad",
        3, embKOverride = Some(2), depth = true)
    }
    assert(e.getMessage.contains("breadth-mode"))
  }

  test("length mode: constant doc count, k-fold cipher-concatenated " +
      "text per doc, copies gram-disjoint, events/embeddings passed " +
      "through unchanged") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-scalegen-length").toString
    ScaleGen.generate(spark, "/root/testdata/sf0.001", out, 3,
      docLength = true)
    val src = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val gd = spark.read.parquet(s"$out/documents.parquet")
    // constant doc COUNT, k-fold text: |new| = k*|src| + (k-1)
    // separator spaces, per doc
    assert(gd.count() == src.count(), "length mode must not add docs")
    val lenBad = gd.select(col("doc_id"), col("n_chars").as("nc"),
        length(col("text")).cast("long").as("real"))
      .join(src.select(col("doc_id"),
        length(col("text")).cast("long").as("src_len")), Seq("doc_id"))
      .filter(col("nc") =!= col("real") ||
        col("nc") =!= col("src_len") * 3 + 2)
      .count()
    assert(lenBad == 0, "every doc must carry exactly 3x text + 2 seps")
    // copy 0 is the source text verbatim (prefix), and lang/source
    // survive — the probe measures length, nothing else moves
    val prefixBad = gd.select(col("doc_id"), col("text").as("t2"),
        col("lang").as("l2"), col("source").as("s2"))
      .join(src, Seq("doc_id"))
      .filter(!col("t2").startsWith(col("text")) ||
        col("l2") =!= col("lang") || col("s2") =!= col("source"))
      .count()
    assert(prefixBad == 0, "copy 0 must prefix each doc unchanged")
    // the cipher keeps copies gram-disjoint: the concatenation must
    // NOT inflate a doc's top trigram count 3x (a naive
    // self-concatenation would); letter trigrams of the copies are
    // disjoint, so per-gram counts stay ~source (+ boundary grams)
    val topSrc = src.filter(col("doc_id") === 0)
      .select(explode(expr("transform(sequence(1, length(text) - 2)," +
        " i -> substring(text, CAST(i AS INT), 3))")).as("g"))
      .filter(col("g").rlike("^[a-z]{3}$"))
      .groupBy(col("g")).count().agg(max(col("count"))).head().getLong(0)
    val topGen = gd.filter(col("doc_id") === 0)
      .select(explode(expr("transform(sequence(1, length(text) - 2)," +
        " i -> substring(text, CAST(i AS INT), 3))")).as("g"))
      .filter(col("g").rlike("^[a-z]{3}$"))
      .groupBy(col("g")).count().agg(max(col("count"))).head().getLong(0)
    assert(topGen < 3 * topSrc,
      s"cipher copies must not stack the same grams: src-max $topSrc " +
        s"gen-max $topGen")
    // events and embeddings pass through (the length axis is a text
    // probe)
    assert(spark.read.parquet(s"$out/events.parquet").count() ==
      sources.Tables.events(spark, "/root/testdata/sf0.001").count())
    assert(spark.read.parquet(s"$out/embeddings.parquet").count() ==
      sources.Tables.embeddings(spark, "/root/testdata/sf0.001").count())
    // mode exclusivity + breadth knobs rejected
    assert(intercept[IllegalArgumentException] {
      ScaleGen.generate(spark, "/root/testdata/sf0.001", out + "-bad",
        3, depth = true, docLength = true)
    }.getMessage.contains("exclusive"))
    assert(intercept[IllegalArgumentException] {
      ScaleGen.generate(spark, "/root/testdata/sf0.001", out + "-bad",
        3, embKOverride = Some(2), docLength = true)
    }.getMessage.contains("breadth-mode"))
  }

  test("skew mode: constant volume, deterministic k-percent of events " +
      "reassigned to hot key 0, everything else byte-identical, " +
      "0pct is a pure passthrough") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-scalegen-skew").toString
    ScaleGen.generate(spark, "/root/testdata/sf0.001", out, 20,
      skew = true)
    val sev = sources.Tables.events(spark, "/root/testdata/sf0.001")
    val gev = spark.read.parquet(s"$out/events.parquet")
    // the SKEW contract: volume is CONSTANT — same rows, same ids,
    // same times, same payloads; only the key column moves
    assert(gev.count() == sev.count(), "skew must not change volume")
    val joined = gev.select(col("event_id"), col("user_id").as("gu"),
        col("ts").as("gts"), col("event_type").as("gt"),
        col("value").as("gv"))
      .join(sev.select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value")), Seq("event_id"))
    assert(joined.count() == sev.count(),
      "event ids must be preserved 1:1")
    assert(joined.filter(col("gts") =!= col("ts") ||
      col("gt") =!= col("event_type") ||
      col("gv") =!= col("value")).count() == 0,
      "non-key columns must be byte-identical")
    // the reassignment set is EXACTLY the xxhash64 selection — every
    // selected row lands on key 0, every unselected row keeps its key
    val sel = pmod(xxhash64(col("event_id")), lit(100L)) < 20
    assert(joined.filter(sel && col("gu") =!= 0L).count() == 0,
      "every selected row must land on the hot key")
    assert(joined.filter(!sel && col("gu") =!= col("user_id"))
      .count() == 0, "unselected rows must keep their key")
    // the selection is a real ~20 percent (xxhash64 is uniform; the
    // band is wide enough to never flake at sf0.001's row count)
    val frac = joined.filter(sel).count().toDouble / sev.count()
    assert(frac > 0.15 && frac < 0.25,
      s"selected fraction $frac outside the 20pct band")
    // no new keys beyond the (already existing) hot key
    assert(gev.select(col("user_id")).except(
      sev.select(col("user_id"))).count() == 0,
      "skew must not mint keys — hot key 0 exists in the source")
    // k=0 is the control: a byte-identical passthrough
    val out0 = java.nio.file.Files
      .createTempDirectory("graft-scalegen-skew0").toString
    ScaleGen.generate(spark, "/root/testdata/sf0.001", out0, 0,
      skew = true)
    assert(spark.read.parquet(s"$out0/events.parquet")
      .select(col("event_id"), col("user_id"), col("ts"))
      .except(sev.select(col("event_id"), col("user_id"), col("ts")))
      .count() == 0, "0pct must be a pure passthrough")
    // text tables pass through unchanged (the skew axis is an
    // events-family probe)
    assert(spark.read.parquet(s"$out/documents.parquet").count() ==
      sources.Tables.documents(spark, "/root/testdata/sf0.001").count())
    assert(spark.read.parquet(s"$out/embeddings.parquet").count() ==
      sources.Tables.embeddings(spark, "/root/testdata/sf0.001").count())
    // guards: the 90pct ceiling, breadth knobs, mode exclusivity
    assert(intercept[IllegalArgumentException] {
      ScaleGen.generate(spark, "/root/testdata/sf0.001", out + "-bad",
        95, skew = true)
    }.getMessage.contains("90pct"))
    assert(intercept[IllegalArgumentException] {
      ScaleGen.generate(spark, "/root/testdata/sf0.001", out + "-bad",
        20, embKOverride = Some(2), skew = true)
    }.getMessage.contains("breadth-mode"))
    assert(intercept[IllegalArgumentException] {
      ScaleGen.generate(spark, "/root/testdata/sf0.001", out + "-bad",
        20, depth = true, skew = true)
    }.getMessage.contains("exclusive"))
  }
}
