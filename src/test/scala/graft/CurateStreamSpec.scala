package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, TextAnalysis}
import graft.pipelines.CorpusPipeline

/** Streaming corpus ingestion ≡ the batch curation discipline: PII
  * scrubbed before anything holds the text, the shared quality gate,
  * and watermark-bounded exact dedup. */
class CurateStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: Long) = new Timestamp(s * 1000)

  private val goodA =
    "the quick brown fox jumps over the lazy dog and then naps contact bob@example.com today"
  private val goodB =
    "spark executes the shuffle and a broadcast join of wide tables quickly"
  private val goodC =
    "a third clean document with the usual stopword mixture in it okay"

  test("curateStream: scrubs, gates, dedups within the watermark; equals the batch discipline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val docs = in.toDS().toDF("ts", "doc_id", "text")
    val q = CorpusPipeline.curateStream(docs, "ts", col("doc_id"),
        col("text"), watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("curated")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        (ts(1000), 1L, goodA),
        (ts(1010), 2L, goodA), // exact dup in the same batch
        (ts(1020), 3L, "short junk"), // fails the quality gate
        (ts(1030), 4L, goodB))
      q.processAllAvailable()
      in.addData(
        (ts(1100), 5L, goodA), // dup across batches, inside watermark
        (ts(1200), 6L, goodC))
      q.processAllAvailable()
      val rows = spark.table("curated").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("scrubbed"))
        .toMap
      assert(rows.keySet == Set(1L, 4L, 6L))
      // PII never reaches the output (or the dedup state: the hash is
      // of the scrubbed text)
      assert(rows(1L).contains("[EMAIL]") && !rows(1L).contains("bob@"))

      // the batch discipline over the same rows lands on the same
      // survivor set (stream keeps first-seen; batch keeps min id —
      // identical here because arrival order is id order)
      val batch = Seq((1L, goodA), (2L, goodA), (3L, "short junk"),
        (4L, goodB), (5L, goodA), (6L, goodC)).toDF("doc_id", "text")
      val scrubbed = TextAnalysis.piiScrub(batch, col("doc_id"), col("text"))
        .select(col("doc_id"), col("scrubbed"))
        .filter(TextAnalysis.qualityOk(col("scrubbed")))
      val survivors = Dedup.exactDedup(scrubbed, col("doc_id"), col("scrubbed"))
        .select(col("canonical_id")).as[Long].collect().toSet
      assert(survivors == rows.keySet)
    } finally q.stop()
  }

  test("curateStream banned-term gate: a blocklisted doc drops " +
      "in-stream, matching the batch screen; empty list is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val banned = goodB + " after a slow scan of the ledger"
    val in = MemoryStream[(Timestamp, Long, String)]
    val q = CorpusPipeline.curateStream(in.toDS().toDF("ts", "doc_id", "text"),
        "ts", col("doc_id"), col("text"), watermarkDelay = "10 minutes",
        bannedTerms = Seq("SLOW SCAN", "merge batch"))
      .writeStream.format("memory").queryName("curated_banned")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((ts(1000), 1L, goodA), (ts(1010), 2L, banned),
        (ts(1020), 3L, goodC))
      q.processAllAvailable()
      val kept = spark.table("curated_banned")
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 3L))
      // batch parity: the screen flags exactly the dropped doc (terms
      // case-fold on both sides)
      val flagged = TextAnalysis.bannedTermScreen(
          Seq((1L, goodA), (2L, banned), (3L, goodC)).toDF("id", "t"),
          col("id"), col("t"), Seq("SLOW SCAN", "merge batch"))
        .filter(col("flagged")).select("doc_id").as[Long].collect().toSet
      assert(flagged == Set(2L))
    } finally q.stop()
  }

  test("curateStream stripMarkup: an HTML-wrapped copy of a seen plain " +
      "doc dedups onto it, and PII inside markup is still scrubbed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val wrapped = "<html><p>" + goodA.replace("bob@example.com",
      "<a href=\"mailto:bob@example.com\">bob@example.com</a>") +
      "</p><!-- tracker --></html>"
    val in = MemoryStream[(Timestamp, Long, String)]
    val q = CorpusPipeline.curateStream(in.toDS().toDF("ts", "doc_id", "text"),
        "ts", col("doc_id"), col("text"), watermarkDelay = "10 minutes",
        stripMarkup = true)
      .writeStream.format("memory").queryName("curated_markup")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((ts(1000), 1L, goodA), (ts(1010), 2L, wrapped),
        (ts(1020), 3L, "<p>" + goodB + "</p>"))
      q.processAllAvailable()
      val rows = spark.table("curated_markup").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("scrubbed"))
        .toMap
      // the wrapped copy of doc 1 strips to the same prose -> deduped;
      // doc 3's markup strips and the prose survives the quality gate
      assert(rows.keySet == Set(1L, 3L))
      assert(rows(3L) == goodB)
      assert(rows(1L).contains("[EMAIL]") && !rows(1L).contains("<"))
    } finally q.stop()
  }

  test("ingestStream: persistent index screens batches; only kept docs are indexed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-ingest-idx").toString
    val art1 = "seventeen violinists rehearse quietly beneath the " +
      "old stone bridge while the river carries their tune away"
    val art2 = "spark executes the shuffle and a broadcast join of " +
      "wide tables quickly across many executor nodes tonight"
    val art3 = "a wholly novel third document about content defined " +
      "chunking and its shift resistant boundaries which realign " +
      "after any insertion because each cut depends only on the " +
      "trailing window of characters in practice"
    val art3near = art3.replace("practice", "production")
    val art2near = art2.replace("tonight", "tomorrow")
    val in = MemoryStream[(Long, String)]
    val decisions = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Boolean, Option[Long], Boolean)]
    val q = CorpusPipeline.ingestStream(in.toDS().toDF("id", "text"),
        col("id"), col("text"), idxDir) { d =>
      decisions ++= d.collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Boolean]("exact_dup"),
        if (r.isNullAt(r.fieldIndex("near_dup_of"))) None
        else Some(r.getAs[Long]("near_dup_of")),
        r.getAs[Boolean]("keep")))
      ()
    }.option("checkpointLocation", java.nio.file.Files
      .createTempDirectory("graft-ingest-ckpt").toString).start()
    try {
      in.addData((1L, art1), (2L, art2), (3L, art1))
      q.processAllAvailable()
      val b1 = decisions.toSeq.map(d => d._1 -> d).toMap
      assert(b1.keySet == Set(1L, 2L, 3L))
      assert(b1(1L)._4 && b1(2L)._4)  // novel docs kept
      assert(b1(3L)._2 && !b1(3L)._4) // within-batch exact twin dropped
      assert(b1(3L)._3.contains(1L))  // near evidence names the original
      decisions.clear()

      in.addData((10L, art1), (11L, art2near), (12L, art3))
      q.processAllAvailable()
      val b2 = decisions.toSeq.map(d => d._1 -> d).toMap
      assert(b2(10L)._2 && !b2(10L)._4) // exact vs the index
      assert(b2(10L)._3.contains(1L))   // matched doc 1, never doc 3
      assert(!b2(11L)._2 && b2(11L)._3.contains(2L) && !b2(11L)._4)
      assert(b2(12L)._4)                // novel
      decisions.clear()

      // 11 was dropped, so its bands are NOT indexed: a near copy of
      // art3 matches 12 (kept), and art1 still matches 1
      in.addData((20L, art3near), (21L, art1))
      q.processAllAvailable()
      val b3 = decisions.toSeq.map(d => d._1 -> d).toMap
      assert(b3(20L)._3.contains(12L) && !b3(20L)._4)
      assert(b3(21L)._2 && b3(21L)._3.contains(1L))

      // the index holds exactly the kept docs
      val idxIds = spark.read.parquet(s"$idxDir/hashes")
        .select("doc_id").as[Long].collect().toSet
      assert(idxIds == Set(1L, 2L, 12L))
    } finally q.stop()
  }

  test("ingestStream: index compaction keeps decisions identical and caps file count") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val texts = Seq(
      1L -> ("seventeen violinists rehearse quietly beneath the old " +
        "stone bridge while the river carries their tune away"),
      2L -> ("spark executes the shuffle and a broadcast join of wide " +
        "tables quickly across many executor nodes tonight"),
      3L -> ("gardeners plant tomatoes beside the fence and water " +
        "them every single morning before the summer heat arrives"),
      4L -> ("the observatory telescope tracked a distant comet while " +
        "astronomers recorded its spectral lines through the night"))
    val probe = Seq( // one exact twin, one near copy, one novel
      100L -> texts.head._2,
      101L -> texts(1)._2.replace("tonight", "tomorrow"),
      102L -> ("completely novel closing document about compaction " +
        "rewrites that change file layout while never changing any " +
        "decision the screening pipeline emits for future batches"))
    def run(compactAt: Int): (Seq[(Long, Boolean, Option[Long], Boolean)], Int, Int) = {
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-compact-idx").toString
      val in = MemoryStream[(Long, String)]
      val decisions = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Boolean, Option[Long], Boolean)]
      val q = CorpusPipeline.ingestStream(in.toDS().toDF("id", "text"),
          col("id"), col("text"), idxDir,
          compactAt = compactAt, compactTo = 1) { d =>
        decisions ++= d.collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Boolean]("exact_dup"),
          if (r.isNullAt(r.fieldIndex("near_dup_of"))) None
          else Some(r.getAs[Long]("near_dup_of")),
          r.getAs[Boolean]("keep")))
        ()
      }.option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-compact-ckpt").toString).start()
      try {
        for ((docId, t) <- texts) { // one novel doc per trigger
          in.addData((docId, t)); q.processAllAvailable()
        }
        val preProbe = graft.sinks.Sinks
          .parquetFileCount(spark, s"$idxDir/hashes")
        in.addData(probe: _*); q.processAllAvailable()
        (decisions.sortBy(_._1).toSeq, preProbe,
          graft.sinks.Sinks.parquetFileCount(spark, s"$idxDir/hashes"))
      } finally q.stop()
    }
    val (compacted, preC, postC) = run(compactAt = 3)
    val (plain, preP, _) = run(compactAt = 1000000)
    // decisions are IDENTICAL with and without compaction
    assert(compacted == plain)
    // and they are the right decisions against the (compacted) index
    val byId = compacted.map(d => d._1 -> d).toMap
    assert(byId(100L)._2 && byId(100L)._3.contains(1L) && !byId(100L)._4)
    assert(!byId(101L)._2 && byId(101L)._3.contains(2L) && !byId(101L)._4)
    assert(byId(102L)._4)
    // compaction actually ran and reduced the file count: the
    // uncompacted run rots past the threshold, the compacted one
    // stays at or under compactTo + the appends since the last sweep
    assert(preP > 3, s"fixture too small to rot: $preP files")
    assert(preC < preP, s"compaction never fired: $preC vs $preP")
    assert(postC <= 3, s"post-probe count not capped: $postC")
  }

  test("ingestStream chunk screen: shifted boilerplate assembled from " +
      "several indexed docs is caught ONLY by the gear-chunk screen " +
      "(exact md5 differs, no single minhash pair clears the bar); " +
      "index chunk rows stay hash-only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-chunk-idx").toString
    // three donors: each a sizable distinctive block behind a unique
    // lead-in; blockA is longest so the biggest-donor evidence is
    // deterministic
    val blockA = "the licensing terms of this corpus require every " +
      "redistribution to carry the original attribution notice and a " +
      "copy of the permission grant in a prominent location near the " +
      "top of the derived document where readers can find it without " +
      "scrolling past unrelated material of any kind whatsoever"
    val blockB = "submissions are reviewed within thirty days by two " +
      "independent referees who score novelty rigor and clarity on a " +
      "five point scale before the editor issues a decision letter"
    val blockC = "to unsubscribe from these notifications visit your " +
      "account settings page and toggle the email preferences switch " +
      "under the communications heading then save your changes"
    val docs = Seq(
      1L -> ("orchids bloom in the greenhouse corner " + blockA),
      2L -> ("meteor showers peak after midnight tonight " + blockB),
      3L -> ("the harbor ferry runs every twenty minutes " + blockC))
    // the composite: all three blocks, each SHIFTED by new
    // surroundings — no byte-identical whole doc, and no single donor
    // covers enough of it for the banded-minhash screen
    val composite = "assorted unrelated framing words open this " +
      "document " + blockB + " meanwhile " + blockC + " and finally " +
      blockA + " with a short closing remark"
    val novel = "a wholly original essay on tidal energy capture " +
      "along rocky coastlines where turbine placement must respect " +
      "shipping lanes and seasonal migration patterns of local birds"
    val in = MemoryStream[(Long, String)]
    case class Dec(exact: Boolean, near: Option[Long],
      chunk: Option[Long], overlap: Option[Double], keep: Boolean)
    val decisions = scala.collection.mutable.Map.empty[Long, Dec]
    val q = CorpusPipeline.ingestStream(in.toDS().toDF("id", "text"),
        col("id"), col("text"), idxDir) { d =>
      decisions ++= d.collect().map(r => r.getAs[Long]("doc_id") -> Dec(
        r.getAs[Boolean]("exact_dup"),
        if (r.isNullAt(r.fieldIndex("near_dup_of"))) None
        else Some(r.getAs[Long]("near_dup_of")),
        if (r.isNullAt(r.fieldIndex("chunk_dup_of"))) None
        else Some(r.getAs[Long]("chunk_dup_of")),
        if (r.isNullAt(r.fieldIndex("chunk_overlap"))) None
        else Some(r.getAs[Double]("chunk_overlap")),
        r.getAs[Boolean]("keep")))
      ()
    }.option("checkpointLocation", java.nio.file.Files
      .createTempDirectory("graft-chunk-ckpt").toString).start()
    try {
      in.addData(docs: _*); q.processAllAvailable()
      assert(decisions.values.forall(_.keep)) // donors pairwise novel
      decisions.clear()

      in.addData((10L, composite), (11L, novel)); q.processAllAvailable()
      val c = decisions(10L)
      // not an exact twin, and NO single minhash pair clears 0.5 —
      // only the corpus-global chunk screen catches it
      assert(!c.exact && c.near.isEmpty)
      assert(c.chunk.contains(1L), s"biggest donor should be 1: $c")
      assert(c.overlap.exists(_ >= 0.5), s"overlap too low: $c")
      assert(!c.keep)
      assert(decisions(11L).keep && decisions(11L).chunk.isEmpty)

      // dropped docs never pollute the chunk index; rows are
      // hash-only (chunk_md5, doc_id) — no text, no spans
      val idx = spark.read.parquet(s"$idxDir/chunks")
      assert(idx.columns.toSeq.sorted == Seq("chunk_md5", "doc_id"))
      assert(idx.select("doc_id").as[Long].collect().toSet ==
        Set(1L, 2L, 3L, 11L))
    } finally q.stop()
  }

  test("ingestStream unicode screen: a decomposed twin of an indexed " +
      "composed doc is caught by the exact screen though raw md5 differs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-ingest-uni").toString
    val composed = "le caf\u00e9 r\u00e9sum\u00e9 sits beside the " +
      "na\u00efve river while seventeen violinists rehearse quietly"
    val decomposed = "le cafe\u0301 re\u0301sume\u0301 sits beside the " +
      "nai\u0308ve river while seventeen violinists rehearse quietly"
    // byte-distinct (a raw content hash admits the twin), yet
    // NFC-canonically one string — exactly what the screen must see
    assert(composed != decomposed)
    assert(graft.util.UnicodeNorm.normalize(decomposed,
      java.text.Normalizer.Form.NFC) == composed)
    val in = MemoryStream[(Long, String)]
    val decisions = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Boolean, Boolean)]
    val q = CorpusPipeline.ingestStream(in.toDS().toDF("id", "text"),
        col("id"), col("text"), idxDir) { d =>
      decisions ++= d.collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Boolean]("exact_dup"), r.getAs[Boolean]("keep")))
      ()
    }.option("checkpointLocation", java.nio.file.Files
      .createTempDirectory("graft-ingest-uni-ckpt").toString).start()
    try {
      in.addData((1L, composed))
      q.processAllAvailable()
      assert(decisions.toSeq == Seq((1L, false, true)))
      decisions.clear()
      in.addData((2L, decomposed))
      q.processAllAvailable()
      val d2 = decisions.toSeq.head
      assert(d2._1 == 2L && d2._2 && !d2._3) // exact_dup, dropped
      // the index holds only the composed original
      val idxIds = spark.read.parquet(s"$idxDir/hashes")
        .select("doc_id").as[Long].collect().toSet
      assert(idxIds == Set(1L))
    } finally q.stop()
  }

  test("compaction crash window heals: orphaned .old restores before any read") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-crash-idx").toString + "/hashes"
    Seq(("h1", 1L), ("h2", 2L)).toDF("chash", "doc_id")
      .write.parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the crash between the two swap renames: live dir gone,
    // backup present, a half-written .compact left behind
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".old")))
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir + ".compact"))
    graft.sinks.Sinks.restoreOrphanedCompaction(fs, dir)
    // the index is back — a read sees BOTH rows, not an empty frame
    assert(spark.read.parquet(dir).count() == 2)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".compact")))
    // healthy state: restore is a no-op (does not clobber live data)
    graft.sinks.Sinks.restoreOrphanedCompaction(fs, dir)
    assert(spark.read.parquet(dir).count() == 2)
    // and a compaction straight after the heal works end to end
    graft.sinks.Sinks.compactParquetDir(spark, dir, "chash", 1)
    assert(spark.read.parquet(dir).count() == 2)
    assert(graft.sinks.Sinks.parquetFileCount(spark, dir) == 1)
  }

  test("atomicSnapshotSwap + readSnapshotOr: first publish, overwrite " +
      "swap, crash-window heal, and absent-dir empty read — all via " +
      "scheme-qualified paths") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val schema = StructType(Seq(StructField("key", StringType),
      StructField("last_ts_ms", LongType)))
    // file:// URI on purpose: the java.io.File probe this replaced is
    // always false for scheme-qualified paths
    val dir = "file://" + java.nio.file.Files
      .createTempDirectory("graft-snap").toString + "/gate"
    // absent dir: empty frame of the declared schema, no inference error
    assert(graft.sinks.Sinks.readSnapshotOr(spark, dir, schema)
      .count() == 0)
    // first publish (no live dir): single rename
    graft.sinks.Sinks.atomicSnapshotSwap(
      Seq(("a", 1L)).toDF("key", "last_ts_ms"), dir)
    assert(graft.sinks.Sinks.readSnapshotOr(spark, dir, schema)
      .as[(String, Long)].collect().toSet == Set(("a", 1L)))
    // overwrite swap replaces contents wholesale
    graft.sinks.Sinks.atomicSnapshotSwap(
      Seq(("a", 2L), ("b", 3L)).toDF("key", "last_ts_ms"), dir)
    assert(graft.sinks.Sinks.readSnapshotOr(spark, dir, schema)
      .as[(String, Long)].collect().toSet == Set(("a", 2L), ("b", 3L)))
    // crash between the two swap renames: live gone, .old present —
    // the next read heals instead of restoring an empty map
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".old")))
    assert(graft.sinks.Sinks.readSnapshotOr(spark, dir, schema)
      .as[(String, Long)].collect().toSet == Set(("a", 2L), ("b", 3L)))
  }

  test("corpusDiff: added/removed/changed/unchanged, thin join only") {
    import spark.implicits._
    val old = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("id", "t")
    val neu = Seq((1L, "alpha"), (2L, "beta EDITED"), (4L, "delta"))
      .toDF("id", "t")
    val diff = CorpusPipeline.corpusDiff(old, col("id"), col("t"),
      neu, col("id"), col("t"))
    val out = diff.collect().map(r => r.getAs[Long]("doc_id") ->
      r.getAs[String]("status")).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    // the join carries hashes, never text
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val root = diff.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case pl => pl
    }
    val wide = root.collect { case e: ShuffleExchangeExec => e }
      .filter(_.output.exists(a => a.name == "t" || a.name == "text"))
    assert(wide.isEmpty, "diff exchanges must carry hashes, not text")
  }

  test("dataCard: hand-computed per-source rates in exact permille") {
    import spark.implicits._
    val clean = "the quick brown fox jumps over a lazy dog and then " +
      "naps in the shade of an old oak tree nearby"
    val docs = Seq(
      (1L, "web", clean),
      (2L, "web", clean),                       // exact copy of 1
      (3L, "web", clean + " contact bob@example.com now"), // PII
      (4L, "web", "short junk"),                // fails quality
      (5L, "books", clean + " entirely original closing line")
    ).toDF("id", "src", "t")
    val out = CorpusPipeline.dataCard(docs, col("id"), col("src"), col("t"))
      .collect().map(r => r.getAs[String]("stratum") -> r).toMap
    val web = out("web")
    assert(web.getAs[Long]("n_docs") == 4L)
    // docs 1-3 pass quality, 4 fails: 3*1000 DIV 4 = 750
    assert(web.getAs[Long]("quality_ok_permille") == 750L)
    // one PII doc of 4: 250
    assert(web.getAs[Long]("pii_permille") == 250L)
    // doc 2 is the one non-canonical copy: 250
    assert(web.getAs[Long]("dup_copy_permille") == 250L)
    assert(out("books").getAs[Long]("n_docs") == 1L)
    assert(out("books").getAs[Long]("dup_copy_permille") == 0L)
    // token mass is the exact sum of per-doc token counts
    val wantTokens = Seq(clean, clean, clean + " contact bob@example.com now",
      "short junk").map(_.split(" ").count(_.nonEmpty).toLong).sum
    assert(web.getAs[Long]("n_tokens_total") == wantTokens)
  }

  test("curationFunnel: monotone attrition with hand-placed stage casualties") {
    import spark.implicits._
    val clean = "the quick brown fox jumps over a lazy dog and then " +
      "naps in the shade of an old oak tree nearby"
    val docs = Seq(
      (1L, clean),
      (2L, clean + " plus a wholly different continuation about rivers " +
        "and the bridges that cross them in the spring when melting " +
        "snow swells every stream beneath their arches loudly"),
      (3L, clean),                       // exact dup of 1 -> stage 3
      (4L, clean + " tail"),             // near dup of 1 -> stage 4
      (5L, "short junk"),                // -> stage 2
      (6L, "mojibake cafÃ© " + clean)    // -> stage 1
    ).toDF("id", "t")
    val out = CorpusPipeline.curationFunnel(docs, col("id"), col("t"))
      .collect().map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("token_mass"))).toMap
    assert(out("0_raw")._1 == 6L)
    assert(out("1_encoding")._1 == 5L)   // doc 6 out
    assert(out("2_quality")._1 == 4L)    // doc 5 out
    assert(out("3_exact_dedup")._1 == 3L) // doc 3 out (1 survives)
    assert(out("4_near_dedup")._1 == 2L) // doc 4 out (vs lower id 1)
    // token masses are exact sums and monotonically non-increasing
    val masses = Seq("0_raw", "1_encoding", "2_quality", "3_exact_dedup",
      "4_near_dedup").map(out(_)._2)
    assert(masses == masses.sorted.reverse)
    assert(out("0_raw")._2 == docs.collect().map(
      _.getAs[String]("t").split(" ").count(_.nonEmpty).toLong).sum)
  }

  test("curateStream: the quality gate is the batch gate, by shared thresholds") {
    import spark.implicits._
    // boundary doc: exactly MinTokens tokens must pass, one fewer must not
    val atMin = (1 to TextAnalysis.MinTokens.toInt)
      .map(i => if (i % 3 == 0) "the" else s"w$i").mkString(" ")
    val below = atMin.split(" ").drop(1).mkString(" ")
    val df = Seq((1L, atMin), (2L, below)).toDF("doc_id", "text")
    val viaScore = TextAnalysis.qualityScore(df, col("doc_id"), col("text"))
      .filter(col("quality_ok")).select("doc_id").as[Long].collect().toSet
    val viaGate = df.filter(TextAnalysis.qualityOk(col("text")))
      .select("doc_id").as[Long].collect().toSet
    assert(viaScore == viaGate && viaGate == Set(1L))
  }
}
