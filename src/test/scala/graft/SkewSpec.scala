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

  test("saltedJoin spreads the hot key's reducer load ~salts-fold") {
    // a 32x hot key under a forced shuffle join (no broadcast — the
    // situation the utility exists for — and no AQE, so the raw
    // reducer imbalance is observable): the plain join lands every
    // hot row on ONE reducer; salting bounds it by construction.
    // Partition row counts are deterministic, not timing-based.
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val savedBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold",
      "10485760")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val big = ((1 to 3200).map(i => ("hot", i.toLong)) ++
        (1 to 100).map(i => (s"k${i % 7}", i.toLong)))
        .toDF("key", "v").repartition(8) // input balanced; skew is the join's
      val small = ("hot" +: (0 to 6).map(i => s"k$i"))
        .map(k => (k, k.toUpperCase)).toDF("key", "p")
      def maxPart(df: org.apache.spark.sql.DataFrame): Int =
        df.rdd.mapPartitions(it => Iterator(it.size)).collect().max
      val plainMax = maxPart(big.join(small, Seq("key")))
      // salts=32: with 32 shuffle partitions, fewer salts leave the
      // spread at the mercy of (key, salt)->partition collisions
      // (8 buckets into 32 bins collide often); 32 salts average the
      // bucket load out, the deployment guidance for a chosen-k salt
      val saltedMax = maxPart(Skew.saltedJoin(big, small, Seq("key"), 32))
      assert(plainMax >= 3200,
        s"fixture broken: hot key not concentrated ($plainMax)")
      assert(saltedMax <= plainMax / 3,
        s"salting must spread the hot reducer: $saltedMax vs $plainMax")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
    }
  }

  test("kmvDistinct bounds the shuffle payload at a hot key (task metrics)") {
    // a 32x-hot key with 3200 DISTINCT values spread over 8 map
    // partitions: the bounded k-min aggregator must ship <= k buffer
    // rows per partition to the reducer (here <= 8 buffers of <= 8
    // hashes), where the old distinct() + row_number window form
    // shipped all 3200 distinct hashes into one reducer task. AQE off
    // so the raw exchange write metric is the map-side output.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val big = (0 until 3200).map(i => ("hot", s"u$i"))
        .toDF("key", "v").repartition(8)
      val out = graft.operators.Heuristics
        .kmvDistinct(big, col("key"), col("v"), k = 8)
      val rows = out.collect()
      assert(rows.length == 1 && rows.head.getAs[Long]("n_kept") == 8L)
      val shuffles = out.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // the aggregate exchange is the one hash-partitioned on `key`
      // (repartition(8) is round-robin); its write payload must be
      // bounded by partitions-not-rows
      val aggEx = shuffles.filter(_.outputPartitioning match {
        case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
          h.expressions.flatMap(_.references.map(_.name)).toSet == Set("key")
        case _ => false
      })
      assert(aggEx.nonEmpty, s"no key-partitioned exchange:\n$shuffles")
      val written = aggEx.map(_.metrics("shuffleRecordsWritten").value).sum
      assert(written <= 8L,
        s"partial aggregation must bound the hot key's shuffle payload " +
          s"at one buffer per map partition; wrote $written rows (the " +
          s"window form would write 3200)")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
    }
  }

  test("keySkewCard: hand-computed card, deterministic tie-break, " +
      "bounded top-k head mass") {
    // counts by key: 7 -> 60, 100 -> 60 (tie at the max: hot_key must
    // be the SMALLER key), 1/2/3 -> 10 each
    val rows = (1 to 60).map(_ => 7L) ++ (1 to 60).map(_ => 100L) ++
      Seq(1L, 2L, 3L).flatMap(k => (1 to 10).map(_ => k))
    val df = rows.toDF("user_id")
    val card = Skew.keySkewCard(df, col("user_id")).collect().head
    assert(card.getAs[Long]("n_rows") == 150L)
    assert(card.getAs[Long]("n_keys") == 5L)
    assert(card.getAs[Long]("max_count") == 60L)
    assert(card.getAs[Long]("hot_key") == 7L,
      "max-count tie must break to the smallest key")
    assert(card.getAs[Long]("mean_count") == 30L)
    // sorted per-key loads [10,10,10,60,60]: ceil-rank p50 = 10
    // (cum 3 of 5), p99 = 60 (needs cum 5)
    assert(card.getAs[Long]("p50_count") == 10L)
    assert(card.getAs[Long]("p99_count") == 60L)
    assert(card.getAs[Long]("hot_share_ppm") == 400000L) // 60/150
    // 2.0x the fair share (60 * 1000 DIV (150 DIV 5 = 30))
    assert(card.getAs[Long]("hot_fold_x1000") == 2000L)
    // 5 keys < 10: the whole corpus is head mass
    assert(card.getAs[Long]("top10_share_ppm") == 1000000L)
    // the top-k bound really truncates: 12 singleton keys + one
    // 8-row key -> top10 holds 8 + 9x1 = 17 of 20 rows
    val df2 = ((1 to 8).map(_ => 0L) ++ (1L to 12L)).toDF("user_id")
    val card2 = Skew.keySkewCard(df2, col("user_id")).collect().head
    assert(card2.getAs[Long]("top10_share_ppm") == 850000L)
    assert(card2.getAs[Long]("hot_key") == 0L)
    // rerun determinism (the tie-break and top-k orders are total)
    val again = Skew.keySkewCard(df, col("user_id")).collect().head
    assert(again.toSeq == card.toSeq)
    // the hot-key LIST (the card's actionable complement): ranked
    // (count desc, key asc), shares in ppm of ALL rows
    val hk = Skew.hotKeys(df, col("user_id"), k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(hk == Seq((1L, 7L, 60L, 400000L), (2L, 100L, 60L, 400000L),
      (3L, 1L, 10L, 66666L)), hk.toString)
    // null keys neither crash the typed top-k nor drop: they count
    // under the reserved key Long.MinValue
    val dfN = Seq(Some(1L), Some(1L), None, None, None)
      .toDF("user_id")
    val cardN = Skew.keySkewCard(dfN, col("user_id")).collect().head
    assert(cardN.getAs[Long]("n_rows") == 5L)
    assert(cardN.getAs[Long]("n_keys") == 2L)
    assert(cardN.getAs[Long]("max_count") == 3L)
    assert(cardN.getAs[Long]("hot_key") == Long.MinValue)
    // a NON-castable key (string IPs/emails — the reference's actual
    // hot-key types) raises with the remediation instead of silently
    // null-merging every key onto the sentinel (which would fabricate
    // one giant hot key); xxhash64-mapped string keys are the path
    val dfS = Seq("1.2.3.4", "5.6.7.8", "1.2.3.4").toDF("user_id")
    val ex = intercept[Exception] {
      Skew.keySkewCard(dfS, col("user_id")).collect()
    }
    assert(ex.getMessage.contains("xxhash64"),
      s"unexpected: ${ex.getMessage}")
    val hashed = Skew.keySkewCard(dfS, xxhash64(col("user_id")))
      .collect().head
    assert(hashed.getAs[Long]("n_rows") == 3L)
    assert(hashed.getAs[Long]("n_keys") == 2L)
    assert(hashed.getAs[Long]("max_count") == 2L)
    // the fold keeps full precision at high cardinality: 1e6
    // singleton keys + one 50-row key reads exactly 50000 (50x fair
    // share). A ppm-share intermediate quantizes in steps of
    // n_keys/1000 (49000 here, hard 0 once share drops under 1 ppm —
    // a 50x-hot key invisible past ~1e8 keys); dividing by the
    // floored fair share directly never loses the signal
    val dfC = spark.range(1000000L).select(col("id").as("user_id"))
      .union(spark.range(50).select(lit(2000000L).as("user_id")))
    val cardC = Skew.keySkewCard(dfC, col("user_id")).collect().head
    assert(cardC.getAs[Long]("hot_fold_x1000") == 50000L,
      s"fold must survive high cardinality: ${cardC.toSeq}")
    // the null sentinel is reserved by convention only: a GENUINE
    // Long.MinValue key would alias the null bucket (two n_keys rows
    // sharing one hot_key value) — refused loudly, same remediation
    val dfM = Seq(Long.MinValue, 1L, 1L).toDF("user_id")
    val exM = intercept[Exception] {
      Skew.keySkewCard(dfM, col("user_id")).collect()
    }
    assert(exM.getMessage.contains("sentinel"),
      s"unexpected: ${exM.getMessage}")
    val hashedM = Skew.keySkewCard(dfM, xxhash64(col("user_id")))
      .collect().head
    assert(hashedM.getAs[Long]("n_keys") == 2L)
  }

  test("AQE splits a skewed sort-merge-join partition at runtime — " +
      "the documented first-line defense before saltedJoin") {
    // the Skew scaladoc ranks the repo's defenses: structural caps,
    // then AQE's runtime skew split, then explicit salting. The first
    // two were asserted in prose only; this pins the AQE claim — a
    // hot key big enough to cross the skew thresholds really is
    // split by AQEShuffleRead, with the join's pairs unchanged.
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      // force the sort-merge path (the regime salting/AQE exist for)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "65536")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "32768")
      import spark.implicits._
      // hot key ~600 KB of shuffle payload vs a tiny tail: far past
      // 2x the median partition and the 64 KB threshold
      val big = ((1 to 20000).map(i => ("hot", s"payload_$i")) ++
        (1 to 64).map(i => (s"k${i % 8}", s"p$i")))
        .toDF("key", "v").repartition(8)
      val small = ("hot" +: (0 to 7).map(i => s"k$i"))
        .map(k => (k, k.toUpperCase)).toDF("key", "p")
      val joined = big.join(small, Seq("key"))
      // materialize THIS dataset's own QueryExecution (count() builds
      // a separate one and would leave this plan un-finalized)
      assert(joined.collect().length == 20064) // pairs unchanged
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead"),
        s"expected an adaptive shuffle read in the final plan:\n$plan")
      assert(plan.contains("skew"),
        s"AQE did not mark the hot partition as skewed:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("saltedJoin refuses inputs that already carry a _salt column") {
    // withColumn would silently overwrite (and drop would erase) a
    // caller's _salt data — the contract is refuse, never corrupt
    val big = Seq(("k", 1L)).toDF("key", "_salt")
    val plain = Seq(("k", 1L)).toDF("key", "v")
    val small = Seq(("k", "p")).toDF("key", "p")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, small, Seq("key"), 4)
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(plain, big.withColumnRenamed("v", "p"),
        Seq("key"), 4)
    }
  }

  test("choosePath: a balanced card keeps every operator analytic; " +
      "the 50%-hot card flips sessions/relay/sequence to sharded and " +
      "alias-abuse (the measured don't-flip member) stays analytic; " +
      "tiny-cardinality share spikes don't flip") {
    import spark.implicits._
    import Skew.{SerialOp, SerialPath}
    val flippable = Seq(SerialOp.Sessions, SerialOp.RelayScan,
      SerialOp.SequenceAbuse)
    // balanced: 300 keys x 10 rows — fold reads ~1000 (fair share)
    val balanced = Skew.keySkewCard(
      (1 to 300).flatMap(k => Seq.fill(10)(k.toLong)).toDF("k"),
      col("k"))
    for (op <- flippable :+ SerialOp.AliasAbuse)
      assert(Skew.choosePath(balanced, op) == SerialPath.Analytic,
        s"$op flipped on a balanced card")
    // the measured regime: one key holds 50% of 2000 rows over 101
    // keys (the skew probe's shape) — flip the three measured
    // winners, keep the measured loser analytic
    val hot = Skew.keySkewCard(
      (Seq.fill(1000)(0L) ++
        (1 to 100).flatMap(k => Seq.fill(10)(k.toLong))).toDF("k"),
      col("k"))
    for (op <- flippable)
      assert(Skew.choosePath(hot, op) == SerialPath.Sharded,
        s"$op did not flip on the 50%-hot card")
    assert(Skew.choosePath(hot, SerialOp.AliasAbuse) ==
      SerialPath.Analytic, "alias-abuse flipped despite the measured" +
        " don't-flip adjudication")
    // 2 keys at 50% each: the share reads hot but the fold reads
    // fair (a 2-key corpus has nothing to shard) — the fold floor
    // holds the analytic path
    val twoKeys = Skew.keySkewCard(
      (Seq.fill(50)(1L) ++ Seq.fill(50)(2L)).toDF("k"), col("k"))
    for (op <- flippable)
      assert(Skew.choosePath(twoKeys, op) == SerialPath.Analytic,
        s"$op flipped on a 2-key corpus")
    // pure-threshold sanity at the crossover boundary (>= flips)
    assert(Skew.choosePath(300000L, 10000L, SerialOp.Sessions) ==
      SerialPath.Sharded)
    assert(Skew.choosePath(299999L, 10000L, SerialOp.Sessions) ==
      SerialPath.Analytic)
    assert(Skew.choosePath(300000L, 9999L, SerialOp.Sessions) ==
      SerialPath.Analytic)
    // the frame adapter refuses ambiguity: empty and per-stratum
    // multi-row cards
    val empty = Skew.keySkewCard(Seq.empty[Long].toDF("k"), col("k"))
    assert(intercept[IllegalArgumentException] {
      Skew.choosePath(empty, SerialOp.Sessions)
    }.getMessage.contains("one-row"))
    val byStratum = Skew.keySkewCardBy(
      Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)).toDF("g", "k"),
      col("g"), col("k"))
    assert(intercept[IllegalArgumentException] {
      Skew.choosePath(byStratum, SerialOp.Sessions)
    }.getMessage.contains("one-row"))
  }
}
