package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. The repo's first lines of defense are
  * structural (frequency caps on hot shingles/bands/cells — drop the
  * k² work instead of redistributing it) and AQE's runtime skew-join
  * splitting. Salting is the third tool, for the case the other two
  * cannot cover: an equi-join that MUST keep every hot-key pair
  * (no cap is semantically acceptable) against a replicable side —
  * e.g. joining a skewed event stream to a per-key profile table
  * where one NAT'd address carries 10% of the corpus. AQE splits
  * skewed partitions of shuffle joins, but only per-partition and
  * only when stats surface at runtime; an explicit salt bounds the
  * worst reducer BY CONSTRUCTION.
  */
object Skew {

  /** Salted inner equi-join: spread each hot key of `big` over
    * `salts` reducers by hashing the WHOLE row onto a salt, and
    * replicate `small` across every salt value. Result is row-for-row
    * identical to `big.join(small, keys)` (spec-pinned) — salting
    * changes the partitioning arithmetic, never the pairs — at the
    * cost of scanning `salts` copies of the replicated side through
    * the shuffle, so `small` should be the profile/dimension side
    * (too big to broadcast, small enough to replicate a few times).
    *
    * The salt is `pmod(xxhash64(all of big's columns), salts)` — a
    * pure function of the row, so re-runs and re-partitionings land
    * every row on the same salt (the repo's determinism discipline);
    * rows identical in every column share a salt, which is harmless:
    * duplicates of one row need no spreading to balance, key SKEW
    * (many DISTINCT rows per key) is what spreads. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(keys.nonEmpty, "need at least one join key")
    // withColumn would silently REPLACE a caller's _salt column (and
    // the final drop would erase it) — refuse rather than corrupt
    require(!big.columns.contains("_salt"),
      "big side already carries a _salt column")
    require(!small.columns.contains("_salt"),
      "small side already carries a _salt column")
    val bigS = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(salts.toLong)))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    bigS.join(smallS, keys :+ "_salt").drop("_salt")
  }

  /** The key-skew card — the decide-to-mitigate diagnostic a keyed
    * pipeline runs BEFORE committing to a partitioning at corpus
    * scale: how concentrated is the per-key load? One row out:
    *
    *  - `n_rows`, `n_keys`, `mean_count` — the balanced baseline
    *  - `max_count`, `hot_key` — the heaviest key (ties broken by
    *    smallest key, so the row is deterministic)
    *  - `hot_share_ppm` — the hot key's share of ALL rows (parts per
    *    million); `hot_fold_x1000` — how many times the fair share
    *    (n_rows/n_keys) the hot key holds, x1000 — the number that
    *    directly reads as a salting factor
    *  - `top10_share_ppm` — head mass (is it ONE hot key or a hot
    *    head?)
    *  - `p50_count`, `p99_count` — the load distribution's body
    *
    * Scale shape: ONE partial-agg shuffle builds the per-key counts;
    * everything downstream reduces that |keys|-row frame — the top-10
    * rides [[graft.functions.TopKAggregator]] (map-side bounded, so
    * no sort of the counts frame), the quantiles ride the shared
    * integer-histogram kernel (|distinct load values| rows, which
    * concentrates far below |keys|), and the final assembly is a
    * broadcast join of per-stratum singleton frames. Integer contract:
    * shares are `x * 1000000 DIV n_rows` (exact for corpora under
    * ~9e12 rows — the int64 multiply bound), fold is
    * `max_count * 1000 DIV (n_rows DIV n_keys)` — against the floored
    * fair share directly, so the reading survives any key cardinality
    * (a ppm-share intermediate would quantize the fold away past ~1e6
    * keys). A null key is counted as the reserved key Long.MinValue
    * (the card is a TOTAL diagnostic — it must not crash or drop on a
    * null-keyed pipeline; the SQL mirrors assume the driver corpora's
    * no-null keys), while a NON-null key that cannot cast to long
    * raises with the remediation (map string keys through xxhash64) —
    * silently nulling it would merge every key onto the sentinel and
    * fabricate a giant hot key. Degenerate inputs: an empty frame yields zero card
    * rows (the SQL mirror's global-aggregate form yields one all-NULL
    * row — only reachable on an empty corpus, which no gate runs). */
  def keySkewCard(df: DataFrame, key: Column, topK: Int = 10)
      : DataFrame = {
    // group by the RAW key: the contract-checked cast lives in
    // keySkewCardOfCounts (casting here would silently null a
    // non-castable key before the check could fire)
    val counts = df.groupBy(lit("all").as("stratum"), key.as("k"))
      .agg(count(lit(1)).as("n"))
    keySkewCardOfCounts(counts, col("stratum"), col("k"), col("n"),
      topK).drop("stratum")
  }

  /** Per-stratum [[keySkewCard]] — one card row per group (a time
    * window, a source, a shard): is SOME slice of the stream in the
    * hot-key regime even when the global card reads balanced? Same
    * columns as the global card plus `stratum`. Scale shape identical
    * (the quantile histograms and top-k partials are per-stratum, so
    * the added dimension rides the same bounded aggregations). */
  def keySkewCardBy(df: DataFrame, group: Column, key: Column,
      topK: Int = 10): DataFrame = {
    val counts = df.groupBy(group.as("stratum"), key.as("k"))
      .agg(count(lit(1)).as("n"))
    keySkewCardOfCounts(counts, col("stratum"), col("k"), col("n"),
      topK)
  }

  /** The card body over a PRE-AGGREGATED per-(stratum, key) counts
    * frame — the shared core of [[keySkewCard]]/[[keySkewCardBy]] and
    * the streaming monitor's foreachBatch epilogue (whose finalized
    * windows arrive already counted). `counts` must carry one row per
    * (group, key). */
  def keySkewCardOfCounts(countsDf: DataFrame, group: Column,
      key: Column, n: Column, topK: Int = 10): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    // null -> Long.MinValue: the TopKAggregator's typed input is a
    // non-nullable long, and a diagnostic that CRASHES on the
    // null-keyed pipeline it should be describing is useless. But a
    // NON-null key that fails the long cast (a string IP, an email —
    // the reference's actual hot-key types) must be LOUD, not merged:
    // under non-ANSI cast it would silently null out and every key
    // would collapse onto the sentinel — the card reporting one giant
    // hot key that does not exist. try_cast funnels ANSI and non-ANSI
    // into the same explicit error (the hashReservoir id contract);
    // string-keyed pipelines pass xxhash64(key) and join the identity
    // back if they need it.
    val counts = countsDf.select(group.as("stratum"),
      checkedKey(key).as("k"), n.cast("long").as("n"))
    val topk = udaf(new graft.functions.TopKAggregator(topK))
    // totals + deterministic top-k loads (count desc, key asc — the
    // aggregator's own total order; counts are exact in double far
    // past any real corpus) in one bounded pass per stratum
    val tops = counts.groupBy(col("stratum")).agg(
      sum(col("n")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      topk(col("k"), col("n").cast("double")).as("top"))
    val quant = TextAnalysis.integerQuantiles(counts, col("stratum"),
        col("n"), qs = Seq(50, 99))
      .select(col("stratum"), col("mean_v").as("mean_count"),
        col("p50").as("p50_count"), col("p99").as("p99_count"))
    tops.join(broadcast(quant), Seq("stratum"))
      .select(col("stratum"), col("n_rows"), col("n_keys"),
        expr("CAST(element_at(top.items, 1).cosine AS BIGINT)")
          .as("max_count"),
        expr("element_at(top.items, 1).vecId").as("hot_key"),
        expr("CAST(aggregate(top.items, CAST(0 AS DOUBLE)," +
          " (acc, x) -> acc + x.cosine) AS BIGINT)").as("top_n"),
        col("mean_count"), col("p50_count"), col("p99_count"))
      .select(col("stratum"), col("n_rows"), col("n_keys"),
        col("max_count"), col("hot_key"), col("mean_count"),
        col("p50_count"), col("p99_count"),
        expr("max_count * 1000000 DIV n_rows").as("hot_share_ppm"),
        // fold against the FLOORED fair share, not against the ppm
        // share: (share_ppm * n_keys) quantizes in steps of
        // n_keys/1000 and reads 0 for any fold under cardinality/1000
        // — at 1e8 keys a 50x-hot key would vanish. Dividing by
        // n_rows DIV n_keys (>= 1 since every counted key has >= 1
        // row) keeps the signal at every cardinality and stays inside
        // int64 for any max_count a real corpus can hold
        expr("max_count * 1000 DIV (n_rows DIV n_keys)")
          .as("hot_fold_x1000"),
        expr("top_n * 1000000 DIV n_rows").as("top10_share_ppm"))
  }

  /** The card's key contract as a column: null keys count under the
    * reserved key Long.MinValue (the diagnostic is TOTAL — it must
    * not crash or drop on a null-keyed pipeline), while a NON-null
    * key that fails the long cast raises with the remediation —
    * under non-ANSI semantics a silent null would merge every key
    * onto the sentinel and fabricate a giant hot key. try_cast
    * funnels ANSI and non-ANSI into the same explicit error (the
    * hashReservoir id-contract idiom). */
  private def checkedKey(key: Column): Column = {
    val kl = key.try_cast("long")
    when(key.isNull, lit(Long.MinValue))
      .otherwise(when(kl.isNull,
        raise_error(concat(
          lit("keySkewCard: key must cast to long (map string keys " +
            "through xxhash64 first), got "), key.cast("string")))
        .cast("long"))
        // the sentinel is reserved by CONVENTION only: a genuine
        // Long.MinValue key would silently alias the null bucket —
        // two n_keys rows sharing one hot_key value, an ambiguous
        // card — so it gets the same loud refusal as a non-castable
        // key (remap, e.g. xxhash64 the key, and rerun)
        .otherwise(when(kl === lit(Long.MinValue),
          raise_error(lit("keySkewCard: key Long.MinValue collides " +
            "with the reserved null sentinel (remap keys, e.g. " +
            "through xxhash64)")).cast("long"))
          .otherwise(kl)))
  }

  /** The actionable complement of [[keySkewCard]]: the top-k keys
    * THEMSELVES, one row each — (rank, hot_key, n, share_ppm). The
    * card says "this stream is in the hot-key regime"; this list
    * names the keys, which is what an operator actually acts on (the
    * NAT exemption list, the bot accounts to quarantine, the keys a
    * salted join spreads). Same scale shape as the card: one
    * partial-agg shuffle to per-key counts, then the bounded
    * [[graft.functions.TopKAggregator]] (<= k rows per map task, no
    * sort of the counts frame), posexploded declaratively. Ties rank
    * deterministically (count desc, key asc). */
  def hotKeys(df: DataFrame, key: Column, k: Int = 10): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val counts = df.groupBy(key.as("k0")).agg(count(lit(1)).as("n"))
    val topk = udaf(new graft.functions.TopKAggregator(k))
    counts.agg(
        sum(col("n")).as("total"),
        topk(checkedKey(col("k0")), col("n").cast("double")).as("top"))
      .select(col("total"), posexplode(col("top.items")))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("col.vecId").as("hot_key"),
        expr("CAST(col.cosine AS BIGINT)").as("n"),
        expr("CAST(col.cosine AS BIGINT) * 1000000 DIV total")
          .as("share_ppm"))
  }

  /** Execution path for a per-key-serial operator: the single-sort
    * analytic form or its slice-and-mend sharded twin (both
    * oracle-identical — q169/q171/q172/q173/q176 share the analytic
    * queries' oracles verbatim, so the choice is pure performance). */
  sealed abstract class SerialPath
  object SerialPath {
    case object Analytic extends SerialPath
    case object Sharded extends SerialPath
  }

  /** The per-key-serial operator family with measured crossovers
    * (SCALING.md rounds 15–16, min-of-2 skew probes at 10M events):
    * each member carries the skew-card reading at which its sharded
    * twin starts winning.
    *
    *  - `shareCrossoverPpm`: the hot key's share of all rows at the
    *    measured flip point. Sessions/relay/sequence win 1.6–2.3× at
    *    the 50 %-hot key and cost 1.5–2.3× balanced; the crossover
    *    sits near the ~300 ‰ point the salted-join probe measured
    *    for the same straggler shape (dead heat at both ends).
    *    Alias-abuse measured the OTHER way (analytic 1.27× under the
    *    50 % key vs the sharded form's higher fixed cost at every
    *    point — its plan is aggregation-dominated, not sort-bound),
    *    so its crossover is unreachable: never flip on share alone.
    *  - `foldFloorX1000`: hot_fold_x1000 must ALSO read hot (≥ 10×
    *    the fair share — "in the thousands", the r15 deployment
    *    rule). This guards the tiny-cardinality corner: at 2 keys a
    *    50 % share IS the fair share (fold ≈ 1000, nothing to
    *    shard), and share alone would flip it. */
  sealed abstract class SerialOp(val shareCrossoverPpm: Long,
    val foldFloorX1000: Long)
  object SerialOp {
    /** [[Sessionize.assignSessions]] → `assignSessionsSharded` /
      * `sessionSummarySharded` / `sessionLimitSharded`. */
    case object Sessions extends SerialOp(300000L, 10000L)
    /** [[CustomsDetectors.privateRelayForward]] → `...Sharded`. */
    case object RelayScan extends SerialOp(300000L, 10000L)
    /** [[Heuristics.sequenceAbuse]] → `sequenceAbuseSharded`. */
    case object SequenceAbuse extends SerialOp(300000L, 10000L)
    /** `Heuristics.fxaAccountAbuseAlias` — the measured "don't flip"
      * member: the sharded twin (q176) exists for the far tail, but
      * no measured card reading justifies it, so the evidence-driven
      * chooser never returns Sharded for it (flip manually only if a
      * flood concentrates FAR past 50 % on one account and the
      * card's fold keeps climbing — SCALING.md r16 addendum). */
    case object AliasAbuse extends SerialOp(Long.MaxValue, Long.MaxValue)
  }

  /** Evidence-driven path selection for the per-key-serial family:
    * maps a [[keySkewCard]] reading to analytic/sharded per the
    * measured crossovers, so an operator flips on the card instead
    * of a human reading SCALING.md. Pure core — the frame adapter
    * below reads the card row. */
  def choosePath(hotSharePpm: Long, hotFoldX1000: Long,
      op: SerialOp): SerialPath =
    if (hotSharePpm >= op.shareCrossoverPpm &&
        hotFoldX1000 >= op.foldFloorX1000) SerialPath.Sharded
    else SerialPath.Analytic

  /** [[choosePath]] over the card frame itself ([[keySkewCard]]'s
    * one-row output; the card is a bounded diagnostic, so the
    * collect is the budgetSelect class). An empty card (empty
    * corpus) or a multi-row frame (a per-stratum card — ambiguous:
    * which stratum governs?) is refused loudly rather than guessed. */
  def choosePath(card: DataFrame, op: SerialOp): SerialPath = {
    val rows = card.select(col("hot_share_ppm").cast("long"),
      col("hot_fold_x1000").cast("long")).collect()
    require(rows.length == 1,
      s"choosePath expects the one-row global skew card, got " +
        s"${rows.length} rows (pass one stratum of a keySkewCardBy)")
    choosePath(rows(0).getLong(0), rows(0).getLong(1), op)
  }
}
