package graft.operators

import org.apache.spark.sql.DataFrame
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
}
