package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus curation operators. Every published CommonCrawl-derived
  * training set (CCNet, C4, RefinedWeb, FineWeb) starts with URL-level
  * filtering against domain blocklists (UT1-style adult/malware lists,
  * multi-million entries) before any content is fetched or scored —
  * at 100 TB this must be a projection-narrow join, never a per-row
  * regex scan over the list.
  */
object Curation {

  /** All label suffixes of `host`, e.g. `a.b.com` → [com, b.com,
    * a.b.com]. The transform lambda runs interpreted (HOF), but over
    * ≤ ~6 labels per row in a projection that carries only (id, host)
    * — the cost ceiling is the join it feeds, not this map. */
  private def hostSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    transform(sequence(lit(1), size(labels)),
      k => array_join(slice(labels, size(labels) - k + 1, k), "."))
  }

  /** Documents whose host matches the blocklist, with the matched
    * entry. Blocklist semantics are DOMAIN-SUFFIX on label boundaries
    * (the UT1/Public-Suffix convention): `tracker.net` blocks
    * `tracker.net` and `cdn.tracker.net`, but NOT `nottracker.net` —
    * which is why the match is an equi-join on exploded label
    * suffixes, not an `endsWith` scan (substring suffix matching gets
    * label boundaries wrong AND would force a per-row loop over the
    * list).
    *
    * Scale shape: the host column explodes to its label suffixes
    * (≤ ~6 rows per doc, codegen'd `substring_index`, doc text never
    * enters the projection) and equi-joins the blocklist on the
    * suffix string. The blocklist side carries a `broadcast` hint:
    * even UT1-sized lists (millions of entries, ~100 MB hashed)
    * broadcast far cheaper than shuffling the corpus's exploded
    * suffix rows; drop `hint` for a list too large for executor
    * memory and the same plan degrades to a keyed shuffle join. A doc
    * matching several list entries reports each match once. */
  def blockedMatches(df: DataFrame, id: Column, host: Column,
      blocklist: DataFrame, entry: Column,
      hint: Boolean = true): DataFrame = {
    val suffixes = df.select(id.as("doc_id"), host.as("host"))
      .select(col("doc_id"), col("host"),
        explode(hostSuffixes(col("host"))).as("sfx"))
    val list = blocklist.select(entry.as("sfx")).distinct()
    suffixes
      .join(if (hint) broadcast(list) else list, Seq("sfx"))
      .select(col("doc_id"), col("host"), col("sfx").as("blocked_domain"))
  }

  /** The curation filter: rows whose host matches NO blocklist entry.
    * A row is dropped when ANY of its suffixes matches, so the anti
    * condition must quantify over the whole suffix set — hence
    * matched ids first ([[blockedMatches]] semi form), then one
    * left-anti on the id. The blocked-id set is typically a small
    * fraction of the corpus, so Catalyst broadcast-anti-joins it;
    * worst case it degrades to a keyed shuffle. Keeps the full input
    * row — this is the head of a curation pipeline, everything
    * downstream sees fewer rows. */
  def filterBlockedDomains(df: DataFrame, id: Column, host: Column,
      blocklist: DataFrame, entry: Column,
      hint: Boolean = true): DataFrame = {
    val blockedIds = blockedMatches(df, id, host, blocklist, entry, hint)
      .select(col("doc_id").as("__blocked_id")).distinct()
    df.join(blockedIds, id === col("__blocked_id"), "left_anti")
  }

  /** Map-only predicate form for CONFIG-SIZED lists (hundreds of
    * entries riding in a plan literal, like the detector ignore
    * lists): true iff any label suffix of `host` is in `blocked`.
    * `arrays_overlap` against a literal array — no join, no shuffle,
    * evaluated on the scan. For corpus-scale blocklists use the
    * DataFrame form. */
  def isBlockedDomain(host: Column, blocked: Seq[String]): Column =
    arrays_overlap(hostSuffixes(host), typedLit(blocked))
}
