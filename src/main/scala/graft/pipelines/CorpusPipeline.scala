package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Composed training-data curation pipeline — the C4-shaped chain a
  * corpus build runs end-to-end: quality gate (length / stopword /
  * token heuristics) -> language/class ID (marker scoring) -> exact
  * dedup survivor selection. Each stage is an existing operator; the
  * composition stays one declarative plan, so Catalyst fuses the
  * per-doc projections and the only shuffles are the dedup hash
  * aggregate and the per-doc joins (all keyed on doc_id; AQE
  * broadcasts the small sides at bench scale).
  *
  * Scale: every stage is linear in the corpus with keyed shuffles
  * only — the same shapes proven individually by q15/q22/q23. At
  * 100 TB the dedup aggregate shuffles 32-byte md5 keys, never text,
  * and the doc_id joins co-locate if the corpus is bucketed by
  * doc_id (Sinks.writeBucketed). */
object CorpusPipeline {

  /** Curate: quality-passing, deduplicated documents with their
    * predicted class. Output: (doc_id, pred_class, n_tokens,
    * n_copies) — one row per surviving document. */
  def curate(df: DataFrame, id: Column, text: Column,
      markers: Map[String, Seq[String]]): DataFrame = {
    val quality = TextAnalysis.qualityScore(df, id, text)
      .filter(col("quality_ok"))
      .select(col("doc_id"), col("n_tokens"))
    val classed = TextAnalysis.classifyByMarkers(df, id, text, markers)
      .select(col("doc_id"), col("pred_class"))
    val survivors = df
      .select(id.as("doc_id"), md5(text).as("text_hash"))
      .join(Dedup.exactDedup(df, id, text), Seq("text_hash"))
      .filter(col("doc_id") === col("canonical_id"))
      .select(col("doc_id"), col("n_copies"))
    quality.join(classed, Seq("doc_id"))
      .join(survivors, Seq("doc_id"))
      .select(col("doc_id"), col("pred_class"), col("n_tokens"),
        col("n_copies"))
  }

  /** Streaming corpus ingestion — the same curation discipline over a
    * live document stream (the shape of a crawl-ingest pipeline that
    * cleans as it lands rather than in a nightly batch):
    *
    *  1. PII scrub FIRST — a map-only projection, so redacted text is
    *     the only text any later stage (or state store) ever holds;
    *  2. quality gate ([[TextAnalysis.qualityOk]] — the batch gate's
    *     thresholds, by construction);
    *  3. exact dedup within the watermark
    *     ([[graft.streaming.Streaming.dedupStream]]:
    *     `dropDuplicatesWithinWatermark` on the content hash — state
    *     is one md5 per kept doc and ages out with the watermark).
    *
    * Emits an append stream of (ts, doc_id, scrubbed) — every row is
    * quality-passing, PII-redacted and the first copy of its content
    * within the watermark horizon. Scale: stages 1-2 are stateless
    * projections fused into the stream scan; the only state is the
    * dedup hash set, bounded by the watermark delay. */
  def curateStream(docs: DataFrame, tsName: String, id: Column,
      text: Column, watermarkDelay: String): DataFrame = {
    val scrubbed = TextAnalysis.PiiPatterns.foldLeft(text) {
      case (t, (name, pat)) =>
        regexp_replace(t, pat, s"[${name.toUpperCase}]")
    }
    val base = docs.select(col(tsName), id.as("doc_id"),
        scrubbed.as("scrubbed"))
      .filter(TextAnalysis.qualityOk(col("scrubbed")))
    graft.streaming.Streaming
      .dedupStream(base, tsName, col("scrubbed"), watermarkDelay)
      .select(col(tsName), col("doc_id"), col("scrubbed"))
  }
}
