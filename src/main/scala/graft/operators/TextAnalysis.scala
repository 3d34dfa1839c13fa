package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token
  * statistics, quality scoring, marker-based language/class scoring and
  * document fingerprinting. All pure Column compositions (codegen'd,
  * no UDFs); ratios are single IEEE divisions of exact integers so
  * results are engine-portable bit-for-bit.
  *
  * Scale: each operator is a narrow projection or one hash-aggregate;
  * nothing shuffles more than (doc_id-keyed) aggregates.
  */
object TextAnalysis {

  /** Whitespace tokens of the lower-cased text, empties dropped. */
  def tokens(text: Column): Column = Dedup.tokens(text)

  /** Per-doc token statistics: total tokens, distinct tokens (types)
    * and type/token ratio. */
  def tokenStats(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), tokens(text).as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_tokens"),
        size(array_distinct(col("ws"))).cast("long").as("n_types"))
      .withColumn("ttr", col("n_types") / col("n_tokens"))

  /** BPE-ish subword-unit count: runs of letters, runs of digits, or a
    * single other non-space char each count as one unit — a cheap,
    * deterministic proxy for tokenizer cost. */
  def unitCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
      .cast("long")

  /** Demo stopword list over the corpus vocabulary. */
  val Stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in")

  /** Per-doc quality heuristics: char/token counts, stopword ratio,
    * mean token length, and a boolean gate combining them (the shape of
    * C4/Gopher-style quality filters). */
  def qualityScore(df: DataFrame, id: Column, text: Column,
      stopwords: Seq[String] = Stopwords): DataFrame = {
    val sw = typedLit(stopwords)
    df.select(id.as("doc_id"), length(text).cast("long").as("n_chars"),
        tokens(text).as("ws"), unitCount(text).as("n_units"))
      .select(col("doc_id"), col("n_chars"), col("n_units"),
        size(col("ws")).cast("long").as("n_tokens"),
        size(filter(col("ws"), t => array_contains(sw, t))).cast("long")
          .as("n_stop"))
      .withColumn("stop_ratio", col("n_stop") / col("n_tokens"))
      .withColumn("mean_token_len",
        (col("n_chars") - (col("n_tokens") - 1)) / col("n_tokens"))
      .withColumn("quality_ok",
        col("n_tokens") >= 10 && col("stop_ratio") >= 0.01 &&
          col("stop_ratio") <= 0.6 && col("mean_token_len") <= 12.0)
  }

  /** Marker-based class scoring (the n-gram-list language-ID shape):
    * score(class) = matching tokens / total tokens; winner = argmax
    * with deterministic tie-break on class name. `markers` maps class
    * name -> marker token list. */
  def classifyByMarkers(df: DataFrame, id: Column, text: Column,
      markers: Map[String, Seq[String]]): DataFrame = {
    val base = df.select(id.as("doc_id"), tokens(text).as("ws"))
      .withColumn("n_tokens", size(col("ws")).cast("long"))
    val scored = markers.toSeq.sortBy(_._1).map { case (cls, words) =>
      base.select(col("doc_id"), lit(cls).as("class"),
        (size(filter(col("ws"), t => array_contains(typedLit(words), t)))
          .cast("long") / col("n_tokens")).as("score"))
    }.reduce(_.unionAll(_))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("class").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("class").as("pred_class"), col("score"))
  }

  /** Content-defined document fingerprint: md5 of the sorted distinct
    * token set — invariant to word order and duplication, the cheap
    * "bag-of-words hash" dedup key. */
  def fingerprint(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"),
      md5(array_join(array_sort(array_distinct(tokens(text))), " "))
        .as("fp"))
}
