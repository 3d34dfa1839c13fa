package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Synthetic corpus scaler for the empirical scale probe
  * (tools/scale_probe.sh): replicates the sf0.1 documents and
  * embeddings tables k-fold so the heavy dedup/ANN/curation family
  * can be timed at 1x/3x/10x and its scaling exponents measured
  * rather than argued from plan shape.
  *
  * Replication discipline — the point is that a k-fold corpus should
  * carry ~k-fold near-dup STRUCTURE, not the same structure k times
  * deeper: a naive copy would hand every document k exact twins and
  * turn every pair-family query quadratically heavier BY DATA (a
  * 10-clique per original doc), which measures the corpus, not the
  * engine. So each copy is made pairwise-dissimilar to the others:
  *  - documents: every whitespace token gets a per-copy suffix
  *    (`word` -> `word_c3`), which preserves intra-copy relationships
  *    exactly (similar docs stay similar under the same per-token
  *    rewrite) while cross-copy shingle/line/chunk overlap drops to
  *    ~zero — each copy contributes its own dup clusters;
  *  - embeddings: a per-copy cyclic shift of the vector components —
  *    an isometry, so intra-copy distances are untouched, while
  *    cross-copy cosines fall to the random-vector baseline.
  * Copy 0 is byte-identical to the source, so the 1x dir is the
  * original data re-laid-out by the same writer (like-for-like
  * timing).
  *
  * Usage: runMain graft.ScaleGen <srcSfDir> <outDir> <k>
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleGen <srcSfDir> <outDir> <k>")
    val Array(srcDir, outDir, kStr) = args
    val k = kStr.toInt
    require(k >= 1, "k must be >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val copies = broadcast(spark.range(k).select(col("id").as("copy")))

    val docs = sources.Tables.documents(spark, srcDir)
    docs.crossJoin(copies)
      .select(
        (col("doc_id") + col("copy") * 10000000L).as("doc_id"),
        when(col("copy") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1_c"), col("copy")))).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(4 * k)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val emb = sources.Tables.embeddings(spark, srcDir)
    emb.crossJoin(copies)
      .select(
        (col("vec_id") + col("copy") * 10000000L).as("vec_id"),
        expr("transform(embedding, (x, i) -> " +
          "element_at(embedding, (CAST(i + copy AS INT) % " +
          "size(embedding)) + 1))").as("embedding"),
        col("label"))
      .repartition(2 * k)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    println(s"[scalegen] wrote ${k}x corpus to $outDir")
    spark.stop()
  }
}
