package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators._

/** Finer-grained warm-JVM profile of the shingle pipeline. */
object Profile2 {
  import Profile.t

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    t("warmup emb")(Tables.embeddings(spark, sfDir).count())
    t("docs.count 1")(docs.count())
    t("docs.count 2")(docs.count())
    t("docs text len sum")(docs.select(sum(length(col("text")))).collect()(0).getLong(0))
    val tok = docs.select(col("doc_id"), Dedup.tokens(col("text")).as("ws"))
    t("tokens count 1")(tok.select(sum(size(col("ws")))).collect()(0).getLong(0))
    t("tokens count 2")(tok.select(sum(size(col("ws")))).collect()(0).getLong(0))
    val raw = tok.filter(size(col("ws")) >= 3)
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(1), size(col("ws")) - 2)).as("i"))
      .select(col("doc_id"),
        concat_ws(" ", (0 until 3).map(k => element_at(col("ws"), col("i") + k)): _*).as("s"))
    t("raw shingles 1")(raw.count())
    t("raw shingles 2")(raw.count())
    val dd = raw.dropDuplicates("doc_id", "s")
    t("dedup shingles 1")(dd.count())
    t("dedup shingles 2")(dd.count())
    val sh = Dedup.explodedShingles(docs, col("doc_id"), col("text"), 3)
    t("persist build")(sh.count())
    t("read from cache")(sh.count())
    val a = sh.select(col("doc_id").as("doc_a"), col("s"))
    val b = sh.select(col("doc_id").as("doc_b"), col("s"))
    t("self join agg") {
      a.join(b, Seq("s")).filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1))).count()
    }
    t("self join agg 2") {
      a.join(b, Seq("s")).filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1))).count()
    }
    t("q16 warm full") {
      Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), 3, 0.5,
        0, org.apache.spark.storage.StorageLevel.NONE).count()
    }
    spark.stop()
  }
}
