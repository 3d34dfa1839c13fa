package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators._

/** Stage-level profiler for the bench hot list — times sub-frames of
  * the slow queries so optimization targets measurements, not guesses.
  * Not part of the driver contract. */
object Profile {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  -> $r")
    r
  }

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
    t("docs.count")(docs.count())

    // q16 stages
    val sh = Dedup.explodedShingles(docs, col("doc_id"), col("text"), 3)
    t("explodedShingles")(sh.count())
    t("q16 full (sh cached)") {
      Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), 3, 0.5).count()
    }
    sh.unpersist()
    t("q16 cold") {
      val r = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), 3, 0.5).count()
      spark.catalog.clearCache(); r
    }

    // q16 variants
    t("q16 no-persist") {
      val r = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), 3, 0.5,
        0, org.apache.spark.storage.StorageLevel.NONE).count()
      spark.catalog.clearCache(); r
    }
    t("q16 collect_list") {
      val shn = Dedup.explodedShingles(docs, col("doc_id"), col("text"), 3,
        org.apache.spark.storage.StorageLevel.NONE)
      val sizes = shn.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      val grouped = shn.groupBy(col("s"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1)
      val r = grouped
        .select(explode(col("ids")).as("doc_a"), col("ids"))
        .select(col("doc_a"), explode(col("ids")).as("doc_b"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("shared"))
        .join(sizes.toDF("doc_a", "n_a"), Seq("doc_a"))
        .join(sizes.toDF("doc_b", "n_b"), Seq("doc_b"))
        .withColumn("jaccard", col("shared") / (col("n_a") + col("n_b") - col("shared")))
        .filter(col("jaccard") >= 0.5).count()
      spark.catalog.clearCache(); r
    }

    // q53 stages
    val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), 3, 0.5)
      .persist()
    t("pairs for cc")(pairs.count())
    t("cc only")(Dedup.nearDupClusters(pairs, col("doc_a"), col("doc_b")).count())
    // instrumented CC: how many rounds, cost per round?
    locally
    {
      import spark.implicits._
      val fwd = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().persist()
      var labels = edges.select(col("src").as("v")).distinct()
        .withColumn("label", col("v")).localCheckpoint(true)
      var changed = 1L; var iter = 0
      while (changed > 0 && iter < 25) {
        val t0 = System.nanoTime()
        val neighborMin = edges
          .join(labels.withColumnRenamed("v", "dst"), Seq("dst"))
          .groupBy(col("src").as("v")).agg(min(col("label")).as("nmin"))
        val acc = spark.sparkContext.longAccumulator("cc_changed")
        val next = labels.withColumnRenamed("label", "old")
          .join(neighborMin, Seq("v"), "left")
          .select(col("v"), col("old"),
            least(col("old"), coalesce(col("nmin"), col("old"))).as("label"))
          .as[(Long, Long, Long)]
          .map { r => if (r._2 != r._3) acc.add(1L); (r._1, r._3) }
          .toDF("v", "label").localCheckpoint(true)
        changed = acc.value; labels = next; iter += 1
        println(f"PROF   cc round $iter%2d changed=$changed%6d ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      }
      edges.unpersist()
    }
    pairs.unpersist(); spark.catalog.clearCache()

    // q33 variants
    val c = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_mktsegment"), col("c_name"))
    val a = c.toDF("nk", "seg", "name_a"); val b = c.toDF("nk", "seg", "name_b")
    t("q33 current") {
      a.join(b, Seq("nk", "seg"))
        .filter(col("name_a") < col("name_b") &&
          levenshtein(col("name_a"), col("name_b")) <= 3)
        .groupBy(col("nk"), col("seg")).agg(count(lit(1))).count()
    }
    t("q33 threshold") {
      a.join(b, Seq("nk", "seg"))
        .filter(col("name_a") < col("name_b") &&
          levenshtein(col("name_a"), col("name_b"), 3) <= 3)
        .groupBy(col("nk"), col("seg")).agg(count(lit(1))).count()
    }

    // q41 stages
    val emb = Tables.embeddings(spark, sfDir)
    t("emb.count")(emb.count())
    t("q41 full") {
      Similarity.ivfTopK(emb, col("vec_id"), col("embedding"),
        Seq(0L, 1L, 2L, 3L, 4L), 5).count()
    }
    spark.catalog.clearCache()
    t("q41 again") {
      Similarity.ivfTopK(emb, col("vec_id"), col("embedding"),
        Seq(0L, 1L, 2L, 3L, 4L), 5).count()
    }
    spark.catalog.clearCache()
    // q41 sub-stages
    locally
    {
      val base = emb.select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
        .withColumn("nrm", Similarity.dotQ(col("qv"), col("qv")))
      t("q41 base only")(base.count())
      val cents = base.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cent_id"), col("qv").as("c_qv"), col("nrm").as("c_nrm"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
        .orderBy(col("c_cos").desc, col("cent_id").asc)
      val assigned = base.crossJoin(broadcast(cents))
        .withColumn("c_cos", Similarity.dotQ(col("qv"), col("c_qv")) /
          sqrt((col("nrm") * col("c_nrm")).cast("double")))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("vec_id"), col("qv"), col("nrm"), col("cent_id").as("cell"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("q41 assigned")(assigned.count())
      t("q41 assigned 2nd")(assigned.count())
      assigned.unpersist()
    }

    // q52 / q40 for reference
    t("q40 hll") {
      graft.operators.Heuristics.distinctCardinality(Tables.events(spark, sfDir),
        col("ts"), col("user_id"), col("event_type"), "1 day", 1, 0.02).count()
    }
    spark.stop()
  }
}
