package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables

/** 10× stress probe for the round-12 second-wave rows (q112 classifier,
  * q113 audit, q115 sketches, q116 sampler, q114b label propagation) —
  * same synthetic-inflation method as StressProbe10x (shifted copies,
  * materialized as a real table dir; test sourceset, never ships).
  *
  * q114b runs twice at 10×: the registered query (cells derived from
  * corpus size via Similarity.cellCountFor — the fix this probe
  * motivated) and an explicit FIXED 8-cell leg that reproduces the
  * pathology: pair work is Σ|cell|², each cell grows 10×, measured
  * 3.6 s → 71 s. The pair demonstrates WHY the cell count must track
  * corpus size.
  *
  * Run: sbt "Test/runMain graft.tools.StressProbeWave2 /root/testdata/sf0.1"
  */
object StressProbeWave2 {
  val queries = Seq("q112_nb_quality_classifier", "q113_provenance_audit",
    "q116_stratified_sample", "q115_hll_mergeable",
    "q114b_label_propagation_blocked")

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def stage(copies: Int): String = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_stress_w2_${copies}x").toString
      val docs0 = Tables.load(spark, sf, "documents")
      (0 until copies).map { c =>
        docs0.withColumn("doc_id", col("doc_id") + lit(c * 1000000L))
          .withColumn("text",
            if (c == 0) col("text")
            else regexp_replace(col("text"), "^(\\S+\\s+){" + c + "}", ""))
      }.reduce(_ unionByName _)
        .repartition(32).write.parquet(s"$dir/documents.parquet")
      val emb0 = Tables.load(spark, sf, "embeddings")
      (0 until copies).map { c =>
        emb0.withColumn("vec_id", col("vec_id") + lit(c * 1000000L))
          .withColumn("embedding", transform(col("embedding"), (x, i) =>
            (x * (lit(1.0) + lit(0.03 * c) * (pmod(i + lit(c), lit(7)) - lit(3))))
              .cast("float")))
      }.reduce(_ unionByName _)
        .repartition(32).write.parquet(s"$dir/embeddings.parquet")
      dir
    }

    for (copies <- Seq(1, 10)) {
      val dir = stage(copies)
      val nDocs = Tables.load(spark, dir, "documents").count()
      val nEmb = Tables.load(spark, dir, "embeddings").count()
      println(s"=== copies=$copies docs=$nDocs emb=$nEmb dir=$dir ===")
      for (name <- queries) {
        val reps = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(name)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$name min=${reps.min}%.3f reps=${reps.map(t => f"$t%.2f").mkString(",")}")
      }
      // q114b with cells PINNED at the fixture's 8 — the quadratic
      // pathology the registered query's derived cell count avoids
      if (copies > 1) {
        val e = Tables.load(spark, dir, "embeddings")
        val cells = 8
        val reps = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          val cents = graft.ops.Similarity.kmeansCentroids(
            e, "embedding", "vec_id", k = cells, iters = 2)
          val edges = graft.ops.Similarity.knnGraphBlocked(
              e, "embedding", "vec_id", cents, k = 5, probes = 4, replicas = 2)
            .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
          val nodes = e.select(col("vec_id").as("node"),
            col("label").as("truth"), (col("vec_id") % 5 === 0).as("seed"))
          graft.ops.Graph.labelPropagation(
            nodes.select(col("node"),
              when(col("seed"), col("truth")).as("seed_label")),
            edges, iters = 3)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"q114b_fixed_cells(k=$cells) min=${reps.min}%.3f " +
          f"reps=${reps.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
