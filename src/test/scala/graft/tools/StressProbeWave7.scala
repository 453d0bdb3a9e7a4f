package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Dedup

/** Duplicate-mass stress probe for the round-15 additions: the
  * exact-threshold prefix Jaccard join (q146) and the integer-micros
  * k-means trainer (q147). Test sourceset, never ships.
  *
  * q146 probes on a GROUP-PRIVATE-VOCABULARY synthesis, not the raw
  * shifted-copy corpus of Wave2-6: the driver fixture is deliberately
  * token-dense (at t = 0.8 MOST cross-document pairs genuinely
  * qualify — sf0.1 already emits ~12M true pairs), so inflating it 10×
  * would measure the fixture's quadratic ground-truth mass, not the
  * operator. Here every token is prefixed with its ORIGINAL doc id, so
  * documents from different originals share nothing and the qualifying
  * mass is exactly the within-group copy pairs — duplicate mass under
  * experimental control. Copies are word-shifted (shift k keeps
  * J ≈ (n−k)/n ≥ 0.8), so `copies` dials C(copies, 2) true pairs per
  * original: copies 3 → 10 grows the pair mass 15× while the corpus
  * grows 3.3×. The honest question the probe answers: does runtime
  * track the PAIR mass (the output any exact join must emit) while the
  * prefix screen's over-generation (candidates / qualifying) stays
  * pinned, and does candidates / all-pairs stay ≪ 1 (the pruning
  * claim in the operator scaladoc)?
  *
  * q147 inflates embeddings by id-offset copies — identical vectors,
  * unchanged cluster geometry, 10× member mass — so its n×k
  * distance+mean shape should grow ~linearly.
  *
  * Run: sbt "Test/runMain graft.tools.StressProbeWave7 /root/testdata/sf0.1"
  */
object StressProbeWave7 {

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

    // shifted copies with a per-original private vocabulary
    def privateCorpus(copies: Int) = {
      val docs0 = Tables.load(spark, sf, "documents")
        .select(col("doc_id"), col("text"))
      (0 until copies).map { c =>
        docs0.withColumn("text",
            if (c == 0) col("text")
            else regexp_replace(col("text"), "^(\\S+\\s+){" + c + "}", ""))
          .withColumn("text", array_join(
            transform(split(col("text"), "\\s+"),
              t => concat_ws("_", col("doc_id").cast("string"), t)), " "))
          .withColumn("doc_id", col("doc_id") + lit(c * 1000000L))
      }.reduce(_ unionByName _).repartition(32)
    }

    for (copies <- Seq(3, 10)) {
      val docs = privateCorpus(copies).cache()
      val n = docs.count()
      println(s"=== q146 probe: copies=$copies docs=$n ===")
      val cand = Dedup.jaccardPrefixCandidates(docs, "text", "doc_id", 0.8)
        .count()
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val out = Dedup.jaccardJoinPrefix(docs, "text", "doc_id", 0.8).count()
        ((System.nanoTime() - t0) / 1e9, out)
      }
      val out = reps.head._2
      println(f"prefix_candidates=$cand qualifying=$out " +
        f"all_pairs=${n * (n - 1) / 2} " +
        f"cand_over_out=${cand.toDouble / math.max(out, 1)}%.2f " +
        f"cand_over_allpairs=${cand.toDouble / (n * (n - 1) / 2)}%.6f " +
        f"min=${reps.map(_._1).min}%.3f")
      docs.unpersist()
    }

    for (copies <- Seq(1, 10)) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_stress_w7_${copies}x").toString
      val emb0 = Tables.load(spark, sf, "embeddings")
      (0 until copies).map { c =>
        emb0.withColumn("vec_id", col("vec_id") + lit(c * 1000000L))
      }.reduce(_ unionByName _)
        .repartition(32).write.parquet(s"$dir/embeddings.parquet")
      println(s"=== q147 probe: copies=$copies ===")
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries("q147_kmeans_telemetry")(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"q147_kmeans_telemetry min=${reps.min}%.3f " +
        f"reps=${reps.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
