package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables

/** 10× stress probe for the round-14 telemetry wave: OOV rate (q133),
  * n-gram diversity (q134), Zipf slope (q135), canonical-representative
  * dedup (q51b) and embedding coherence (q136). Same shifted-copy
  * inflation as StressProbe10x/Wave2-4 (copy 0 unperturbed, later
  * copies word-shifted text / perturbed embeddings; test sourceset,
  * never ships). The fixture's token vocabulary is constant across
  * copies (31 types), so — as with Wave4 — the vocabulary-bounded terms
  * (top-V cut, rank windows, OLS sums) are trivially constant and what
  * the probe genuinely measures is the corpus-proportional token/gram
  * passes. q51b is expected to inherit q51's duplicate-mass growth
  * (copies share most shingles — pair work ∝ duplicate mass, the
  * documented stress term, NOT corpus-quadratic behavior).
  *
  * Run: sbt "Test/runMain graft.tools.StressProbeWave5 /root/testdata/sf0.1"
  */
object StressProbeWave5 {
  val docQueries = Seq("q133_oov_rate", "q134_ngram_diversity",
    "q135_zipf_slope", "q51b_canonical_keep")
  val embQueries = Seq("q136_embedding_coherence")

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
        .createTempDirectory(s"graft_stress_w5_${copies}x").toString
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
      for (name <- docQueries ++ embQueries) {
        val reps = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(name)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$name min=${reps.min}%.3f reps=${reps.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
