package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables

/** 10× probe for the round-13 late wave: bottom-k quantile sketches
  * (q123 — prefiltered window, "no corpus sort"), BPE training (q119b —
  * vocabulary-bounded, so growth should track VOCAB, which grows
  * sublinearly in corpus), length-bucketed batching (q128 — per-lang
  * rank windows, the documented exact anchor), and the curation
  * composition's doc pricing (q119d). Shifted-copy inflation of
  * documents (same method as the earlier probes; test sourceset).
  *
  * Run: sbt "Test/runMain graft.tools.StressProbeWave4 /root/testdata/sf0.1"
  */
object StressProbeWave4 {
  val queries = Seq("q123_quantile_sketch", "q119b_bpe_train_merges",
    "q119d_bpe_doc_pricing", "q128_length_bucketed_batching")

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
        .createTempDirectory(s"graft_stress_w4_${copies}x").toString
      val docs0 = Tables.load(spark, sf, "documents")
      (0 until copies).map { c =>
        docs0.withColumn("doc_id", col("doc_id") + lit(c * 1000000L))
          .withColumn("text",
            if (c == 0) col("text")
            else regexp_replace(col("text"), "^(\\S+\\s+){" + c + "}", ""))
      }.reduce(_ unionByName _)
        .repartition(32).write.parquet(s"$dir/documents.parquet")
      dir
    }

    for (copies <- Seq(1, 10)) {
      val dir = stage(copies)
      val vocab = Tables.load(spark, dir, "documents")
        .select(explode(graft.ops.TextAnalysis.tokens(lower(col("text"))))
          .as("w")).distinct().count()
      println(s"=== copies=$copies vocab=$vocab dir=$dir ===")
      for (name <- queries) {
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
