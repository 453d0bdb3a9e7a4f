package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables

/** 10× stress probe for the round-15 winnowed-edge family: q51 (exact
  * shared-shingle edges) vs q51c (MOSS-winnowed edges) head to head on
  * the same shifted-copy inflation as StressProbe10x/Wave2-5 (copy 0
  * unperturbed, later copies word-shifted; test sourceset, never
  * ships). Both inherit the duplicate-mass pair term — copies share
  * most shingles — but the winnowed path admits only the ≈ 2/(w+1)
  * selected gram positions into the postings self-join, so the
  * quadratic term's CONSTANT drops and with it the measured 10×
  * growth factor (the verdict-r14 ask). Also reruns q134 (the Wave5
  * rotation item: its growth must stay linear-by-shape; a gram-builder
  * regression shows up as a growth change here before any band
  * breach).
  *
  * Run: sbt "Test/runMain graft.tools.StressProbeWave6 /root/testdata/sf0.1"
  */
object StressProbeWave6 {
  val docQueries = Seq("q51_dedup_clusters", "q51c_dedup_clusters_winnowed",
    "q51e_dedup_clusters_lsh", "q134_ngram_diversity")

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
        .createTempDirectory(s"graft_stress_w6_${copies}x").toString
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
      val nDocs = Tables.load(spark, dir, "documents").count()
      println(s"=== copies=$copies docs=$nDocs dir=$dir ===")
      for (name <- docQueries) {
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
