package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables

/** 10× probe for the span-dedup pair: exact positional-gram counting
  * (q104) vs the winnowed sparse path (q104b). The claim under test is
  * the ratio's DIRECTION at scale — the winnowed path shuffles
  * ≈ 2/(w+1) of the gram positions, so its advantage should widen as
  * the gram stream grows. Shifted-copy inflation (documents only; same
  * method as the other probes; test sourceset, never ships).
  *
  * Run: sbt "Test/runMain graft.tools.StressProbeSpans /root/testdata/sf0.1"
  */
object StressProbeSpans {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def stage(copies: Int): String = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_stress_sp_${copies}x").toString
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
      println(s"=== copies=$copies dir=$dir ===")
      for (name <- Seq("q104_duplicated_spans",
          "q104b_duplicated_spans_winnowed")) {
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
