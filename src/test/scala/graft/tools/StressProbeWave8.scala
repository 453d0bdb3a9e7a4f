package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables

/** 10× stress probe for the round-15 graph/interval wave: triangle
  * census (q151), k-core (q153), assortativity (q154) on the
  * shifted-copy document inflation (Wave6 synthesis), and the
  * interval-overlap join (q155) on a user-inflated events table
  * (10× users → ~10× sessions; cross-user overlap pairs grow with the
  * CONCURRENCY density, which this inflation raises honestly — the
  * output IS bigger). Test sourceset, never ships.
  *
  * Run: sbt "Test/runMain graft.tools.StressProbeWave8 /root/testdata/sf0.1"
  */
object StressProbeWave8 {
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
        .createTempDirectory(s"graft_stress_w8_${copies}x").toString
      val docs0 = Tables.load(spark, sf, "documents")
      (0 until copies).map { c =>
        docs0.withColumn("doc_id", col("doc_id") + lit(c * 1000000L))
          .withColumn("text",
            if (c == 0) col("text")
            else regexp_replace(col("text"), "^(\\S+\\s+){" + c + "}", ""))
      }.reduce(_ unionByName _)
        .repartition(32).write.parquet(s"$dir/documents.parquet")
      val ev0 = Tables.load(spark, sf, "events")
      (0 until copies).map { c =>
        ev0.withColumn("user_id", col("user_id") + lit(c * 1000000L))
          .withColumn("event_id", col("event_id") + lit(c * 100000000L))
      }.reduce(_ unionByName _)
        .repartition(32).write.parquet(s"$dir/events.parquet")
      dir
    }

    val rows = Seq("q151_triangle_census", "q153_kcore",
      "q154_degree_assortativity", "q155_interval_overlap")
    for (copies <- Seq(1, 10)) {
      val dir = stage(copies)
      println(s"=== copies=$copies dir=$dir ===")
      for (name <- rows) {
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
