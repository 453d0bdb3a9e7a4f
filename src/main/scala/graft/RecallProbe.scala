package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Similarity

/** TEMPORARY tuning probe (round 7): prints recall@10 of the LSH / IVF
  * ANN paths vs brute force across parameter grids, on each sf dir.
  * Deleted once floors are pinned.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val embeds = Tables.load(spark, sf, "embeddings").cache()
      val queries = embeds.filter(col("vec_id") < 5)
      val K = 10
      val brute = Similarity.bruteForceTopK(
        embeds, queries, "vec_id", "embedding", "vec_id", "embedding", K).cache()
      val bruteN = brute.count()

      def recall(approx: DataFrame): Double = {
        val hits = brute.select("query_id", "neighbor_id")
          .join(approx.select("query_id", "neighbor_id"), Seq("query_id", "neighbor_id"))
          .count()
        hits.toDouble / bruteN
      }

      println(s"=== $sf (n=${embeds.count()}) ===")
      val n = embeds.count()
      for (cells <- Seq(10, 20); nprobe <- Seq(4, 6, 8)) {
        val stride = math.max(1L, n / cells).toInt
        val r = recall(Similarity.ivfTopK(embeds, queries,
          "vec_id", "embedding", "vec_id", "embedding", K, stride, nprobe))
        println(f"IVF cells=$cells (stride=$stride) nprobe=$nprobe recall=$r%.3f")
      }
      embeds.unpersist(); brute.unpersist()
    }
    spark.stop()
  }
}
