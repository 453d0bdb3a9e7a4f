package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timer for builder-side profiling of a pipeline under
  * optimization — not part of any suite.
  *
  * Run: sbt "Test/runMain graft.tools.PerfProbe /root/testdata/sf0.1"
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    import graft.ops.TextAnalysis
    time("tokens explode count") {
      d.select(explode(TextAnalysis.tokens(col("text"))).as("t")).count() }
    time("bigrams explode count") {
      d.select(explode(TextAnalysis.bigrams(col("text"))).as("b")).count() }
    time("bgDoc groupBy") {
      d.select(col("doc_id"), explode(TextAnalysis.bigrams(col("text"))).as("bg"))
        .groupBy("doc_id", "bg").count().count() }
    time("full bigramPerplexity") {
      TextAnalysis.bigramPerplexity(d, "text", "doc_id").count() }
    time("full bigramPerplexity 2nd") {
      TextAnalysis.bigramPerplexity(d, "text", "doc_id").count() }
    spark.stop()
  }
}
