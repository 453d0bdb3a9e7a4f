package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch smoke-runner: runs named SparkEntry queries against a SF dir
  * and shows the first rows. Throwaway ad-hoc tool (test sourceset). */
object ScratchRunQuery {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args.drop(1)) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sf)
      df.show(20, false)
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
