package graft

import org.apache.spark.sql.SparkSession

/** Single-query bench probe: times ONE registered query for N reps and
  * prints every rep — the drill-down companion to [[Bench]] (which
  * reports only the interleaved min). Used to separate genuine plan
  * regressions from machine-load noise when a headline number drifts.
  *
  * Usage: runMain graft.BenchOne <query_name> [reps=5]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // mirror Bench's session exactly (r21): shuffled-hash join where
      // the planner's size conditions fit — see the Bench.scala note
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val times = (1 to reps).map(_ => force())
    println(f"""{"query":"$name","reps":[${times.map(t => f"$t%.3f").mkString(",")}],"min":${times.min}%.3f}""")
    spark.stop()
  }
}
