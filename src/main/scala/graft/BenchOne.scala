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
    // Bench's exact session, by construction (shared builder)
    val spark = BenchSession.build()
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
