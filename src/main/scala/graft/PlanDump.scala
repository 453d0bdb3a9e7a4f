package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan-audit companion to [[Bench]]/[[BenchOne]]: writes
  * `.explain("formatted")` for the named registered queries to
  * `<outDir>/<query>_<tag>.txt` — the before/after plan evidence the
  * optimization rounds commit under plans/r{N}/. Uses the exact session
  * configuration Bench runs with, so the captured plan is the timed plan.
  *
  * Usage: runMain graft.PlanDump <outDir> <tag> <query>[,<query>...]
  *        (query list "headline" expands to SparkEntry.headline)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    // hard arity check (ADVICE r21): a silently mis-invoked dump that
    // exits 0 looks like evidence when it produced nothing
    if (args.length < 3) {
      System.err.println(
        "usage: runMain graft.PlanDump <outDir> <tag> <query>[,<query>...]")
      sys.exit(2)
    }
    val outDir = args(0)
    val tag = args(1)
    val names: Seq[String] =
      if (args(2) == "headline") SparkEntry.headline
      else args(2).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Bench's exact session, by construction (shared builder) — the
    // captured plan IS the timed plan
    val spark = BenchSession.build()
    Files.createDirectories(Paths.get(outDir))
    var failed = 0
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(outDir, s"${n}_$tag.txt"),
          plan.getBytes("UTF-8"))
        println(s"[plandump] wrote $n")
      } catch {
        // NonFatal only (ADVICE r21): an OOM/fatal error must crash the
        // dump, not be swallowed into a fake-complete run
        case scala.util.control.NonFatal(e) =>
          failed += 1
          System.err.println(s"[plandump] $n failed: ${e.getMessage}")
      }
    }
    spark.stop()
    // a partial dump must not look like success to the caller
    if (failed > 0) sys.exit(1)
  }
}
