package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.{ClassifierQueries, CurationQueries, TextVectorQueries}

/** Ad-hoc timings for the round-12 second-wave operators at sf0.1 —
  * decides which rows join the bench headline and what bands go in
  * BASELINE.md. Not part of any suite.
  *
  * Run: sbt "Test/runMain graft.tools.NewOpsProbe /root/testdata/sf0.1"
  */
object NewOpsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = Seq(
      CurationQueries.q113ProvenanceAudit,
      CurationQueries.q116StratifiedSample,
      ClassifierQueries.q112NbQualityClassifier,
      TextVectorQueries.q114bLabelPropagationBlocked,
      TextVectorQueries.q115HllMergeable,
      TextVectorQueries.q117RandomProjection)
    for (rep <- 1 to 2; q <- qs) {
      val t0 = System.nanoTime()
      val n = q.run(spark, sfDir).count()
      println(f"rep$rep ${q.name}%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
