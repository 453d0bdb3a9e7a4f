package graft.tools

import org.apache.spark.sql.functions._

/** Probe (test sourceset — never ships): does the propagate round join
  * co-partition with the pre-hashed edge checkpoint? */
object PropagatePlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.BenchSession.build()
    val e0 = graft.core.Tables.load(spark, sfDir, "embeddings")
    val edges = graft.ops.Similarity.bruteForceTopKPartial(
        e0, e0, "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
    val nodes = e0.select(col("vec_id").as("node"),
      when(col("vec_id") % 5 === 0, col("label")).as("seed_label"))

    for (variant <- Seq("plain", "prehashed")) {
      val e =
        if (variant == "plain")
          edges.select(col("src"), col("dst")).localCheckpoint(eager = false)
        else
          edges.select(col("src"), col("dst"))
            .repartition(col("dst")).localCheckpoint(eager = false)
      val seeds =
        if (variant == "plain")
          nodes.select(col("node"), col("seed_label")).localCheckpoint(eager = false)
        else
          nodes.select(col("node"), col("seed_label"))
            .repartition(col("node")).localCheckpoint(eager = false)
      var labels = seeds.select(col("node"), col("seed_label").as("lab"))
      for (round <- 1 to 2) {
        val counts = e
          .join(labels.select(col("node").as("dst"), col("lab")), Seq("dst"))
          .filter(col("lab").isNotNull)
          .groupBy(col("src"), col("lab")).agg(count(lit(1)).as("c"))
        val upd = counts
          .groupBy(col("src"))
          .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("m"))
          .select(col("src").as("node"), (-col("m.nl")).as("newlab"))
        val joined = seeds
          .join(labels.withColumnRenamed("lab", "prev"), Seq("node"), "left")
          .join(upd, Seq("node"), "left")
          .withColumn("lab",
            coalesce(col("seed_label"), col("newlab"), col("prev")))
        if (round == 2) {
          println(s"=== $variant round-2 counts plan ===")
          counts.explain()
        }
        labels = joined.select(col("node"), col("lab"))
          .localCheckpoint(eager = false)
      }
    }
    spark.stop()
  }
}
