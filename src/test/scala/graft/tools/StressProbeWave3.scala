package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables

/** 10× stress probe for the two headline families VERDICT r12 flagged
  * as lacking a 10× row — the served-ANN retrieval leg (q105c) and the
  * sharded JSONL export round-trip (q111) — plus the new end-to-end
  * composition row (q122). Same shifted-copy inflation as
  * StressProbe10x / StressProbeWave2 (copy 0 unperturbed, later copies
  * word-shifted text and perturbed embeddings; test sourceset, never
  * ships).
  *
  * Claims under test:
  *  - q105c: the PQ-served vector leg reads a published index and
  *    probes a bounded cell subset; the keyword leg is a broadcast
  *    semi-join over postings that grow linearly. Expect ≤ ~linear
  *    wall growth (plus the one-off retrain at the new fingerprint).
  *  - q111: shard COUNT derives from corpus chars, so 10× corpus →
  *    ~10× shards of constant size; write+read-back should scale
  *    ~linearly and the shard count must track the 10× total.
  *  - q122: every stage claims linear-or-vocabulary-bounded shapes;
  *    the composition should inherit them.
  *
  * Run: sbt "Test/runMain graft.tools.StressProbeWave3 /root/testdata/sf0.1"
  */
object StressProbeWave3 {
  val queries = Seq("q105c_hybrid_rrf_ann", "q111_shard_export",
    "q122_curation_pipeline")

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
        .createTempDirectory(s"graft_stress_w3_${copies}x").toString
      val docs0 = Tables.load(spark, sf, "documents")
      (0 until copies).map { c =>
        docs0.withColumn("doc_id", col("doc_id") + lit(c * 1000000L))
          .withColumn("text",
            if (c == 0) col("text")
            else regexp_replace(col("text"), "^(\\S+\\s+){" + c + "}", ""))
      }.reduce(_ unionByName _)
        .repartition(32).write.parquet(s"$dir/documents.parquet")
      val emb0 = Tables.load(spark, sf, "embeddings")
      (0 until copies).map { c =>
        emb0.withColumn("vec_id", col("vec_id") + lit(c * 1000000L))
          .withColumn("embedding", transform(col("embedding"), (x, i) =>
            (x * (lit(1.0) + lit(0.03 * c) * (pmod(i + lit(c), lit(7)) - lit(3))))
              .cast("float")))
      }.reduce(_ unionByName _)
        .repartition(32).write.parquet(s"$dir/embeddings.parquet")
      dir
    }

    for (copies <- Seq(1, 10)) {
      val dir = stage(copies)
      val nDocs = Tables.load(spark, dir, "documents").count()
      val nEmb = Tables.load(spark, dir, "embeddings").count()
      println(s"=== copies=$copies docs=$nDocs emb=$nEmb dir=$dir ===")
      for (name <- queries) {
        val reps = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(name)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$name min=${reps.min}%.3f reps=${reps.map(t => f"$t%.2f").mkString(",")}")
      }
      // q111's structural claim: shards ∝ corpus chars (constant shard
      // SIZE, growing shard COUNT)
      val manifest = graft.SparkEntry.queries("q111_shard_export")(spark, dir)
      val stats = manifest.agg(count(lit(1)), sum(col("chars"))).head()
      println(s"q111 shards=${stats.getLong(0)} total_chars=${stats.getLong(1)}")
    }
    spark.stop()
  }
}
