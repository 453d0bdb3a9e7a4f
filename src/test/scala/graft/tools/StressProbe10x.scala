package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** 10× stress probe for the five priciest bench rows (VERDICT r11 item
  * 7; test sourceset — never ships). The driver ships no sf1, so the
  * probe SYNTHESIZES one: a real sf dir's documents/embeddings/events
  * inflated 10× by the established shifted-copy method (copy 0
  * unperturbed; document copies drop their first c words, embedding
  * copies get a copy-and-index-dependent perturbation, event copies
  * shift ids/users and slide ts by c minutes) and MATERIALIZED as a
  * normal table directory, so the five registered queries run against
  * it completely unchanged — same plans, same served-index lifecycle.
  *
  * Prints, per scale (1× and 10×): per-query wall (min of 3 forced
  * runs, first run absorbs any index [re]build) plus the q35b/q101f
  * quality numbers (ANN recall@10 vs brute force; blocked-incremental
  * pruned-set recall vs the exact incremental rule) so none of the 10×
  * timings can silently buy speed with accuracy.
  *
  * Run: sbt "Test/runMain graft.tools.StressProbe10x /root/testdata/sf0.1"
  */
object StressProbe10x {
  val queries = Seq("q51_dedup_clusters", "q35b_ann_pq",
    "q104_duplicated_spans", "q103_incremental_agg",
    "q101f_semantic_dedup_incr_blocked")

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
        .createTempDirectory(s"graft_stress_${copies}x").toString
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
      val ev0 = Tables.load(spark, sf, "events")
      (0 until copies).map { c =>
        ev0.withColumn("event_id", col("event_id") + lit(c * 100000000L))
          .withColumn("user_id", col("user_id") + lit(c * 1000000L))
          .withColumn("ts", col("ts") + expr(s"make_interval(0,0,0,0,0,$c,0)"))
      }.reduce(_ unionByName _)
        .repartition(32).write.parquet(s"$dir/events.parquet")
      dir
    }

    for (copies <- Seq(1, 10)) {
      val dir = stage(copies)
      val nDocs = Tables.load(spark, dir, "documents").count()
      val nEmb = Tables.load(spark, dir, "embeddings").count()
      val nEv = Tables.load(spark, dir, "events").count()
      println(s"=== copies=$copies docs=$nDocs emb=$nEmb events=$nEv dir=$dir ===")
      for (name <- queries) {
        val reps = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(name)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$name min=${reps.min}%.3f reps=${reps.map(t => f"$t%.2f").mkString(",")}")
      }
      // quality at this scale — recall floors, same definitions as Bench
      val e = Tables.load(spark, dir, "embeddings").cache()
      val q = e.filter(col("vec_id") < 5)
      val brute = graft.ops.Similarity.bruteForceTopK(
        e, q, "vec_id", "embedding", "vec_id", "embedding", 10).cache()
      val bruteN = brute.count().toDouble
      val pqHits = graft.SparkEntry.queries("q35b_ann_pq")(spark, dir)
        .select("query_id", "neighbor_id")
        .join(brute.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id")).count()
      val seed = e.filter(col("vec_id") % 5 =!= 0)
      val inc = e.filter(col("vec_id") % 5 === 0)
      val keptRep = seed.join(
        graft.ops.Dedup.semanticDedup(seed, "embedding", "vec_id", 0.45)
          .filter(col("kept")).select(col("id")),
        seed("vec_id") === col("id"))
        .select(seed("vec_id"), seed("embedding")).cache()
      val exactPruned = graft.ops.Dedup.semanticDedupIncremental(
          keptRep, inc, "embedding", "vec_id", 0.45)
        .filter(!col("kept")).select("id").cache()
      val nExact = exactPruned.count().toDouble
      val cents = graft.ops.Similarity.kmeansCentroids(
        e, "embedding", "vec_id", k = 8, iters = 2)
      val blockedHits = graft.ops.Dedup.semanticDedupIncrementalBlocked(
          keptRep, inc, "embedding", "vec_id", 0.45, cents, probes = 2)
        .filter(!col("kept")).select("id")
        .join(exactPruned, Seq("id")).count()
      println(f"q35b_recall=${pqHits / bruteN}%.3f " +
        f"q101f_pruned_recall=${if (nExact > 0) blockedHits / nExact else -1.0}%.3f " +
        f"exact_pruned=$nExact%.0f")
      e.unpersist(); brute.unpersist(); keptRep.unpersist(); exactPruned.unpersist()
    }
    spark.stop()
  }
}
