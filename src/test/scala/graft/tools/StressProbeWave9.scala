package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{DedupCluster, Graph, Intervals}

/** Round-16 stress probes. Test sourceset, never ships.
  *
  * GRAPH section — the growth-factor cut the round-16 scale paths
  * claim, on the Wave8 shifted-copy duplicate-mass inflation (1× vs
  * 10×), each pipeline built FRESH per rep (no memo) so the number is
  * the whole edge-build + analytics cost:
  *   exact      = triangleCounts(sharedShingleEdges minShared 10)
  *   winnowed   = triangleCounts(winnowedShingleEdges w=4 minShared 4)
  *   collapsed  = LSH star edges → components → representatives →
  *                sharedShingleEdges(minShared 3) → triangleCounts
  *
  * INTERVAL section — the q155 skew guard: one interval spanning the
  * whole range among many short ones. Reports the derived bucket
  * width, the explode fan-out (bucket rows) at the derived width vs a
  * mis-set narrow width, and the join wall time — the numbers behind
  * the scaladoc's mitigation advice (split/cap pathological spans;
  * the derived width keeps fan-out = range/median per long interval).
  *
  * Run: sbt "Test/runMain graft.tools.StressProbeWave9 /root/testdata/sf0.1"
  */
object StressProbeWave9 {
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
    import spark.implicits._

    def corpusFor(copies: Int): DataFrame = {
      val docs0 = Tables.load(spark, sf, "documents")
      val inflated = (0 until copies).map { c =>
        docs0.withColumn("doc_id", col("doc_id") + lit(c * 1000000L))
          .withColumn("text",
            if (c == 0) col("text")
            else regexp_replace(col("text"), "^(\\S+\\s+){" + c + "}", ""))
      }.reduce(_ unionByName _)
      val twins = inflated
        .select((col("doc_id") + 100000000L).as("doc_id"),
          regexp_replace(col("text"), "^\\S+\\s*", "").as("text"))
      inflated.select(col("doc_id"), col("text")).union(twins)
        .repartition(32, col("doc_id"))
        .localCheckpoint(true)
    }

    def exactCensus(c: DataFrame): DataFrame =
      Graph.triangleCounts(DedupCluster.sharedShingleEdges(
        c, "text", "doc_id", shingleK = 3, minShared = 10, maxDf = 1000))
    def winnowedCensus(c: DataFrame): DataFrame =
      Graph.triangleCounts(DedupCluster.winnowedShingleEdges(
        c, "text", "doc_id", shingleK = 3, w = 4, minShared = 4,
        maxDf = 1000))
    def collapsedCensus(c: DataFrame): DataFrame = {
      val comp = DedupCluster.connectedComponents(
        DedupCluster.lshClusterEdges(c, "text", "doc_id",
          shingleK = 3, numHashes = 32, bands = 8))
      val reps = DedupCluster.representatives(c, "doc_id", comp)
      Graph.triangleCounts(DedupCluster.sharedShingleEdges(
        reps, "text", "doc_id", shingleK = 3, minShared = 3, maxDf = 1000))
    }

    println("=== graph pipelines (fresh build per rep) ===")
    val mins = scala.collection.mutable.Map.empty[(String, Int), Double]
    for (copies <- Seq(1, 10)) {
      val c = corpusFor(copies)
      c.count()
      for ((name, f) <- Seq[(String, DataFrame => DataFrame)](
          ("exact", exactCensus), ("winnowed", winnowedCensus),
          ("collapsed", collapsedCensus))) {
        val reps = (1 to (if (copies == 1) 3 else 2)).map { _ =>
          val t0 = System.nanoTime()
          f(c).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        mins((name, copies)) = reps.min
        println(f"copies=$copies $name%-10s min=${reps.min}%7.3f reps=${reps.map(t => f"$t%.2f").mkString(",")}")
      }
      c.unpersist()
    }
    for (name <- Seq("exact", "winnowed", "collapsed"))
      println(f"$name%-10s growth@10x = ${mins((name, 10)) / mins((name, 1))}%5.2fx")

    println("=== interval skew guard (q155 shape) ===")
    // 200k short sessions (~1 ms) + `longK` whole-range spans
    val range = 200000L * 5000L
    def intervals(longK: Int): DataFrame =
      spark.range(200000L)
        .select(col("id").as("iid"), (col("id") * 5000L).as("s"),
          (col("id") * 5000L + 1000L).as("e"))
        .unionAll(spark.range(longK.toLong).select(
          (col("id") + 10000000L).as("iid"), lit(0L).as("s"),
          lit(range).as("e")))
    for (longK <- Seq(1, 32)) {
      val iv = intervals(longK).localCheckpoint(true)
      val derived = Intervals.deriveBucketMicros(iv, iv)
      def fanout(w: Long): Long = iv
        .select((expr(s"e div $w") - expr(s"s div $w") + 1L).as("n"))
        .agg(sum(col("n"))).head().getLong(0)
      val t0 = System.nanoTime()
      val pairs = Intervals.overlapJoin(iv, iv, derived)
        .filter(col("a_iid") < col("b_iid")).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"longK=$longK%-3d derivedW=$derived fanout@derived=${fanout(derived)}%,d " +
        f"fanout@W100=${fanout(100L)}%,d pairs=$pairs%,d join=$sec%.2fs")
      iv.unpersist()
    }
    spark.stop()
  }
}
