package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line for the driver (BENCH_r{N}.json).
  *
  * Results are forced through the noop sink so every column is fully
  * materialized (a bare .count() would let Catalyst prune the aggregates
  * under measurement). One untimed warm-up of the first query absorbs
  * one-off JVM/codegen/parquet-footer costs; each query then runs once,
  * timed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // static conf, must be set before the first session: the default
      // generated-class cache (100 entries) thrashes when ~20 queries
      // rotate through one JVM — every pass re-runs Janino compilation
      // of evicted stages, billing seconds of driver-side compile time
      // to queries whose DATA path is subsecond (q30 read 5.1s vs 1.0s
      // actual; see BASELINE.md r4 note). A long-lived production driver
      // sizes this cache to its workload for exactly the same reason.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    val names = SparkEntry.headline.filter(SparkEntry.queries.contains)
    // Warm-up: JVM + codegen + file listing, untimed. Same failure policy
    // as the timed loop — a broken first query must not abort the whole
    // benchmark before any JSON is emitted (its own timed run records -1).
    try force(names.head) catch {
      case e: Throwable => System.err.println(s"[bench] warmup: ${e.getMessage}")
    }
    // Three timed reps per query, INTERLEAVED (three full passes over the
    // query list) and min-taken: single-shot numbers swing ±30% with
    // background machine load, and back-to-back reps share the same load
    // window, so a transient spike poisons both and reads as a false
    // regression round over round (r2→r3 drift on q30/q33/q41 — VERDICT
    // r3 §wrong#4). Interleaving separates a query's reps by a full pass
    // (~seconds to minutes), so min-of-3 sees three independent load
    // samples; every rep does all the work, so the min is honest.
    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      val ok = try { force(name); true } catch {
        case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}"); false
      }
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    // Machine 1-min load average, sampled before and after the timed
    // passes. Min-of-3 interleaved reps suppress TRANSIENT spikes, but
    // SUSTAINED background load inflates all three reps alike (the r4
    // artifact recorded q31 at 2.04 s where a fresh unloaded JVM runs
    // 0.67 s steady-state — see BASELINE.md r5 note). Recording the load
    // makes each artifact self-documenting: a high loadavg says "discount
    // this run", no cross-round archaeology needed.
    def loadAvg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }

    // Load DISCIPLINE, not just load recording (VERDICT r6 item 3): three
    // of the first six round artifacts were loaded-machine measurements
    // whose +40..60% rows read as phantom regressions. Wait (bounded) for
    // the machine to go idle before the timed passes; if it never does,
    // run anyway and stamp "loaded": true so the artifact self-identifies
    // as a hot run. Threshold 2.0 on a 32-cpu box ≈ background noise.
    val idleThreshold = 2.0
    var waitedSec = 0
    while (loadAvg() > idleThreshold && waitedSec < 300) {
      System.err.println(f"[bench] loadavg ${loadAvg()}%.2f > $idleThreshold%.1f, waiting (${waitedSec}s)")
      Thread.sleep(15000); waitedSec += 15
    }

    val loadBefore = loadAvg()
    val passes = (1 to 3).map(_ => names.map(n => n -> timeOnce(n)).toMap)
    val loadAfter = loadAvg()
    val results = names.map { name =>
      val reps = passes.map(_(name)).filter(_ >= 0)
      name -> (if (reps.nonEmpty) reps.min else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum

    // ---- quality fields (untimed; VERDICT r6 items 1 and 5) ----
    // ANN recall@10 vs the exact brute-force ranking, per round: a
    // recall regression in the approximate paths is a quality bug the
    // wall-times cannot see. Computed on the SAME sf dir the timings ran.
    import org.apache.spark.sql.functions.col
    val recalls: Seq[(String, Double)] =
      try {
        val brute = SparkEntry.queries("q33_ann_brute")(spark, sfDir)
          .select(col("query_id"), col("neighbor_id")).cache()
        val bruteN = brute.count().toDouble
        Seq("q34_ann_lsh", "q35_ann_ivf", "q65_ann_ivf_trained").map { n =>
          val hits = SparkEntry.queries(n)(spark, sfDir)
            .select(col("query_id"), col("neighbor_id"))
            .join(brute, Seq("query_id", "neighbor_id")).count()
          n -> hits / bruteN
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] recall: ${e.getMessage}"); Seq.empty
      }
    // Z-order file-skipping ratio on real parquet footers (same probe
    // WriterSpec asserts as a >=2x boolean): linear-candidates /
    // z-candidates for the quadrant-interior band predicate, tracked per
    // round like latency.
    val zratio: Double =
      try {
        val li = graft.core.Tables.load(spark, sfDir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
        val p = graft.core.Zorder.skipProbe(
          li, Seq("l_quantity", "l_extendedprice"), "l_extendedprice",
          loFrac = 0.32, hiFrac = 0.42, bits = 8, files = 8)
        if (p.zorderCandidates > 0) p.linearCandidates.toDouble / p.zorderCandidates
        else -1.0
      } catch { case e: Throwable =>
        System.err.println(s"[bench] zorder: ${e.getMessage}"); -1.0
      }

    val recallJson = recalls.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","load_before":$loadBefore%.2f,"load_after":$loadAfter%.2f,"loaded":${loadBefore > idleThreshold},"recall":$recallJson,"zorder_skip_ratio":$zratio%.2f}""")
    spark.stop()
  }
}
