package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data export sinks: the hand-off boundary where a curated
  * corpus leaves the engine for tokenizer/training jobs. The export
  * format is JSONL shard directories — one directory per shard, each
  * holding line-delimited JSON — because that is the format every
  * mainstream data-loading stack ingests without a Spark dependency.
  *
  * Scale design: shard routing is a narrow per-row hash projection (no
  * shuffle; the writer's partitionBy clusters rows by shard in the
  * write stage), and the shard COUNT derives from corpus size so the
  * export targets a fixed shard SIZE — the property downstream loaders
  * care about — instead of a fixed shard count that degrades as the
  * corpus grows.
  */
object Export {

  /** Overflow-masked Knuth multiplicative hash → [0, buckets): the
    * split family's arithmetic (CurationQueries.hashBucket), reused
    * for shard routing so an independent engine can replay the
    * assignment bit for bit. */
  private def shardOf(id: Column, buckets: Column): Column =
    ((pmod(id, lit(2147483648L)) * (2654435761L % 4294967296L))
      % 4294967296L) % buckets

  /** Export `df` as hash-routed JSONL shard directories, sized so each
    * shard carries ≈ `targetChars` characters of `textCol`. Returns the
    * output path; `columns` picks the fields each JSON line carries
    * (the shard column is the partition dir). Deterministic: same
    * corpus → same shard count, same routing, same files.
    *
    * `basePath` is the cluster hand-off knob: pass a shared-storage URI
    * (HDFS/S3/ABFS) so executors write where the training job reads.
    * When None (the default, and the sandbox posture) a fresh driver-
    * local temp dir is created and registered for JVM-exit cleanup —
    * correct on local[*], NOT reachable by remote executors. */
  def shardedJsonl(
      df: DataFrame, idCol: String, textCol: String,
      columns: Seq[String], targetChars: Long = 16384L,
      basePath: Option[String] = None,
      clusterThresholdBytes: Long = 256L << 20): String = {
    val nShards = df.agg(
      greatest(lit(1L),
        ceil(sum(length(col(textCol))) / targetChars.toDouble).cast("long"))
        .as("k"))
    val routed = df.crossJoin(broadcast(nShards))
      .select(shardOf(col(idCol), col("k")).cast("int").as("shard") +:
        columns.map(col): _*)
    // Size-gated write clustering (r22, guide §6): a partitionBy writer
    // whose input is NOT clustered by the partition column opens one
    // file per (task, shard) — task-count × shard-count small files at
    // cluster scale. Hash-distributing by `shard` first fixes that, but
    // costs an exchange that a small single-task input never earns back
    // (measured r21: unconditional repartition regressed the sf0.1
    // single-file case 1.63 → 1.91 s). The gate is the optimizer's
    // estimated input size — plan statistics, no extra job — with the
    // threshold a parameter so both branches stay testable.
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val clustered =
      if (estBytes > clusterThresholdBytes) routed.repartition(col("shard"))
      else routed
    val out = basePath.getOrElse {
      val tmp = java.nio.file.Files.createTempDirectory("graft_shards")
      graft.streaming.EventPipeline.registerTempCleanup(tmp)
      tmp.toString
    }
    clustered.write.mode("overwrite").partitionBy("shard").json(out)
    out
  }

  /** Read a [[shardedJsonl]] export back with a pinned schema (the
    * shard partition column rides the directory names). */
  def readShardedJsonl(
      spark: org.apache.spark.sql.SparkSession, path: String,
      schema: String): DataFrame =
    spark.read.schema(schema).json(path)
}
