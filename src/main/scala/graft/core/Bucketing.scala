package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) joins — the "100× lever" for repeated fact-fact
  * joins (q12's inline note): write both sides bucketBy the join key and
  * the join reads matching bucket files directly, eliminating BOTH
  * shuffle exchanges. At 100 TB the exchange is the dominant cost of an
  * orders⋈lineitem join; bucket layout amortizes it across every future
  * join on that key. The overwrite + read-back-by-name semantics match
  * the engine's managed-table contract (S4/S5). */
object Bucketing {

  /** The canonical key→bucket assignment shared by every hash-partition
    * consumer (the partition-scoped upsert sink, the batch MERGE twin,
    * and the specs that derive a key's partition directory): one
    * definition, so a test computing a bucket can never silently drift
    * from the sink that wrote it. */
  def bucketExpr(key: org.apache.spark.sql.Column, buckets: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
    pmod(xxhash64(key), lit(buckets.toLong))
  }

  /** Persist as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    if (spark.catalog.tableExists(table)) spark.sql(s"DROP TABLE $table")
    // same cross-session orphan-directory hazard as writePartitioned
    TableStore.clearOrphanLocation(spark, table)
    df.write.format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").saveAsTable(table)
  }

  /** Inner equi-join of two bucketed tables on their bucket key. With
    * matching bucket counts Spark plans scan → (sort) → SortMergeJoin
    * with NO Exchange on either side (asserted in PlanSpec). */
  def bucketedEquiJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable),
        spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))

  /** Persist as a Hive-style partitioned managed table (one directory per
    * partition value). At 100 TB, time/tenant partition columns are what
    * make selective scans cheap: a filter on the partition column prunes
    * directories at PLANNING time (PartitionFilters), and a join against
    * a filtered dimension prunes them at RUNTIME via dynamic partition
    * pruning — both asserted in PlanSpec. */
  def writePartitioned(
      df: DataFrame, table: String, partitionCol: String): Unit = {
    val spark = df.sparkSession
    if (spark.catalog.tableExists(table)) spark.sql(s"DROP TABLE $table")
    // a previous SESSION's managed directory survives the in-memory
    // catalog; creating over it raises LOCATION_ALREADY_EXISTS
    TableStore.clearOrphanLocation(spark, table)
    df.write.format("parquet")
      .partitionBy(partitionCol)
      .mode("overwrite").saveAsTable(table)
  }

  /** Overwrite ONLY the partitions present in `df`, leaving every other
    * partition untouched — dynamic partition overwrite, the idempotent
    * daily-reprocess primitive (re-running one day's pipeline must not
    * clobber the rest of the table). Static overwrite mode would replace
    * the WHOLE table; the session conf scopes the dynamic behavior to
    * this write. */
  def overwritePartitions(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try df.write.mode("overwrite").insertInto(table)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
