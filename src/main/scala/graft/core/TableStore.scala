package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Managed-table persistence shared by every sink that writes through the
  * catalog (the pharma round-trips, the streaming upsert sink): the
  * orphan-location cleanup that each call site used to copy by hand, and
  * a stage-then-swap publish for sinks whose input plan READS the table
  * they replace.
  */
object TableStore {

  private def simpleName(table: String): String = table.split('.').last

  /** Delete a managed-table LOCATION left behind by a previous session:
    * the in-memory catalog forgets tables across sessions but the
    * warehouse directory persists, and Spark refuses to create a managed
    * table over an existing location (LOCATION_ALREADY_EXISTS). No-op
    * when the table is known to THIS session's catalog — its location is
    * then legitimately owned and `mode("overwrite")` handles it. */
  def clearOrphanLocation(spark: SparkSession, table: String): Unit =
    if (!spark.catalog.tableExists(table)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), simpleName(table))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }

  /** Overwrite `table` as a managed parquet table, clearing any orphan
    * location first — the S4 sink primitive. */
  def overwriteTable(spark: SparkSession, table: String, df: DataFrame): Unit = {
    clearOrphanLocation(spark, table)
    df.write.mode("overwrite").format("parquet").saveAsTable(table)
  }

  /** Stage-then-swap publish: the full data write lands in
    * `<table>__staging` while the target table stays intact and readable,
    * then the swap is two catalog operations (drop + rename — the
    * in-memory/Hive catalog moves the managed directory with the rename).
    *
    * Two properties a direct `saveAsTable(table)` overwrite lacks:
    *  - a plan that READS `table` can be published over it without eager
    *    materialization — the read executes against the still-intact
    *    target while the staging write runs (no self-overwrite hazard);
    *  - a crash during the EXPENSIVE phase (the data write) leaves the
    *    target untouched; the remaining non-atomic window is the two
    *    catalog ops, after the new snapshot is complete on disk in the
    *    staging table — recoverable, unlike a half-rewritten target.
    * A real lakehouse format (Delta/Iceberg) closes even that window by
    * making the swap a single transaction-log commit. */
  def publishTable(spark: SparkSession, table: String, df: DataFrame): Unit = {
    val staging = table + "__staging"
    if (spark.catalog.tableExists(staging)) spark.sql(s"DROP TABLE $staging")
    overwriteTable(spark, staging, df)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    clearOrphanLocation(spark, table)
    spark.sql(s"ALTER TABLE $staging RENAME TO $table")
  }

  /** Recover from a crash inside [[publishTable]]: restore or discard
    * whatever the interrupted swap left, so a restarting writer (the
    * upsert sink calls this before its stream starts) finds the table in
    * a consistent state. Three cases:
    *
    *  - target intact → any staging residue is STALE (the writer died
    *    before the drop): discard it. The interrupted batch was never
    *    committed to the writer's checkpoint, so it replays and
    *    re-merges idempotently.
    *  - target missing, staging table in the catalog (same-session
    *    crash between drop and rename) → finish the swap with the
    *    rename that was about to run.
    *  - target missing, only the staging DIRECTORY on disk (the crash
    *    killed the session; the in-memory catalog lost both entries) →
    *    re-publish the complete parquet snapshot from that directory.
    *
    * In every case a subsequent checkpoint-resumed batch replays over
    * the restored snapshot; the latest-per-key merge is idempotent
    * under replay of the same batch, so recovery + replay converges to
    * the uninterrupted result. Returns true iff a snapshot was
    * restored. */
  def recoverStaging(spark: SparkSession, table: String): Boolean = {
    val staging = table + "__staging"
    if (spark.catalog.tableExists(table)) {
      if (spark.catalog.tableExists(staging)) spark.sql(s"DROP TABLE $staging")
      clearOrphanLocation(spark, staging)
      false
    } else if (spark.catalog.tableExists(staging)) {
      clearOrphanLocation(spark, table)
      spark.sql(s"ALTER TABLE $staging RENAME TO $table")
      true
    } else {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), simpleName(staging))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) {
        // distinct locations (staging dir → target dir), so the write can
        // read the snapshot lazily; delete the staging dir only after the
        // republish has fully materialized the target
        overwriteTable(spark, table, spark.read.parquet(loc.toString))
        fs.delete(loc, true)
        true
      } else false
    }
  }
}
