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
}
