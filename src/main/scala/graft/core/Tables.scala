package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Each table is one parquet file/dir under `sfDir`. At 100 TB these would be
  * multi-file partitioned datasets — `spark.read.parquet(dir)` handles both
  * shapes identically, so nothing here changes at scale.
  */
object Tables {
  /** TPC-H-ish star schema + extension tables, in dependency order. */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, s"$sfDir/$name.parquet")
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table's `ts` physical encoding has shipped in two
    * vintages: TIMESTAMP(NANOS) (readable only as int64 under the
    * nanosAsLong legacy flag) and native timestamp[us] with
    * isAdjustedToUTC=false (read as TIMESTAMP_NTZ). A production reader
    * derives the physical type from the file footer rather than pinning
    * one writer vintage — footer-driven branching costs one metadata
    * read and survives upstream re-writes. Everything downstream sees
    * one logical type: session-zone TimestampType. */
  def loadEvents(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(path))
  }

  /** Normalize whatever physical `ts` a frame carries to session-zone
    * TimestampType. int64 → treated as nanos-since-epoch with integer
    * `div` (nanos ~1.7e18 overflows double precision, so never `/`);
    * TIMESTAMP_NTZ → cast (value-preserving under the UTC session zone
    * every entrypoint pins); TimestampType → untouched. No-op when the
    * frame has no `ts` column. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    if (!df.columns.contains("ts")) df
    else df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Register every table as a temp view so `spark.sql` queries resolve the
    * same names the DuckDB oracle uses. Idempotent per session. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
