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

  /** The events table carries TIMESTAMP(NANOS) parquet timestamps, which
    * Spark only reads via the nanosAsLong legacy flag. Convert to
    * microsecond TimestampType with integer division — nanos-since-epoch
    * (~1.7e18) overflows double precision, so `div`, never `/`. */
  def loadEvents(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path)
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** Register every table as a temp view so `spark.sql` queries resolve the
    * same names the DuckDB oracle uses. Idempotent per session. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
