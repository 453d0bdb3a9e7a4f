package graft.pharma

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion of the labs directory feed — the reference's SECOND source
  * (`url_labs`, Pharma_Ingestion_Cleaning.py:16: declared next to the
  * meds feed, fetched-URL defined but never ingested by any notebook;
  * SURVEY.md §2.1 S8). Implementing it closes the one reference row with
  * no twin: a user pointing the engine at both URLs gets both tables.
  *
  * Shape: a JSON ARRAY of lab records (the meds feed's nested `lab`
  * struct — name/address/tel/web — promoted to a standalone directory,
  * plus the wilaya region field a directory carries). Same ingestion
  * posture as MedsFeed: explicit schema (never inferred — at 100 TB
  * inference is a full extra pass and nondeterministic under dirty
  * data), from_json + explode so the flatten runs distributed, and the
  * HTTP fetch behind the driver-side seam (HttpFetch.loadLabs).
  */
object LabsFeed {

  /** One lab record as it appears in the directory feed. */
  val labStruct: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("address", StringType),
    StructField("tel", StringType),
    StructField("web", StringType),
    StructField("wilaya", StringType)))

  /** The whole feed document: an array of lab records. */
  val feedType: ArrayType = ArrayType(labStruct)

  /** Flatten a DataFrame holding raw feed documents (one JSON string per
    * row in `jsonCol`) into one row per lab. Malformed documents parse to
    * NULL (from_json PERMISSIVE) and explode drops them — a dirty feed
    * degrades to fewer rows, never an abort; [[corrupt]] is the matching
    * dead-letter relation. */
  def flatten(raw: DataFrame, jsonCol: String = "json"): DataFrame =
    raw
      .select(explode(from_json(col(jsonCol), feedType)).as("lab"))
      .select(col("lab.*"))

  /** Documents [[flatten]] silently contributes zero rows for — the
    * quarantine/dead-letter relation a production ingest routes to a
    * replay sink, same discipline as the meds feed's corrupt-record
    * handling (WriterSpec). Carries the raw document so a fixed parser
    * can replay it. */
  def corrupt(raw: DataFrame, jsonCol: String = "json"): DataFrame =
    raw.filter(
      from_json(col(jsonCol), feedType).isNull && col(jsonCol).isNotNull)

  /** Load a labs directory from JSON text already in memory (tests /
    * driver-fetched HTTP payloads) — the same seam as
    * MedsFeed.fromJsonString. */
  def fromJsonString(spark: SparkSession, json: String): DataFrame = {
    import spark.implicits._
    flatten(Seq(json).toDF("json"))
  }
}
