package graft.pharma

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion of the medication feed: a JSON document shaped as a map from
  * first letter → array of medication records (reference:
  * Pharma_Ingestion_Cleaning.py:30-39 flattens it with a driver-side
  * Python loop; we replace that loop with from_json + explode so the
  * flatten runs distributed — SURVEY.md §2.1 S2).
  *
  * Schemas are explicit (never inferred): at 100 TB schema inference is a
  * full extra pass and nondeterministic under dirty data (SURVEY.md §7.4.4).
  */
/** Typed view of a raw medication record (SURVEY.md §1.5: case-class
  * Dataset for the type-safe core, DataFrame at API edges). Nullable
  * fields are Options; the nested structs mirror the feed shape. */
final case class LabInfo(
    name: Option[String], address: Option[String],
    tel: Option[String], web: Option[String])
final case class ClassInfo(
    therapeutic: Option[String], pharmacological: Option[String])
final case class Medication(
    first_letter: String, name: Option[String], generic: Option[String],
    form: Option[String], reference_rate: Option[String],
    refundable: Option[Boolean], lab: Option[LabInfo],
    // the feed column is `class`, which Java identifiers (and therefore
    // Dataset encoders) cannot carry — typed() renames it
    med_class: Option[ClassInfo])

object MedsFeed {

  /** One raw medication record as it appears in the feed. */
  val medStruct: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("generic", StringType),
    StructField("form", StringType),
    StructField("reference_rate", StringType),
    StructField("refundable", BooleanType),
    StructField("lab", StructType(Seq(
      StructField("name", StringType),
      StructField("address", StringType),
      StructField("tel", StringType),
      StructField("web", StringType)))),
    StructField("class", StructType(Seq(
      StructField("therapeutic", StringType),
      StructField("pharmacological", StringType))))))

  /** The whole feed document: letter → records. */
  val feedType: MapType = MapType(StringType, ArrayType(medStruct))

  /** Flatten a DataFrame holding raw feed documents (one JSON string per
    * row in `jsonCol`) into one row per medication with the map key
    * injected as `first_letter`. explode on the map gives (key, value);
    * inline star-expansion replaces the reference's Python append loop. */
  def flatten(raw: DataFrame, jsonCol: String = "json"): DataFrame =
    raw
      .select(explode(from_json(col(jsonCol), feedType)).as(Seq("first_letter", "meds")))
      .select(col("first_letter"), explode(col("meds")).as("med"))
      .select(col("first_letter"), col("med.*"))

  /** Load a feed from JSON text already in memory (tests / driver-fetched
    * HTTP payloads). The HTTP fetch itself is behind this seam: zero-egress
    * environments pass the payload in, production passes a downloaded
    * object-store blob — the engine never fetches (SURVEY.md §7.4.6). */
  def fromJsonString(spark: SparkSession, json: String): DataFrame = {
    import spark.implicits._
    flatten(Seq(json).toDF("json"))
  }

  /** Typed view over the flattened feed — Dataset[Medication] for
    * callers that want compile-time field checking; the engine's own
    * pipeline stays on DataFrames (dynamic schema at the edges). */
  def typed(flattened: DataFrame): Dataset[Medication] = {
    import flattened.sparkSession.implicits._
    flattened.withColumnRenamed("class", "med_class").as[Medication]
  }

  /** Streaming twin of [[fromJsonString]]: watch a directory for feed
    * documents (one whole JSON document per file — the shape a periodic
    * fetch job lands in object storage) and flatten each incrementally.
    * Because [[flatten]] and the Cleaning stages are pure
    * DataFrame => DataFrame transforms, the IDENTICAL logical plan runs
    * batch and incremental (SURVEY.md §2.9 "incremental re-ingestion"). */
  def streamFromDirectory(spark: SparkSession, dir: String): DataFrame =
    flatten(
      spark.readStream.option("wholetext", "true").text(dir)
        .withColumnRenamed("value", "json"))
}
