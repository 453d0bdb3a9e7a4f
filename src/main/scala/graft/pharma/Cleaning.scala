package graft.pharma

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cleaning pass over the flattened medication feed — pure
  * DataFrame => DataFrame stages shared by batch and streaming (each stage
  * is a narrow projection/filter; the whole pass fuses into one
  * whole-stage-codegen'd scan at any scale).
  *
  * Stages mirror the reference semantics (SURVEY.md §1.2):
  *  - struct pull-up of lab/class fields (Pharma_Ingestion_Cleaning.py:66-72)
  *  - price extraction: first digit run of reference_rate, try_cast to int
  *    (Pharma_Ingestion_Cleaning.py:88-91 — try_cast keeps dirty rows NULL
  *    instead of failing under ANSI mode)
  *  - valid-price filter: price IS NOT NULL AND price > 0
  *    (Pharma_Ingestion_Cleaning.py:123)
  *  - refundable imputation: NULL means "not covered" — domain-verified in
  *    the reference (Pharma_Ingestion_Cleaning.py:163-166)
  *  - price_category derivation — the reference queries GROUP BY a column
  *    no notebook creates; thresholds Low ≤ 100 < Medium ≤ 500 < High are
  *    inferred from its affordability bands
  *    (pharmaceutical_dashboard_queries.sql:50-62,96-97; SURVEY.md §7.4.1)
  */
object Cleaning {

  def structFlatten(df: DataFrame): DataFrame =
    df.withColumn("lab_name", col("lab.name"))
      .withColumn("lab_address", col("lab.address"))
      .withColumn("lab_tel", col("lab.tel"))
      .withColumn("lab_web", col("lab.web"))
      .withColumn("therapeutic_class", col("class.therapeutic"))
      .withColumn("pharmacological_class", col("class.pharmacological"))

  /** First run of digits in the price text, NULL-safe under ANSI mode
    * (try_cast returns NULL on no-digit/overflow instead of raising). */
  def priceExtract(df: DataFrame): DataFrame =
    df.withColumn("price",
      expr("try_cast(regexp_extract(reference_rate, '(\\\\d+)', 1) AS INT)"))

  def validPriceFilter(df: DataFrame): DataFrame =
    df.filter(col("price").isNotNull && col("price") > 0)

  def refundableImpute(df: DataFrame): DataFrame =
    df.withColumn("refundable_clean", coalesce(col("refundable"), lit(false)))
      .withColumn("refundable_label",
        when(col("refundable_clean"), "Covered").otherwise("Not Covered"))

  def priceCategory(df: DataFrame): DataFrame =
    df.withColumn("price_category",
      when(col("price") <= 100, "Low")
        .when(col("price") <= 500, "Medium")
        .otherwise("High"))

  /** The full cleaning pass in reference order. */
  def all(df: DataFrame): DataFrame =
    priceCategory(refundableImpute(validPriceFilter(priceExtract(structFlatten(df)))))

  /** Cleaning with the triage accounting attached as an Observation:
    * the reference audits the feed with FOUR separate count() actions
    * (Pharma_Ingestion_Cleaning.py:100-112) — four full scans at 100 TB.
    * observe() computes the same metrics as a side effect of whatever
    * single action the caller runs on the cleaned frame, so the audit is
    * free: clean once, read the counts off the observation. */
  def observedClean(df: DataFrame): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    val priced = priceExtract(structFlatten(df)).observe(obs,
      count(lit(1)).as("total"),
      count(when(col("price").isNull, 1)).as("null_price"),
      count(when(col("price") === 0, 1)).as("zero_price"),
      count(when(col("price") > 0, 1)).as("valid_price"))
    (priceCategory(refundableImpute(validPriceFilter(priced))), obs)
  }

  /** Triage accounting the reference performs manually
    * (Pharma_Ingestion_Cleaning.py:100-112): partition rows by price
    * validity; the three buckets must sum to the total. */
  def priceTriage(df: DataFrame): DataFrame = {
    val priced = priceExtract(df)
    priced.agg(
      count(lit(1)).as("total"),
      count(when(col("price").isNull, 1)).as("null_price"),
      count(when(col("price") === 0, 1)).as("zero_price"),
      count(when(col("price") > 0, 1)).as("valid_price"))
  }
}
