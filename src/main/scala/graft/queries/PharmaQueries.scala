package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraftQuery
import graft.pharma.{Cleaning, Dashboard, InsuranceModel, MedsFeed, PharmaFixture}

/** The reference pipeline end-to-end on the embedded deterministic fixture
  * feed (the driver's test tables don't ship a medications table, so these
  * run rows-only; golden-value assertions live in the pharma ScalaTest
  * suites). Ignores sfDir by design — the feed is the fixture.
  */
object PharmaQueries {

  private def medications(s: SparkSession): DataFrame =
    Cleaning.all(MedsFeed.fromJsonString(s, PharmaFixture.feedJson()))

  /** Ingest → clean triage accounting (the reference's manual audit,
    * Pharma_Ingestion_Cleaning.py:100-112). */
  val pharmaTriage = GraftQuery(
    "pharma_triage",
    (s, _) => Cleaning.priceTriage(MedsFeed.fromJsonString(s, PharmaFixture.feedJson())))

  private def dash(n: Int, name: String) = GraftQuery(
    name, (s, _) => Dashboard.all(n)(medications(s)))

  val pharmaKpi = dash(1, "pharma_q01_kpi")
  val pharmaDiseaseArea = dash(2, "pharma_q02_disease_area")
  val pharmaManufacturers = dash(3, "pharma_q03_manufacturers")
  val pharmaSegmentation = dash(4, "pharma_q04_segmentation")
  val pharmaForms = dash(5, "pharma_q05_forms")
  val pharmaExpensive = dash(6, "pharma_q06_most_expensive")
  val pharmaAffordability = dash(7, "pharma_q07_affordability")
  val pharmaCoverage = dash(8, "pharma_q08_disease_coverage")
  val pharmaMfrSize = dash(9, "pharma_q09_manufacturer_size")
  val pharmaIngredients = dash(10, "pharma_q10_ingredients")
  val pharmaHistogram = dash(11, "pharma_q11_histogram")
  val pharmaInsurance = dash(12, "pharma_q12_insurance")
  val pharmaMlDataset = dash(13, "pharma_q13_ml_dataset")
  val pharmaBalance = dash(14, "pharma_q14_class_balance")

  /** Distributed MLlib replacement for the reference's sklearn stage. */
  val pharmaMlMetrics = GraftQuery(
    "pharma_ml_metrics",
    (s, _) => InsuranceModel.metricsDf(s, Dashboard.mlDataset(medications(s))))

  val all: Seq[GraftQuery] = Seq(
    pharmaTriage, pharmaKpi, pharmaDiseaseArea, pharmaManufacturers,
    pharmaSegmentation, pharmaForms, pharmaExpensive, pharmaAffordability,
    pharmaCoverage, pharmaMfrSize, pharmaIngredients, pharmaHistogram,
    pharmaInsurance, pharmaMlDataset, pharmaBalance, pharmaMlMetrics)
}
