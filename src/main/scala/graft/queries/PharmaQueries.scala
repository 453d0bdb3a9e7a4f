package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraftQuery
import graft.pharma.{Cleaning, Dashboard, InsuranceModel, LabsFeed, MedsFeed, PharmaFixture}

/** The reference pipeline end-to-end on the embedded deterministic fixture
  * feed, every dashboard query DuckDB-oracle-checked.
  *
  * Oracle design: the driver's DuckDB gate only creates views for the ten
  * standard test tables, so the pharma oracles are self-contained — the
  * `pharma_q00_raw_feed` query dumps the RAW flattened feed (struct
  * pull-up only, no cleaning) as parquet, and every oracle re-derives the
  * cleaned `medications` relation from it in pure DuckDB SQL (regexp
  * price extraction, try_cast, valid-price filter, refundable imputation,
  * price_category buckets). That makes the oracle an independent
  * recomputation of BOTH the cleaning pass and the query — the cleaning
  * semantics of Pharma_Ingestion_Cleaning.py:66-123,163-166 are verified,
  * not assumed. `__PHARMA_RAW__` is substituted by Verify with the
  * absolute dump path at run time.
  *
  * All queries route through the managed-table round-trip
  * (saveAsTable("medications") overwrite → spark.table) — the reference's
  * central storage contract (Pharma_Ingestion_Cleaning.py:211,218).
  */
object PharmaQueries {

  /** Cleaned feed via the catalog: write once per session as a managed
    * parquet table, read back by name — the S4/S5 round-trip of
    * SURVEY.md §2.1 (Delta on Databricks; parquet saveAsTable has the
    * identical overwrite + read-back-by-name semantics here). */
  private[graft] def medications(s: SparkSession): DataFrame = {
    // Qualified name throughout: an unqualified "medications" can be
    // shadowed by a temp view (DashboardSql registers one on the same
    // session), which would satisfy tableExists AND win name resolution —
    // silently skipping the managed-table round-trip.
    if (!s.catalog.tableExists("default.medications")) {
      // orphan-location cleanup (previous-session leftovers) lives in the
      // shared helper — see TableStore.clearOrphanLocation
      graft.core.TableStore.overwriteTable(s, "default.medications",
        Cleaning.all(MedsFeed.fromJsonString(s, PharmaFixture.feedJson())))
    }
    s.table("default.medications")
  }

  /** Raw flattened feed (S2 JSON map-of-lists flatten + struct pull-up,
    * pre-cleaning). Dumped by Verify; the other pharma oracles read this
    * parquet back in DuckDB. Rows-only itself — it IS the fixture. */
  val pharmaRawFeed = GraftQuery(
    "pharma_q00_raw_feed",
    (s, _) => Cleaning.structFlatten(
      MedsFeed.fromJsonString(s, PharmaFixture.feedJson()))
      .drop("lab", "class"))

  /** Labs directory via the catalog — the reference's SECOND source
    * (S8, `url_labs` declared Pharma_Ingestion_Cleaning.py:16 and never
    * ingested there; SURVEY.md §2.1). Same managed-table round-trip as
    * `medications`. */
  private[graft] def labs(s: SparkSession): DataFrame = {
    if (!s.catalog.tableExists("default.labs")) {
      graft.core.TableStore.overwriteTable(s, "default.labs",
        LabsFeed.fromJsonString(s, PharmaFixture.labsJson()))
    }
    s.table("default.labs")
  }

  /** Shared DuckDB re-derivation of the cleaned medications relation from
    * the raw dump — mirrors Cleaning.priceExtract/validPriceFilter/
    * refundableImpute/priceCategory exactly. */
  private val MedsCte: String =
    """WITH priced AS (
      |  SELECT *, try_cast(regexp_extract(reference_rate, '(\d+)', 1) AS INT) AS price
      |  FROM read_parquet('__PHARMA_RAW__/*.parquet')),
      |medications AS (
      |  SELECT *, coalesce(refundable, false) AS refundable_clean,
      |    CASE WHEN price <= 100 THEN 'Low'
      |         WHEN price <= 500 THEN 'Medium' ELSE 'High' END AS price_category
      |  FROM priced WHERE price IS NOT NULL AND price > 0)""".stripMargin

  private def dash(n: Int, name: String, oracle: String) = GraftQuery(
    name, (s, _) => Dashboard.all(n)(medications(s)), Some(s"$MedsCte\n$oracle"))

  /** Ingest → clean triage accounting (the reference's manual audit,
    * Pharma_Ingestion_Cleaning.py:100-112) — oracle runs on the raw dump
    * BEFORE the valid-price filter. */
  val pharmaTriage = GraftQuery(
    "pharma_triage",
    (s, _) => Cleaning.priceTriage(
      Cleaning.structFlatten(MedsFeed.fromJsonString(s, PharmaFixture.feedJson()))),
    Some("""SELECT count(*) AS total,
      count(CASE WHEN price IS NULL THEN 1 END) AS null_price,
      count(CASE WHEN price = 0 THEN 1 END) AS zero_price,
      count(CASE WHEN price > 0 THEN 1 END) AS valid_price
      FROM (SELECT try_cast(regexp_extract(reference_rate, '(\d+)', 1) AS INT) AS price
            FROM read_parquet('__PHARMA_RAW__/*.parquet')) priced"""))

  val pharmaKpi = dash(1, "pharma_q01_kpi",
    """SELECT count(*) AS total_medications,
      count(DISTINCT lab_name) AS manufacturers,
      count(DISTINCT therapeutic_class) AS disease_categories,
      round(avg(price), 0) AS avg_price_DA,
      round(percentile_cont(0.5) WITHIN GROUP (ORDER BY price), 0) AS median_price_DA,
      max(price) AS most_expensive_DA
      FROM medications""")

  val pharmaDiseaseArea = dash(2, "pharma_q02_disease_area",
    """SELECT therapeutic_class AS disease_area, count(*) AS drug_count,
      round(avg(price), 0) AS avg_price_DA,
      round(min(price), 0) AS min_price_DA,
      round(max(price), 0) AS max_price_DA
      FROM medications WHERE therapeutic_class IS NOT NULL
      GROUP BY therapeutic_class HAVING count(*) >= 30
      ORDER BY avg_price_DA DESC LIMIT 12""")

  val pharmaManufacturers = dash(3, "pharma_q03_manufacturers",
    """SELECT lab_name AS manufacturer, count(*) AS products,
      round(avg(price), 0) AS avg_price_DA,
      count(DISTINCT therapeutic_class) AS disease_areas
      FROM medications WHERE lab_name IS NOT NULL
      GROUP BY lab_name ORDER BY products DESC LIMIT 10""")

  val pharmaSegmentation = dash(4, "pharma_q04_segmentation",
    """SELECT price_category, count(*) AS medications_count,
      round(avg(price), 0) AS avg_price_DA,
      round(count(*) * 100.0 / (SELECT count(*) FROM medications), 1) AS market_pct
      FROM medications GROUP BY price_category""")

  val pharmaForms = dash(5, "pharma_q05_forms",
    """SELECT form, count(*) AS count,
      round(avg(price), 0) AS avg_price_DA,
      round(count(*) * 100.0 /
        (SELECT count(*) FROM medications WHERE form IS NOT NULL), 1) AS market_pct
      FROM medications WHERE form IS NOT NULL
      GROUP BY form ORDER BY count DESC LIMIT 8""")

  val pharmaExpensive = dash(6, "pharma_q06_most_expensive",
    """SELECT name, therapeutic_class AS disease_area, lab_name AS manufacturer,
      price AS price_DA, form
      FROM medications WHERE price IS NOT NULL
      ORDER BY price_DA DESC, name LIMIT 15""")

  val pharmaAffordability = dash(7, "pharma_q07_affordability",
    """SELECT
      round(count(CASE WHEN price <= 100 THEN 1 END) * 100.0 / count(*), 1) AS affordable_drugs_pct,
      round(count(CASE WHEN price > 500 THEN 1 END) * 100.0 / count(*), 1) AS premium_drugs_pct,
      round(avg(CASE WHEN price <= 100 THEN price END), 0) AS avg_affordable_price_DA
      FROM medications WHERE price IS NOT NULL""")

  val pharmaCoverage = dash(8, "pharma_q08_disease_coverage",
    """SELECT count(*) AS disease_areas_covered,
      round(avg(drugs_per_area), 0) AS avg_drugs_per_disease_area
      FROM (SELECT therapeutic_class, count(*) AS drugs_per_area
            FROM medications WHERE therapeutic_class IS NOT NULL
            GROUP BY therapeutic_class) per_area""")

  val pharmaMfrSize = dash(9, "pharma_q09_manufacturer_size",
    """SELECT manufacturer_size, count(DISTINCT lab_name) AS manufacturers,
      round(avg(avg_price), 0) AS avg_price_DA,
      CAST(sum(product_count) AS BIGINT) AS total_products
      FROM (SELECT lab_name, count(*) AS product_count, avg(price) AS avg_price,
              CASE WHEN count(*) >= 100 THEN 'Large (100+ products)'
                   WHEN count(*) >= 50 THEN 'Medium (50-99 products)'
                   ELSE 'Small (<50 products)' END AS manufacturer_size
            FROM medications WHERE lab_name IS NOT NULL AND price IS NOT NULL
            GROUP BY lab_name) per_lab
      GROUP BY manufacturer_size ORDER BY avg_price_DA DESC""")

  val pharmaIngredients = dash(10, "pharma_q10_ingredients",
    """SELECT generic AS active_ingredient, count(*) AS formulations,
      round(avg(price), 0) AS avg_price_DA,
      count(DISTINCT lab_name) AS manufacturers
      FROM medications WHERE generic IS NOT NULL AND generic != ''
      GROUP BY generic ORDER BY formulations DESC LIMIT 10""")

  val pharmaHistogram = dash(11, "pharma_q11_histogram",
    """SELECT CASE WHEN price <= 50 THEN '0-50 DA'
        WHEN price <= 100 THEN '51-100 DA'
        WHEN price <= 200 THEN '101-200 DA'
        WHEN price <= 500 THEN '201-500 DA'
        WHEN price <= 1000 THEN '501-1000 DA'
        ELSE '1000+ DA' END AS price_range,
      count(*) AS medications
      FROM medications WHERE price IS NOT NULL GROUP BY 1""")

  val pharmaInsurance = dash(12, "pharma_q12_insurance",
    """SELECT CASE WHEN refundable = true THEN 'Covered by Insurance'
        WHEN refundable = false THEN 'Not Covered'
        ELSE 'Unknown' END AS coverage_status,
      count(*) AS medications_count,
      round(avg(price), 0) AS avg_price_DA,
      round(count(*) * 100.0 / (SELECT count(*) FROM medications), 1) AS percentage
      FROM medications GROUP BY 1""")

  val pharmaMlDataset = dash(13, "pharma_q13_ml_dataset",
    """SELECT price, form, therapeutic_class, pharmacological_class, lab_name,
      coalesce(refundable, false) AS refundable_label
      FROM medications
      WHERE price IS NOT NULL AND form IS NOT NULL
        AND therapeutic_class IS NOT NULL AND pharmacological_class IS NOT NULL
        AND lab_name IS NOT NULL""")

  val pharmaBalance = dash(14, "pharma_q14_class_balance",
    """SELECT CASE WHEN refundable = true THEN 'Covered' ELSE 'Not Covered' END AS label,
      count(*) AS count,
      round(count(*) * 100.0 / (SELECT count(*) FROM medications), 1) AS percentage
      FROM medications GROUP BY 1""")

  /** Raw labs directory, dumped by Verify so the lab-join oracle can
    * read it back in DuckDB (`__LABS_RAW__` substitution) — the same
    * self-contained-oracle pattern as pharma_q00_raw_feed. Rows-only
    * itself. (Declared AFTER MedsCte: object vals initialize in
    * declaration order, and the directory oracle interpolates MedsCte.) */
  val pharmaLabsRaw = GraftQuery(
    "pharma_labs_raw", (s, _) => labs(s))

  /** medications ⋈ labs — the two-source join S8 enables: per-lab
    * product stats decorated with the directory fields. Plan shape:
    * aggregate the fact side FIRST (one shuffle on lab_name, output =
    * |labs| rows), then left-join the model-sized directory — the
    * pre-aggregation keeps the join input tiny at any corpus scale, and
    * labs with no medications survive with products = 0 (left join from
    * the directory side). */
  val pharmaLabDirectory = GraftQuery(
    "pharma_q15_lab_directory",
    { (s, _) =>
      val perLab = medications(s).filter(col("lab_name").isNotNull)
        .groupBy(col("lab_name"))
        .agg(count(lit(1)).as("products"),
          round(avg(col("price")), 0).as("avg_price_DA"))
      labs(s).select(col("name").as("lab_name"), col("wilaya"), col("web"))
        .join(perLab, Seq("lab_name"), "left")
        .select(col("lab_name"), col("wilaya"), col("web"),
          coalesce(col("products"), lit(0L)).as("products"),
          col("avg_price_DA"))
        .orderBy(col("products").desc, col("lab_name"))
    },
    Some(s"""$MedsCte,
      labs AS (SELECT * FROM read_parquet('__LABS_RAW__/*.parquet'))
      SELECT l.name AS lab_name, l.wilaya, l.web,
        coalesce(p.products, 0) AS products, p.avg_price_DA
      FROM labs l LEFT JOIN (
        SELECT lab_name, count(*) AS products,
          round(avg(price), 0) AS avg_price_DA
        FROM medications WHERE lab_name IS NOT NULL
        GROUP BY lab_name) p
      ON p.lab_name = l.name
      ORDER BY products DESC, lab_name"""))

  /** Distributed MLlib replacement for the reference's sklearn stage —
    * not SQL-expressible (RF training); metric floors, per-class P/R, and
    * the persistence round-trip are asserted in PharmaMlSpec. */
  val pharmaMlMetrics = GraftQuery(
    "pharma_ml_metrics",
    (s, _) => InsuranceModel.metricsDf(s, Dashboard.mlDataset(medications(s))))

  val all: Seq[GraftQuery] = Seq(
    pharmaRawFeed, pharmaLabsRaw, pharmaTriage, pharmaKpi, pharmaDiseaseArea,
    pharmaManufacturers, pharmaSegmentation, pharmaForms, pharmaExpensive,
    pharmaAffordability, pharmaCoverage, pharmaMfrSize, pharmaIngredients,
    pharmaHistogram, pharmaInsurance, pharmaMlDataset, pharmaBalance,
    pharmaLabDirectory, pharmaMlMetrics)
}
