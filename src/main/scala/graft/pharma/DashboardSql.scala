package graft.pharma

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The dashboard workload through the SQL front door (SURVEY.md §3.2 —
  * the reference's own entry point is 14 Spark SQL statements over the
  * `medications` catalog table). One statement per query, numbered like
  * `pharmaceutical_dashboard_queries.sql`; semantics re-expressed, column
  * names identical to the DataFrame twins in [[Dashboard]], and
  * SQL ≡ DataFrame equivalence asserted per query in PharmaSqlSpec.
  *
  * Percentage/ratio columns cast to DOUBLE before rounding: a `100.0`
  * literal is DECIMAL in Spark SQL (unlike the DataFrame API's double),
  * and the decimal ratio would change the result type. */
object DashboardSql {

  val sql: Map[Int, String] = Map(
    1 -> """SELECT count(*) AS total_medications,
      count(DISTINCT lab_name) AS manufacturers,
      count(DISTINCT therapeutic_class) AS disease_categories,
      round(avg(price), 0) AS avg_price_DA,
      round(percentile(price, 0.5), 0) AS median_price_DA,
      max(price) AS most_expensive_DA
      FROM medications""",
    2 -> """SELECT therapeutic_class AS disease_area, count(*) AS drug_count,
      round(avg(price), 0) AS avg_price_DA,
      round(cast(min(price) AS DOUBLE), 0) AS min_price_DA,
      round(cast(max(price) AS DOUBLE), 0) AS max_price_DA
      FROM medications WHERE therapeutic_class IS NOT NULL
      GROUP BY therapeutic_class HAVING count(*) >= 30
      ORDER BY avg_price_DA DESC LIMIT 12""",
    3 -> """SELECT lab_name AS manufacturer, count(*) AS products,
      round(avg(price), 0) AS avg_price_DA,
      count(DISTINCT therapeutic_class) AS disease_areas
      FROM medications WHERE lab_name IS NOT NULL
      GROUP BY lab_name ORDER BY products DESC LIMIT 10""",
    4 -> """SELECT price_category, count(*) AS medications_count,
      round(avg(price), 0) AS avg_price_DA,
      round(cast(count(*) * 100.0 / (SELECT count(*) FROM medications) AS DOUBLE), 1)
        AS market_pct
      FROM medications GROUP BY price_category
      ORDER BY CASE price_category WHEN 'Low' THEN 1 WHEN 'Medium' THEN 2 ELSE 3 END""",
    5 -> """SELECT form, count(*) AS count,
      round(avg(price), 0) AS avg_price_DA,
      round(cast(count(*) * 100.0 /
        (SELECT count(*) FROM medications WHERE form IS NOT NULL) AS DOUBLE), 1)
        AS market_pct
      FROM medications WHERE form IS NOT NULL
      GROUP BY form ORDER BY count DESC LIMIT 8""",
    6 -> """SELECT name, therapeutic_class AS disease_area,
      lab_name AS manufacturer, price AS price_DA, form
      FROM medications WHERE price IS NOT NULL
      ORDER BY price_DA DESC, name LIMIT 15""",
    7 -> """SELECT
      round(cast(count(CASE WHEN price <= 100 THEN 1 END) * 100.0 / count(*) AS DOUBLE), 1)
        AS affordable_drugs_pct,
      round(cast(count(CASE WHEN price > 500 THEN 1 END) * 100.0 / count(*) AS DOUBLE), 1)
        AS premium_drugs_pct,
      round(avg(CASE WHEN price <= 100 THEN price END), 0) AS avg_affordable_price_DA
      FROM medications WHERE price IS NOT NULL""",
    8 -> """SELECT count(*) AS disease_areas_covered,
      round(avg(drugs_per_area), 0) AS avg_drugs_per_disease_area
      FROM (SELECT therapeutic_class, count(*) AS drugs_per_area
            FROM medications WHERE therapeutic_class IS NOT NULL
            GROUP BY therapeutic_class)""",
    9 -> """SELECT manufacturer_size, count(DISTINCT lab_name) AS manufacturers,
      round(avg(avg_price), 0) AS avg_price_DA,
      sum(product_count) AS total_products
      FROM (SELECT lab_name, count(*) AS product_count, avg(price) AS avg_price,
              CASE WHEN count(*) >= 100 THEN 'Large (100+ products)'
                   WHEN count(*) >= 50 THEN 'Medium (50-99 products)'
                   ELSE 'Small (<50 products)' END AS manufacturer_size
            FROM medications WHERE lab_name IS NOT NULL AND price IS NOT NULL
            GROUP BY lab_name)
      GROUP BY manufacturer_size ORDER BY avg_price_DA DESC""",
    10 -> """SELECT generic AS active_ingredient, count(*) AS formulations,
      round(avg(price), 0) AS avg_price_DA,
      count(DISTINCT lab_name) AS manufacturers
      FROM medications WHERE generic IS NOT NULL AND generic != ''
      GROUP BY generic ORDER BY formulations DESC LIMIT 10""",
    11 -> """SELECT CASE WHEN price <= 50 THEN '0-50 DA'
        WHEN price <= 100 THEN '51-100 DA'
        WHEN price <= 200 THEN '101-200 DA'
        WHEN price <= 500 THEN '201-500 DA'
        WHEN price <= 1000 THEN '501-1000 DA'
        ELSE '1000+ DA' END AS price_range,
      count(*) AS medications
      FROM medications WHERE price IS NOT NULL
      GROUP BY 1 ORDER BY min(price)""",
    12 -> """SELECT CASE WHEN refundable = true THEN 'Covered by Insurance'
        WHEN refundable = false THEN 'Not Covered'
        ELSE 'Unknown' END AS coverage_status,
      count(*) AS medications_count,
      round(avg(price), 0) AS avg_price_DA,
      round(cast(count(*) * 100.0 / (SELECT count(*) FROM medications) AS DOUBLE), 1)
        AS percentage
      FROM medications GROUP BY 1 ORDER BY medications_count DESC""",
    13 -> """SELECT price, form, therapeutic_class, pharmacological_class, lab_name,
      coalesce(refundable, false) AS refundable_label
      FROM medications
      WHERE price IS NOT NULL AND form IS NOT NULL
        AND therapeutic_class IS NOT NULL AND pharmacological_class IS NOT NULL
        AND lab_name IS NOT NULL""",
    14 -> """SELECT CASE WHEN refundable = true THEN 'Covered' ELSE 'Not Covered' END
        AS label,
      count(*) AS count,
      round(cast(count(*) * 100.0 / (SELECT count(*) FROM medications) AS DOUBLE), 1)
        AS percentage
      FROM medications GROUP BY 1 ORDER BY label""")

  /** Run query `n` through spark.sql against the given cleaned frame
    * (registered as the `medications` view, the reference's table name). */
  def run(spark: SparkSession, meds: DataFrame, n: Int): DataFrame = {
    meds.createOrReplaceTempView("medications")
    spark.sql(sql(n))
  }
}
