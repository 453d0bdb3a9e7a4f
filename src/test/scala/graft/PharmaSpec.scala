package graft

import org.apache.spark.sql.functions._

import graft.pharma.{Cleaning, Dashboard, MedsFeed, PharmaFixture}
import graft.queries.PharmaQueries

/** Golden-value suite for the cloned reference workload: the fixture feed
  * is deterministic (PharmaFixture), so ingest/clean/dashboard results are
  * constants — asserted here against hand-checked values, independently of
  * the DuckDB oracle gate. Mirrors the reference's own manual audits
  * (Pharma_Ingestion_Cleaning.py:100-112,140-148,218-224). */
class PharmaSpec extends SparkTestBase {

  private lazy val raw =
    Cleaning.structFlatten(MedsFeed.fromJsonString(spark, PharmaFixture.feedJson()))
  private lazy val meds = Cleaning.all(
    MedsFeed.fromJsonString(spark, PharmaFixture.feedJson())).cache()

  test("triage partitions the feed: total = null + zero + valid") {
    val r = Cleaning.priceTriage(raw).head()
    assert(r.getAs[Long]("total") === 300L)
    assert(r.getAs[Long]("null_price") === 90L)
    assert(r.getAs[Long]("zero_price") === 15L)
    assert(r.getAs[Long]("valid_price") === 195L)
    assert(r.getAs[Long]("total") ===
      r.getAs[Long]("null_price") + r.getAs[Long]("zero_price") + r.getAs[Long]("valid_price"))
  }

  test("observed clean: triage metrics ride the single cleaning pass") {
    val (cleaned, obs) = Cleaning.observedClean(
      MedsFeed.fromJsonString(spark, PharmaFixture.feedJson()))
    // ONE action drives both the cleaned result and the audit metrics
    assert(cleaned.count() === 195L)
    val m = obs.get
    assert(m("total") === 300L)
    assert(m("null_price") === 90L)
    assert(m("zero_price") === 15L)
    assert(m("valid_price") === 195L)
  }

  test("KPI golden row (dashboard query 1)") {
    val r = Dashboard.marketOverview(meds).head()
    assert(r.getAs[Long]("total_medications") === 195L)
    assert(r.getAs[Long]("manufacturers") === 6L)
    assert(r.getAs[Long]("disease_categories") === 6L)
    assert(r.getAs[Double]("avg_price_DA") === 547.0)
    assert(r.getAs[Double]("median_price_DA") === 200.0)
    assert(r.getAs[Int]("most_expensive_DA") === 2500)
  }

  test("class balance golden rows (dashboard query 14)") {
    val rows = Dashboard.classBalance(meds).collect()
      .map(r => (r.getAs[String]("label"), r.getAs[Long]("count"))).toMap
    assert(rows === Map("Covered" -> 92L, "Not Covered" -> 103L))
  }

  test("price_category boundaries: Low <= 100 < Medium <= 500 < High") {
    import spark.implicits._
    val df = Seq(50, 100, 101, 500, 501).toDF("price")
    val cats = Cleaning.priceCategory(df).orderBy("price")
      .collect().map(_.getAs[String]("price_category")).toSeq
    assert(cats === Seq("Low", "Low", "Medium", "Medium", "High"))
  }

  test("histogram bucket boundaries at 50/100/200/500/1000") {
    import spark.implicits._
    val df = Seq(50, 51, 100, 101, 200, 201, 500, 501, 1000, 1001).toDF("price")
    val got = Dashboard.priceHistogram(df)
      .collect().map(r => r.getAs[String]("price_range") -> r.getAs[Long]("medications")).toMap
    assert(got === Map(
      "0-50 DA" -> 1L, "51-100 DA" -> 2L, "101-200 DA" -> 2L,
      "201-500 DA" -> 2L, "501-1000 DA" -> 2L, "1000+ DA" -> 1L))
  }

  test("price extraction: dirty inputs become NULL, digits extract") {
    import spark.implicits._
    val df = Seq("150.00 DA", "", "gratuit", null, "0 DA").toDF("reference_rate")
    val prices = Cleaning.priceExtract(df).collect().map(r =>
      Option(r.getAs[Integer]("price")).map(_.toInt))
    assert(prices.toSeq === Seq(Some(150), None, None, None, Some(0)))
  }

  test("catalog round-trip: saveAsTable overwrite + re-read by name") {
    val fromCatalog = PharmaQueries.medications(spark)
    assert(spark.catalog.tableExists("medications"))
    assert(fromCatalog.count() === meds.count())
    assert(fromCatalog.columns.sorted.toSeq === meds.columns.sorted.toSeq)
    // second call must reuse the saved table, not rewrite
    assert(PharmaQueries.medications(spark).count() === 195L)
  }

  test("lab directory join (S8): every lab kept, product totals reconcile") {
    val dir = PharmaQueries.pharmaLabDirectory.run(spark, sfDir).cache()
    // left join from the directory: all 8 labs survive, the two with no
    // medications at products = 0 with NULL avg price
    assert(dir.count() === 8L)
    val misses = dir.filter(col("products") === 0L)
    assert(misses.select("lab_name").collect().map(_.getString(0)).toSet ===
      Set("SAIDAL", "GENERIS"))
    assert(misses.filter(col("avg_price_DA").isNotNull).count() === 0L)
    // per-lab products sum back to the cleaned feed's lab_name rows
    val total = dir.agg(sum("products")).head().getLong(0)
    assert(total === meds.filter(col("lab_name").isNotNull).count())
  }

  test("ML dataset projection has no nulls in any feature column (query 13)") {
    val ds = Dashboard.mlDataset(meds)
    assert(ds.count() === 161L)
    val nullCounts = ds.select(ds.columns.map(c =>
      count(when(col(c).isNull, 1)).as(c)).toSeq: _*).head()
    ds.columns.indices.foreach(i => assert(nullCounts.getLong(i) === 0L))
  }

  test("typed Dataset[Medication] view round-trips the feed") {
    val typed = graft.pharma.MedsFeed.typed(raw)
    assert(typed.count() === 300L)
    // compile-time field access through the case class
    val withLab = typed.filter(m => m.lab.exists(_.name.isDefined)).count()
    val withLabDf = raw.filter(col("lab.name").isNotNull).count()
    assert(withLab === withLabDf)
  }

  test("coverage tri-state percentages sum to ~100 (query 12)") {
    val pctSum = Dashboard.coverageStatus(meds)
      .agg(sum(col("percentage"))).head().getDouble(0)
    assert(math.abs(pctSum - 100.0) <= 0.2)
  }
}
