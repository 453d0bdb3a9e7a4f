package graft

import graft.pharma.{Cleaning, Dashboard, DashboardSql, MedsFeed, PharmaFixture}

/** SQL front door ≡ DataFrame API: every dashboard query must produce the
  * identical relation through spark.sql as through the Column-based twin
  * — the reference's own entry point is SQL (SURVEY.md §3.2), so the SQL
  * surface is part of parity, not an optional extra. */
class PharmaSqlSpec extends SparkTestBase {

  private lazy val meds = Cleaning.all(
    MedsFeed.fromJsonString(spark, PharmaFixture.feedJson())).cache()

  (1 to 14).foreach { n =>
    test(s"dashboard query $n: SQL and DataFrame forms are identical") {
      val viaSql = DashboardSql.run(spark, meds, n)
      val viaDf = Dashboard.all(n)(meds)
      assert(viaSql.columns.sorted.toSeq === viaDf.columns.sorted.toSeq)
      assert(viaSql.exceptAll(viaDf).count() === 0L,
        s"rows in SQL form missing from DataFrame form")
      assert(viaDf.exceptAll(viaSql).count() === 0L,
        s"rows in DataFrame form missing from SQL form")
    }
  }
}
