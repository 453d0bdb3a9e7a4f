package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.queries.CurationQueries

/** Contracts for the provenance audit (q113) and the two-phase exact
  * stratified sampler (q116). */
class CurationAuditSpec extends SparkTestBase {

  test("q113 provenance audit: reasons partition the corpus, precedence is first-fail, pct sums to 100 per source") {
    val out = CurationQueries.q113ProvenanceAudit.run(spark, sfDir).cache()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    // every document lands in exactly one (source, reason) bucket
    assert(out.agg(sum("docs")).head().getLong(0) === docs)
    // per-source shares sum to 100 (±rounding)
    out.groupBy("source").agg(sum("pct_of_source").as("p")).collect()
      .foreach(r => assert(math.abs(r.getDouble(1) - 100.0) < 0.11,
        s"${r.getString(0)}: ${r.getDouble(1)}"))
    // precedence: a 1_too_short bucket can also fail later gates, so its
    // avg_gates_failed may exceed 1; a 4_kept bucket fails exactly zero
    out.filter(col("reason") === "4_kept").collect()
      .foreach(r => assert(r.getAs[Double]("avg_gates_failed") === 0.0))
    out.unpersist()
  }

  test("q116 two-phase stratified sample equals the naive single-window sample; exact quota per stratum") {
    val k = 40
    val twoPhase = CurationQueries.q116StratifiedSample.run(spark, sfDir)
    // naive form: one global window per stratum over ALL rows
    val h = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("lang"), col("doc_id"),
        (((pmod(col("doc_id"), lit(2147483648L)) * (2246822519L % 4294967296L))
          % 4294967296L) % 1000000L).as("hkey"))
    val w = Window.partitionBy(col("lang")).orderBy(col("hkey"), col("doc_id"))
    val naive = h.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("lang"), col("rk"), col("doc_id"))
    assert(twoPhase.exceptAll(naive).isEmpty && naive.exceptAll(twoPhase).isEmpty,
      "two-phase sample must select the identical membership")
    // exact quota: min(k, stratum size) rows per lang
    val sizes = h.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    twoPhase.groupBy("lang").count().collect().foreach { r =>
      assert(r.getLong(1) === math.min(k.toLong, sizes(r.getString(0))))
    }
    // prefilter survivor count must cover the quota at this fixture
    // (the 4× safety margin the two-phase plan relies on)
    val n = h.groupBy(col("lang")).agg(count(lit(1)).as("nl"))
    val survivors = h.join(n, Seq("lang"))
      .filter(col("hkey") < ceil(lit(k) * 4 * 1000000.0 / col("nl")).cast("long"))
      .groupBy("lang").count().collect()
    survivors.foreach(r => assert(r.getLong(1) >= math.min(k.toLong, sizes(r.getString(0)))))
  }
}
