package graft

import org.apache.spark.sql.functions._

import graft.queries.TextVectorQueries

/** Mergeable HLL sketch contracts beyond the oracle rows: merge-order
  * and split-choice independence — the properties that make persisted
  * per-shard sketches safe to combine in any order at refresh time. */
class SketchSpec extends SparkTestBase {

  import spark.implicits._

  test("q115 row pins union=global and the error envelope on the fixture") {
    val r = TextVectorQueries.q115HllMergeable.run(spark, sfDir).head()
    assert(r.getAs[Boolean]("union_equals_global"))
    assert(r.getAs[Boolean]("rel_err_within_6pct"))
    assert(r.getAs[Long]("exact_distinct") > 0)
  }

  test("sketch merge is split-invariant: any batch partition unions to the same estimate") {
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
    def mergedEst(m: Int): Long = {
      val parts = toks.withColumn("part", col("doc_id") % m)
        .groupBy("part").agg(hll_sketch_agg(col("token"), lit(14)).as("sk"))
      parts.agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
        .head().getLong(0)
    }
    val ests = Seq(2, 3, 10).map(mergedEst)
    assert(ests.distinct.size === 1, s"split-dependent estimates: $ests")
    val direct = toks.agg(
      hll_sketch_estimate(hll_sketch_agg(col("token"), lit(14))))
      .head().getLong(0)
    assert(ests.head === direct)
  }
}
