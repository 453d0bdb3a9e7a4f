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

  test("per-source MinHash signature estimates a KNOWN mid-range Jaccard (q118b estimator, non-degenerate regime)") {
    // two sources over a constructed vocabulary: A = w0..w599,
    // B = w300..w899 → |∩| = 300, |∪| = 900, J = 1/3. One word per doc
    // exercises the doc-signature element-min fold (signature of the
    // union of singletons = per-source signature).
    val rows = (0 until 600).map(i => ("a", s"w$i")) ++
      (300 until 900).map(i => ("b", s"w$i"))
    val d = rows.toDF("source", "text")
    val k = 256
    val sig = d.select(col("source"),
        posexplode(graft.functions.SketchExpressions.minhashSignature(
          transform(graft.ops.TextAnalysis.tokens(col("text")),
            t => xxhash64(t)), k)))
      .groupBy(col("source"), col("pos")).agg(min(col("col")).as("mh"))
    val est = sig.filter(col("source") === "a")
      .select(col("pos"), col("mh").as("ma"))
      .join(sig.filter(col("source") === "b")
        .select(col("pos"), col("mh").as("mb")), Seq("pos"))
      .agg((count(when(col("ma") === col("mb"), 1)) / k.toDouble))
      .head().getDouble(0)
    assert(math.abs(est - 1.0 / 3.0) < 0.1, s"J estimate $est for true 1/3")
  }
}
