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

  test("bottom-k quantile sketch: 3-way merge bit-equals from-scratch; estimates bracket the true quantile; deterministic") {
    import graft.ops.Quantiles
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), col("doc_id"),
        graft.ops.TextAnalysis.tokenCount(col("text")).cast("long").as("ntok"))
    val k = 64
    // 3-way shard merge must be bit-identical to the full-corpus sketch
    val shards = (0 until 3).map(i =>
      Quantiles.bottomKSketch(d.filter(col("doc_id") % 3 === i),
        "source", "doc_id", "ntok", k))
    val merged = Quantiles.mergeSketches(shards, k)
    val full = Quantiles.bottomKSketch(d, "source", "doc_id", "ntok", k)
    assert(merged.exceptAll(full).count() === 0L)
    assert(full.exceptAll(merged).count() === 0L)
    // p50 estimate must land inside the exact p25–p75 band per source
    // (a k=64 uniform sample's median rank error is far tighter; the
    // wide band keeps the assertion noise-proof)
    val est = Quantiles.quantileEstimates(full, Seq(0.5))
      .select(col("g").as("source"), col("est"))
    val exact = d.groupBy(col("source")).agg(
      expr("percentile(ntok, 0.25)").as("p25"),
      expr("percentile(ntok, 0.75)").as("p75"))
    val out = est.join(exact, Seq("source"))
      .filter(col("est") < col("p25") || col("est") > col("p75"))
    assert(out.count() === 0L,
      s"p50 estimates outside the p25–p75 band: ${out.collect().mkString}")
    // rerun determinism
    val again = Quantiles.bottomKSketch(d, "source", "doc_id", "ntok", k)
    assert(full.exceptAll(again).count() === 0L)
  }
}
