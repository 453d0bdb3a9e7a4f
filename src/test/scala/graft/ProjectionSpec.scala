package graft

import org.apache.spark.sql.functions._

import graft.ops.Projection

/** Exactness and JL-quality contracts for the sign random projection. */
class ProjectionSpec extends SparkTestBase {

  import spark.implicits._

  private def signOf(d: Int, j: Int): Double =
    if ((d.toLong * 2654435761L % 4294967296L) * (j.toLong * 40503L + 1L)
      % 4294967296L % 1009L < 504L) 1.0 else -1.0

  test("projection equals the plain-Scala formula BIT-EXACTLY (order-independent fold)") {
    val vec = Array.tabulate(64)(d => (math.sin(d * 1.7) * 3).toFloat)
    val expected = Array.tabulate(16) { j =>
      vec.zipWithIndex.map { case (x, d) => x.toDouble * signOf(d, j) }.sum / 4.0
    }
    val got = Seq((1L, vec)).toDF("vec_id", "embedding")
      .select(Projection.project(col("embedding"), 16).as("p"))
      .head().getSeq[Double](0)
    got.zip(expected).foreach { case (g, e) =>
      assert(g === e, s"bit mismatch: $g vs $e")
    }
  }

  test("JL property: projected cosines track original cosines on fixture pairs") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") < 60)
    val proj = e.select(col("vec_id"),
      Projection.project(col("embedding"), 16).as("p"),
      transform(col("embedding"), _.cast("double")).as("o"))
    def cos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, v) => s + v)
      val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (s, v) => s + v))
      val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (s, v) => s + v))
      dot / (na * nb)
    }
    val l = proj.select(col("vec_id").as("i"), col("p").as("pi"), col("o").as("oi"))
    val r = proj.select(col("vec_id").as("k"), col("p").as("pk"), col("o").as("ok"))
    val stats = l.crossJoin(r).filter(col("i") < col("k"))
      .select(abs(cos(col("pi"), col("pk")) - cos(col("oi"), col("ok"))).as("d"))
      .agg(avg(col("d")).as("mean_dist"), max(col("d")).as("max_dist")).head()
    // 64→16 sign JL: per-pair distortion concentrates around 1/√16
    // (measured mean 0.195, max 0.815 over these 1770 pairs)
    assert(stats.getDouble(0) < 0.25, s"mean cosine distortion ${stats.getDouble(0)}")
    assert(stats.getDouble(1) < 0.9, s"max cosine distortion ${stats.getDouble(1)}")
  }

  test("projected LSH + exact rerank holds recall against brute force (q34c path)") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 5)
    val brute = graft.ops.Similarity.bruteForceTopKPartial(
        e, queries, "vec_id", "embedding", "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val proj = Projection.projectedLshTopK(
        e, queries, "vec_id", "embedding", "vec_id", "embedding", k = 10,
        outDim = 48, planes = 4, tables = 24, rerank = 100)
      .select(col("query_id"), col("neighbor_id"))
    val total = brute.count().toDouble
    val hits = proj.join(brute, Seq("query_id", "neighbor_id")).count()
    // the registered q34c config (48-d, 24 tables, 20 % rerank cut):
    // the round-14 sweep measured 0.82 at n=2000 and this fixture
    // (n=500, same cut fraction) sits at 0.80 — floor with headroom
    // for LSH table-seed sensitivity, still far above the 0.62 the
    // superseded 32-d/16-table/10 % config scored
    assert(hits / total >= 0.7, s"projected-LSH recall ${hits / total}")
  }
}
