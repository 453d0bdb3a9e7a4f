package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection (Achlioptas 2003 sign
  * variant) for embedding dimensionality reduction ahead of LSH /
  * coarse search: y_j = Σ_d x_d·s(d,j) / √outDim with s(d,j) ∈ {±1}
  * drawn from a DETERMINISTIC integer hash of (input dim, output dim) —
  * no RNG state, no stored matrix, any engine regenerates the same
  * projection from the formula alone. A narrow per-row map (no
  * shuffle); at 100 TB the projected column simply replaces the wide
  * one downstream, cutting every subsequent distance kernel and
  * exchange by inDim/outDim.
  *
  * Exactness note (why q117 can carry a hash-exact oracle): each
  * product x_d·(±1) is an exact float, and a sum of ≤64 float-mantissa
  * (24-bit) values is exact in double arithmetic PROVIDED the summand
  * exponents span fewer than ~29 binary orders of magnitude (53 − 24;
  * beyond that the smallest mantissas fall off the end of the double
  * and the fold becomes order-dependent). The driver's embeddings are
  * unit-scale with components well above 1e-8, so the assumption holds
  * for this fixture — a corpus with denormal-adjacent components would
  * need a tolerance-based oracle instead, with round(·,6) ties as the
  * failure mode. √16 = 4 is a power of two, so the final division is
  * exact; under the bounded-dynamic-range assumption both engines
  * produce bit-identical projections. */
object Projection {

  /** ±1 sign for (input dim d, output dim j) — overflow-safe masked
    * integer arithmetic, replayable in ANSI SQL: the d-hash MULTIPLIED
    * by a j-derived odd factor (nonlinear in (d, j) jointly), mod a
    * small odd prime, thresholded at its midpoint. An additive d/j mix
    * here is an arithmetic progression mod the prime — its sign columns
    * correlate (gram off-diagonals up to 1.0) and the projection stops
    * being JL; the product form measures ≈ 0.09 mean column coherence
    * and the expected ≈ 1/√outDim cosine distortion. */
  private def sign(d: Column, j: Column): Column =
    when((((d * 2654435761L) % 4294967296L) * (j * 40503L + 1L))
      % 4294967296L % 1009L < 504L, lit(1.0)).otherwise(lit(-1.0))

  /** Project `vecCol` (array<float|double>, inDim elements) to an
    * array<double> of `outDim` via the sign matrix. Pure Column
    * expression — composes under whole-stage codegen consumers; the
    * inner fold is interpreted HOF arithmetic (outDim·inDim ops/row),
    * the same budget class as the sketch expressions. */
  def project(vecCol: Column, outDim: Int): Column = {
    val scale = math.sqrt(outDim.toDouble)
    transform(sequence(lit(0), lit(outDim - 1)), j =>
      aggregate(
        zip_with(vecCol,
          sequence(lit(0), size(vecCol) - 1),
          (x, d) => x.cast("double") * sign(d.cast("long"), j.cast("long"))),
        lit(0.0), (acc, v) => acc + v) / scale)
  }

  /** Convenience: (idCol, projected) relation. */
  def projectRelation(df: DataFrame, idCol: String, vecCol: String,
      outDim: Int): DataFrame =
    df.select(col(idCol), project(col(vecCol), outDim).as("projected"))

  /** Projection-accelerated sign-LSH ANN: hash, bucket and
    * candidate-rank in the `outDim`-d PROJECTED space (every signature
    * and candidate cosine costs inDim/outDim less), then rerank the
    * top `rerank` candidates per query by EXACT cosine in the original
    * space — the standard reduce→bucket→rerank stack (Indyk–Motwani
    * LSH over a JL sketch). Same output shape as Similarity.lshTopK;
    * recall vs brute force floor-asserted in ProjectionSpec and
    * emitted in the bench recall block. */
  def projectedLshTopK(
      corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String,
      k: Int, outDim: Int = 16, planes: Int = 4, tables: Int = 16,
      rerank: Int = 30): DataFrame = {
    val cp = corpus.select(col(corpusId).as("__cid"),
      project(col(corpusVec), outDim).as("pv"))
    val qp = queries.select(col(queryId).as("__qid"),
      project(col(queryVec), outDim).as("pv"))
    val cand = Similarity.lshTopK(cp, qp, "__cid", "pv", "__qid", "pv",
        k = rerank, planes = planes, tables = tables)
      .select(col("query_id"), col("neighbor_id"))
    val c = corpus.select(col(corpusId).cast("long").as("neighbor_id"),
      col(corpusVec).as("cv"))
    val q = queries.select(col(queryId).cast("long").as("query_id"),
      col(queryVec).as("qv"))
    val scored = cand
      .join(c, Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cos", Similarity.cosine(col("qv"), col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }
}
