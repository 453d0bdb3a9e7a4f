package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns — the standard 4×
  * memory/IO reduction for vector corpora (a 100 TB float32 embedding
  * store becomes 25 TB, and ANN candidate scans become byte scans).
  *
  * Per-dimension affine quantization: q = round((x - min_d) · 255 /
  * (max_d - min_d)), dequantized as min_d + q · step. Reconstruction
  * error is bounded by step/2 per element BY CONSTRUCTION, which is what
  * the oracle asserts (a cross-engine-stable contract, like q03b's HLL
  * accuracy bound).
  *
  * Scale shape: the dimension stats are one groupBy over (dim) keys —
  * d keys total, partial-aggregated map-side — and the stats row then
  * broadcasts back; quantization itself is a narrow per-row transform.
  */
object Quantize {

  /** One-row frame of per-dimension (mins, maxs) arrays, index-aligned
    * with the vector dimensions. */
  def dimStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(transform(col(vecCol), _.cast("double"))))
      .groupBy(col("pos"))
      .agg(min(col("col")).as("mn"), max(col("col")).as("mx"))
      // collect_list order is nondeterministic after a shuffle — sort the
      // (pos, mn, mx) structs, then strip to index-aligned arrays
      .agg(array_sort(collect_list(struct(col("pos"), col("mn"), col("mx"))))
        .as("s"))
      .select(transform(col("s"), s => s.getField("mn")).as("mins"),
        transform(col("s"), s => s.getField("mx")).as("maxs"))

  private def step(mins: Column, maxs: Column, i: Column): Column =
    (element_at(maxs, i + 1) - element_at(mins, i + 1)) / 255.0

  /** Adds `qvec` (int in [0,255]) alongside the original vector; the
    * stats row rides in via a broadcast cross join, so the pass stays
    * shuffle-free for the data itself. */
  def withInt8(df: DataFrame, vecCol: String): DataFrame = {
    val stats = dimStats(df, vecCol)
    df.crossJoin(broadcast(stats))
      .withColumn("qvec",
        transform(col(vecCol), (x, i) => {
          val mn = element_at(col("mins"), i + 1)
          val st = step(col("mins"), col("maxs"), i)
          when(st > 0, round((x.cast("double") - mn) / st).cast("int"))
            .otherwise(lit(0))
        }))
  }

  /** Dequantized double vector from `qvec` + the stats columns. */
  def dequantized: Column =
    transform(col("qvec"), (q, i) => {
      val mn = element_at(col("mins"), i + 1)
      val st = (element_at(col("maxs"), i + 1) - mn) / 255.0
      mn + q.cast("double") * st
    })
}
