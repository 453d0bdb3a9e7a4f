package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable bottom-k (KMV-style) quantile sketches — the quantile
  * sibling of the q115 HLL distinct-count sketches: a fixed-size,
  * deterministic, exactly-mergeable summary a 100 TB monitoring layer
  * keeps per source/shard to answer "what is p50/p90 token length"
  * without ever sorting the corpus.
  *
  * The sketch of a group is the k rows with the SMALLEST (hkey, id)
  * where hkey is the split family's masked Knuth multiplicative hash —
  * a deterministic uniform sample (bottom-k order statistics of a
  * fixed hash are a k-minimum-values sketch). Two properties make it
  * operational:
  *  - replayable: the hash is integer arithmetic any engine reproduces
  *    bit for bit, so the whole construction carries a DuckDB oracle
  *    (q123) — no FP anywhere;
  *  - exactly mergeable: bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪
  *    bottom-k(B)) — an order-statistics identity, so per-shard
  *    sketches union and re-rank at O(shards·k) cost into exactly the
  *    sketch of the full corpus (q123b pins bit-equality).
  *
  * Scale shape: the construction reuses q116's prefiltered-window
  * discipline — a count aggregate sizes a 4×-quota hash threshold, the
  * window ranks only the ~4k surviving candidates per group, and an
  * under-coverage guard degrades an unlucky group to its full window
  * (output provably identical either way, q116's argument). Merge and
  * estimate windows are bounded by k·inputs by construction. */
object Quantiles {

  private val Mask = 1000000L

  private def hkeyOf(id: org.apache.spark.sql.Column) =
    ((pmod(id, lit(2147483648L)) * (2246822519L % 4294967296L))
      % 4294967296L) % Mask

  /** Build the per-group bottom-k sketch: (g, rk, hkey, id, v) with
    * rk = 1..k in (hkey, id) order. Deterministic; output is identical
    * to the naive full-window sampler (the prefilter only drops rows
    * that order after every survivor).
    *
    * The per-group count/threshold relations are one row per group —
    * data-dependent cardinality for an arbitrary groupCol — so they
    * carry NO broadcast hint: AQE picks broadcast at runtime when the
    * group count is small (every current caller groups by bounded
    * `source`), and a high-cardinality groupCol degrades safely to a
    * shuffled join instead of a driver-side OOM (the r11 q101b
    * lesson: never hint a relation whose size the caller controls). */
  def bottomKSketch(df: DataFrame, groupCol: String, idCol: String,
      valCol: String, k: Int): DataFrame = {
    require(k >= 1, "sketch size must be >= 1")
    val h = df.select(col(groupCol).as("g"), col(idCol).as("id"),
      col(valCol).as("v"), hkeyOf(col(idCol)).as("hkey"))
    val n = h.groupBy(col("g")).agg(count(lit(1)).as("ng"))
      .withColumn("thr", ceil(lit(k) * 4 * Mask.toDouble / col("ng")).cast("long"))
    val sv = h.join(n, Seq("g"))
      .filter(col("hkey") < col("thr"))
      .groupBy(col("g")).agg(count(lit(1)).as("cnt"))
    val cov = n.join(sv, Seq("g"), "left_outer")
      .withColumn("ok",
        coalesce(col("cnt"), lit(0L)) >= least(lit(k.toLong), col("ng")))
      .select(col("g"), col("thr"), col("ok"))
    val cand = h.join(cov, Seq("g"))
      .filter(col("hkey") < col("thr") || !col("ok"))
    val w = Window.partitionBy(col("g")).orderBy(col("hkey"), col("id"))
    cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("g"), col("rk"), col("hkey"), col("id"), col("v"))
  }

  /** Merge sketches: union, dedup on (g, id), re-rank to k. Inputs are
    * sketches, so the window sees ≤ k·|inputs| rows per group — bounded
    * regardless of corpus size. Exactly equals the from-scratch sketch
    * of the union (q123b's contract). The (g, id) dedup makes the merge
    * REPLAY-IDEMPOTENT — merging a sketch that was already folded in is
    * a no-op, because a given id carries one immutable (hkey, v) — the
    * property that lets the streaming sink (q123c) run without a
    * correctness-mandatory checkpoint, unlike the additive token-count
    * sink. */
  def mergeSketches(sketches: Seq[DataFrame], k: Int): DataFrame = {
    val u = sketches.map(_.select(col("g"), col("hkey"), col("id"), col("v")))
      .reduce(_ unionByName _)
      // (g, id) dedup via aggregate — duplicates carry the identical
      // immutable (hkey, v), so first() is deterministic. (A
      // dropDuplicates here tripped a Catalyst binding error when the
      // unioned sketches share lineage, e.g. 3 shards of one frame.)
      .groupBy(col("g"), col("id"))
      .agg(first(col("hkey")).as("hkey"), first(col("v")).as("v"))
    val w = Window.partitionBy(col("g")).orderBy(col("hkey"), col("id"))
    u.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("g"), col("rk"), col("hkey"), col("id"), col("v"))
  }

  /** Quantile estimates from a sketch: for each q, the sample value at
    * rank ceil(q·m) in (v, id) order (percentile_disc over the sample;
    * m = sample size, which is min(k, |group|)). The window ranks only
    * sketch rows — O(k) per group. */
  def quantileEstimates(sketch: DataFrame, qs: Seq[Double]): DataFrame = {
    val m = sketch.groupBy(col("g")).agg(count(lit(1)).as("m"))
    val vw = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    // same no-hint rule as bottomKSketch: m is one row per group
    val ranked = sketch.withColumn("vr", row_number().over(vw))
      .join(m, Seq("g"))
    qs.map(q =>
        ranked.filter(col("vr") === ceil(lit(q) * col("m")).cast("int"))
          .select(col("g"), lit(q).as("q"), col("v").as("est"),
            col("m").as("sample_n")))
      .reduce(_ unionByName _)
  }
}
