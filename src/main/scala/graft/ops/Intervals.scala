package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval analytics. The overlap JOIN here is the two-relation
  * generalization q18's broadcast band cannot express: Spark plans a
  * pure `a.s <= b.e AND b.s <= a.e` theta join as a nested-loop cross
  * product, so the scale path is the classic bucketing rewrite — an
  * EQUI-join on the coarse time buckets an interval spans, refined
  * exactly afterwards. */
object Intervals {

  /** Bucketed interval-overlap join over CLOSED micro-timestamp
    * intervals: inputs carry (iid BIGINT unique, s, e micros,
    * s <= e); output is one row per overlapping (a_iid, b_iid) pair
    * with the exact overlap length min(e)−max(s) >= 0.
    *
    * Shape: each interval explodes to the `bucketMicros`-wide buckets
    * it spans (sequence over exact integer division), the two sides
    * equi-join on the bucket key (hash shuffle — never a nested loop),
    * and the exact predicate refines. DE-DUPLICATION WITHOUT A
    * DISTINCT: a pair overlapping across many shared buckets is
    * credited only in the bucket containing max(a.s, b.s) — the
    * overlap's first instant, which both intervals contain — so each
    * pair survives exactly once and no second shuffle is paid.
    *
    * Tuning note for 100 TB: bucketMicros trades explode fan-out
    * (long intervals × narrow buckets) against bucket occupancy
    * (wide buckets × many co-resident intervals → bigger refine
    * fan-in); set it near the median interval length. A symmetric
    * self-join emits (x,y), (y,x) and self pairs — callers filter
    * (e.g. a_iid < b_iid). */
  /** Auto-derived bucket width — the scaladoc's own tuning rule made
    * executable: ONE cheap approx-percentile pass over both inputs
    * picks the median interval length (`e − s`), the width at which
    * explode fan-out (long intervals × narrow buckets) and bucket
    * occupancy (wide buckets × many co-residents) balance. accuracy
    * 10000 ≈ ±0.01 percentile error — the width only needs the right
    * ORDER OF MAGNITUDE, exactness of the JOIN never depends on it.
    * The median is taken over POSITIVE lengths only: point intervals
    * span one bucket at ANY width, so they carry no tuning signal —
    * but a point-heavy distribution (e.g. single-event sessions) would
    * otherwise drag the median to 0, and the clamped 1 µs width makes
    * every long interval explode into billions of buckets (sequence()
    * refuses, loudly). All-point inputs return 1 — nothing can
    * explode. The explicit-width [[overlapJoin]] stays as the override
    * for callers that know their distribution. */
  def deriveBucketMicros(a: DataFrame, b: DataFrame): Long = {
    val lens = a.select((col("e") - col("s")).as("len"))
      .unionAll(b.select((col("e") - col("s")).as("len")))
      .filter(col("len") > 0L)
    val m = lens
      .agg(percentile_approx(col("len"), lit(0.5), lit(10000)).as("m"))
      .head()
    math.max(if (m.isNullAt(0)) 1L else m.getLong(0), 1L)
  }

  /** [[overlapJoin]] with the bucket width derived from the data
    * (median interval length). Same exact result for ANY positive
    * width — EdgeCaseSpec pins derived ≡ explicit — so this only
    * moves the plan's fan-out/fan-in balance, never the rows. */
  def overlapJoinAuto(a: DataFrame, b: DataFrame): DataFrame =
    overlapJoin(a, b, deriveBucketMicros(a, b))

  def overlapJoin(a: DataFrame, b: DataFrame,
      bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive: $bucketMicros")
    def buckets(df: DataFrame, side: String) = df.select(
      col("iid").as(s"${side}_iid"), col("s").as(s"${side}_s"),
      col("e").as(s"${side}_e"),
      explode(sequence(expr(s"s div $bucketMicros"),
        expr(s"e div $bucketMicros"))).as("bucket"))
    buckets(a, "a").join(buckets(b, "b"), Seq("bucket"))
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .filter(expr(s"greatest(a_s, b_s) div $bucketMicros") === col("bucket"))
      .select(col("a_iid"), col("b_iid"),
        (least(col("a_e"), col("b_e")) -
          greatest(col("a_s"), col("b_s"))).as("overlap_micros"))
  }
}
