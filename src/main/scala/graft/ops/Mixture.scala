package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-budget mixture planning — the arithmetic a training run does
  * between "we curated these sources" and "the data loader samples
  * them": given each source's AVAILABLE token count and an integer
  * mixture weight, derive per source the TARGET token share of a fixed
  * budget, the EPOCH factor over what is available (> 1e6 micros means
  * repetition — the over-sampling a DoReMi-style weighting forces on a
  * small high-weight source), and the per-epoch keep RATE (capped at
  * 1: a source can only repeat, never super-sample within one epoch).
  *
  * Exactness architecture (the q55/q56 oracle discipline): weights are
  * INTEGERS (a caller with float weights quantizes them once — parts
  * per thousand lose nothing a data loader can express), so target =
  * budget·w div Σw and both micro ratios are exact 64-bit floor
  * divisions any engine replays bit-for-bit; no cross-partition double
  * sum anywhere. Overflow headroom: budget·w must stay < 2⁶³ — holds
  * through budget ≈ 9e14 tokens (a ~quadrillion-token plan) at weight
  * sums ≤ 10⁴.
  *
  * Scale shape: the sources relation is one row per SOURCE (thousands,
  * not billions) — a broadcast-sized plan relation; the single join +
  * scalar Σw cross join never touches the corpus itself. */
object Mixture {

  /** `sources`: (source, available_tokens); `weights`: (source,
    * weight ≥ 0 integer). Every source must carry a weight — a source
    * silently defaulting to 0 would vanish from the mixture without a
    * trace, so the join is inner and the row-count contract is the
    * caller's (q159 pins it by construction). Returns one row per
    * source: target_tokens, epochs_micro, rate_micro. */
  def tokenBudgetPlan(sources: DataFrame, weights: DataFrame,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive: $budgetTokens")
    val joined = sources.join(weights, Seq("source"))
    val total = joined.agg(sum(col("weight")).as("wsum"))
    joined.crossJoin(total)
      .select(
        col("source"),
        col("available_tokens"),
        col("weight"),
        expr(s"($budgetTokens * weight) div wsum").as("target_tokens"))
      .withColumn("epochs_micro",
        when(col("available_tokens") > 0,
          expr("(target_tokens * 1000000) div available_tokens"))
          .otherwise(lit(null).cast("long")))
      .withColumn("rate_micro",
        // least() skips NULLs in both engines, so an ungated form
        // would hand a source with NOTHING available a 100% keep rate;
        // an empty source has no rate, same as it has no epoch factor
        when(col("available_tokens") > 0,
          least(lit(1000000L), col("epochs_micro")))
          .otherwise(lit(null).cast("long")))
  }
}
