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
    withEpochAndRate(joined.crossJoin(total)
      .select(
        col("source"),
        col("available_tokens"),
        col("weight"),
        expr(s"($budgetTokens * weight) div wsum").as("target_tokens")))
  }

  /** The epoch/keep-rate tail both planners share: epochs_micro =
    * target over available (> 1e6 means repetition), rate_micro capped
    * at 1. least() skips NULLs in both engines, so an ungated form
    * would hand a source with NOTHING available a 100% keep rate — an
    * empty source has no rate, same as it has no epoch factor. */
  private def withEpochAndRate(plan: DataFrame): DataFrame =
    plan
      .withColumn("epochs_micro",
        when(col("available_tokens") > 0,
          expr("(target_tokens * 1000000) div available_tokens"))
          .otherwise(lit(null).cast("long")))
      .withColumn("rate_micro",
        when(col("available_tokens") > 0,
          least(lit(1000000L), col("epochs_micro")))
          .otherwise(lit(null).cast("long")))

  /** TEMPERATURE mixture at T = 2 — the multilingual up-sampling
    * recipe (sample source i with probability ∝ nᵢ^(1/T); mT5/mBERT's
    * exponential smoothing): big sources damp toward each other, small
    * sources up-weight, without any hand-set weights. T = 2 is the
    * implemented point on the curve because its exponent is a SQUARE
    * ROOT — an IEEE-exact operation both engines compute bit-identically
    * on identical operands — where a general pow() is libm-dependent
    * and breaks the hash-oracle discipline; other temperatures
    * quantize their weights externally and take [[tokenBudgetPlan]].
    *
    * Exactness: per-source token counts are exact longs; each source
    * takes ONE shared sqrt, quantized to MILLIS (sqrt_milli ≤ 3e13
    * even at a 10²⁰-token source, so the share numerator
    * sqrt_milli·10⁶ can never overflow a long — a micro quantization
    * would wrap at ~8.5e13 tokens per source, silently); the
    * normalizer is a SUM OF LONGS (order-free); share/target/epochs/
    * rate are exact 64-bit floor divisions. The target routes through
    * share_micro (≤ 1e6), so the budget bound is 9.2e12 tokens
    * regardless of corpus size. Scale shape: one row per source,
    * broadcast-sized; the corpus itself never shuffles. */
  def temperatureMixturePlan(sources: DataFrame,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive: $budgetTokens")
    val scored = sources.select(
      col("source"), col("available_tokens"),
      when(col("available_tokens") > 0,
        round(sqrt(col("available_tokens").cast("double")) * 1e3)
          .cast("long")).otherwise(lit(0L)).as("sqrt_milli"))
    val total = scored.agg(sum(col("sqrt_milli")).as("den"))
    withEpochAndRate(scored.crossJoin(total)
      .withColumn("share_micro",
        expr("(sqrt_milli * 1000000) div den"))
      .withColumn("target_tokens",
        expr(s"($budgetTokens * share_micro) div 1000000"))
      .drop("den"))
  }
}
