package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Preference-pair mining — the dataset-construction step of
  * DPO/RLHF-style training: within each group (a prompt, a topic, a
  * query id), pair the HIGHEST-scored member as `chosen` against the
  * LOWEST-scored as `rejected`, keeping only pairs whose score margin
  * clears a floor (a near-tie teaches a preference model nothing and
  * adds label noise — the standard filtering move).
  *
  * Exactness architecture: the score quantizes ONCE to integer micros
  * (one identical IEEE multiply+round per row in any engine); best and
  * worst are max_by/min_by picks under TOTAL struct orders — chosen
  * maximizes (score_micro, -id) (highest score, ties to the LOWEST
  * id), rejected minimizes (score_micro, id) (lowest score, ties to
  * the lowest id) — so ties break identically everywhere and the
  * margin is an exact long difference. Groups with fewer than two
  * members yield no pair (chosen == rejected is filtered, not paired
  * with itself).
  *
  * Scale shape: ONE hash aggregation on the group key — a single
  * exchange with map-side partial max_by/min_by combine, output one
  * row per group; no pair explosion (max×min, never all-pairs), no
  * per-group sort (the window form this replaced paid two rank sorts
  * plus a join). */
object Preference {

  /** `df` carries `groupCol` (string), `idCol` (long, unique within
    * the group), and `scoreCol` (numeric). Returns per group with ≥ 2
    * members and margin ≥ `minMarginMicro`: chosen/rejected ids and
    * score micros plus the margin. */
  def minePairs(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: Column, minMarginMicro: Long = 0L): DataFrame = {
    val scored = df.select(
      col(groupCol).as("grp"), col(idCol).as("id"),
      round(scoreCol.cast("double") * 1e6).cast("long").as("score_micro"))
    scored.groupBy(col("grp"))
      .agg(
        // descending-id tie-break via -1-id (bitwise NOT): a total
        // order REVERSAL over the FULL long range — negate(id) would
        // silently overflow at Long.MinValue with ANSI off, inverting
        // the order and diverging from the row_number oracle
        max_by(struct(col("id"), col("score_micro")),
          struct(col("score_micro"), lit(-1L) - col("id"))).as("best"),
        min_by(struct(col("id"), col("score_micro")),
          struct(col("score_micro"), col("id"))).as("worst"))
      .filter(col("best.id") =!= col("worst.id"))
      .withColumn("margin_micro",
        col("best.score_micro") - col("worst.score_micro"))
      .filter(col("margin_micro") >= minMarginMicro)
      .select(col("grp"), col("best.id").as("chosen_id"),
        col("worst.id").as("rejected_id"),
        col("best.score_micro").as("chosen_micro"),
        col("worst.score_micro").as("rejected_micro"),
        col("margin_micro"))
  }
}
