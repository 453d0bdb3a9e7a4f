package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  * worst are row_number picks under TOTAL orders ((score desc, id asc)
  * and (score asc, id asc)), so ties break identically everywhere and
  * the margin is an exact long difference. Groups with fewer than two
  * members yield no pair (chosen == rejected is filtered, not paired
  * with itself).
  *
  * Scale shape: two rank windows per group partition plus one
  * group-keyed join — shuffle on the group key only, output one row
  * per group; no pair explosion (max×min, never all-pairs). */
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
    val bestW = Window.partitionBy(col("grp"))
      .orderBy(col("score_micro").desc, col("id"))
    val worstW = Window.partitionBy(col("grp"))
      .orderBy(col("score_micro").asc, col("id"))
    val best = scored.withColumn("rn", row_number().over(bestW))
      .filter(col("rn") === 1)
      .select(col("grp"), col("id").as("chosen_id"),
        col("score_micro").as("chosen_micro"))
    val worst = scored.withColumn("rn", row_number().over(worstW))
      .filter(col("rn") === 1)
      .select(col("grp"), col("id").as("rejected_id"),
        col("score_micro").as("rejected_micro"))
    best.join(worst, Seq("grp"))
      .filter(col("chosen_id") =!= col("rejected_id"))
      .withColumn("margin_micro",
        col("chosen_micro") - col("rejected_micro"))
      .filter(col("margin_micro") >= minMarginMicro)
      .select(col("grp"), col("chosen_id"), col("rejected_id"),
        col("chosen_micro"), col("rejected_micro"), col("margin_micro"))
  }
}
