package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of grouped aggregates under a change feed —
  * the materialized-view refresh loop the storage layer's CDC read
  * ([[graft.core.TableStore.tableChanges]]) exists to feed. The refresh
  * is O(changes) + O(touched groups), never O(base): a 100 TB base
  * table that changed by a GB costs a GB of delta aggregation plus a
  * join against the standing aggregate on the group key.
  *
  * Only ADDITIVE aggregates (count, sum, and anything derivable from
  * them — avg, ratios) are incrementally maintainable under deletes:
  * each change row contributes a signed delta (+post for
  * insert/update_postimage, −pre for delete/update_preimage) and the
  * group total is the running sum. min/max are deliberately absent —
  * deleting the current extremum needs a rescan of the group, which is
  * a recompute, not a refresh (the classic self-maintainability
  * boundary). A group whose live row count reaches zero leaves the
  * aggregate entirely, so refreshed state is always exactly what
  * [[baseAggregate]] over the post snapshot would produce — the
  * equivalence the q103 oracle checks end-to-end.
  */
object Incremental {

  /** The change types that contribute a POSITIVE row image. The other
    * two (`delete`, `update_preimage`) contribute negatively. */
  private val positiveTypes = Seq("insert", "update_postimage")

  /** Full (re)computation of the maintained aggregate: one row per
    * `keyCols` group with `__cnt` (live row count) and one summed
    * column per entry of `sumCols`, named `sum_<col>`. This defines the
    * maintained VIEW; [[applyChanges]] keeps it current under a change
    * feed without re-running this over the base. */
  def baseAggregate(
      df: DataFrame, keyCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "baseAggregate needs at least one group column")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__cnt"),
        sumCols.map(c => sum(col(c)).as(s"sum_$c")): _*)
  }

  /** Refresh `agg` (a [[baseAggregate]] result) with a CDC change feed
    * (`_change_type` row images, the [[graft.core.TableStore.tableChanges]]
    * shape). Signed per-group deltas are aggregated from the changes
    * (map-side combinable — one shuffle of the DELTA only), full-outer
    * merged into the standing aggregate on the group key, and groups
    * whose live count reaches zero drop out. Untouched groups pass
    * through byte-identical — at scale the join's post-shuffle work is
    * bounded by |agg| + |touched groups|, and the standing side can be
    * pre-partitioned on the key to make the refresh a local merge.
    *
    * Sum semantics under NULL match a direct recompute: a NULL
    * contribution is ignored in both directions, so a group holding
    * only-NULL values carries `sum_<c>` = NULL exactly like
    * [[baseAggregate]] would. */
  def applyChanges(
      agg: DataFrame, changes: DataFrame,
      keyCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "applyChanges needs at least one group column")
    val sign = when(col("_change_type").isin(positiveTypes.map(lit): _*), 1)
      .otherwise(-1)
    val delta = changes
      .withColumn("__sign", sign)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__sign")).as("__cnt_d"),
        sumCols.map(c =>
          sum(col(c) * col("__sign")).as(s"__sum_${c}_d")): _*)
    agg.join(delta, keyCols, "full_outer")
      .select((keyCols.map(col) :+
        (coalesce(col("__cnt"), lit(0L)) + coalesce(col("__cnt_d"), lit(0L)))
          .as("__cnt")) ++
        // a sum stays NULL when BOTH sides are NULL (all-NULL group),
        // matching sum()'s ignore-NULL semantics on a direct recompute
        sumCols.map(c =>
          when(col(s"sum_$c").isNull && col(s"__sum_${c}_d").isNull, lit(null))
            .otherwise(coalesce(col(s"sum_$c"), lit(0.0)) +
              coalesce(col(s"__sum_${c}_d"), lit(0.0)))
            .as(s"sum_$c")): _*)
      .filter(col("__cnt") > 0)
  }
}
