package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key time-series repair operators. The gap-fill family: q74's
  * forward fill carries the LAST observation (step functions — session
  * state, account balances); [[interpolateLinear]] here reconstructs
  * between bracketing observations (continuous signals — sensor
  * readings, rates). Both are two window passes per key partition, no
  * shuffle beyond the (key) hash — the 100 TB shape is one partition
  * per device/user series, never a global sort. */
object TimeSeries {

  /** STRICT linear interpolation of null `valCol` rows between their
    * nearest non-null neighbors within the key partition:
    * v = v_prev + (v_next − v_prev) · (t − t_prev)/(t_next − t_prev),
    * time measured in epoch MICROS (exact integer differences; the one
    * shared IEEE divide+multiply+add replays identically in any
    * engine). Rows with no bracketing observation on either side stay
    * NULL — interpolation never extrapolates (pair with q74's forward
    * fill when trailing-edge carry is wanted). `orderCols` break ties
    * deterministically within equal timestamps. */
  def interpolateLinear(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, orderCols: Seq[String]): DataFrame = {
    val ord = (col(tsCol) +: orderCols.map(col)): Seq[Column]
    val before = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val after = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obs = when(col(valCol).isNotNull,
      struct(unix_micros(col(tsCol)).as("t"), col(valCol).as("v")))
    val t = unix_micros(col(tsCol))
    df
      .withColumn("__p", last(obs, ignoreNulls = true).over(before))
      .withColumn("__n", first(obs, ignoreNulls = true).over(after))
      .withColumn(s"${valCol}_interp",
        when(col(valCol).isNotNull, col(valCol))
          // equal bracket timestamps (ties at micros resolution): the
          // fraction is 0/0 — take the earlier observation instead of
          // manufacturing a NaN
          .when(col("__p").isNotNull && col("__n").isNotNull &&
            col("__n.t") === col("__p.t"), col("__p.v"))
          .when(col("__p").isNotNull && col("__n").isNotNull,
            col("__p.v") + (col("__n.v") - col("__p.v")) *
              ((t - col("__p.t")) / (col("__n.t") - col("__p.t")))))
      .drop("__p", "__n")
  }
}
