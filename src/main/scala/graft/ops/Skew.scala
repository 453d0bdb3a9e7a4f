package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for hot-key workloads (SURVEY.md §7 scale
  * posture: "Skewed keys → salting or AQE skew-join").
  *
  * AQE's skew handling covers sort-merge JOINS at runtime; hot-key
  * AGGREGATION skew is a plan-shape problem — when a groupBy key has a
  * handful of giant groups, every row of a hot key lands on one reducer.
  * Salting splits each group into `salts` subgroups for the first
  * (heavy) aggregation and merges the constant-size partials in a second
  * (tiny) one. Works for any algebraic aggregate (sum/count/min/max, and
  * avg via sum+count). */
object Skew {

  /** Deterministic row salt in [0, salts): hash of the whole row's
    * monotonically increasing id is NOT deterministic across runs, so the
    * salt must derive from data columns — callers pass the columns that
    * identify a row (any stable, roughly-uniform tuple works; residual
    * salt skew only costs balance, never correctness). */
  def salt(salts: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(salts))

  /** Salted sum/count aggregation: groupBy(key) with hot keys spread over
    * `salts` reducers. Returns one row per key with `sum_<c>` and
    * `count_rows` columns — the same result as a direct
    * groupBy(key).agg(sum, count), with the first shuffle's per-reducer
    * load bounded by |hot key| / salts. */
  def saltedSumCount(
      df: DataFrame,
      keyCols: Seq[String],
      sumCol: String,
      saltFrom: Seq[String],
      salts: Int = 16): DataFrame = {
    val keyed = df.withColumn("__salt", salt(salts, saltFrom.map(col): _*))
    val partial = keyed
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(sum(col(sumCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$sumCol"),
        sum(col("__pcnt")).cast("long").as("count_rows"))
  }

  /** Salted shuffle EQUI-JOIN for hot probe keys that AQE cannot save:
    * AQE's skew-join split only fires for sort-merge joins whose skewed
    * side materialized as multiple map outputs, and never for the
    * build-side replication a broadcast would need when the DIM is too
    * big to broadcast. The manual rewrite: the fact side salts each row
    * into [0, salts) and the dim side replicates each row `salts` times,
    * so the join key becomes (key, salt) and a hot key's rows spread
    * over `salts` reducers — exchange volume grows by |dim|·salts
    * (bounded: the dim is the SMALL side), per-reducer load drops by
    * salts. Result-identical to the plain equi-join (asserted in
    * PlanSpec alongside the (key, salt) partitioning). */
  def saltedEquiJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      saltFrom: Seq[String],
      salts: Int = 16): DataFrame = {
    val saltedFact = fact
      .withColumn("__fsalt", salt(salts, saltFrom.map(fact(_)): _*))
    val saltedDim = dim
      .withColumn("__dsalt", explode(sequence(lit(0), lit(salts - 1))))
    saltedFact
      .join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          col("__fsalt") === col("__dsalt").cast("long"))
      .drop("__fsalt", "__dsalt")
  }
}
