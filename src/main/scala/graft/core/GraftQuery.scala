package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine capability: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle for the driver's
  * hash-match correctness gate. Non-SQL operators (MinHash, SimHash, LSH,
  * language-ID, …) omit the oracle and get a rows-only check.
  *
  * Determinism contract: every query ends in a total ORDER BY (unique key
  * tiebreaks) and rounds floating aggregates, so sorted-row hashing is
  * stable across Spark and DuckDB.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object GraftQuery {
  /** Assemble driver-contract maps from query registries. */
  def queryMap(qs: Seq[GraftQuery]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.run).toMap
  def oracleMap(qs: Seq[GraftQuery]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
