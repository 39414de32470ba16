package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of registered queries plus their DuckDB oracle SQL.
  *
  * Contract (driver-defined, see SparkEntry): every query is a
  * `(SparkSession, sfDir) => DataFrame`; the oracle map holds ANSI SQL that
  * DuckDB 1.0 runs over the same parquet fixtures (bare table names).
  * Determinism rules (SURVEY.md §7.4): total ordering with unique
  * tie-breakers, decimal (not float) money aggregates, explicit NULLS
  * FIRST/LAST in oracle SQL, `sort_array` around any collect_list.
  * Queries without an oracle entry get a weaker rows-only check.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
