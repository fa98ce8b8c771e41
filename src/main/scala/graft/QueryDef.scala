package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: name, Spark implementation, and (when SQL-expressible)
  * the equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables.
  *
  * Determinism contract (SURVEY.md §5.5): every oracle-checked query ends with a
  * total-order ORDER BY (unique key combination) in BOTH the Spark plan and the
  * SQL, computed columns are aliased identically on both sides, and floating
  * aggregates are either exact (integer-valued doubles, min/max) or converted to
  * integer cents before summing so results are independent of partition order.
  */
final case class QueryDef(
    name: String,
    impl: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Oracle-checked query. */
  def sql(name: String)(oracle: String)(impl: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, impl, Some(oracle.trim))

  /** Non-SQL-expressible query — driver records a rows-only check. */
  def rowsOnly(name: String)(impl: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, impl, None)
}
