package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in [[Registry]]; this object only adapts them to the
  * driver's Map-based interface. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q_vdt1: the reference's first pipeline (join + projection,
    * `jobs/vdt1.py:41-42`) on the testdata analog. */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("q_vdt1").impl(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(d => d.name -> d.impl).toMap
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
