package org.apache.spark.sql.graft

import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.{SparkSession => ApiSparkSession}

/** Scan-scoped session configuration. Some SQL confs are read at scan
  * planning time from the RELATION'S session (`FileSourceScanExec` builds
  * readers against `relation.sparkSession`), so a data source that needs
  * one — `spark.sql.parquet.fieldId.read.enabled` for id-mode
  * column-mapped Delta tables — must either mutate the user's session
  * (leaking one table's requirement onto every later parquet scan) or
  * plan against a CLONE. `cloneSession` is the engine's own forking
  * primitive (same SparkContext, shared cache, copied-then-independent
  * conf); it is `private[sql]`, hence this shim lives under
  * `org.apache.spark.sql`. */
object SessionShim {
  /** A forked session with `kvs` applied on top of the caller's conf —
    * the caller's session is never touched. */
  def withConf(spark: ApiSparkSession, kvs: (String, String)*): ApiSparkSession = {
    val cloned = spark.asInstanceOf[SparkSession].cloneSession()
    kvs.foreach { case (k, v) => cloned.conf.set(k, v) }
    cloned
  }

  /** A DataFrame over an already-parsed logical plan (`Dataset.ofRows`,
    * also `private[sql]`): what the SQL-DML bridge
    * ([[graft.sources.VtSqlDml]]) needs to hand a parsed MERGE source —
    * a table reference or an arbitrary subquery — to the engine as a
    * DataFrame, triggering its normal analysis. */
  def ofRows(spark: ApiSparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)

  /** A DataFrame over a `BaseRelation` (`baseRelationToDataFrame`, the same
    * wrapping `DataFrameReader.load` performs) — what lets the engine serve
    * a LISTING-FREE `HadoopFsRelation` over a commit-pinned file index as a
    * plain DataFrame (r21): `spark.read.parquet(explicit files…)` pays a
    * driver `getFileStatus` per path, and above the parallel-discovery
    * threshold (32 paths) a whole distributed LISTING JOB, for statuses the
    * commit log already records. */
  def ofRelation(spark: ApiSparkSession,
                 rel: org.apache.spark.sql.sources.BaseRelation)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[SparkSession].baseRelationToDataFrame(rel)
}
