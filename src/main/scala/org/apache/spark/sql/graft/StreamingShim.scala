package org.apache.spark.sql.graft

import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.{DataFrame, SparkSession => ApiSparkSession}

/** The one Spark-internal seam a DSv1 streaming source needs: the engine
  * asserts that `Source.getBatch`'s DataFrame has `isStreaming=true`, and
  * the only way to mark one is `internalCreateDataFrame(..., isStreaming =
  * true)` — `private[sql]`, hence this shim lives under
  * `org.apache.spark.sql`. It is exactly what Spark's own FileStreamSource
  * does (`fileDataset.queryExecution.toRdd` is lazy — no execution happens
  * here; the engine runs the returned plan). */
object StreamingShim {
  def asStreaming(spark: ApiSparkSession, df: DataFrame): DataFrame = {
    val classic = spark.asInstanceOf[SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse seam for a DSv1 `Sink`: the micro-batch frame handed to
    * `addBatch` wraps the incremental execution and cannot be fed to batch
    * writers directly — Spark's own ForeachBatchSink re-wraps it exactly
    * like this (the already-planned `toRdd`, re-presented as a plain batch
    * DataFrame) before handing it to user code. */
  def asBatch(spark: ApiSparkSession, df: DataFrame): DataFrame = {
    val classic = spark.asInstanceOf[SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
