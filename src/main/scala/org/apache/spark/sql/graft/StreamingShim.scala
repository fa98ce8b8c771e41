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
}
