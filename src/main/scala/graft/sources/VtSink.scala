package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graft.StreamingShim
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventsStreaming
import graft.vt.VersionedTable

/** A GENUINE Structured Streaming sink into a versioned table:
  * `df.writeStream.format("vt").option("path", root).start()` lands each
  * micro-batch as ONE append commit — the engine-driven twin of
  * [[graft.streaming.EventsStreaming.streamingVersionedIngest]]'s
  * foreachBatch form, with the same exactly-once contract: the commit
  * message carries the batchId, and a re-delivered batch whose id the
  * branch's commit log already records is skipped
  * ([[EventsStreaming.ingestBatch]] — Delta's transactional `txnVersion`
  * dedup on the native commit log). Every batch boundary is a time-travel
  * point; a reader never sees a half-written batch.
  *
  * Composes with [[VtChangeFeed]] and [[DeltaChanges]] into pure
  * `readStream → writeStream` mirroring pipelines — no hand-rolled drain
  * loops. Append output mode only: Update/Complete would need a keyed
  * apply (a different contract — [[graft.vt.VersionedTable.applyCdc]]),
  * so they are refused loudly rather than silently appended. */
final class VtSink(vt: VersionedTable, branch: String) extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the addBatch frame wraps the incremental execution; re-present it as
    // a plain batch frame (what ForeachBatchSink does) before committing
    val batch = StreamingShim.asBatch(data.sparkSession, data)
    EventsStreaming.ingestBatch(vt, branch)(batch, batchId)
  }
  override def toString: String = s"VtSink(${vt.root}@$branch)"
}

/** `writeStream.format("vt")` provider. Options: `path` (required,
  * versioned table root — must exist; table lifecycle stays with its
  * owner), `branch` (default `main`). */
final class VtSinkProvider extends StreamSinkProvider with DataSourceRegister {
  override def shortName(): String = "vt"

  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"format(\"vt\") supports Append output mode only, got $outputMode — " +
        "Update/Complete need a keyed apply (VersionedTable.applyCdc), not a " +
        "blind append")
    require(partitionColumns.isEmpty,
      "format(\"vt\") does not support partitionBy — versioned tables " +
        "organize data by commit, not by directory partition")
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "format(\"vt\") needs option 'path' (the versioned table root)"))
    new VtSink(VersionedTable.open(path), parameters.getOrElse("branch", "main"))
  }
}
