package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graft.StreamingShim

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
final class VtSink(vt: VersionedTable, branch: String,
                   statsCols: Seq[String] = Nil) extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the addBatch frame wraps the incremental execution; re-present it as
    // a plain batch frame (what ForeachBatchSink does) before committing
    val batch = StreamingShim.asBatch(data.sparkSession, data)
    EventsStreaming.ingestBatch(vt, branch, statsCols)(batch, batchId)
  }
  override def toString: String = s"VtSink(${vt.root}@$branch)"
}

