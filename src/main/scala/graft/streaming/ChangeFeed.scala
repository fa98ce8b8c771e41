package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.vt.VersionedTable

/** Versioned-table CHANGE-FEED CONSUMER — the SOURCE direction of the
  * streaming story. [[EventsStreaming.ingestBatch]] covers the sink side
  * (stream → versioned table, idempotent per batchId); this is the mirror:
  * downstream jobs consume a versioned table incrementally, exactly the
  * contract of Delta's `spark.readStream.table(...)` with
  * `readChangeFeed` (the reference's Delta dependency exposes it as CDF,
  * `jobs/vdt4.py` reads full snapshots instead — this is the scale path it
  * lacks: at 100 TB a downstream job must read the per-commit DELTA, never
  * re-scan the snapshot).
  *
  * Mechanics: each named consumer owns a persisted CURSOR (the highest table
  * version it has fully processed) in the table's metadata store under
  * `cursors/`. [[poll]] returns the change feed over `(cursor, head]` —
  * per-row `change_type` + `version` columns from
  * [[VersionedTable.changesFeed]] — without advancing anything;
  * [[commit]] advances the cursor AFTER the caller has durably processed the
  * batch. A crash between the two redelivers the same interval
  * (at-least-once); pairing with an idempotent sink (e.g. `ingestBatch`,
  * which keys on batchId) yields end-to-end exactly-once — the same
  * contract Structured Streaming's checkpoint + idempotent-sink pairing
  * gives `foreachBatch`.
  *
  * Why not a custom DataSource V2 `MicroBatchStream`? The feed's batches ARE
  * commit intervals, already exposed as DataFrames; wrapping them in DSv2
  * would re-implement parquet scan planning inside `PartitionReader` for no
  * new capability. The driver-loop-with-persisted-offsets shape below is how
  * Spark itself structures `Trigger.AvailableNow` drains.
  *
  * Scale: a poll reads only the interval's commit metadata (O(versions
  * polled), bounded by `maxVersions`) and plans a scan over just the
  * interval's added/changed files — never the snapshot. `maxVersions` chunks
  * a long catch-up into bounded batches, so a consumer resuming after a
  * month of commits holds plans and memory proportional to the chunk, not
  * the backlog.
  */
object ChangeFeed {

  /** One deliverable interval: the feed rows for `(fromVersion, toVersion]`.
    * `df` carries the table columns + `change_type` + `version`. */
  final case class Batch(df: DataFrame, fromVersion: Long, toVersion: Long)

  private def cursorPath(vt: VersionedTable, consumer: String) = {
    require(consumer.nonEmpty && !consumer.contains('/') && !consumer.contains('\\'),
      s"bad consumer name: $consumer")
    vt.root.resolve("cursors").resolve(consumer)
  }

  /** The consumer's last committed version (0 = nothing consumed yet: version
    * 0's content is the initial snapshot, delivered via a plain versioned
    * read, not the feed — Delta's `startingVersion` convention). */
  def cursor(vt: VersionedTable, consumer: String): Long = {
    val p = cursorPath(vt, consumer)
    if (vt.store.exists(p)) vt.store.read(p).trim.toLong else 0L
  }

  /** Next unprocessed interval for `consumer`, or None when caught up. Does
    * NOT advance the cursor — call [[commit]] after the batch is durable. */
  def poll(spark: SparkSession, vt: VersionedTable, consumer: String,
           branch: String = "main", maxVersions: Int = Int.MaxValue): Option[Batch] = {
    require(maxVersions >= 1, "maxVersions must be >= 1")
    val from = cursor(vt, consumer)
    val headV = vt.head(branch).map(_.version).getOrElse(0L)
    if (headV <= from) None
    else {
      val to = math.min(headV, from + maxVersions)
      Some(Batch(vt.changesFeed(spark, branch, from, to), from, to))
    }
  }

  /** Durably advance the cursor to `toVersion` (atomic full-object put). Only
    * forward moves are accepted — a replayed commit of an older batch (the
    * crash-redelivery case) must not rewind a cursor a faster retry already
    * advanced. */
  def commit(vt: VersionedTable, consumer: String, toVersion: Long): Unit = {
    val cur = cursor(vt, consumer)
    require(toVersion >= cur,
      s"cursor for $consumer is already at $cur; cannot rewind to $toVersion")
    vt.store.ensurePrefix(cursorPath(vt, consumer).getParent)
    vt.store.put(cursorPath(vt, consumer), toVersion.toString)
  }

  /** `Trigger.AvailableNow` drain: poll → process → commit until caught up.
    * `f` must be idempotent for exactly-once (it may see a batch twice after
    * a crash). Returns the number of batches processed. */
  def processAvailable(spark: SparkSession, vt: VersionedTable, consumer: String,
                       branch: String = "main", maxVersions: Int = Int.MaxValue)
                      (f: Batch => Unit): Int = {
    var n = 0
    var batch = poll(spark, vt, consumer, branch, maxVersions)
    while (batch.isDefined) {
      val b = batch.get
      f(b)
      commit(vt, consumer, b.toVersion)
      n += 1
      batch = poll(spark, vt, consumer, branch, maxVersions)
    }
    n
  }
}
