package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}

import graft.vt.VersionedTable

/** Commit-version offset of the versioned-table change-feed stream; the
  * checkpointed form is just the decimal version (round-trips through
  * Structured Streaming's `SerializedOffset` as `json.toLong`). */
final case class VersionOffset(version: Long) extends Offset {
  override def json: String = version.toString
}

/** Shared floor / rate-limit / restart-rebase bookkeeping for the
  * version-offset streaming sources ([[VtChangeFeedSource]],
  * [[DeltaChangesSource]]). `floor` is the exclusive lower bound below
  * which nothing is served; `lastEnd` the newest offset the engine knows
  * about (the rate-limit base). Both start at the OPTION-derived value,
  * but the option governs FRESH streams only (Delta's rule): on restart
  * the engine's first signal — a `commit` ack or a `getBatch` replay
  * carrying checkpointed offsets — REBASES both onto the checkpoint via
  * [[sync]]. Without the rebase, `startingVersion=latest` would re-pin
  * the floor to the restart-time head and silently withhold every commit
  * that landed while the stream was down. */
private[sources] final class OffsetFloor(start: Long) {
  @volatile private var floorV: Long = start
  @volatile private var lastEnd: Long = start
  @volatile private var synced: Boolean = false

  def sync(v: Long): Unit = synchronized {
    if (!synced) { synced = true; floorV = math.min(floorV, v); lastEnd = v }
    else lastEnd = math.max(lastEnd, v)
  }

  def floor: Long = floorV

  /** Newest offset the engine may process to — `head` capped by the rate
    * limit; None while nothing past the floor exists. */
  def nextEnd(head: Long, maxPerBatch: Int): Option[Long] = {
    val end = math.max(lastEnd, math.min(head, lastEnd + maxPerBatch))
    if (end <= floorV) None else Some(end)
  }
}

/** A GENUINE Structured Streaming source over a versioned table's change
  * feed: `spark.readStream.format("vt-changes").option("path", root).load()`
  * tails the branch's commit log as micro-batches, one offset per commit
  * version — the streaming twin of [[graft.streaming.ChangeFeed.poll]],
  * but driven by Spark's own engine (checkpointed offsets, triggers,
  * AvailableNow, foreachBatch sinks) instead of a hand-rolled drain loop.
  *
  * This is the DSv1 `Source` SPI — the same contract delta-spark's
  * DeltaSource implements — because its `getBatch` returns a DataFrame:
  * each micro-batch is the fully DISTRIBUTED `changesFeed` scan of the
  * version interval `(start, end]`, so no row ever funnels through the
  * driver; the driver handles O(versions) commit metadata only. At 100 TB
  * that means a micro-batch over a burst of large commits plans exactly
  * the same multi-file parquet scan the batch feed does.
  *
  * Offset semantics (Delta's `startingVersion` convention): the lower
  * bound is EXCLUSIVE — version 0's content is the initial snapshot,
  * delivered by a plain versioned read, not the feed. `startingVersion`
  * option: `"earliest"` (default, stream everything after v0),
  * `"latest"` (only commits after stream start), or an explicit version
  * (exclusive). `maxVersionsPerBatch` rate-limits how many commit
  * versions one micro-batch may cover (Delta's `maxFilesPerTrigger`
  * analog, by version).
  *
  * Restart correctness: the engine replays the last incomplete batch via
  * `getBatch(checkpointed start, end)` and acks completed ones via
  * [[VtChangeFeedSource.commit]]; both fast-forward `lastEnd`, so a
  * post-restart `getOffset` can never regress below the checkpoint and
  * re-deliver an interval (the classic DSv1 restart hazard). The feed's
  * schema is pinned at stream start (table schema at head + `change_type`
  * + `version`); an interval whose evolved schema no longer matches fails
  * loudly on the select rather than silently null-filling. */
final class VtChangeFeedSource(spark: SparkSession, vt: VersionedTable,
                               branch: String, startVersion: Long,
                               maxVersionsPerBatch: Int)
    extends Source {

  require(maxVersionsPerBatch >= 1,
    s"maxVersionsPerBatch must be >= 1, got $maxVersionsPerBatch")

  override val schema: StructType =
    VtChangeFeed.feedSchema(vt, branch)

  private val offsets = new OffsetFloor(startVersion)

  private def headVersion: Long =
    vt.head(branch).map(_.version).getOrElse(
      throw new IllegalArgumentException(s"no such branch: $branch"))

  override def getOffset: Option[Offset] =
    offsets.nextEnd(headVersion, maxVersionsPerBatch).map(VersionOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    start.foreach(s => offsets.sync(s.json.toLong))
    val from = start.map(_.json.toLong).getOrElse(offsets.floor)
    val to = end.json.toLong
    offsets.sync(to)
    val batch =
      if (to <= from) // replayed empty interval after restart — never throw here
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      else
        vt.changesFeed(spark, branch, from, to)
          .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    // the engine asserts getBatch's frame is marked streaming; the plan
    // itself is the same distributed scan (toRdd is lazy — nothing runs here)
    org.apache.spark.sql.graft.StreamingShim.asStreaming(spark, batch)
  }

  override def commit(end: Offset): Unit = offsets.sync(end.json.toLong)

  override def stop(): Unit = ()

  override def toString: String = s"VtChangeFeedSource(${vt.root}@$branch)"
}

/** `format("vt-changes")` provider (registered via
  * `META-INF/services/org.apache.spark.sql.sources.DataSourceRegister`).
  * Options: `path` (required, versioned table root), `branch`
  * (default `main`), `startingVersion` (`earliest` | `latest` | version,
  * exclusive lower bound), `maxVersionsPerBatch`. */
final class VtChangeFeed extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "vt-changes"

  private def open(params: Map[String, String]): (VersionedTable, String) = {
    val path = SourcePaths.required(params, "vt-changes", "versioned table root")
    (VersionedTable.open(path), params.getOrElse("branch", "main"))
  }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "vt-changes derives its schema from the table's commit log; a " +
        "user-specified schema is not supported")
    val (vt, branch) = open(parameters)
    (shortName(), VtChangeFeed.feedSchema(vt, branch))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val (vt, branch) = open(parameters)
    val start = parameters.getOrElse("startingVersion", "earliest") match {
      case "earliest" => 0L
      case "latest" => vt.head(branch).map(_.version).getOrElse(0L)
      case v => v.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"bad startingVersion '$v': expected earliest, latest, or a version number"))
    }
    val maxV = parameters.get("maxVersionsPerBatch").map(_.toInt)
      .getOrElse(Int.MaxValue)
    new VtChangeFeedSource(sqlContext.sparkSession, vt, branch, start, maxV)
  }
}

object VtChangeFeed {
  /** Feed columns in their PINNED order: the branch-head table schema,
    * then `change_type`, then `version` — [[VtChangeFeedSource.getBatch]]
    * selects into exactly this order because the engine binds a DSv1
    * batch's columns to the source schema positionally. */
  private[sources] def feedSchema(vt: VersionedTable, branch: String): StructType = {
    val head = vt.head(branch).getOrElse(throw new IllegalArgumentException(
      s"branch $branch of ${vt.root} has no commits — nothing to stream"))
    DataType.fromJson(head.schemaJson).asInstanceOf[StructType]
      .add("change_type", StringType)
      .add("version", LongType, nullable = false)
  }
}
