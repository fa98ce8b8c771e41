package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}
import graft.QueryDef.{sql => q}

/** Stream-shaped analytics over the `events` table (north-star extension —
  * the reference itself is batch-only, SURVEY.md §2.9).
  *
  * Each operator exists twice with identical semantics:
  *  - a BATCH form registered as an oracle-checked query (below), and
  *  - a Structured Streaming form (`readStream` → watermark → windowed agg /
  *    `flatMapGroupsWithState`) exercised by StreamingSpec, so the streaming
  *    path is held to the same answers as the batch path on the same rows.
  */
object EventsStreaming {

  // ---- tumbling window aggregation ---------------------------------------

  /** Batch tumbling 1h windows: count + exact (integer-cents) value sum per
    * (window, event_type). Window start is pure integer arithmetic on epoch
    * seconds (`(sec div 3600) * 3600` — identical to Spark's epoch-aligned
    * `window()` start) and the cents rounding is mode-independent
    * `floor(x + 0.5)`, so neither engine's FP rounding mode nor its
    * timestamp-bucketing builtin can drift the oracle comparison. */
  def tumblingCounts(events: DataFrame): DataFrame = {
    val sec = col("ts").cast(LongType)
    events
      .groupBy((sec - (sec % 3600)).as("win_start"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(floor(col("value") * 100 + 0.5).cast(LongType)).as("sum_val_c"))
      .select(col("win_start"), col("event_type"), col("cnt"), col("sum_val_c"))
  }

  val qWindowTumbling: QueryDef = q("q_window_tumbling")(
    """SELECT (CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600) * 3600 AS win_start,
      |       event_type, count(*) AS cnt,
      |       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_val_c
      |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin) { (s, d) =>
    tumblingCounts(Tables.events(s, d)).orderBy("win_start", "event_type")
  }

  /** Streaming twin: file-source stream with a 1h watermark. Late rows beyond
    * the watermark are dropped; in append mode a window emits once final. */
  def streamingTumblingCounts(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(floor(col("value") * 100 + 0.5).cast(LongType)).as("sum_val_c"))
      .select(col("w.start").cast(LongType).as("win_start"), col("event_type"),
        col("cnt"), col("sum_val_c"))

  // ---- sessionization ----------------------------------------------------

  /** Batch sessionization: a session breaks after a 30-minute silence.
    * Classic gaps-and-islands — lag + cumulative sum over a per-user window.
    * Second-truncated timestamps keep both engines' arithmetic identical. */
  def sessionize(events: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val sec = col("ts").cast(LongType)
    val newSess = when(sec - lag(sec, 1).over(w) > gapSec, 1).otherwise(0)
    events.withColumn("new_sess", newSess)
      .withColumn("sess_id", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_id")
      .agg(count(lit(1)).as("n_events"), min(sec).as("sess_start"), max(sec).as("sess_end"))
  }

  val qSessionize: QueryDef = q("q_sessionize")(
    """WITH e AS (SELECT user_id, event_id,
      |                  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec FROM events),
      |     f AS (SELECT user_id, event_id, sec,
      |                  CASE WHEN sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) > 1800
      |                       THEN 1 ELSE 0 END AS new_sess FROM e),
      |     g AS (SELECT user_id, sec,
      |                  sum(new_sess) OVER (PARTITION BY user_id ORDER BY sec, event_id
      |                                      ROWS UNBOUNDED PRECEDING) AS sess_id FROM f)
      |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id, count(*) AS n_events,
      |       min(sec) AS sess_start, max(sec) AS sess_end
      |FROM g GROUP BY user_id, sess_id ORDER BY user_id, sess_id""".stripMargin) { (s, d) =>
    sessionize(Tables.events(s, d))
      .select(col("user_id"), col("sess_id").cast(LongType).as("sess_id"),
        col("n_events"), col("sess_start"), col("sess_end"))
      .orderBy("user_id", "sess_id")
  }

  /** Rolling time-RANGE window: per-user count and cents-sum of the trailing
    * hour at every event — the sliding-window complement of the tumbling
    * bucket above (a row belongs to many overlapping frames here). RANGE
    * frames are tie-inclusive (all rows with equal sec share one frame), so
    * the result is deterministic however same-second events are ordered;
    * cents stay integers, so the frame sum is order-exact in both engines. */
  def rollingHour(events: DataFrame): DataFrame = {
    val sec = col("ts").cast(LongType)
    val w = Window.partitionBy("user_id").orderBy("sec").rangeBetween(-3600L, 0L)
    events.select(col("user_id"), col("event_id"), sec.as("sec"),
        floor(col("value") * 100 + 0.5).cast(LongType).as("cents"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_val_c_1h", sum(col("cents")).over(w))
      .select("user_id", "event_id", "sec", "n_1h", "sum_val_c_1h")
  }

  val qWindowRange: QueryDef = q("q_window_range")(
    """WITH e AS (SELECT user_id, event_id,
      |                  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
      |                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events)
      |SELECT user_id, event_id, sec,
      |       count(*) OVER w AS n_1h,
      |       CAST(sum(cents) OVER w AS BIGINT) AS sum_val_c_1h
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY sec
      |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    rollingHour(Tables.events(s, d)).orderBy("user_id", "event_id")
  }

  /** Batch hopping (sliding) windows: 1h windows every 15min — each event
    * lands in 4 overlapping windows. The window membership is an explicit
    * `explode(sequence(...))` of the 4 window starts (pure integer epoch
    * arithmetic, exactly what Spark's `window(ts, "1 hour", "15 minutes")`
    * computes), so the oracle replays it with `generate_series`. The explode
    * is row-local (×4 fan-out BEFORE the keyed shuffle, so partial
    * aggregation absorbs it map-side); the only exchange is the final
    * (win_start, event_type) hash shuffle. */
  def hoppingCounts(events: DataFrame, sizeSec: Long = 3600L,
                    hopSec: Long = 900L): DataFrame = {
    val sec = col("ts").cast(LongType)
    val lastStart = sec - pmod(sec, lit(hopSec)) // newest window containing sec
    events
      .select(col("event_type"),
        floor(col("value") * 100 + 0.5).cast(LongType).as("cents"),
        explode(sequence(lastStart - (sizeSec - hopSec), lastStart,
          lit(hopSec))).as("win_start"))
      .groupBy("win_start", "event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("sum_val_c"))
  }

  val qWindowHopping: QueryDef = q("q_window_hopping")(
    """WITH e AS (SELECT event_type,
      |                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
      |                  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec FROM events),
      |     x AS (SELECT event_type, cents,
      |                  unnest(generate_series(sec - sec % 900 - 2700,
      |                                         sec - sec % 900, 900)) AS win_start FROM e)
      |SELECT win_start, event_type, count(*) AS cnt,
      |       CAST(sum(cents) AS BIGINT) AS sum_val_c
      |FROM x GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin) { (s, d) =>
    hoppingCounts(Tables.events(s, d))
      .select("win_start", "event_type", "cnt", "sum_val_c")
      .orderBy("win_start", "event_type")
  }

  /** Streaming twin: Spark's native sliding `window()` with a watermark —
    * StreamingSpec pins its agreement with [[hoppingCounts]] on the same
    * rows (same 4-windows-per-event semantics, state bounded by watermark). */
  def streamingHoppingCounts(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(floor(col("value") * 100 + 0.5).cast(LongType)).as("sum_val_c"))
      .select(col("w.start").cast(LongType).as("win_start"), col("event_type"),
        col("cnt"), col("sum_val_c"))

  /** Moving aggregate over a bounded ROWS frame: count and cents-sum of the
    * trailing 4 events (3 preceding + current) per user — the row-count
    * complement of the time-RANGE frame in [[rollingHour]]. The (sec,
    * event_id) ordering is a total order per user, so the frame contents are
    * deterministic in both engines; cents stay integers so the sum is exact. */
  def movingRows(events: DataFrame): DataFrame = {
    val sec = col("ts").cast(LongType)
    val w = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
      .rowsBetween(-3, Window.currentRow)
    events.select(col("user_id"), col("event_id"), sec.as("sec"),
        floor(col("value") * 100 + 0.5).cast(LongType).as("cents"))
      .withColumn("mv_n", count(lit(1)).over(w))
      .withColumn("mv_sum_c", sum(col("cents")).over(w))
      .select("user_id", "event_id", "sec", "mv_n", "mv_sum_c")
  }

  val qWindowRows: QueryDef = q("q_window_rows")(
    """WITH e AS (SELECT user_id, event_id,
      |                  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
      |                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events)
      |SELECT user_id, event_id, sec,
      |       count(*) OVER w AS mv_n,
      |       CAST(sum(cents) OVER w AS BIGINT) AS mv_sum_c
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
      |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    movingRows(Tables.events(s, d)).orderBy("user_id", "event_id")
  }

  /** Running DISTINCT count over a window — "distinct event types seen so
    * far per user", the engagement-breadth growth metric. Spark has no
    * DISTINCT window aggregates, so the idiomatic form is
    * `size(collect_set(x) OVER running-frame)`; DuckDB supports
    * `count(DISTINCT x) OVER` natively and the two are semantically
    * identical. State per frame is one small set of distinct values (5
    * event types here) — bounded by the value domain, not the row count. */
  def runningDistinct(events: DataFrame): DataFrame = {
    val sec = col("ts").cast(LongType)
    val w = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select(col("user_id"), col("event_id"), sec.as("sec"), col("event_type"))
      .withColumn("n_types_seen",
        size(collect_set(col("event_type")).over(w)).cast(LongType))
      .select("user_id", "event_id", "sec", "n_types_seen")
  }

  val qWindowDistinct: QueryDef = q("q_window_distinct")(
    """WITH e AS (SELECT user_id, event_id, event_type,
      |                  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec FROM events)
      |SELECT user_id, event_id, sec,
      |       CAST(count(DISTINCT event_type) OVER w AS BIGINT) AS n_types_seen
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    runningDistinct(Tables.events(s, d)).orderBy("user_id", "event_id")
  }

  /** Forward-fill (last-observation-carried-forward): impute missing values
    * from the most recent non-null observation in the same series — the
    * standard time-series gap repair. `last(..., ignoreNulls)` over a
    * running per-user frame; the (sec, event_id) total order makes the
    * carried value deterministic. Synthetic gaps (every 5th event) keep the
    * query closed-form for the oracle, which replays it with DuckDB's
    * `last_value(... IGNORE NULLS)`. Leading nulls (no prior observation)
    * stay null — both engines agree. */
  def forwardFill(events: DataFrame): DataFrame = {
    val sec = col("ts").cast(LongType)
    val cents = floor(col("value") * 100 + 0.5).cast(LongType)
    val gapped = when(pmod(col("event_id"), lit(5)) === 0, lit(null)).otherwise(cents)
    val w = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select(col("user_id"), col("event_id"), sec.as("sec"),
        gapped.as("cents_gapped"))
      .withColumn("cents_filled", last(col("cents_gapped"), ignoreNulls = true).over(w))
      .select("user_id", "event_id", "sec", "cents_gapped", "cents_filled")
  }

  val qForwardFill: QueryDef = q("q_forward_fill")(
    """WITH e AS (SELECT user_id, event_id,
      |                  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
      |                  CASE WHEN event_id % 5 = 0 THEN NULL
      |                       ELSE CAST(floor(value * 100 + 0.5) AS BIGINT) END AS cents_gapped
      |           FROM events)
      |SELECT user_id, event_id, sec, cents_gapped,
      |       last_value(cents_gapped IGNORE NULLS) OVER w AS cents_filled
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    forwardFill(Tables.events(s, d)).orderBy("user_id", "event_id")
  }

  /** Linear interpolation of the synthetic gaps in EXACT integer
    * arithmetic: lerp between the previous and next non-null anchors, in
    * milli-cents so the slope never leaves int64 —
    * `prev*1000 + (next-prev)*1000*(t-t0) DIV (t1-t0)`. Both engines
    * truncate integer division toward zero (Spark DIV = DuckDB `//`), so
    * the result is bit-identical with no floating point anywhere. Edge
    * policy: leading gaps backfill, trailing gaps forward-fill, non-gaps
    * pass through scaled. The backward/forward anchor lookups are one
    * window pair over the same per-user ordering (one shuffle total). */
  def interpolate(events: DataFrame): DataFrame = {
    val sec = col("ts").cast(LongType)
    val cents = floor(col("value") * 100 + 0.5).cast(LongType)
    val gapped = when(pmod(col("event_id"), lit(5)) === 0, lit(null)).otherwise(cents)
    val ord = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val base = events.select(col("user_id"), col("event_id"), sec.as("sec"),
      gapped.as("g"))
    val anchored = base
      .withColumn("pv", last(col("g"), ignoreNulls = true).over(wPrev))
      .withColumn("pt", last(when(col("g").isNotNull, col("sec")), ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("g"), ignoreNulls = true).over(wNext))
      .withColumn("nt", first(when(col("g").isNotNull, col("sec")), ignoreNulls = true).over(wNext))
    anchored.select(col("user_id"), col("event_id"), col("sec"),
      when(col("g").isNotNull, col("g") * 1000)
        .when(col("pv").isNull, col("nv") * 1000)
        .when(col("nv").isNull, col("pv") * 1000)
        .when(col("nt") === col("pt"), col("pv") * 1000)
        .otherwise(col("pv") * 1000 +
          expr("((nv - pv) * 1000 * (sec - pt)) DIV (nt - pt)"))
        .as("mc_interp"))
  }

  val qInterpolate: QueryDef = q("q_interpolate")(
    """WITH e AS (SELECT user_id, event_id,
      |                  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
      |                  CASE WHEN event_id % 5 = 0 THEN NULL
      |                       ELSE CAST(floor(value * 100 + 0.5) AS BIGINT) END AS g
      |           FROM events),
      |     a AS (SELECT user_id, event_id, sec, g,
      |                  last_value(g IGNORE NULLS) OVER wp AS pv,
      |                  last_value(CASE WHEN g IS NOT NULL THEN sec END IGNORE NULLS) OVER wp AS pt,
      |                  first_value(g IGNORE NULLS) OVER wn AS nv,
      |                  first_value(CASE WHEN g IS NOT NULL THEN sec END IGNORE NULLS) OVER wn AS nt
      |           FROM e
      |           WINDOW wp AS (PARTITION BY user_id ORDER BY sec, event_id
      |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |                  wn AS (PARTITION BY user_id ORDER BY sec, event_id
      |                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT user_id, event_id, sec,
      |       CAST(CASE WHEN g IS NOT NULL THEN g * 1000
      |                 WHEN pv IS NULL THEN nv * 1000
      |                 WHEN nv IS NULL THEN pv * 1000
      |                 WHEN nt = pt THEN pv * 1000
      |                 ELSE pv * 1000 + ((nv - pv) * 1000 * (sec - pt)) // (nt - pt)
      |            END AS BIGINT) AS mc_interp
      |FROM a ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    interpolate(Tables.events(s, d)).orderBy("user_id", "event_id")
  }

  // ---- stateful streaming sessionizer ------------------------------------

  final case class Ev(user_id: Long, sec: Long)
  final case class SessState(sessId: Long, lastSec: Long, startSec: Long, n: Long)
  final case class SessOut(user_id: Long, sess_id: Long, n_events: Long,
                           sess_start: Long, sess_end: Long)

  /** Streaming sessionizer via flatMapGroupsWithState: custom per-key state,
    * emits a session when the 30-min gap closes it (plus the open tail on
    * timeout). State is one tiny record per active user — bounded memory at
    * any event volume; the shuffle is keyed on user_id only. */
  def streamingSessionize(events: Dataset[Ev], gapSec: Long = 1800L)(
      implicit spark: SparkSession): Dataset[SessOut] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessState], SessOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[List[SessState]]) =>
          // batch-per-trigger: fold sorted events into (closed sessions, open tail)
          val sorted = evs.toSeq.sortBy(_.sec)
          val init = state.getOption.flatMap(_.headOption)
          var open: Option[SessState] = init
          val closed = scala.collection.mutable.ListBuffer.empty[SessOut]
          sorted.foreach { e =>
            open match {
              case Some(st) if e.sec - st.lastSec <= gapSec =>
                open = Some(st.copy(lastSec = e.sec, n = st.n + 1))
              case Some(st) =>
                closed += SessOut(userId, st.sessId, st.n, st.startSec, st.lastSec)
                open = Some(SessState(st.sessId + 1, e.sec, e.sec, 1))
              case None =>
                open = Some(SessState(0L, e.sec, e.sec, 1))
            }
          }
          state.update(open.toList)
          closed.iterator
      }
  }

  // ---- streaming heavy hitters -------------------------------------------

  final case class HHOut(group: String, token: String, cnt: Long)

  /** Streaming Misra–Gries heavy hitters: one BOUNDED counter map per group
    * maintained across micro-batches via `flatMapGroupsWithState` — the
    * [[graft.ext.HeavyHitters]] summary with TIME as the merge dimension.
    * Each batch's tokens fold into the state with the same `mgReduce` step
    * the batch Aggregator uses, so after any number of batches the state
    * obeys the same N/(capacity+1) undercount bound over everything streamed
    * so far — state stays ≤ capacity entries per group forever, the property
    * that makes a frequency census runnable as an unbounded ingest job.
    * Emits the current top-k per group each trigger (Update mode). */
  def streamingHeavyHitters(tokens: Dataset[(String, String)],
                            capacity: Int, k: Int)(
      implicit spark: SparkSession): Dataset[HHOut] = {
    import spark.implicits._
    import graft.ext.HeavyHitters
    tokens.groupByKey(_._1)
      .flatMapGroupsWithState[Map[String, Long], HHOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (g: String, it: Iterator[(String, String)],
         state: GroupState[Map[String, Long]]) =>
          var buf = state.getOption.getOrElse(Map.empty[String, Long])
          it.foreach { case (_, tok) => buf = HeavyHitters.mgReduce(buf, tok, capacity) }
          state.update(buf)
          HeavyHitters.mgTop(buf, k).iterator.map(tc => HHOut(g, tc.token, tc.cnt))
      }
  }

  // ---- streaming ingestion into the versioned lakehouse layer ------------

  private[graft] val BatchMsgPrefix = "stream batch "
  // Strict message shape for the idempotence check: a manual commit whose
  // message merely starts with the prefix ("stream batch backfill") must be
  // SKIPPED, not parsed — a NumberFormatException here would wedge every
  // subsequent micro-batch. 18 digits max keeps `toLong` overflow-proof.
  private val BatchMsgRe = ("^" + BatchMsgPrefix + """(\d{1,18})$""").r

  /** One idempotent micro-batch append: skip the write when the branch has
    * already committed this batchId or a later one. A restarted query
    * re-delivers its last micro-batch under the SAME batchId (Spark's
    * exactly-once sink contract expects the sink to dedup by it — the same
    * `txnAppId`/`txnVersion` check Delta's streaming sink performs), so
    * without this check a crash between the commit and the checkpoint
    * advance would append the batch twice. The check reads commit METADATA
    * newest-first and stops at the first ingest commit found — O(1) ingest
    * commits inspected per batch, no data read. Batch ids are monotonic per
    * checkpoint, so "newest ingest commit's id >= batchId" ⇔ duplicate. */
  def ingestBatch(vt: graft.vt.VersionedTable, branch: String,
                  statsCols: Seq[String] = Nil)
                 (batch: DataFrame, batchId: Long): Unit = {
    if (lastIngestedBatchId(vt, branch).exists(_ >= batchId)) () // duplicate delivery: already committed
    else if (!batch.isEmpty)
      vt.write(batch, branch, message = s"$BatchMsgPrefix$batchId",
        mode = "append", statsCols = statsCols)
  }

  /** Keyed-CDC twin of [[ingestBatch]]: land one source version's
    * (upserts, deleted keys) as ONE [[graft.vt.VersionedTable.applyCdc]]
    * commit tagged with `batchId` — the same watermark dedup, so a
    * re-delivered batch after a crash is skipped, and the one-commit shape
    * means there is no torn intermediate version for the watermark to
    * mis-read. Used by [[ChangeFeed.tailFromDelta]] for delete/update
    * versions that log shipping cannot express. */
  def applyCdcBatch(vt: graft.vt.VersionedTable, branch: String,
                    keyCols: Seq[String])
                   (upserts: DataFrame, deleteKeys: DataFrame,
                    batchId: Long): Unit = {
    if (lastIngestedBatchId(vt, branch).exists(_ >= batchId)) ()
    else vt.applyCdc(upserts.sparkSession, upserts, Some(deleteKeys), keyCols,
      branch, message = s"$BatchMsgPrefix$batchId")
  }

  /** Newest ingest commit's batchId on `branch`, if any — the sink-side
    * transaction watermark [[ingestBatch]] dedups against (Delta's
    * `txnVersion` analog). Lazy head-first metadata walk that stops at the
    * first ingest commit found — O(1) ingest commits inspected, no data
    * read. Exposed so a crashed replicator ([[ChangeFeed.replicateAppends]])
    * can recover which source interval the sink already holds. */
  def lastIngestedBatchId(vt: graft.vt.VersionedTable, branch: String): Option[Long] =
    Iterator.iterate(vt.head(branch))(_.flatMap(_.parent).map(vt.loadCommit))
      .takeWhile(_.isDefined).map(_.get.message)
      .collectFirst { case BatchMsgRe(digits) => digits.toLong }

  /** Streaming → VersionedTable ingest via foreachBatch: each micro-batch
    * becomes one APPEND commit (O(metadata) union of the parent file list),
    * so the branch head is always a consistent snapshot — a reader never
    * sees a half-written batch — and every batch boundary is a time-travel
    * point. Exactly-once per batchId: [[ingestBatch]] skips a re-delivered
    * batch whose id is already in the branch's commit log, which is the
    * lakehouse streaming-sink contract (Delta's transactional streaming
    * write) on the native commit log. Small files accumulate per trigger at
    * scale — `vt.compact()` is the companion operation. */
  def streamingVersionedIngest(events: DataFrame, vt: graft.vt.VersionedTable,
                               branch: String = "main"):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.outputMode("append").foreachBatch(ingestBatch(vt, branch) _)

  /** The full continuously-ingesting training-data pipeline as ONE
    * foreachBatch: each micro-batch of documents is (1) screened against the
    * PERSISTED corpus signature table — exact sha + banded near-dup, work ∝
    * batch, corpus text never read
    * ([[graft.ext.IncrementalDedup.screenAgainstSignatures]]); (2) its fresh
    * docs appended to the corpus as one commit (idempotent per batchId, same
    * contract as [[ingestBatch]]); (3) the signature table advanced O(batch)
    * ([[graft.ext.IncrementalDedup.maintainSignatureTable]]). Every batch
    * boundary is a time-travel point of BOTH tables, and a duplicate
    * delivery after a crash re-screens but never double-commits. Docs whose
    * near-dup verification meets the Jaccard threshold are dropped along
    * with exact dups (the curation choice; flip `dropNearDups` to keep them). */
  def dedupIngestBatch(vt: graft.vt.VersionedTable, sigVt: graft.vt.VersionedTable,
                       branch: String = "main", dropNearDups: Boolean = true)
                      (batch: DataFrame, batchId: Long): Unit = {
    // HEAL FIRST, on every delivery — including the duplicate-skip path: a
    // crash between the corpus commit and the signature maintenance below
    // would otherwise leave sigVt permanently behind (the re-delivered batch
    // is skipped, and every later batch screens against a stale snapshot
    // that lets that batch's duplicates through). Maintenance is idempotent
    // and O(delta) when behind, a metadata no-op when caught up.
    graft.ext.IncrementalDedup.maintainSignatureTable(vt, sigVt, branch)
    if (lastIngestedBatchId(vt, branch).exists(_ >= batchId) || batch.isEmpty) return
    // WITHIN-batch exact collapse first (min-doc_id survivor per sha): two
    // byte-identical docs arriving in one micro-batch must not both land.
    // Near-dup screening stays corpus-granular — same batch-boundary
    // semantics as dropDuplicatesWithinWatermark, which is also exact-only;
    // a same-batch near-dup pair is caught the next time either text
    // arrives, once the survivors' signatures are persisted.
    val spark = batch.sparkSession
    val raw = batch.select("doc_id", "text")
    val docs = raw.withColumn("__sha", sha2(col("text"), 256))
      .withColumn("__rep", org.apache.spark.sql.functions.min("doc_id")
        .over(org.apache.spark.sql.expressions.Window.partitionBy("__sha")))
      .where(col("doc_id") === col("__rep")).select("doc_id", "text")
    val fresh =
      if (vt.head(branch).isEmpty) docs // first batch: no corpus to screen against
      else {
        val profile = graft.ext.IncrementalDedup.screenAgainstSignatures(
          docs, sigVt.read(spark, branch))
        val keep = profile.where(!col("is_exact_dup") &&
          (if (dropNearDups) col("n_near") === 0L else lit(true)))
        docs.join(keep.select("doc_id"), Seq("doc_id"), "left_semi")
      }
    // commit even when everything was screened out: the batchId must be
    // recorded or a restart would re-deliver and re-screen forever
    vt.write(fresh, branch, message = s"$BatchMsgPrefix$batchId", mode = "append")
    graft.ext.IncrementalDedup.maintainSignatureTable(vt, sigVt, branch)
  }

  /** Streaming writer wiring [[dedupIngestBatch]] — see there. */
  def streamingDedupIngest(docs: DataFrame, vt: graft.vt.VersionedTable,
                           sigVt: graft.vt.VersionedTable, branch: String = "main"):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append").foreachBatch(dedupIngestBatch(vt, sigVt, branch) _)

  // ---- stream-stream join ------------------------------------------------

  /** Stream-stream inner join with event-time bounds: enrich a stream of
    * events with the FIRST stream's rows for the same user within the
    * trailing hour. Both sides carry watermarks and the join condition
    * bounds event time on both sides — the two conditions Structured
    * Streaming needs to know when buffered state can be dropped, so state
    * is bounded by (arrival rate × horizon) per side, not by stream length.
    * The shuffle is keyed on user_id only; this is the canonical
    * clicks⋈impressions shape. StreamingSpec pins agreement with the
    * equivalent batch range join on the same rows. */
  def streamingIntervalJoin(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.withWatermark("ts", "1 hour").as("l")
    val r = right.withWatermark("ts", "1 hour").as("r")
    l.join(r,
      col("l.user_id") === col("r.user_id") &&
        col("r.ts") >= col("l.ts") &&
        col("r.ts") <= col("l.ts") + org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR"))
      .select(col("l.user_id"), col("l.event_id").as("l_event"),
        col("r.event_id").as("r_event"),
        col("l.ts").cast(LongType).as("l_sec"), col("r.ts").cast(LongType).as("r_sec"))
  }

  // ---- streaming dedup ---------------------------------------------------

  /** Streaming exact dedup: content fingerprint + dropDuplicatesWithinWatermark
    * — state holds one fingerprint per doc inside the watermark horizon, so
    * memory is bounded by arrival rate × horizon, not corpus size. The batch
    * twin is Dedup.exactDedup; StreamingSpec pins their agreement. */
  def streamingDedup(events: DataFrame, idCol: String, contentCol: String): DataFrame =
    events
      .withColumn("content_sha", sha2(col(contentCol), 256))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("content_sha")

  val defs: Seq[QueryDef] =
    Seq(qWindowTumbling, qSessionize, qWindowRange, qWindowHopping, qWindowRows,
      qForwardFill, qInterpolate, qWindowDistinct)
}
