package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}
import graft.QueryDef.{sql => q}

/** As-of join — the time-series operator Spark has no built-in for (the
  * prompt's canonical "operator the engine lacks"). Implemented by COMPOSING
  * built-ins (preference (a) over a custom SparkPlan): union the two sides
  * tagged, sort each key's timeline once, and carry the last right-side value
  * forward with `last(ignoreNulls)` over an unbounded-preceding frame.
  *
  * One shuffle on the join key + one in-partition sort — the same cost as a
  * single window aggregation, versus a naive range-join's quadratic blowup.
  * Equal timestamps match (`right.ts <= left.ts` inclusive) because right
  * rows sort before left rows at the same instant. DuckDB's native
  * `ASOF LEFT JOIN` provides the independent oracle.
  */
object AsofJoin {

  /** For every `left` row, attach `valueCol` from the latest `right` row of
    * the same `key` with `rightTs <= leftTs` (null when none precedes).
    * When `right` has several rows at one (key, ts), the LARGEST value wins —
    * the window orders right peers by value, so the pick is deterministic
    * (max_by semantics) rather than partition-order-dependent; pre-aggregate
    * upstream if a different tie rule is wanted. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               valueCol: String): DataFrame = {
    val rightTagged = right.select(col(key), col(ts),
      lit(0).as("__tag"), col(valueCol).as("__r_value"))
    val leftTagged = left.withColumn("__tag", lit(1))
      .withColumn("__r_value", lit(null).cast(right.schema(valueCol).dataType))
    val cols = leftTagged.columns
    val unioned = rightTagged
      .select(cols.map(c => if (rightTagged.columns.contains(c)) col(c)
        else lit(null).cast(leftTagged.schema(c).dataType).as(c)): _*)
      .unionByName(leftTagged)
    // nulls_first so `last(ignoreNulls)` lands on the largest NON-null value
    // among right peers sharing a timestamp; left rows carry null __r_value,
    // so their relative order never affects the carried value
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__tag").asc, col("__r_value").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__asof", last(col("__r_value"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .drop("__tag", "__r_value")
  }

  /** Events as-of-joined to the latest preceding purchase value per user. */
  val qJoinAsof: QueryDef = q("q_join_asof")(
    """WITH e AS (SELECT user_id, event_id,
      |                  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
      |                  value, event_type FROM events),
      |     r AS (SELECT user_id, sec, max(value) AS purchase_value
      |           FROM e WHERE event_type = 'purchase' GROUP BY user_id, sec)
      |SELECT l.user_id, l.sec, l.event_id, l.value, r.purchase_value AS last_purchase
      |FROM e l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.sec >= r.sec
      |ORDER BY l.user_id, l.sec, l.event_id""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d).select(col("user_id"), col("event_id"),
      col("ts").cast(LongType).as("sec"), col("value"), col("event_type"))
    val purchases = e.where(col("event_type") === "purchase")
      .groupBy("user_id", "sec").agg(max("value").as("purchase_value"))
    asofJoin(e.select("user_id", "event_id", "sec", "value"), purchases,
      key = "user_id", ts = "sec", valueCol = "purchase_value")
      .select(col("user_id"), col("sec"), col("event_id"), col("value"),
        col("__asof").as("last_purchase"))
      .orderBy("user_id", "sec", "event_id")
  }

  /** As-of join WITH TOLERANCE (pandas `merge_asof(tolerance=...)`): the
    * match is dropped when the latest preceding right row is older than
    * `tol` time units — the guard real feature pipelines need so a years-old
    * reading can't leak into today's features. Same single-shuffle plan as
    * [[asofJoin]]; the carried value is a (ts, value) struct so the
    * staleness check is row-local after the window. Duplicate right rows at
    * one (key, ts) resolve deterministically to the largest value — the
    * window orders the carried (ts, value) struct, same rule as [[asofJoin]]. */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, key: String, ts: String,
                        valueCol: String, tol: Long): DataFrame = {
    val vType = right.schema(valueCol).dataType
    val rightTagged = right.select(col(key), col(ts), lit(0).as("__tag"),
      struct(col(ts).as("__rts"), col(valueCol).as("__rv")).as("__r_match"))
    val leftTagged = left.withColumn("__tag", lit(1))
      .withColumn("__r_match", lit(null).cast(
        StructType(Seq(StructField("__rts", left.schema(ts).dataType),
          StructField("__rv", vType)))))
    val cols = leftTagged.columns
    val unioned = rightTagged
      .select(cols.map(c => if (rightTagged.columns.contains(c)) col(c)
        else lit(null).cast(leftTagged.schema(c).dataType).as(c)): _*)
      .unionByName(leftTagged)
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__tag").asc, col("__r_match").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__m", last(col("__r_match"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .withColumn("__asof",
        when(col("__m").isNotNull && col("__m.__rts") >= col(ts) - tol, col("__m.__rv")))
      .drop("__tag", "__r_match", "__m")
  }

  /** Same query as q_join_asof but matches staler than 1 hour are nulled. */
  val qJoinAsofTol: QueryDef = q("q_join_asof_tol")(
    """WITH e AS (SELECT user_id, event_id,
      |                  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
      |                  value, event_type FROM events),
      |     r AS (SELECT user_id, sec, max(value) AS purchase_value
      |           FROM e WHERE event_type = 'purchase' GROUP BY user_id, sec)
      |SELECT l.user_id, l.sec, l.event_id, l.value,
      |       CASE WHEN l.sec - r.sec <= 3600 THEN r.purchase_value END AS recent_purchase
      |FROM e l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.sec >= r.sec
      |ORDER BY l.user_id, l.sec, l.event_id""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d).select(col("user_id"), col("event_id"),
      col("ts").cast(LongType).as("sec"), col("value"), col("event_type"))
    val purchases = e.where(col("event_type") === "purchase")
      .groupBy("user_id", "sec").agg(max("value").as("purchase_value"))
    asofJoinTolerance(e.select("user_id", "event_id", "sec", "value"), purchases,
      key = "user_id", ts = "sec", valueCol = "purchase_value", tol = 3600L)
      .select(col("user_id"), col("sec"), col("event_id"), col("value"),
        col("__asof").as("recent_purchase"))
      .orderBy("user_id", "sec", "event_id")
  }

  // -------------------------------------------------------------------------
  // Range join — the other interval operator Spark lacks a native strategy
  // for. A direct inequality join plans BroadcastNestedLoopJoin (quadratic);
  // the scale path is BIN BUCKETING: points map to one bin, intervals explode
  // to their covering bins, the join becomes an EQUI-join on bin + a residual
  // filter. Work scales with interval width / bin width, not |L|×|R|.
  // -------------------------------------------------------------------------

  /** Join `points` (pointCol) to `intervals` ([loCol, hiCol)) via bin
    * bucketing. Result = all (point, interval) pairs with lo <= p < hi. */
  def rangeJoin(points: DataFrame, intervals: DataFrame, pointCol: String,
                loCol: String, hiCol: String, binWidth: Double): DataFrame = {
    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth).cast(LongType))
    val iv = intervals.withColumn("__bin", explode(sequence(
      floor(col(loCol) / binWidth).cast(LongType),
      floor((col(hiCol) - 1e-9) / binWidth).cast(LongType))))
    p.join(iv, Seq("__bin"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }

  /** Low-priced orders joined to 5 synthetic price bands. The oracle
    * is DuckDB's plain inequality join; RangeJoinSpec asserts the physical
    * plan is an equi-join (no BroadcastNestedLoopJoin). */
  val qJoinRange: QueryDef = q("q_join_range")(
    """WITH bands AS (SELECT r_regionkey AS band_id, r_regionkey * 8000.0 + 1000.0 AS lo,
      |                      r_regionkey * 8000.0 + 7000.0 AS hi FROM region),
      |     pts AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 40000)
      |SELECT o_orderkey, o_totalprice, band_id, lo, hi
      |FROM pts JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
      |ORDER BY o_orderkey, band_id""".stripMargin) { (s, d) =>
    val bands = Tables.region(s, d).select(col("r_regionkey").as("band_id"),
      (col("r_regionkey") * 8000.0 + 1000.0).as("lo"),
      (col("r_regionkey") * 8000.0 + 7000.0).as("hi"))
    val pts = Tables.orders(s, d).where(col("o_totalprice") < 40000)
      .select("o_orderkey", "o_totalprice")
    rangeJoin(pts, bands, "o_totalprice", "lo", "hi", binWidth = 1000.0)
      .select("o_orderkey", "o_totalprice", "band_id", "lo", "hi")
      .orderBy("o_orderkey", "band_id")
  }

  val defs: Seq[QueryDef] = Seq(qJoinAsof, qJoinAsofTol, qJoinRange)
}
