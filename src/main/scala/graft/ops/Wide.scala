package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}
import graft.QueryDef.{sql => q}

/** Round-8 surface widening: reshaping (unpivot/melt), nested types
  * (map/struct), array higher-order functions, and time-series resampling —
  * the remaining everyday relational shapes a user of the reference's Spark
  * jobs reaches for next. All row-local or single-keyed-shuffle plans; no
  * operator here has a single-partition stage.
  */
object Wide {

  /** Unpivot/melt (`Dataset.unpivot`, the inverse of q_pivot): wide numeric
    * columns → long (metric, value) pairs. Row-local explosion — the plan is
    * one Expand over the scan, no shuffle. Oracle = the equivalent UNION ALL
    * (portable to any SQL engine). */
  val qUnpivot: QueryDef = q("q_unpivot")(
    """SELECT l_orderkey, l_linenumber, 'l_discount' AS metric, l_discount AS value FROM lineitem
      |UNION ALL SELECT l_orderkey, l_linenumber, 'l_quantity', l_quantity FROM lineitem
      |UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, metric, value""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_tax", "l_discount")
      .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_tax"), col("l_discount")), "metric", "value")
      .orderBy("l_orderkey", "l_linenumber", "metric", "value")
  }

  /** Map-typed column round trip: build a map from arrays, extract values,
    * enumerate keys. Maps stay row-local (never a shuffle key here). */
  val qMapFuncs: QueryDef = q("q_map_funcs")(
    """SELECT o_orderkey,
      |       map(['status','prio'], [o_orderstatus, o_orderpriority])['status'][1] AS status_v,
      |       map(['status','prio'], [o_orderstatus, o_orderpriority])['prio'][1] AS prio_v,
      |       CAST(cardinality(map(['status','prio'], [o_orderstatus, o_orderpriority])) AS INTEGER) AS n_keys,
      |       array_to_string(map_keys(map(['status','prio'], [o_orderstatus, o_orderpriority])), ',') AS keys_csv
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val m = map_from_arrays(array(lit("status"), lit("prio")),
      array(col("o_orderstatus"), col("o_orderpriority")))
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        element_at(m, "status").as("status_v"),
        element_at(m, "prio").as("prio_v"),
        size(m).as("n_keys"),
        array_join(map_keys(m), ",").as("keys_csv"))
      .orderBy("o_orderkey")
  }

  /** Struct-typed column round trip: pack fields, read them back, and take
    * the array_min over an ARRAY OF STRUCTS (struct comparison is
    * lexicographic by field position in both engines — the argmin idiom the
    * IVF assignment also uses). */
  val qStructFuncs: QueryDef = q("q_struct_funcs")(
    """SELECT o_orderkey,
      |       struct_pack(price := o_totalprice, status := o_orderstatus).price AS s_price,
      |       struct_pack(price := o_totalprice, status := o_orderstatus).status AS s_status,
      |       list_min([struct_pack(v := o_totalprice, src := 'total'),
      |                 struct_pack(v := o_totalprice / 2, src := 'half')]).src AS smaller_src
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val st = struct(col("o_totalprice").as("price"), col("o_orderstatus").as("status"))
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        st.getField("price").as("s_price"),
        st.getField("status").as("s_status"),
        array_min(array(
          struct(col("o_totalprice").as("v"), lit("total").as("src")),
          struct((col("o_totalprice") / 2).as("v"), lit("half").as("src"))))
          .getField("src").as("smaller_src"))
      .orderBy("o_orderkey")
  }

  /** Array higher-order functions over a per-row numeric vector: aggregate
    * (left fold), exists, forall, filter, transform — all codegen'd
    * row-local expressions, the Spark-native replacement for per-row UDFs. */
  val qHof: QueryDef = q("q_hof")(
    """WITH t AS (SELECT l_orderkey, l_linenumber,
      |                  [l_quantity, l_discount, l_tax] AS arr FROM lineitem)
      |SELECT l_orderkey, l_linenumber,
      |       list_reduce(list_prepend(CAST(0 AS DOUBLE), arr), (acc, x) -> acc + x) AS hof_sum,
      |       len(list_filter(arr, x -> x > 25)) > 0 AS any_gt25,
      |       len(list_filter(arr, x -> x >= 0)) = 3 AS all_nonneg,
      |       CAST(len(list_filter(arr, x -> x > 1)) AS INTEGER) AS n_gt1,
      |       arr[1] * 2 AS first_doubled
      |FROM t ORDER BY l_orderkey, l_linenumber, hof_sum, first_doubled""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .withColumn("arr", array(col("l_quantity"), col("l_discount"), col("l_tax")))
      .select(col("l_orderkey"), col("l_linenumber"),
        aggregate(col("arr"), lit(0.0), (acc, x) => acc + x).as("hof_sum"),
        exists(col("arr"), _ > 25).as("any_gt25"),
        forall(col("arr"), _ >= 0).as("all_nonneg"),
        size(filter(col("arr"), _ > 1)).as("n_gt1"),
        (element_at(col("arr"), 1) * 2).as("first_doubled"))
      .orderBy("l_orderkey", "l_linenumber", "hof_sum", "first_doubled")
  }

  /** Time-series resample: 5-minute OHLC bars over the event stream —
    * open/close by deterministic sequence (arg-min/arg-max on the unique
    * event_id), high/low/volume per bar. One keyed aggregation; bar start is
    * pure integer epoch arithmetic so neither engine's timestamp-bucketing
    * builtin is trusted. */
  val qResample: QueryDef = q("q_resample")(
    """SELECT (CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 300) * 300 AS bar_start,
      |       arg_min(value, event_id) AS open_v,
      |       max(value) AS high_v,
      |       min(value) AS low_v,
      |       arg_max(value, event_id) AS close_v,
      |       count(*) AS volume
      |FROM events GROUP BY 1 ORDER BY bar_start""".stripMargin) { (s, d) =>
    val sec = col("ts").cast(LongType)
    Tables.events(s, d)
      .groupBy((sec - (sec % 300)).as("bar_start"))
      .agg(min_by(col("value"), col("event_id")).as("open_v"),
        max(col("value")).as("high_v"),
        min(col("value")).as("low_v"),
        max_by(col("value"), col("event_id")).as("close_v"),
        count(lit(1)).as("volume"))
      .orderBy("bar_start")
  }

  /** Per-status price stats through the TYPED custom-Aggregator path
    * ([[graft.functions.GroupStats]]): `groupByKey.agg(aggregator.toColumn)`
    * — the extension point for aggregation logic the built-ins lack. The
    * buffer is merge-order-insensitive (integer cents + min/max), so the
    * result is bit-stable under any partitioning; mean is derived with
    * integer division, identical in both engines. */
  val qTypedAgg: QueryDef = q("q_typed_agg")(
    """SELECT o_orderstatus AS status, count(*) AS cnt,
      |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
      |       min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
      |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) // count(*) AS BIGINT) AS mean_cents
      |FROM orders GROUP BY o_orderstatus ORDER BY status""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.orders(s, d).select(col("o_orderstatus"), col("o_totalprice"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .agg(graft.functions.GroupStats.toColumn)
      .toDF("status", "stats")
      .select(col("status"), col("stats.cnt").as("cnt"),
        col("stats.sumCents").as("sum_cents"),
        col("stats.mn").as("min_price"), col("stats.mx").as("max_price"),
        expr("stats.sumCents div stats.cnt").as("mean_cents"))
      .orderBy("status")
  }

  val defs: Seq[QueryDef] = Seq(qUnpivot, qMapFuncs, qStructFuncs, qHof, qResample,
    qTypedAgg)
}
