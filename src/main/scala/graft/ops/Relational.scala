package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}
import graft.QueryDef.{sql => q}

/** Atomic relational operators — SURVEY.md §2.1–2.8, one oracle-checked query
  * per operator, all pure DataFrame DSL so Catalyst plans them (pushdown,
  * pruning, broadcast selection, AQE) with zero custom physical code.
  *
  * Determinism contract (SURVEY.md §5.5): every query ends in a total-order
  * sort present in BOTH the Spark plan and the oracle SQL; float aggregates
  * are either exact (integral-valued doubles like `l_quantity`) or rounded to
  * integers pre-sum; nullable sort keys carry explicit NULLS FIRST/LAST on the
  * DuckDB side to match Spark's asc_nulls_first / desc_nulls_last defaults.
  */
object Relational {

  // -------------------------------------------------------------------------
  // §2.1 Scans (S1–S4) — reference reads CSV (±inferSchema), ORC, Parquet
  // from a lakeFS branch (`jobs/vdt1.py:32-38`, `jobs/vdt4.py:29-32`).
  // Testdata is parquet at rest, so CSV/ORC scans are proven by round-trip:
  // write the format to scratch, read it back, compare against the oracle on
  // the original table — exercising both the sink and the scan of the format.
  // -------------------------------------------------------------------------

  /** S1 — CSV scan with header + schema inference (`jobs/vdt1.py:32-35`). */
  val qScanCsv: QueryDef = q("q_scan_csv")(
    """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag""".stripMargin) { (s, d) =>
    val out = Tables.scratch("scan_csv")
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .write.mode("overwrite").option("header", true).csv(out)
    s.read.option("header", true).option("inferSchema", true).csv(out)
      .select(col("l_orderkey").cast(LongType), col("l_linenumber").cast(IntegerType),
        col("l_quantity").cast(DoubleType), col("l_returnflag"))
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
  }

  /** S2 — CSV scan without inference: every column lands as string and is
    * cast explicitly downstream (`jobs/vdt4.py:29-36`). */
  val qScanCsvRaw: QueryDef = q("q_scan_csv_raw")(
    """SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey_raw, o_orderstatus,
      |       CAST(o_custkey AS VARCHAR) AS o_custkey_raw
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val out = Tables.scratch("scan_csv_raw")
    Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_custkey")
      .write.mode("overwrite").option("header", true).csv(out)
    s.read.option("header", true).option("inferSchema", false).csv(out)
      .select(col("o_orderkey").as("o_orderkey_raw"), col("o_orderstatus"),
        col("o_custkey").as("o_custkey_raw"))
      .orderBy(col("o_orderkey_raw").cast(LongType))
  }

  /** S1-hardening (r12 verdict #7) — CSV option surface under HOSTILE text:
    * embedded delimiters, embedded double quotes, embedded NEWLINES
    * (multiLine read), and a distinguished nullValue token, round-tripped
    * write→read with explicit quote/escape options. The reference relies on
    * CSV defaults (`jobs/vdt1.py:32-35`); a real lake hits quoted fields
    * immediately. The hostile strings are built deterministically from
    * `nation`, so DuckDB reproduces them closed-form from the parquet. */
  val qScanCsvQuoted: QueryDef = q("q_scan_csv_quoted")(
    """SELECT CAST(n_nationkey AS BIGINT) AS k,
      |       'x,"y"' || chr(10) || n_name AS tricky,
      |       CASE WHEN n_regionkey = 2 THEN NULL ELSE n_name END AS maybe_null
      |FROM nation ORDER BY k""".stripMargin) { (s, d) =>
    val out = Tables.scratch("scan_csv_quoted")
    Tables.nation(s, d).select(
      col("n_nationkey").cast(LongType).as("k"),
      concat(lit("x,\"y\"\n"), col("n_name")).as("tricky"),
      when(col("n_regionkey") === 2, lit(null).cast("string"))
        .otherwise(col("n_name")).as("maybe_null"))
      .write.mode("overwrite")
      .option("header", true).option("quote", "\"").option("escape", "\"")
      .option("nullValue", "\\N").csv(out)
    s.read
      .option("header", true).option("multiLine", true)
      .option("quote", "\"").option("escape", "\"").option("nullValue", "\\N")
      .schema("k BIGINT, tricky STRING, maybe_null STRING").csv(out)
      .orderBy("k")
  }

  /** S3 — ORC scan (`jobs/vdt1.py:37-38`); S9 ORC sink is the write half. */
  val qScanOrc: QueryDef = q("q_scan_orc")(
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val out = Tables.scratch("scan_orc")
    Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").orc(out)
    s.read.orc(out).orderBy("o_orderkey")
  }

  /** S4 — Parquet scan with projection pushdown (`jobs/vdt2.py:42-43`):
    * `.explain` shows ReadSchema limited to the 4 selected columns. */
  val qScanParquet: QueryDef = q("q_scan_parquet")(
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")
  }

  // -------------------------------------------------------------------------
  // §2.1 Sinks (S7–S9) — overwrite-mode CSV/Parquet/ORC (`jobs/vdt1.py:45-47`,
  // `vdt2.py:63-64`, `vdt3.py:60-61`), verified by read-back.
  // -------------------------------------------------------------------------

  /** S7 — headerless CSV sink (`jobs/vdt1.py:45-47`), read back with an
    * explicit schema (headerless files carry none). */
  val qSinkCsv: QueryDef = q("q_sink_csv")(
    """SELECT o_orderstatus, count(*) AS cnt, min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    val out = Tables.scratch("sink_csv")
    Tables.orders(s, d).groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"), min("o_orderkey").as("min_ok"), max("o_orderkey").as("max_ok"))
      .write.mode("overwrite").option("header", false).csv(out)
    s.read.schema("o_orderstatus STRING, cnt BIGINT, min_ok BIGINT, max_ok BIGINT")
      .csv(out).orderBy("o_orderstatus")
  }

  /** S8 — Parquet sink (`jobs/vdt2.py:63-64`). Sum over a non-cents-exact
    * double is made order-independent by rounding to integers pre-sum; the
    * rounding is `floor(x + 0.5)` rather than `round(x)` because thousands of
    * testdata prices land exactly on .5, where round() is FP-rounding-mode
    * dependent across engines while floor of the identical IEEE add is not. */
  val qSinkParquet: QueryDef = q("q_sink_parquet")(
    """SELECT l_returnflag, l_linestatus, count(*) AS cnt, sum(l_quantity) AS sum_qty,
      |       CAST(sum(CAST(floor(l_extendedprice + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_r
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    val out = Tables.scratch("sink_parquet")
    Tables.lineitem(s, d).groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"),
        sum(floor(col("l_extendedprice") + 0.5).cast(LongType)).as("sum_price_r"))
      .write.mode("overwrite").parquet(out)
    s.read.parquet(out).orderBy("l_returnflag", "l_linestatus")
  }

  /** S9 — ORC sink (`jobs/vdt3.py:60-61`). Mode-independent floor(x+0.5)
    * rounding as in S8. */
  val qSinkOrc: QueryDef = q("q_sink_orc")(
    """SELECT o_orderpriority, count(*) AS cnt,
      |       CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_r
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val out = Tables.scratch("sink_orc")
    Tables.orders(s, d).groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"), sum(floor(col("o_totalprice") + 0.5).cast(LongType)).as("sum_price_r"))
      .write.mode("overwrite").orc(out)
    s.read.orc(out).orderBy("o_orderpriority")
  }

  /** ext — JSON-lines sink + schema-pinned scan (covers JSON as both a sink
    * and a source format). Integer/string columns only: JSON round-trips
    * them exactly, so the oracle stays plain SQL over `orders`. */
  val qSinkJson: QueryDef = q("q_sink_json")(
    """SELECT o_orderstatus, count(*) AS cnt, min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    val out = Tables.scratch("sink_json")
    Tables.orders(s, d).groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"), min("o_orderkey").as("min_ok"), max("o_orderkey").as("max_ok"))
      .write.mode("overwrite").json(out)
    s.read.schema("o_orderstatus STRING, cnt BIGINT, min_ok BIGINT, max_ok BIGINT")
      .json(out).orderBy("o_orderstatus")
  }

  /** ext — plain-text sink + `spark.read.text` scan: one value per line,
    * order irrelevant after the group-count read-back. */
  val qSinkText: QueryDef = q("q_sink_text")(
    """SELECT o_orderpriority AS value, count(*) AS cnt
      |FROM orders GROUP BY o_orderpriority ORDER BY value""".stripMargin) { (s, d) =>
    val out = Tables.scratch("sink_text")
    Tables.orders(s, d).select(col("o_orderpriority")).write.mode("overwrite").text(out)
    s.read.text(out).groupBy("value").agg(count(lit(1)).as("cnt")).orderBy("value")
  }

  // -------------------------------------------------------------------------
  // §2.2 Projections / filters / derivations (P1–P8)
  // -------------------------------------------------------------------------

  /** P1 — column projection narrowing the scan (`jobs/vdt1.py:42`). */
  val qProject: QueryDef = q("q_project")(
    """SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey""") { (s, d) =>
    Tables.customer(s, d).select("c_custkey", "c_name", "c_mktsegment").orderBy("c_custkey")
  }

  /** P2 — rename/alias (`jobs/vdt2.py:53,60`). */
  val qAlias: QueryDef = q("q_alias")(
    """SELECT c_custkey AS id, c_name AS name, c_acctbal AS balance
      |FROM customer ORDER BY id""".stripMargin) { (s, d) =>
    Tables.customer(s, d).select(col("c_custkey").as("id"), col("c_name").as("name"),
      col("c_acctbal").as("balance")).orderBy("id")
  }

  /** P3 — comparison filter; pushes to the parquet scan as PushedFilters
    * (`jobs/vdt2.py:50`). */
  val qFilterCmp: QueryDef = q("q_filter_cmp")(
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |WHERE l_quantity >= 30.0 ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).where(col("l_quantity") >= 30.0)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity")
  }

  /** P5 — derived arithmetic column (`jobs/vdt2.py:49`): one deterministic
    * per-row IEEE expression, bit-identical across engines. */
  val qDeriveArith: QueryDef = q("q_derive_arith")(
    """SELECT l_orderkey, l_linenumber, l_extendedprice * (1 - l_discount) AS revenue
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .withColumn("revenue", col("l_extendedprice") * (lit(1) - col("l_discount")))
      .select("l_orderkey", "l_linenumber", "revenue")
      .orderBy("l_orderkey", "l_linenumber", "revenue")
  }

  /** P6 — row-wise mean over a dynamically selected column set
    * (`jobs/vdt4.py:53-60`): the column list is discovered from the schema at
    * plan-build time (driver-side metaprogram), then folded left-to-right. */
  val qRowwiseMean: QueryDef = q("q_rowwise_mean")(
    """SELECT l_orderkey, l_linenumber,
      |       (((l_quantity + l_extendedprice) + l_discount) + l_tax) / 4 AS row_mean
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, row_mean""".stripMargin) { (s, d) =>
    val df = Tables.lineitem(s, d)
    val cols = df.schema.fields
      .filter(f => f.dataType == DoubleType && f.name.startsWith("l_")).map(f => col(f.name))
    df.withColumn("row_mean", cols.reduce(_ + _) / lit(cols.length))
      .select("l_orderkey", "l_linenumber", "row_mean")
      .orderBy("l_orderkey", "l_linenumber", "row_mean")
  }

  /** P7 — when/otherwise, chained 4-way (`jobs/vdt4.py:50,69-73`). */
  val qCaseWhen: QueryDef = q("q_case_when")(
    """SELECT l_orderkey, l_linenumber,
      |       CASE WHEN l_quantity <= 10 THEN 'low' WHEN l_quantity <= 25 THEN 'mid'
      |            WHEN l_quantity <= 40 THEN 'high' ELSE 'max' END AS qty_band
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, qty_band""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .withColumn("qty_band",
        when(col("l_quantity") <= 10, "low").when(col("l_quantity") <= 25, "mid")
          .when(col("l_quantity") <= 40, "high").otherwise("max"))
      .select("l_orderkey", "l_linenumber", "qty_band")
      .orderBy("l_orderkey", "l_linenumber", "qty_band")
  }

  /** P8 — casts (`jobs/vdt4.py:35-36,63`). long↔string and int↔long/double
    * directions chosen because they are exactly representable both sides. */
  val qCast: QueryDef = q("q_cast")(
    """SELECT CAST(l_orderkey AS VARCHAR) AS ok_str, CAST(l_linenumber AS BIGINT) AS ln_long,
      |       CAST(l_linenumber AS DOUBLE) AS ln_dbl, l_orderkey, l_linenumber
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).select(
      col("l_orderkey").cast(StringType).as("ok_str"),
      col("l_linenumber").cast(LongType).as("ln_long"),
      col("l_linenumber").cast(DoubleType).as("ln_dbl"),
      col("l_orderkey"), col("l_linenumber"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // -------------------------------------------------------------------------
  // §2.3 Joins (J1–J3 + extension types)
  // -------------------------------------------------------------------------

  /** J1 — inner FK equi-join (`jobs/vdt1.py:41`). At sf-test scale Spark
    * auto-broadcasts `customer`; at 100 TB customer is NOT bounded, so we do
    * not force broadcast — AQE picks SMJ/shuffled-hash on the shuffled keys. */
  val qJoinInner: QueryDef = q("q_join_inner")(
    """SELECT c_custkey, c_name, c_mktsegment, o_orderkey, o_totalprice
      |FROM customer JOIN orders ON c_custkey = o_custkey ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d).join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .select("c_custkey", "c_name", "c_mktsegment", "o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** J2 — join on aggregate output (`jobs/vdt2.py:52`): partial aggregation
    * happens map-side before the shuffle, then one shuffle keyed on custkey
    * serves both the agg and the join. */
  val qJoinAfterAgg: QueryDef = q("q_join_after_agg")(
    """WITH t AS (SELECT o_custkey, count(*) AS n_orders,
      |                  CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_r
      |           FROM orders GROUP BY o_custkey)
      |SELECT c_custkey, c_name, n_orders, sum_price_r
      |FROM t JOIN customer ON o_custkey = c_custkey ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val t = Tables.orders(s, d).groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), sum(floor(col("o_totalprice") + 0.5).cast(LongType)).as("sum_price_r"))
    t.join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select("c_custkey", "c_name", "n_orders", "sum_price_r")
      .orderBy("c_custkey")
  }

  /** J3 — join on window output (`jobs/vdt3.py:55`). */
  val qJoinAfterWindow: QueryDef = q("q_join_after_window")(
    """WITH w AS (SELECT o_custkey, o_orderkey, o_totalprice,
      |                  row_number() OVER (PARTITION BY o_custkey
      |                                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |           FROM orders)
      |SELECT c_custkey, c_name, o_orderkey, o_totalprice
      |FROM w JOIN customer ON o_custkey = c_custkey WHERE rn = 1 ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d).withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
      .orderBy("c_custkey")
  }

  /** Extension — left outer join; NULLS FIRST pinned on both sides. */
  val qJoinLeft: QueryDef = q("q_join_left")(
    """SELECT c_custkey, c_name, o_orderkey, o_totalprice
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |ORDER BY c_custkey, o_orderkey ASC NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.customer(s, d).join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
      .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)
  }

  /** Extension — left semi join (EXISTS). */
  val qJoinSemi: QueryDef = q("q_join_semi")(
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name").orderBy("c_custkey")
  }

  /** Extension — left anti join (NOT EXISTS). */
  val qJoinAnti: QueryDef = q("q_join_anti")(
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name").orderBy("c_custkey")
  }

  /** Extension — full outer join (`data/log_app_test.csv:1` names fullOuter). */
  val qJoinFull: QueryDef = q("q_join_full")(
    """SELECT n_nationkey, n_name, s_suppkey, s_name
      |FROM nation FULL JOIN supplier ON n_nationkey = s_nationkey
      |ORDER BY n_nationkey ASC NULLS FIRST, s_suppkey ASC NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.nation(s, d).join(Tables.supplier(s, d), col("n_nationkey") === col("s_nationkey"), "full")
      .select("n_nationkey", "n_name", "s_suppkey", "s_name")
      .orderBy(col("n_nationkey").asc_nulls_first, col("s_suppkey").asc_nulls_first)
  }

  /** Extension — cross join, bounded dims only (region × nation = 125 rows).
    * At scale a cross join is only ever sane against a broadcast-bounded side. */
  val qJoinCross: QueryDef = q("q_join_cross")(
    """SELECT r_regionkey, r_name, n_nationkey, n_name
      |FROM region CROSS JOIN nation ORDER BY r_regionkey, n_nationkey""".stripMargin) { (s, d) =>
    Tables.region(s, d).crossJoin(Tables.nation(s, d))
      .select("r_regionkey", "r_name", "n_nationkey", "n_name")
      .orderBy("r_regionkey", "n_nationkey")
  }

  // -------------------------------------------------------------------------
  // §2.4 Aggregations (A1–A2 + extensions)
  // -------------------------------------------------------------------------

  /** A1 — hash aggregate groupBy+sum (`jobs/vdt2.py:48`). `l_quantity` is
    * integral-valued, so the double sum is exact and order-independent. */
  val qAggSum: QueryDef = q("q_agg_sum")(
    """SELECT l_returnflag, sum(l_quantity) AS sum_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(sum("l_quantity").as("sum_qty")).orderBy("l_returnflag")
  }

  /** Extension — multi-aggregate in one pass (count/sum/min/max). */
  val qAggMulti: QueryDef = q("q_agg_multi")(
    """SELECT l_returnflag, l_linestatus, count(*) AS cnt, sum(l_quantity) AS sum_qty,
      |       min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"),
        min("l_extendedprice").as("min_price"), max("l_extendedprice").as("max_price"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** A2/W4 — count over an unordered window frame (`jobs/vdt3.py:47-48`):
    * group size attached to every row, no collapse. */
  val qCountOver: QueryDef = q("q_count_over")(
    """SELECT l_orderkey, l_linenumber, l_returnflag,
      |       count(*) OVER (PARTITION BY l_returnflag, l_linestatus) AS grp_cnt
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_returnflag, grp_cnt""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .withColumn("grp_cnt", count(lit(1)).over(Window.partitionBy("l_returnflag", "l_linestatus")))
      .select("l_orderkey", "l_linenumber", "l_returnflag", "grp_cnt")
      .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "grp_cnt")
  }

  /** Extension — count distinct (named in `data/log_app_test.csv:1`). */
  val qCountDistinct: QueryDef = q("q_count_distinct")(
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_parts
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("nd_parts")).orderBy("l_returnflag")
  }

  /** Extension — ROLLUP with GROUPING() disambiguation of the null rows. */
  val qRollup: QueryDef = q("q_rollup")(
    """SELECT l_returnflag, l_linestatus,
      |       CAST(GROUPING(l_returnflag) AS INTEGER) AS g1,
      |       CAST(GROUPING(l_linestatus) AS INTEGER) AS g2,
      |       count(*) AS cnt, sum(l_quantity) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY g1, g2, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).rollup("l_returnflag", "l_linestatus")
      .agg(grouping("l_returnflag").cast(IntegerType).as("g1"),
        grouping("l_linestatus").cast(IntegerType).as("g2"),
        count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"))
      .select("l_returnflag", "l_linestatus", "g1", "g2", "cnt", "sum_qty")
      .orderBy(col("g1"), col("g2"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  // -------------------------------------------------------------------------
  // §2.5 Window functions (W1–W3 + extensions)
  // -------------------------------------------------------------------------

  /** W1 — argmax pattern: row_number over (partition, order desc) then rn<=k
    * (`jobs/vdt2.py:55-57`, generalized to top-3). Tie-broken on the unique
    * key so both engines agree. */
  val qTopkPerGroup: QueryDef = q("q_topk_per_group")(
    """WITH w AS (SELECT o_custkey, o_orderkey, o_totalprice,
      |                  row_number() OVER (PARTITION BY o_custkey
      |                                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |           FROM orders)
      |SELECT o_custkey, o_orderkey, o_totalprice, rn FROM w WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w).cast(LongType)) // int64: DuckDB row_number is BIGINT
      .where(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** W2 — mode-per-group via count + row_number by count desc
    * (`jobs/vdt3.py:50-52`), value-asc tie-break. */
  val qModePerGroup: QueryDef = q("q_mode_per_group")(
    """WITH c AS (SELECT l_suppkey, l_returnflag, count(*) AS cnt
      |           FROM lineitem GROUP BY l_suppkey, l_returnflag),
      |     r AS (SELECT *, row_number() OVER (PARTITION BY l_suppkey
      |                                        ORDER BY cnt DESC, l_returnflag) AS rn FROM c)
      |SELECT l_suppkey, l_returnflag AS mode_flag, cnt FROM r WHERE rn = 1
      |ORDER BY l_suppkey""".stripMargin) { (s, d) =>
    val counts = Tables.lineitem(s, d).groupBy("l_suppkey", "l_returnflag").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("l_suppkey").orderBy(col("cnt").desc, col("l_returnflag").asc)
    counts.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("l_suppkey"), col("l_returnflag").as("mode_flag"), col("cnt"))
      .orderBy("l_suppkey")
  }

  /** W3 — rank over a global order (`jobs/vdt4.py:48-49`). Single-partition
    * hazard: an unpartitioned window sends all rows to one task. Correct at
    * any scale but not parallel — kept for reference parity; the scale-safe
    * alternative for unique ids is zipWithIndex-style assignment. */
  val qRankGlobal: QueryDef = q("q_rank_global")(
    """SELECT o_orderkey, CAST(rank() OVER (ORDER BY o_totalprice DESC) AS BIGINT) AS rnk
      |FROM orders ORDER BY rnk, o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .withColumn("rnk", rank().over(Window.orderBy(col("o_totalprice").desc)).cast(LongType))
      .select("o_orderkey", "rnk").orderBy("rnk", "o_orderkey")
  }

  /** Extension — lag/lead over a partitioned, uniquely ordered window. */
  val qLagLead: QueryDef = q("q_lag_lead")(
    """SELECT o_custkey, o_orderkey,
      |       lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_ok,
      |       lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next_ok
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    Tables.orders(s, d)
      .withColumn("prev_ok", lag("o_orderkey", 1).over(w))
      .withColumn("next_ok", lead("o_orderkey", 1).over(w))
      .select("o_custkey", "o_orderkey", "prev_ok", "next_ok")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Extension — dense_rank + ntile on a partitioned window. */
  val qDenseNtile: QueryDef = q("q_dense_ntile")(
    """SELECT o_orderstatus, o_orderkey,
      |       CAST(dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS BIGINT) AS dr,
      |       CAST(ntile(4) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS INTEGER) AS quartile
      |FROM orders ORDER BY o_orderstatus, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_orderstatus").orderBy("o_orderkey")
    Tables.orders(s, d)
      .withColumn("dr", dense_rank().over(w).cast(LongType))
      .withColumn("quartile", ntile(4).over(w).cast(IntegerType))
      .select("o_orderstatus", "o_orderkey", "dr", "quartile")
      .orderBy("o_orderstatus", "o_orderkey")
  }

  // -------------------------------------------------------------------------
  // §2.6 Sorts / limits (O1–O3 + top-k)
  // -------------------------------------------------------------------------

  /** O1 — global sort asc (`jobs/vdt2.py:50,53`): range-partitioned sort,
    * unique tie-breaker appended for cross-engine determinism. */
  val qSortAsc: QueryDef = q("q_sort_asc")(
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice, l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").asc, col("l_orderkey").asc, col("l_linenumber").asc)
  }

  /** O2 — global sort desc (`jobs/vdt2.py:58`). */
  val qSortDesc: QueryDef = q("q_sort_desc")(
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
  }

  /** O3 — multi-key mixed-direction sort (`jobs/vdt3.py:56`). */
  val qSortMultikey: QueryDef = q("q_sort_multikey")(
    """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
      |ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d).select("o_orderkey", "o_orderpriority", "o_totalprice")
      .orderBy(col("o_orderpriority").asc, col("o_totalprice").desc, col("o_orderkey").asc)
  }

  /** Extension — global top-k (ORDER BY + LIMIT): Spark plans
    * TakeOrderedAndProject — per-partition heaps then a k-merge, no global sort. */
  val qTopk: QueryDef = q("q_topk")(
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
    Tables.orders(s, d).select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc).limit(100)
  }

  /** Extension — BARE `df.limit(n)` (GlobalLimit/LocalLimit, no sort feeding
    * it — unlike q_topk's TakeOrderedAndProject). A bare limit over more
    * rows than it keeps is nondeterministic, so the query limits a table it
    * cannot truncate (region has 5 rows, n=10): the limit semantics — pass
    * through at most n — are exercised, the result stays deterministic, and
    * the trailing sort is presentation-only. */
  val qLimit: QueryDef = q("q_limit")(
    """SELECT r_regionkey, r_name FROM (SELECT r_regionkey, r_name FROM region LIMIT 10) t
      |ORDER BY r_regionkey""".stripMargin) { (s, d) =>
    Tables.region(s, d).select("r_regionkey", "r_name").limit(10).orderBy("r_regionkey")
  }

  // -------------------------------------------------------------------------
  // §2.7 Set operations (extension surface)
  // -------------------------------------------------------------------------

  val qUnion: QueryDef = q("q_union")(
    """SELECT c_custkey, c_name FROM customer WHERE c_nationkey < 5
      |UNION ALL
      |SELECT c_custkey, c_name FROM customer WHERE c_nationkey >= 20
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    c.where(col("c_nationkey") < 5).select("c_custkey", "c_name")
      .union(c.where(col("c_nationkey") >= 20).select("c_custkey", "c_name"))
      .orderBy("c_custkey")
  }

  val qIntersect: QueryDef = q("q_intersect")(
    """SELECT l_partkey AS pk FROM lineitem INTERSECT SELECT p_partkey FROM part
      |ORDER BY pk""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).select(col("l_partkey").as("pk"))
      .intersect(Tables.part(s, d).select(col("p_partkey").as("pk")))
      .orderBy("pk")
  }

  val qExcept: QueryDef = q("q_except")(
    """SELECT p_partkey AS pk FROM part EXCEPT SELECT l_partkey FROM lineitem
      |ORDER BY pk""".stripMargin) { (s, d) =>
    Tables.part(s, d).select(col("p_partkey").as("pk"))
      .except(Tables.lineitem(s, d).select(col("l_partkey").as("pk")))
      .orderBy("pk")
  }

  // -------------------------------------------------------------------------
  // §2.8 Scalar function surface (extension queries)
  // -------------------------------------------------------------------------

  val qStringFuncs: QueryDef = q("q_string_funcs")(
    """SELECT c_custkey, upper(c_name) AS up, lower(c_mktsegment) AS lo,
      |       substr(c_name, 1, 5) AS sub5, concat(c_name, '|', c_mktsegment) AS cat,
      |       CAST(length(c_name) AS BIGINT) AS len
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d).select(col("c_custkey"),
      upper(col("c_name")).as("up"), lower(col("c_mktsegment")).as("lo"),
      substring(col("c_name"), 1, 5).as("sub5"),
      concat(col("c_name"), lit("|"), col("c_mktsegment")).as("cat"),
      length(col("c_name")).cast(LongType).as("len"))
      .orderBy("c_custkey")
  }

  /** Date handling on the yyyyMMdd-int theme of the reference
    * (`jobs/vdt1.py:6`): extract parts + format timestamps to yyyyMMdd ints. */
  val qDateFuncs: QueryDef = q("q_date_funcs")(
    """SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS y,
      |       CAST(month(o_orderdate) AS INTEGER) AS m,
      |       CAST(strftime(o_orderdate, '%Y%m%d') AS INTEGER) AS yyyymmdd
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d).select(col("o_orderkey"),
      year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"),
      date_format(col("o_orderdate"), "yyyyMMdd").cast(IntegerType).as("yyyymmdd"))
      .orderBy("o_orderkey")
  }

  val qMathFuncs: QueryDef = q("q_math_funcs")(
    """SELECT l_orderkey, l_linenumber, abs(l_discount - 0.05) AS adev,
      |       CAST(floor(l_extendedprice) AS BIGINT) AS fl,
      |       CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
      |       sqrt(l_quantity) AS sq, greatest(l_tax, l_discount) AS gr
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, adev, fl, ce, sq, gr""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
      abs(col("l_discount") - 0.05).as("adev"),
      floor(col("l_extendedprice")).as("fl"), ceil(col("l_extendedprice")).as("ce"),
      sqrt(col("l_quantity")).as("sq"), greatest(col("l_tax"), col("l_discount")).as("gr"))
      .orderBy("l_orderkey", "l_linenumber", "adev", "fl", "ce", "sq", "gr")
  }

  /** All atomic relational queries in registration order. */
  val defs: Seq[QueryDef] = Seq(
    qScanCsv, qScanCsvRaw, qScanCsvQuoted, qScanOrc, qScanParquet,
    qSinkCsv, qSinkParquet, qSinkOrc, qSinkJson, qSinkText,
    qProject, qAlias, qFilterCmp, qDeriveArith, qRowwiseMean, qCaseWhen, qCast,
    qJoinInner, qJoinAfterAgg, qJoinAfterWindow, qJoinLeft, qJoinSemi, qJoinAnti,
    qJoinFull, qJoinCross,
    qAggSum, qAggMulti, qCountOver, qCountDistinct, qRollup,
    qTopkPerGroup, qModePerGroup, qRankGlobal, qLagLead, qDenseNtile,
    qSortAsc, qSortDesc, qSortMultikey, qTopk, qLimit,
    qUnion, qIntersect, qExcept,
    qStringFuncs, qDateFuncs, qMathFuncs)
}
