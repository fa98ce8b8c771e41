package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}
import graft.QueryDef.{sql => q}

/** Analytic-surface extensions: GROUPING SETS, value-picking window
  * functions, relative-rank windows, conditional aggregation, regular
  * expressions, and array/higher-order functions (SURVEY.md §2.4/§2.5/§2.8
  * extension surface). All oracle-checked.
  *
  * Scale notes: every query here is either one keyed shuffle (the
  * aggregations), one window shuffle on a real partition key (the windows),
  * or a pure row-local projection (regexp/array ops) — no driver-side loops,
  * no single-partition windows, nothing that degrades at 1000 executors.
  */
object Analytic {

  /** GROUPING SETS — the general form behind rollup/cube (which are already
    * covered): two independent grouping columns aggregated in ONE pass over
    * the data (Spark plans a single Expand + hash aggregate, not two scans).
    */
  val qGroupingSets: QueryDef = q("q_grouping_sets")(
    """SELECT l_returnflag, l_linestatus,
      |       CAST(GROUPING(l_returnflag) AS INTEGER) AS g1,
      |       CAST(GROUPING(l_linestatus) AS INTEGER) AS g2,
      |       count(*) AS cnt, sum(l_quantity) AS sum_qty
      |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
      |ORDER BY g1, g2, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupingSets(Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping("l_returnflag").cast(IntegerType).as("g1"),
        grouping("l_linestatus").cast(IntegerType).as("g2"),
        count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"))
      .select("l_returnflag", "l_linestatus", "g1", "g2", "cnt", "sum_qty")
      .orderBy(col("g1"), col("g2"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  /** first_value / last_value / nth_value over an explicit full-partition
    * frame. The frame matters: with the default RANGE frame last_value
    * would see only rows up to CURRENT ROW — a classic silent-wrongness
    * trap both engines share, avoided identically on both sides. */
  val qFirstLast: QueryDef = q("q_first_last")(
    """SELECT o_orderkey, o_custkey,
      |       first_value(o_orderkey) OVER w AS first_ok,
      |       last_value(o_orderkey) OVER w AS last_ok,
      |       nth_value(o_orderkey, 2) OVER w AS second_ok
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        first(col("o_orderkey")).over(w).as("first_ok"),
        last(col("o_orderkey")).over(w).as("last_ok"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
      .orderBy("o_orderkey")
  }

  /** percent_rank + cume_dist: relative ranks inside each status partition.
    * Both engines compute (rank-1)/(n-1) and (#peers ≤ row)/n from the same
    * integers, so the doubles are bit-identical — no rounding slack needed.
    * Ordering by the unique o_orderkey keeps ranks deterministic. */
  val qPercentRank: QueryDef = q("q_percent_rank")(
    """SELECT o_orderkey, o_orderstatus,
      |       percent_rank() OVER w AS pr,
      |       cume_dist() OVER w AS cd
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_orderstatus").orderBy("o_orderkey")
    Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
        percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
      .orderBy("o_orderkey")
  }

  /** Conditional aggregation: count_if + filtered sums in one grouped pass
    * (no self-joins, no second scan). Integer sums are cast outside the
    * aggregate on the oracle side — DuckDB's sum(BIGINT) is HUGEINT. */
  val qCountIf: QueryDef = q("q_count_if")(
    """SELECT o_orderpriority,
      |       count(*) AS cnt,
      |       count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
      |       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d).groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        count_if(col("o_totalprice") > 150000).as("n_big"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"))
      .orderBy("o_orderpriority")
  }

  /** Regular expressions over document text: first match extraction, global
    * replacement (DuckDB needs the explicit 'g' flag for replace-ALL —
    * Spark's regexp_replace is global by default), and match counting.
    * Patterns stick to character classes both regex dialects (Java util vs
    * RE2) treat identically. */
  val qRegexp: QueryDef = q("q_regexp")(
    """SELECT doc_id,
      |       regexp_extract(text, '[aeiou]{2,}') AS first_vowel_run,
      |       length(regexp_replace(lower(text), '[aeiou]', '', 'g')) AS len_novowel,
      |       CAST(len(regexp_extract_all(text, '[A-Z][a-z]+')) AS BIGINT) AS n_capwords
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(col("doc_id"),
        regexp_extract(col("text"), "[aeiou]{2,}", 0).as("first_vowel_run"),
        // int64 casts: DuckDB length()/len() return BIGINT, Spark's are int32
        length(regexp_replace(lower(col("text")), "[aeiou]", "")).cast("long").as("len_novowel"),
        regexp_count(col("text"), lit("[A-Z][a-z]+")).cast("long").as("n_capwords"))
      .orderBy("doc_id")
  }

  /** Array ops over the tokenized text: size, distinct-size, lexicographic
    * min/max — all row-local (no shuffle, whole-stage codegen'd), with
    * DuckDB's list functions replaying the same values. */
  val qArrayOps: QueryDef = q("q_array_ops")(
    """WITH t AS (SELECT doc_id, list_filter(string_split(lower(text), ' '),
      |                                      x -> x <> '') AS toks FROM documents)
      |SELECT doc_id,
      |       CAST(len(toks) AS INTEGER) AS n_tokens,
      |       CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
      |       list_min(toks) AS tok_min,
      |       list_max(toks) AS tok_max
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        filter(split(lower(col("text")), " "), x => x =!= "").as("toks"))
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct"),
        array_min(col("toks")).as("tok_min"),
        array_max(col("toks")).as("tok_max"))
      .orderBy("doc_id")
  }

  /** Date/interval arithmetic: add days/months, month-end snapping, day
    * deltas. Dates are emitted as formatted STRINGS — a raw DATE column
    * round-trips through parquet/pandas with engine-specific dtypes, while
    * the formatted text hashes identically everywhere. */
  val qDateArith: QueryDef = q("q_date_arith")(
    """SELECT o_orderkey,
      |       strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
      |       strftime(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus2mo,
      |       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom,
      |       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since95
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val dt = to_date(col("o_orderdate"))
    Tables.orders(s, d).select(col("o_orderkey"),
        date_format(date_add(dt, 30), "yyyy-MM-dd").as("plus30"),
        date_format(add_months(dt, 2), "yyyy-MM-dd").as("plus2mo"),
        date_format(last_day(dt), "yyyy-MM-dd").as("eom"),
        datediff(dt, lit("1995-01-01")).cast(LongType).as("days_since95"))
      .orderBy("o_orderkey")
  }

  /** String padding / search / rewrite surface: lpad, rpad, trim, replace,
    * translate, repeat, and 1-based substring search (Spark instr = DuckDB
    * strpos). Row-local, codegen'd, zero shuffle. */
  val qStringPad: QueryDef = q("q_string_pad")(
    """SELECT c_custkey,
      |       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
      |       rpad(trim(c_mktsegment), 12, '.') AS seg_cell,
      |       replace(c_name, 'Customer', 'Cust') AS short_name,
      |       translate(c_mktsegment, 'AEIOU', 'aeiou') AS lowered_vowels,
      |       repeat('-', CAST(c_custkey % 4 AS INTEGER)) AS dashes,
      |       CAST(strpos(c_name, '0') AS BIGINT) AS first_zero_at
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d).select(col("c_custkey"),
        lpad(col("c_custkey").cast(StringType), 10, "0").as("padded_key"),
        rpad(trim(col("c_mktsegment")), 12, ".").as("seg_cell"),
        regexp_replace(col("c_name"), "Customer", "Cust").as("short_name"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("lowered_vowels"),
        expr("repeat('-', CAST(c_custkey % 4 AS INT))").as("dashes"),
        instr(col("c_name"), "0").cast(LongType).as("first_zero_at"))
      .orderBy("c_custkey")
  }

  /** UNION with set semantics (distinct-after-union) — the dedup complement
    * of the existing UNION ALL query; Spark's union + distinct matches SQL
    * UNION exactly. */
  val qUnionDistinct: QueryDef = q("q_union_distinct")(
    """SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_custkey < 50
      |UNION
      |SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_custkey > 100
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    o.where(col("o_custkey") < 50).select("o_orderstatus", "o_orderpriority")
      .union(o.where(col("o_custkey") > 100).select("o_orderstatus", "o_orderpriority"))
      .distinct()
      .orderBy("o_orderstatus", "o_orderpriority")
  }

  /** Fixed-width histogram: integer band index from pure arithmetic (no
    * data-dependent cut points, unlike the quantile bucketing), one hash
    * aggregation. Bands are half-open [lo, lo+width). */
  val qHistogram: QueryDef = q("q_histogram")(
    """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS band,
      |       count(*) AS cnt
      |FROM orders GROUP BY 1 ORDER BY band""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(floor(col("o_totalprice") / 50000).cast(LongType).as("band"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("band")
  }

  /** Null-safe equi-join: `<=>` (DuckDB IS NOT DISTINCT FROM) as a JOIN
    * condition — null keys MATCH null keys, unlike plain `=` which drops
    * them. Null keys are derived deterministically with nullif so the
    * semantics difference is actually exercised. */
  val qJoinNullSafe: QueryDef = q("q_join_null_safe")(
    """WITH l AS (SELECT n_nationkey, nullif(n_regionkey, 0) AS rk FROM nation),
      |     r AS (SELECT r_regionkey, r_name, nullif(r_regionkey, 0) AS rk FROM region)
      |SELECT l.n_nationkey, r.r_name
      |FROM l JOIN r ON l.rk IS NOT DISTINCT FROM r.rk
      |ORDER BY n_nationkey, r_name""".stripMargin) { (s, d) =>
    val l = Tables.nation(s, d)
      .select(col("n_nationkey"), nullif(col("n_regionkey"), lit(0)).as("rk")).as("l")
    val r = Tables.region(s, d)
      .select(col("r_name"), nullif(col("r_regionkey"), lit(0)).as("rk")).as("r")
    l.join(r, col("l.rk") <=> col("r.rk"))
      .select(col("n_nationkey"), col("r_name"))
      .orderBy("n_nationkey", "r_name")
  }

  /** min_by / max_by (DuckDB arg_min / arg_max): the value of one column at
    * another column's extreme — deterministic here because the ordering
    * column (o_orderkey) is unique within every group. */
  val qMinMaxBy: QueryDef = q("q_min_max_by")(
    """SELECT o_custkey,
      |       arg_min(o_orderstatus, o_orderkey) AS first_status,
      |       arg_max(o_orderstatus, o_orderkey) AS last_status,
      |       min(o_orderkey) AS first_ok, max(o_orderkey) AS last_ok
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d).groupBy("o_custkey")
      .agg(min_by(col("o_orderstatus"), col("o_orderkey")).as("first_status"),
        max_by(col("o_orderstatus"), col("o_orderkey")).as("last_status"),
        min("o_orderkey").as("first_ok"), max("o_orderkey").as("last_ok"))
      .orderBy("o_custkey")
  }

  val defs: Seq[QueryDef] = Seq(qGroupingSets, qFirstLast, qPercentRank,
    qCountIf, qRegexp, qArrayOps, qDateArith, qStringPad,
    qUnionDistinct, qHistogram, qJoinNullSafe, qMinMaxBy)
}
