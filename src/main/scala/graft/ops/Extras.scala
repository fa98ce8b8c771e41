package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}
import graft.QueryDef.{sql => q}

/** Surface-completeness extras beyond the reference's own operator set:
  * JSON extraction, DISTINCT, CUBE, unionByName, and the typed Dataset[T]
  * API (SURVEY.md §2.8 extension surface + §1 "Dataset[T] where type safety
  * helps"). All oracle-checked.
  */
object Extras {

  /** JSON field extraction from the events.props payload column. */
  val qJsonFuncs: QueryDef = q("q_json_funcs")(
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d).select(col("event_id"),
      get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .orderBy("event_id")
  }

  /** DISTINCT projection (dedup-at-the-operator level). */
  val qDistinct: QueryDef = q("q_distinct")(
    """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d).select("o_orderstatus", "o_orderpriority").distinct()
      .orderBy("o_orderstatus", "o_orderpriority")
  }

  /** CUBE over two dimensions with GROUPING() disambiguation. */
  val qCube: QueryDef = q("q_cube")(
    """SELECT l_returnflag, l_linestatus,
      |       CAST(GROUPING(l_returnflag) AS INTEGER) AS g1,
      |       CAST(GROUPING(l_linestatus) AS INTEGER) AS g2,
      |       count(*) AS cnt, sum(l_quantity) AS sum_qty
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY g1, g2, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).cube("l_returnflag", "l_linestatus")
      .agg(grouping("l_returnflag").cast(IntegerType).as("g1"),
        grouping("l_linestatus").cast(IntegerType).as("g2"),
        count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"))
      .select("l_returnflag", "l_linestatus", "g1", "g2", "cnt", "sum_qty")
      .orderBy(col("g1"), col("g2"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  /** unionByName: schemas align by NAME, not position — the positional
    * variant would silently mis-zip these two selects. */
  val qUnionByName: QueryDef = q("q_union_by_name")(
    """SELECT c_custkey, c_name FROM customer WHERE c_nationkey < 3
      |UNION ALL
      |SELECT c_custkey, c_name FROM customer WHERE c_nationkey > 21
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    c.where(col("c_nationkey") < 3).select("c_custkey", "c_name")
      .unionByName(c.where(col("c_nationkey") > 21).select("c_name", "c_custkey"))
      .orderBy("c_custkey")
  }

  final case class Supplier(s_suppkey: Long, s_name: String, s_nationkey: Int,
                            s_acctbal: Double)

  /** Typed Dataset[T] API: case-class encoder, typed filter + map. The lambda
    * path costs deserialization vs the codegen'd Column path — used where
    * type safety matters, not in hot aggregates (doc'd trade-off). */
  val qTypedApi: QueryDef = q("q_typed_api")(
    """SELECT s_suppkey, s_name, s_acctbal * 2 AS dbl_bal FROM supplier
      |WHERE s_acctbal > 0 ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.supplier(s, d).as[Supplier]
      .filter(_.s_acctbal > 0)
      .map(x => (x.s_suppkey, x.s_name, x.s_acctbal * 2))
      .toDF("s_suppkey", "s_name", "dbl_bal")
      .orderBy("s_suppkey")
  }

  /** Pivot: groupBy().pivot() with an explicit value list (the at-scale form —
    * implicit pivot runs an extra distinct job to discover values). */
  val qPivot: QueryDef = q("q_pivot")(
    """SELECT l_returnflag,
      |       sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS F,
      |       sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS O
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O")).agg(sum("l_quantity"))
      .orderBy("l_returnflag")
  }

  /** posexplode of a split array — row expansion with ordinal position. */
  val qExplode: QueryDef = q("q_explode")(
    """WITH e AS (SELECT doc_id,
      |                   unnest(list_transform(string_split(text, ' '),
      |                          (w, i) -> {'p': i - 1, 'word': w}), recursive := true)
      |           FROM documents WHERE doc_id < 5)
      |SELECT doc_id, CAST(p AS INTEGER) AS pos, word FROM e ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
    Tables.documents(s, d).where(col("doc_id") < 5)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .orderBy("doc_id", "pos")
  }

  /** collect_set made deterministic: sort the set, join to a string (arrays
    * hash differently across engines; a canonical string does not). */
  val qCollectSet: QueryDef = q("q_collect_set")(
    """SELECT l_suppkey,
      |       array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags
      |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).groupBy("l_suppkey")
      .agg(concat_ws(",", sort_array(collect_set(col("l_returnflag")))).as("flags"))
      .orderBy("l_suppkey")
  }

  /** Null-handling semantics: nullif / coalesce / null-safe equality.
    * Spark's `<=>` is DuckDB's `IS NOT DISTINCT FROM`; both treat
    * null<=>null as TRUE and null<=>value as FALSE — the exact three-valued
    * logic corner this query pins across engines. */
  val qNullSafe: QueryDef = q("q_null_safe")(
    """SELECT o_orderkey,
      |       coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
      |       (nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM
      |        nullif(o_orderpriority, '1-URGENT')) AS ns_eq,
      |       CAST(CASE WHEN nullif(o_orderstatus, 'O') IS NULL
      |                 THEN 1 ELSE 0 END AS INTEGER) AS is_open
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val status = nullif(col("o_orderstatus"), lit("O"))
    val prio = nullif(col("o_orderpriority"), lit("1-URGENT"))
    Tables.orders(s, d).select(col("o_orderkey"),
        coalesce(status, lit("open")).as("status_or_open"),
        status.eqNullSafe(prio).as("ns_eq"),
        when(status.isNull, 1).otherwise(0).cast(IntegerType).as("is_open"))
      .orderBy("o_orderkey")
  }

  /** The ONE SQL text runs on both engines verbatim — the `spark.sql` entry
    * point over temp views, exercising a correlated scalar subquery and a
    * correlated EXISTS (both decorrelate to joins under Catalyst, so the
    * plan is two keyed joins, not a per-row subquery loop). */
  private val custOrdersSql =
    """SELECT c_custkey, c_name,
      |       (SELECT count(*) FROM orders o
      |        WHERE o.o_custkey = c.c_custkey) AS n_orders
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
      |ORDER BY c_custkey""".stripMargin

  val qSqlText: QueryDef = q("q_sql_text")(custOrdersSql) { (s, d) =>
    // The views exist only while spark.sql analyzes the text (Dataset
    // creation resolves them eagerly), then are dropped — registering them
    // for the query's lifetime would leak scale-factor-specific state into
    // the shared session catalog and poison any other name-based spark.sql.
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    try s.sql(custOrdersSql)
    finally { s.catalog.dropTempView("customer"); s.catalog.dropTempView("orders") }
  }

  val defs: Seq[QueryDef] = Seq(qJsonFuncs, qDistinct, qCube, qUnionByName, qTypedApi,
    qPivot, qExplode, qCollectSet, qNullSafe, qSqlText)
}
