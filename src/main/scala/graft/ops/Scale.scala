package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}
import graft.QueryDef.{sql => q}

/** Scale-technique operators: the shuffle-shaping patterns a 100 TB deployment
  * leans on, each exercised as an oracle-checked query so the technique's
  * CORRECTNESS is pinned, and plan-asserted in ScaleSpec so the technique's
  * MECHANISM (no exchange / pruned partitions / two-stage agg) is pinned too.
  */
object Scale {

  /** Skew-safe two-stage aggregation: salt the hot key-space, partial-agg on
    * (key, salt), then final-agg on key. The first shuffle spreads a hot key
    * over `saltBuckets` reducers; the second is tiny (one row per key×salt).
    * Results are identical to the direct groupBy — the oracle proves it. */
  def saltedSum(df: DataFrame, key: String, valueCol: String, saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(crc32(col(key).cast(StringType)) +
      col(valueCol).cast(LongType), lit(saltBuckets)))
    salted.groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__partial"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum("__partial").as("sum_val"), sum("__pcnt").as("cnt"))
  }

  /** Salted aggregation equals the plain aggregation (l_quantity sums are
    * exact integral doubles, so the two-stage re-association is lossless). */
  val qAggSalted: QueryDef = q("q_agg_salted")(
    """SELECT l_returnflag, sum(l_quantity) AS sum_val, count(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    saltedSum(Tables.lineitem(s, d), "l_returnflag", "l_quantity", saltBuckets = 16)
      .orderBy("l_returnflag")
  }

  /** Bucketed co-located join: both sides written bucketed+sorted on the join
    * key → the sort-merge join needs NO exchange (asserted in ScaleSpec).
    * This is the bucketing story for repeated large-table joins at scale:
    * pay the shuffle once at write time, never again at read time. */
  val qJoinBucketed: QueryDef = q("q_join_bucketed")(
    """WITH t AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey)
      |SELECT c.c_custkey, c.c_name, t.n_orders
      |FROM t JOIN customer c ON t.o_custkey = c.c_custkey
      |ORDER BY c.c_custkey""".stripMargin) { (s, d) =>
    bucketedJoin(s, d)
  }

  def bucketedJoin(s: SparkSession, d: String): DataFrame = {
    s.sql("DROP TABLE IF EXISTS graft_b_orders")
    s.sql("DROP TABLE IF EXISTS graft_b_customer")
    // the in-memory catalog forgets tables across JVMs but their warehouse
    // dirs survive — remove them or CREATE TABLE fails LOCATION_ALREADY_EXISTS
    val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("graft_b_orders", "graft_b_customer").foreach(t =>
      graft.Tables.deleteRecursively(java.nio.file.Paths.get(wh, t)))
    Tables.orders(s, d).groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("graft_b_orders")
    Tables.customer(s, d).select("c_custkey", "c_name")
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("graft_b_customer")
    // the merge hint pins the SMJ path (what a big-table join gets at scale);
    // bucketing then removes both exchanges AND both sorts from the join
    s.table("graft_b_orders").hint("merge")
      .join(s.table("graft_b_customer"), col("o_custkey") === col("c_custkey"))
      .select("c_custkey", "c_name", "n_orders")
      .orderBy("c_custkey")
  }

  /** Partitioned layout + partition pruning: write orders hive-partitioned by
    * status, read back with a partition predicate — the scan lists ONE
    * partition directory (PartitionFilters in the plan, asserted in
    * ScaleSpec). The at-scale contract for time/tenant-partitioned lakes. */
  val qPartitionedScan: QueryDef = q("q_partitioned_scan")(
    """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
      |WHERE o_orderstatus = 'F' ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    partitionedScan(s, d)
  }

  def partitionedScan(s: SparkSession, d: String): DataFrame = {
    val out = Tables.scratch("part_orders")
    Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderstatus")
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    s.read.parquet(out).where(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_custkey", "o_orderstatus")
      .orderBy("o_orderkey")
  }

  /** Pre-shuffle co-partitioning reuse: repartition once on the key, then run
    * BOTH an aggregation and a self-join downstream without further
    * exchanges of that side. Oracle checks the combined result. */
  val qRepartitionReuse: QueryDef = q("q_repartition_reuse")(
    """WITH r AS (SELECT o_custkey, o_totalprice FROM orders),
      |     a AS (SELECT o_custkey, count(*) AS n FROM r GROUP BY o_custkey),
      |     m AS (SELECT o_custkey, max(o_totalprice) AS mx FROM r GROUP BY o_custkey)
      |SELECT a.o_custkey, a.n, m.mx FROM a JOIN m ON a.o_custkey = m.o_custkey
      |ORDER BY a.o_custkey""".stripMargin) { (s, d) =>
    val r = Tables.orders(s, d).select("o_custkey", "o_totalprice")
      .repartition(col("o_custkey"))
    val a = r.groupBy("o_custkey").agg(count(lit(1)).as("n"))
    val m = r.groupBy("o_custkey").agg(max("o_totalprice").as("mx"))
    a.join(m, Seq("o_custkey")).select(col("o_custkey"), col("n"), col("mx"))
      .orderBy("o_custkey")
  }

  /** 16-bit Z-order (Morton) interleave of two numeric columns, each rank-
    * normalized to [0, 65535] with cut points from a driver-side action.
    * Layout-sorting by the Z-value clusters BOTH dimensions, so per-file
    * min/max stats can skip files for predicates on EITHER column — the
    * standard multi-dimensional clustering recipe (Delta/Iceberg OPTIMIZE
    * ZORDER). Pure bit arithmetic on codegen'd built-ins. */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
             aMin: Double, aMax: Double, bMin: Double, bMax: Double): org.apache.spark.sql.Column = {
    def norm(c: org.apache.spark.sql.Column, lo: Double, hi: Double) =
      least(lit(65535), greatest(lit(0),
        ((c.cast(DoubleType) - lo) / (if (hi > lo) hi - lo else 1.0) * 65535).cast(IntegerType)))
    val an = norm(a, aMin, aMax)
    val bn = norm(b, bMin, bMax)
    (0 until 16).map { i =>
      (shiftleft(shiftright(an, i).bitwiseAND(1), 2 * i + 1) +
        shiftleft(shiftright(bn, i).bitwiseAND(1), 2 * i)).cast(LongType)
    }.reduce(_ + _)
  }

  val defs: Seq[QueryDef] = Seq(qAggSalted, qJoinBucketed, qPartitionedScan,
    qRepartitionReuse)
}
