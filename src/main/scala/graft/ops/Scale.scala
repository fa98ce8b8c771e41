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

  /** N-ary Z-order (Morton) interleave: each numeric column is range-
    * normalized to `bits = min(16, 63/n)` bits (so the interleave always
    * fits a positive Long — 1..3 dims keep the full 16-bit resolution,
    * 4 dims get 15, 5 get 12, …), then bit i of dimension j lands at position
    * `n*i + (n-1-j)` (earlier columns take the higher bit — the
    * conventional Morton layout). Layout-sorting by the Z-value clusters
    * ALL dimensions, so per-file min/max stats can skip files for
    * predicates on ANY column — the standard multi-dimensional clustering
    * recipe (Delta/Iceberg OPTIMIZE ZORDER, 1..n columns). Pure bit
    * arithmetic on codegen'd built-ins. */
  def zValueN(cols: Seq[org.apache.spark.sql.Column],
              bounds: Seq[(Double, Double)]): org.apache.spark.sql.Column = {
    val n = cols.size
    require(n >= 1 && n == bounds.size, s"zValueN needs matched cols/bounds, got $n/${bounds.size}")
    val bits = math.min(16, 63 / n)
    val maxV = (1 << bits) - 1
    def norm(c: org.apache.spark.sql.Column, lo: Double, hi: Double) =
      least(lit(maxV), greatest(lit(0),
        ((c.cast(DoubleType) - lo) / (if (hi > lo) hi - lo else 1.0) * maxV).cast(IntegerType)))
    val normed = cols.zip(bounds).map { case (c, (lo, hi)) => norm(c, lo, hi) }
    (0 until bits).flatMap { i =>
      normed.zipWithIndex.map { case (cn, j) =>
        shiftleft(shiftright(cn, i).bitwiseAND(1).cast(LongType), n * i + (n - 1 - j))
      }
    }.reduce(_ + _)
  }

  /** The classic 2-ary form (kept for callers and specs). */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
             aMin: Double, aMax: Double, bMin: Double, bMax: Double): org.apache.spark.sql.Column =
    zValueN(Seq(a, b), Seq((aMin, aMax), (bMin, bMax)))

  /** Skew-safe SALTED JOIN — the companion recipe to [[saltedSum]] for the
    * case AQE can't fix (e.g. a skewed key that must SMJ against a
    * non-broadcastable side): the fact side gets a deterministic per-row
    * salt in [0, k), the dim side is replicated k times (explode of a
    * k-element sequence — k× a SMALL side, never the fact), and the join key
    * becomes (key, salt) — a hot key's rows now land on k reducers instead
    * of one. Output is identical to the plain join, which is what the
    * oracle pins. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, k: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(crc32(concat_ws("|", fact.columns.map(col).toIndexedSeq: _*)), lit(k)))
    val replicated = dim.withColumn("__salt", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("__salt", col("__salt").cast(LongType)) // a generator can't nest in cast
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** lineitem ⋈ orders through the salted path, aggregated per status. */
  val qJoinSalted: QueryDef = q("q_join_salted")(
    """SELECT o_orderstatus, count(*) AS cnt,
      |       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_c
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    val fact = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_extendedprice"))
    val dim = Tables.orders(s, d).select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    saltedJoin(fact, dim, "l_orderkey", k = 8)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        sum(floor(col("l_extendedprice") * 100 + 0.5).cast(LongType)).as("sum_price_c"))
      .orderBy("o_orderstatus")
  }

  // ---- scale-safe global rank --------------------------------------------

  /** Global `rank()` WITHOUT the single-partition window (SURVEY §4's
    * "single-partition window" hazard; the reference's own
    * `rank().over(Window.orderBy(...))` — `jobs/vdt4.py:48-49` — moves every
    * row to ONE task). Three bounded stages instead:
    *
    *  1. approxQuantile picks ~`buckets` cut points (one pass, driver gets
    *     a handful of doubles — any cuts are CORRECT, they only balance);
    *  2. count rows per value-bucket (one keyed agg, ≤ buckets rows to the
    *     driver) and prefix-sum them in rank order into per-bucket offsets;
    *  3. rank within each bucket (window partitioned BY bucket — parallel)
    *     and add the bucket's offset.
    *
    * Correct for ties because the bucket is a function of the VALUE: equal
    * keys land in the same bucket, so within-bucket `rank()` plus the offset
    * (= rows in strictly-earlier buckets) is exactly the global rank, gaps
    * included. Null keys fall in bucket 0 and keep Spark's default placement
    * (first for asc, last for desc — bucket 0 ranks last in desc order).
    * At 100 TB: two extra scans buy a window bounded by N/buckets per task. */
  def globalRankScalable(df: DataFrame, key: String, desc: Boolean,
                         outCol: String, buckets: Int = 32): DataFrame =
    // cuts from footers when the frame is file-backed (zero jobs), else the
    // one-pass sketch — cut values only balance, never change ranks (r21)
    globalRankWithCuts(df, key, desc, outCol,
      MLlite.balancingCuts(df, key, buckets), countsOpt = None)

  /** [[globalRankScalable]] with PRECOMPUTED cuts and (optionally) the
    * per-bucket ALL-ROWS counts — the fusion hook letting one counts job
    * serve both the rank offsets and [[MLlite.exactQuantilesWithCuts]] when
    * a pipeline needs both over the same column (q_vdt4, guide §2.4). */
  private[graft] def globalRankWithCuts(df: DataFrame, key: String, desc: Boolean,
                                        outCol: String, cuts: Array[Double],
                                        countsOpt: Option[Map[Int, Long]]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withB = df.withColumn("__b", MLlite.bucketOf(key, cuts))
    val counts = countsOpt.getOrElse(withB.groupBy("__b").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap)
    val order = if (desc) counts.keys.toSeq.sorted.reverse else counts.keys.toSeq.sorted
    val offsets = order.zip(order.scanLeft(0L)(_ + counts(_)).init).toMap
    val w = Window.partitionBy("__b").orderBy(if (desc) col(key).desc else col(key).asc)
    withB.withColumn(outCol,
        rank().over(w).cast(LongType) + element_at(typedLit(offsets), col("__b")))
      .drop("__b")
  }

  /** Same result as q_rank_global (identical oracle SQL) — but the plan has
    * NO SinglePartition exchange before the window (ScaleSpec pins this). */
  val qRankScalable: QueryDef = q("q_rank_scalable")(
    """SELECT o_orderkey, CAST(rank() OVER (ORDER BY o_totalprice DESC) AS BIGINT) AS rnk
      |FROM orders ORDER BY rnk, o_orderkey""".stripMargin) { (s, d) =>
    globalRankScalable(Tables.orders(s, d), "o_totalprice", desc = true, "rnk")
      .select("o_orderkey", "rnk").orderBy("rnk", "o_orderkey")
  }

  // ---- bloom-filter runtime join pruning ---------------------------------

  /** Bloom filter parameters: 16384 bits (256 int64 words — a ~2 KB literal
    * the plan broadcasts to every task for free) × 3 affine hash draws.
    * For the ~1.5k-key dim subsets used here the false-positive rate is
    * (1 - e^(-kn/m))^k ≈ 2%; at larger n, scale mBits — the technique is
    * the point, the constants are per-deployment dials. */
  private val mBits = 16384
  private val kHashes = 3
  private val bloomP = graft.ext.Dedup.P

  /** Hash-i bit position of integer key expression `x` — plain `%`/`*`/`+`
    * on non-negative int64, so the SAME text is valid Spark SQL and DuckDB
    * SQL and both engines agree at any key scale (products stay < 2^63). */
  private def bitPosSql(x: String, i: Int): String = {
    val a = graft.ext.Dedup.affineA(i); val b = graft.ext.Dedup.affineB(i)
    s"((($a * (($x) % $bloomP) + $b) % $bloomP) % $mBits)"
  }

  /** Build the bloom bitmap from the build side's keys in ONE bounded Spark
    * job: the k bit positions per key are exploded row-locally, deduped by
    * the aggregation, and collected — the driver receives at most mBits
    * (16384) integers no matter how many build rows there are, the same
    * bounded-action contract as the IVF centroids. */
  def bloomBits(build: DataFrame, keyCol: String): Array[Long] = {
    val pos = build.select(explode(array(
        (0 until kHashes).map(i => expr(bitPosSql(keyCol, i))): _*)).as("p"))
      .distinct().collect().map(_.getLong(0))
    val bits = new Array[Long](mBits / 64)
    pos.foreach(p => bits(p.toInt >> 6) |= 1L << (p.toInt & 63))
    bits
  }

  /** Membership test against a LITERAL bitmap: all k bit positions set.
    * Pure built-in expressions (element_at / shiftright / bitwise-and) —
    * codegen'd, no UDF, no broadcast variable plumbing; the bitmap rides in
    * the plan itself. This is Spark's own runtime row-level filter shape
    * (InjectRuntimeFilter's bloom pushdown) made explicit and testable. */
  def bloomMightContain(keyCol: String, bits: Array[Long]): org.apache.spark.sql.Column = {
    val arr = bits.mkString("array(", "L, ", "L)")
    expr((0 until kHashes).map { i =>
      val h = bitPosSql(keyCol, i)
      s"((shiftright(element_at($arr, CAST($h DIV 64 AS INT) + 1), CAST($h % 64 AS INT)) & 1) = 1)"
    }.mkString(" AND "))
  }

  /** Bloom-pruned semi join: the 100 TB pattern for a big-fact ⋉ filtered-dim
    * join — build a tiny bloom from the dim subset, row-locally discard the
    * ~98% of fact rows that cannot match BEFORE any join machinery, then run
    * the exact (broadcast) semi join on the survivors to remove false
    * positives. Net effect: the fact table is read once, filtered in the
    * scan stage, and never shuffled. The bloom is a transparent optimization
    * — output is identical to the plain semi join, which is exactly what the
    * oracle checks (ScaleSpec pins the pruning mechanism itself). */
  val qJoinBloom: QueryDef = q("q_join_bloom")(
    """WITH sel AS (SELECT o_orderkey FROM orders WHERE o_totalprice > 150000)
      |SELECT l_returnflag, count(*) AS cnt,
      |       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_c
      |FROM lineitem l
      |WHERE EXISTS (SELECT 1 FROM sel s WHERE s.o_orderkey = l.l_orderkey)
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val sel = Tables.orders(s, d).where(col("o_totalprice") > 150000).select("o_orderkey")
    val bits = bloomBits(sel, "o_orderkey")
    Tables.lineitem(s, d)
      .where(bloomMightContain("l_orderkey", bits))
      .join(broadcast(sel), col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        sum(floor(col("l_extendedprice") * 100 + 0.5).cast(LongType)).as("sum_price_c"))
      .orderBy("l_returnflag")
  }

  /** Z-order layout + both probe reads, factored out so ScaleSpec can assert
    * the FILE-SKIPPING mechanism (inputFiles < snapshot files on EACH
    * dimension) against exactly the layout and literals the oracle row runs.
    * The min/max normalization bounds come from one driver-side action —
    * the adaptive plan-construction pattern (SURVEY.md §3.3). */
  /** The z-order layout pipeline itself — one bounded min/max survey, then
    * the Morton-interleave range-sort. Shared by the `q_zorder` oracle row
    * ([[zorderProbes]]) and the table operation
    * ([[graft.vt.VersionedTable.compactZorder]]), so the layout recipe
    * cannot drift between the measured row and the API. */
  def zorderLayout(df: DataFrame, cols: Seq[String], numFiles: Int): DataFrame = {
    require(cols.nonEmpty, "zorderLayout needs at least one column")
    val r = df.selectExpr(cols.flatMap(c =>
      Seq(s"CAST(min($c) AS DOUBLE)", s"CAST(max($c) AS DOUBLE)")): _*).collect().head
    // an empty table / all-null column yields NULL bounds: degrade to a
    // constant normalization (layout-only commit still completes; the
    // dimension simply contributes no clustering) instead of throwing
    def bound(i: Int) = if (r.isNullAt(i)) 0.0 else r.getDouble(i)
    val bounds = cols.indices.map(i => (bound(2 * i), bound(2 * i + 1)))
    val z = zValueN(cols.map(col), bounds)
    // sort the LAYOUT by the interleaved z-value: each file then covers a
    // small hyper-rectangle of the clustered space, so its min/max stats
    // are tight on EVERY column and any predicate prunes files pre-scan
    df.withColumn("__z", z).repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z").drop("__z")
  }

  def zorderLayout(df: DataFrame, colA: String, colB: String, numFiles: Int): DataFrame =
    zorderLayout(df, Seq(colA, colB), numFiles)

  def zorderProbes(s: SparkSession, d: String, scratch: String):
      (graft.vt.VersionedTable, DataFrame, DataFrame) = {
    val orders = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
    val vt = graft.vt.VersionedTable.create(Tables.scratch(scratch))
    vt.write(zorderLayout(orders, "o_orderkey", "o_totalprice", 8), "main",
      "zorder layout", statsCols = Seq("o_orderkey", "o_totalprice"))
    val byKey = vt.readWhere(s, "main", "o_orderkey", 100d, 500d)
    val byPrice = vt.readWhere(s, "main", "o_totalprice", 1000d, 20000d)
    (vt, byKey, byPrice)
  }

  /** 2-D clustering surfaced as an oracle row: write a [[zValue]]-sorted
    * layout through the versioned writer's per-file stats, then answer one
    * range probe PER DIMENSION via the stats-pruned read — Delta/Iceberg
    * `OPTIMIZE ZORDER` semantics. The oracle is the same two relational
    * filters on the unsorted table: layout must never change answers.
    * ScaleSpec asserts both probes read fewer files than the snapshot
    * holds — the actual multi-dimensional skipping claim. */
  val qZorder: QueryDef = q("q_zorder")(
    """SELECT 'by_key' AS probe, o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_orderkey BETWEEN 100 AND 500
      |UNION ALL
      |SELECT 'by_price' AS probe, o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_totalprice BETWEEN 1000 AND 20000
      |ORDER BY probe, o_orderkey""".stripMargin) { (s, d) =>
    val (_, byKey, byPrice) = zorderProbes(s, d, "vt_zorder")
    byKey.withColumn("probe", lit("by_key"))
      .unionByName(byPrice.withColumn("probe", lit("by_price")))
      .select("probe", "o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("probe", "o_orderkey")
  }

  val defs: Seq[QueryDef] = Seq(qAggSalted, qJoinBucketed, qPartitionedScan,
    qRepartitionReuse, qJoinBloom, qRankScalable, qJoinSalted, qZorder)
}
