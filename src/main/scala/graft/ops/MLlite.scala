package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}
import graft.QueryDef.{sql => q}

/** "ML-lite" operators — the reference's two learned/statistical operators in
  * relational form so the DuckDB oracle can check them (SURVEY.md §2.10, §2.4 A3).
  */
object MLlite {

  /** StringIndexer fit+transform semantics (`jobs/vdt4.py:64-65`):
    * fit = distinct values ordered by frequency desc, value asc; transform =
    * map value → 0-based double index.
    *
    * Fit is one distributed groupBy-count whose RESULT (the distinct-value
    * frequency table — bounded by construction for an indexer) is collected
    * and ordered on the driver, exactly what Spark MLlib's StringIndexer
    * does (its model holds `labelsArray` driver-side). This keeps the plan
    * free of any single-partition window: the earlier formulation ranked the
    * distinct values with an unpartitioned `row_number`, which was safe in
    * size but still planned an `Exchange SinglePartition`. Transform is a
    * broadcast join of the tiny mapping back onto the rows.
    *
    * Null inputs never match the join (SQL null-equality), so null rows are
    * dropped from the output — the same outcome the windowed form had.
    *
    * The input column keeps its NATIVE type end-to-end: the fit groups on the
    * column as-is and breaks frequency ties with the value's own ordering
    * (numeric 9 < 10, not lexicographic "10" < "9"), and the transform joins
    * on the original type — no implicit string↔numeric coercion. Matches
    * MLlib StringIndexer on strings and extends coherently to non-strings. */
  def stringIndex(df: DataFrame, inputCol: String, outputCol: String): DataFrame = {
    val spark = df.sparkSession
    val inField = df.schema(inputCol)
    val labels = df.groupBy(col(inputCol))
      .agg(count(lit(1)).as("__cnt"))
      .where(col(inputCol).isNotNull)
      .collect().map(r => (r.get(0), r.getLong(1)))
      // collect() returns external JVM types — atomic ones (String, java.lang
      // numerics, BigDecimal, Date, …) are Comparable within one column's
      // class; non-Comparable externals (binary → Array[Byte], array →
      // WrappedArray, struct → Row, map) tie-break on a CONTENT-derived
      // string — String.valueOf alone would be identity-based ("[B@1a2b3c")
      // for Array[Byte], giving frequency-tied binary labels nondeterministic
      // indices across runs
      .sortWith { case ((v1, c1), (v2, c2)) =>
        if (c1 != c2) c1 > c2
        else (v1, v2) match {
          case (a: Comparable[_], b) if b.getClass == a.getClass =>
            a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
          case (a, b) => stableString(a) < stableString(b)
        }
      }
    val rows = labels.zipWithIndex
      .map { case ((v, _), i) => org.apache.spark.sql.Row(v, i.toDouble) }
    val mapping = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(StructField(inputCol, inField.dataType), StructField(outputCol, DoubleType))))
    df.join(broadcast(mapping), Seq(inputCol))
  }

  /** Content-based render for tie-breaking non-Comparable label values:
    * binary as lowercase hex, collections/rows element-wise, else
    * String.valueOf (whose default for Array[Byte] is identity-based and
    * therefore nondeterministic across JVMs). */
  private def stableString(v: Any): String = v match {
    case bytes: Array[Byte]              => bytes.map(b => f"$b%02x").mkString
    case arr: Array[_]                   => arr.map(stableString).mkString("[", ",", "]")
    case seq: scala.collection.Seq[_]    => seq.map(stableString).mkString("[", ",", "]")
    case row: org.apache.spark.sql.Row   => row.toSeq.map(stableString).mkString("(", ",", ")")
    case m: scala.collection.Map[_, _]   =>
      m.toSeq.map { case (k, vv) => stableString(k) + "->" + stableString(vv) }
        .sorted.mkString("{", ",", "}")
    case other                           => String.valueOf(other)
  }

  val qStringIndexer: QueryDef = q("q_string_indexer")(
    """WITH m AS (SELECT c_mktsegment,
      |                  CAST(row_number() OVER (ORDER BY count(*) DESC, c_mktsegment) - 1 AS DOUBLE) AS seg_idx
      |           FROM customer GROUP BY c_mktsegment)
      |SELECT c.c_custkey, c.c_mktsegment, m.seg_idx
      |FROM customer c JOIN m USING (c_mktsegment) ORDER BY c.c_custkey""".stripMargin) { (s, d) =>
    stringIndex(Tables.customer(s, d), "c_mktsegment", "seg_idx")
      .select("c_custkey", "c_mktsegment", "seg_idx")
      .orderBy("c_custkey")
  }

  /** The 100 TB StringIndexer twin (r14 verdict #4): identical fit+transform
    * semantics with NO driver-side labels array. [[stringIndex]] is
    * parity-faithful to MLlib (whose model holds `labelsArray` on the
    * driver) — which means a high-cardinality column OOMs the driver. Here
    * the "model" stays a DISTRIBUTED mapping table end-to-end:
    *
    *  1. fit = one keyed groupBy-count over the column (map-side combined);
    *  2. rank = the [[graft.ops.Scale.globalRankScalable]] shape: bucket
    *     each label by DETERMINISTIC count cuts (≤ `buckets` doubles from
    *     approxQuantile, baked in as literals — bucket id is a pure
    *     expression of the row, so every action over the plan agrees),
    *     then `row_number` within each bucket ordered (cnt desc, value
    *     asc) plus per-bucket prefix offsets (O(buckets) longs to the
    *     driver, never a label). Count ties share a bucket — and a
    *     Zipf-shaped column makes one tie group (cnt==1) most of the
    *     table, so any FAT single-count bucket is further sub-split by
    *     VALUE cuts from a seed-pinned sample (order-safe exactly because
    *     one count remains: the residual order is value alone, compared as
    *     unsigned UTF-8 on both sides). No persisted state survives the
    *     call: the fit caches the per-label counts only while its own
    *     actions run.
    *  3. transform = an equi-join of the mapping back onto the rows (AQE
    *     broadcasts it when small; shuffles it when a 10⁹-label column
    *     makes broadcast impossible — exactly the case the parity form
    *     cannot survive). */
  def stringIndexScalable(df: DataFrame, inputCol: String, outputCol: String,
                          buckets: Int = 32): DataFrame = {
    // 4096 is the __g = __b * 4096 + __s packing radix: more buckets than
    // that would alias (b, s) pairs across buckets and silently mis-rank
    require(buckets >= 2 && buckets <= 4096,
      s"need 2 <= buckets <= 4096, got $buckets")
    // the mapping (one row per distinct label) is scanned by three fit-time
    // actions; cache it for the fit and release it before returning — the
    // transform's join recomputes it once lazily, nothing leaks
    val freq = df.where(col(inputCol).isNotNull)
      .groupBy(col(inputCol)).agg(count(lit(1)).as("__cnt")).persist()
    try {
      freq.count() // materialize so the fit actions share one input scan
      val probs = (1 until buckets).map(_.toDouble / buckets).toArray
      val cuts = freq.stat.approxQuantile("__cnt", probs, 0.001).distinct.sorted
      // larger count → fewer cuts at or above it → SMALLER bucket id: bucket
      // ascending is count descending, matching the fit order
      val bucket = cuts.map(c => when(col("__cnt") <= c, 1).otherwise(0))
        .reduceOption(_ + _).getOrElse(lit(0))
      val withB = freq.withColumn("__b", bucket)
      // ZIPF GUARD: count cuts put every equal-count label in ONE bucket, so
      // the cnt==1 long tail of a high-cardinality column would rank in a
      // single window task. A FAT bucket holding a single distinct count is
      // order-safe to sub-split by VALUE (its residual order is value alone),
      // with deterministic cut strings from a seed-pinned sample, compared
      // in unsigned UTF-8 like Spark's own string ordering. Mixed-count
      // buckets stay whole (value-splitting them would scramble cnt order) —
      // cuts land between distinct counts whenever possible, so the massive
      // tie groups that matter are single-count by construction.
      val stats = withB.groupBy("__b")
        .agg(count(lit(1)).as("n"), min("__cnt").as("lo"), max("__cnt").as("hi"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2) == r.getLong(3)))
        .toMap
      val total = stats.values.map(_._1).sum
      val fatLimit = math.max(total / buckets * 2, 1024L)
      val utf8 = new Ordering[String] {
        def compare(a: String, b: String) = graft.vt.VersionedTable.utf8Cmp(a, b)
      }
      // sub-cuts are TYPED: string columns sample + unsigned-UTF-8-sorted
      // cut strings; numeric columns take deterministic quantile cuts
      // (9 < 10 must stay numeric, never lexicographic — the parity form's
      // documented native-type contract); other orderable types keep the
      // tie bucket whole rather than risk a driver/Spark ordering mismatch
      val dt = freq.schema(inputCol).dataType
      val subCuts: Map[Int, Seq[Any]] = stats.collect {
        case (b, (n, true)) if n > fatLimit &&
            (dt == org.apache.spark.sql.types.StringType ||
              dt.isInstanceOf[org.apache.spark.sql.types.NumericType]) =>
          val cs: Seq[Any] = dt match {
            case org.apache.spark.sql.types.StringType =>
              val sample = withB.where(col("__b") === b).select(inputCol)
                .sample(withReplacement = false, math.min(1.0, 4096.0 / n), seed = 42)
                .collect().map(_.getString(0)).sorted(utf8)
              if (sample.isEmpty) Seq.empty
              else (1 until buckets)
                .map(i => sample(((sample.length.toLong * i) / buckets).toInt
                  .min(sample.length - 1)))
                .distinct
            case _ =>
              withB.where(col("__b") === b).stat
                .approxQuantile(inputCol, probs, 0.001).distinct.sorted.toSeq
          }
          b -> cs
      }.filter(_._2.nonEmpty).toMap
      val sub = subCuts.foldLeft(lit(0)) { case (acc, (b, cs)) =>
        when(col("__b") === b,
          cs.map(cu => when(col(inputCol) > lit(cu), 1).otherwise(0)).reduce(_ + _))
          .otherwise(acc)
      }
      val keyed = withB.withColumn("__s", sub)
        .withColumn("__g", col("__b") * 4096 + col("__s"))
      val counts = keyed.groupBy("__g").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val ids = counts.keys.toSeq.sorted // (b asc, s asc) — the fit order
      val offsets = ids.zip(ids.scanLeft(0L)(_ + counts(_)).init).toMap
      val w = Window.partitionBy("__g").orderBy(col("__cnt").desc, col(inputCol).asc)
      val mapping = keyed.withColumn(outputCol,
          (row_number().over(w).cast(LongType) +
            element_at(typedLit(offsets), col("__g")) - 1L).cast(DoubleType))
        .select(col(inputCol), col(outputCol))
      df.join(mapping, Seq(inputCol))
    } finally {
      freq.unpersist()
      ()
    }
  }

  /** Identical oracle to q_string_indexer — the assertion IS the twin
    * contract: same fit order (frequency desc, value asc), same 0-based
    * double indices, produced without any driver label state (ScaleSpec
    * pins the plan: no LocalTableScan, no SinglePartition exchange). */
  val qStringIndexerScalable: QueryDef = q("q_string_indexer_scalable")(
    """WITH m AS (SELECT c_mktsegment,
      |                  CAST(row_number() OVER (ORDER BY count(*) DESC, c_mktsegment) - 1 AS DOUBLE) AS seg_idx
      |           FROM customer GROUP BY c_mktsegment)
      |SELECT c.c_custkey, c.c_mktsegment, m.seg_idx
      |FROM customer c JOIN m USING (c_mktsegment) ORDER BY c.c_custkey""".stripMargin) { (s, d) =>
    stringIndexScalable(Tables.customer(s, d), "c_mktsegment", "seg_idx")
      .select("c_custkey", "c_mktsegment", "seg_idx")
      .orderBy("c_custkey")
  }

  /** Exact quantile cut points under a pinned deterministic rule: the value at
    * 1-based rank ceil(p*n) of the ascending order — the classic
    * nearest-rank definition, expressible identically in Spark and SQL.
    *
    * This pins the SEMANTICS the reference gets from
    * `df.approxQuantile(..., relativeError)` (`jobs/vdt4.py:68`): at
    * relativeError=0 Spark's Greenwald–Khanna sketch is exact; at scale the
    * production path is `df.stat.approxQuantile` / `percentile_approx` with
    * relErr>0 (one pass, mergeable sketch, no global sort). A ScalaTest
    * asserts GK(relErr=0) lands within rank tolerance of this rule.
    */
  def exactQuantileRanks(n: Long, ps: Seq[Double]): Seq[Long] =
    ps.map(p => math.max(1L, math.ceil(p * n).toLong))

  /** Driver-side exact quantiles via `df.stat.approxQuantile` at
    * relativeError=0 — the reference's A3 operator FORM (`jobs/vdt4.py:68`),
    * where the GK sketch degenerates to exact nearest-rank values.
    * REFERENCE-PARITY ONLY, kept for the OperatorSpec pin (GK(0) == the rank
    * rule above): at ε=0 the "sketch" keeps EVERY distinct value in driver
    * memory — O(distinct) driver state, a driver OOM at 100 TB. Every benched
    * query routes through [[exactQuantilesScalable]] instead, which returns
    * the identical values with bounded driver traffic. */
  def exactQuantiles(df: DataFrame, valueCol: String, ps: Seq[Double]): Seq[Double] =
    df.stat.approxQuantile(valueCol, ps.toArray, 0.0).toSeq

  /** Exact nearest-rank quantiles with BOUNDED driver state — the 100 TB
    * replacement for GK(ε=0). Three bounded stages (the same machinery as
    * [[Scale.globalRankScalable]]):
    *
    *  1. `approxQuantile(ε=0.01)` picks ~`buckets` cut points — one mergeable
    *     pass, sketch state O(1/ε), and ANY cuts are correct (they only
    *     balance the buckets);
    *  2. count rows per value-bucket (one keyed agg, ≤ `buckets` rows to the
    *     driver); prefix sums locate each target rank's (bucket, local rank);
    *  3. `row_number` within each bucket — a window partitioned BY bucket, so
    *     every task sorts ~N/buckets rows, never N — filtered to exactly the
    *     |ps| hit positions; the driver receives |ps| rows.
    *
    * Equal values share a bucket (the bucket is a function of the value), so
    * within-bucket position + rows-in-earlier-buckets is exactly the global
    * nearest-rank position: the returned values are bit-identical to GK(0)'s
    * and to the oracle's `row_number`-based rank rule. Mirrors the
    * reference's adaptive plan construction — an action returns scalars baked
    * into the subsequent plan as literals (SURVEY.md §3.3). */
  def exactQuantilesScalable(df: DataFrame, valueCol: String, ps: Seq[Double],
                             buckets: Int = 32): Seq[Double] = {
    // NULLs are excluded up front so both paths agree on nullable columns:
    // approxQuantile (the sketch fallback) ignores nulls, while the
    // when/otherwise bucket expression would have routed them to bucket 0.
    val rows = df.where(col(valueCol).isNotNull)
    exactQuantilesWithCuts(rows, valueCol, ps,
      balancingCuts(df, valueCol, buckets), countsOpt = None)
  }

  /** The value-bucket expression shared by the bucketed rank/quantile
    * machinery: Σ [v > cutᵢ] over SORTED cuts — monotone in v, so bucket
    * concatenation in cut order reproduces the global value order, and equal
    * values always share a bucket whatever the cut VALUES are. That is why
    * cut choice can never change results, only bucket balance. */
  private[graft] def bucketOf(valueCol: String, cuts: Array[Double]): Column =
    cuts.map(c => when(col(valueCol) > c, 1).otherwise(0))
      .reduceOption(_ + _).getOrElse(lit(0))

  /** Pick ~`buckets` balancing cut points for the bucketed rank/quantile
    * machinery WITHOUT a data pass when the frame is file-backed (r21, guide
    * §1.2/§6): global [min, max] from the parquet footers of `df.inputFiles`
    * (driver-local cached metadata reads), linearly interpolated. Cut VALUES
    * never affect results — see [[bucketOf]] — they only balance bucket
    * sizes, so footer-derived cuts are as correct as the GK sketch's and
    * cost ZERO Spark jobs where the sketch cost one full pass over the
    * column. Any shape the footers cannot prove (computed frames with no
    * input files, renamed columns, decimals, NaN extremes, dropped stats)
    * falls back to the one-pass ε=0.01 sketch. A pathological distribution
    * (all mass in one interpolation span) degrades bucket BALANCE only —
    * the per-bucket window then sorts more rows, results unchanged. */
  private[graft] def balancingCuts(df: DataFrame, valueCol: String,
                                   buckets: Int): Array[Double] = {
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    if (probs.isEmpty) return Array.empty[Double] // buckets=1: no cuts
    footerRange(df, valueCol) match {
      case Some((lo, hi)) if hi > lo =>
        (1 until buckets).map(i => lo + (hi - lo) * i / buckets)
          .toArray.distinct.sorted
      case Some(_) => Array.empty[Double] // single value: one bucket
      case None =>
        df.where(col(valueCol).isNotNull)
          .stat.approxQuantile(valueCol, probs, 0.01).distinct.sorted
    }
  }

  /** Footer-provable global [min, max] of `valueCol` across `df`'s input
    * files; None → caller runs the sketch pass. Only used for bucket
    * BALANCE, so a filter above the scan (footers then cover a superset)
    * is harmless. */
  private def footerRange(df: DataFrame, valueCol: String): Option[(Double, Double)] = {
    val dt = df.schema.find(_.name == valueCol).map(_.dataType)
    if (!dt.exists(t => t.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
        !t.isInstanceOf[org.apache.spark.sql.types.DecimalType])) return None
    val files = try df.inputFiles catch { case scala.util.control.NonFatal(_) => Array.empty[String] }
    if (files.isEmpty || files.length > 4096) return None
    var lo = Double.MaxValue
    var hi = -Double.MaxValue
    var any = false
    files.foreach { f =>
      if (!f.endsWith(".parquet")) return None
      val p = try java.nio.file.Paths.get(new java.net.URI(f).getPath)
              catch { case _: Exception => java.nio.file.Paths.get(f.stripPrefix("file:")) }
      graft.vt.VersionedTable.footerDoubleRange(p, valueCol) match {
        case Some(Some((mn, mx))) =>
          any = true
          if (mn < lo) lo = mn
          if (mx > hi) hi = mx
        case Some(None) => () // provably all-null for the column: no range
        case None => return None // unprovable footer: sketch fallback
      }
    }
    if (any && java.lang.Double.isFinite(lo) && java.lang.Double.isFinite(hi))
      Some((lo, hi))
    else None
  }

  /** Exact nearest-rank quantiles over `rows` (already null-filtered) with
    * PRECOMPUTED cuts and, optionally, precomputed per-bucket non-null
    * counts — the fusion hook that lets one counts job serve both this and
    * [[Scale.globalRankScalable]] when a pipeline needs both over the same
    * column (q_vdt4: guide §2.4, share the pass). */
  private[graft] def exactQuantilesWithCuts(rows: DataFrame, valueCol: String,
                                            ps: Seq[Double], cuts: Array[Double],
                                            countsOpt: Option[Map[Int, Long]]): Seq[Double] = {
    import org.apache.spark.sql.expressions.Window
    val withB = rows.withColumn("__b", bucketOf(valueCol, cuts))
    val counts = countsOpt.getOrElse(withB.groupBy("__b").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap)
    val n = counts.values.sum
    require(n > 0, s"exactQuantilesScalable: no rows in $valueCol")
    val order = counts.keys.toSeq.sorted
    val offsets = order.zip(order.scanLeft(0L)(_ + counts(_)).init).toMap
    val locals: Seq[(Int, Long)] = exactQuantileRanks(n, ps).map { r =>
      val b = order.findLast(bb => offsets(bb) < r).get
      (b, r - offsets(b))
    }
    val w = Window.partitionBy("__b").orderBy(col(valueCol).asc)
    val cond = locals.distinct
      .map { case (b, k) => col("__b") === lit(b) && col("__rn") === lit(k) }
      .reduce(_ || _)
    // r21 (guide §2.3): only the buckets that HOLD a target rank need the
    // window pass — pre-filtering the others cuts the rank shuffle to
    // ~|targets|/buckets of the rows; per-bucket row_numbers are unchanged
    // by dropping whole other partitions.
    val candBuckets = locals.map(_._1).distinct
    val got = withB.where(col("__b").isin(candBuckets: _*))
      .withColumn("__rn", row_number().over(w).cast(LongType))
      .where(cond)
      .select(col("__b"), col("__rn"), col(valueCol).cast(DoubleType).as("__v"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    locals.map(got)
  }

  val qApproxQuantile: QueryDef = q("q_approx_quantile")(
    """WITH r AS (SELECT l_extendedprice AS v,
      |                  row_number() OVER (ORDER BY l_extendedprice) AS rn FROM lineitem),
      |     n AS (SELECT count(*) AS cnt FROM lineitem)
      |SELECT CAST(rn AS BIGINT) AS rn, v FROM r, n
      |WHERE rn IN (CAST(ceil(0.25 * cnt) AS BIGINT), CAST(ceil(0.5 * cnt) AS BIGINT),
      |             CAST(ceil(0.75 * cnt) AS BIGINT))
      |ORDER BY rn""".stripMargin) { (s, d) =>
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val targets = exactQuantileRanks(li.count(), Seq(0.25, 0.5, 0.75))
    val vals = exactQuantilesScalable(li, "l_extendedprice", Seq(0.25, 0.5, 0.75))
    targets.zip(vals).toDF("rn", "v").orderBy("rn")
  }

  /** Grouped exact interpolated percentiles (quantile_cont semantics) over
    * INTEGER CENTS: pos = (n-1)·p lands on exact binary fractions for
    * quartiles, and frac·(upper-lower) is a dyadic-rational × int product —
    * bit-exact in IEEE double in both engines, so the oracle hash-matches
    * without any rounding tolerance. One shuffle on the group key;
    * percentile is Spark's built-in exact aggregator (sort within group). */
  val qPercentile: QueryDef = q("q_percentile")(
    """WITH c AS (SELECT o_orderpriority,
      |                  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders)
      |SELECT o_orderpriority,
      |       quantile_cont(cents, 0.25) AS p25,
      |       quantile_cont(cents, 0.5)  AS p50,
      |       quantile_cont(cents, 0.75) AS p75
      |FROM c GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val cents = floor(col("o_totalprice") * 100 + 0.5).cast(LongType)
    Tables.orders(s, d).withColumn("cents", cents)
      .groupBy("o_orderpriority")
      .agg(expr("percentile(cents, 0.25)").as("p25"),
        expr("percentile(cents, 0.5)").as("p50"),
        expr("percentile(cents, 0.75)").as("p75"))
      .orderBy("o_orderpriority")
  }

  /** Quantile bucketing (`jobs/vdt4.py:68-73`): cut points from an action,
    * baked into a chained when/otherwise. */
  def quantileBucket(df: DataFrame, valueCol: String, outputCol: String,
                     cuts: Seq[Double]): DataFrame = {
    require(cuts.size == 3, "expects q1,q2,q3")
    df.withColumn(outputCol,
      when(col(valueCol) <= cuts(0), 1).when(col(valueCol) <= cuts(1), 2)
        .when(col(valueCol) <= cuts(2), 3).otherwise(4))
  }

  val qQuantileBucket: QueryDef = q("q_quantile_bucket")(
    """WITH r AS (SELECT l_extendedprice AS v,
      |                  row_number() OVER (ORDER BY l_extendedprice) AS rn FROM lineitem),
      |     n AS (SELECT count(*) AS cnt FROM lineitem),
      |     cuts AS (SELECT max(CASE WHEN rn = CAST(ceil(0.25 * cnt) AS BIGINT) THEN v END) AS q1,
      |                     max(CASE WHEN rn = CAST(ceil(0.5 * cnt) AS BIGINT) THEN v END) AS q2,
      |                     max(CASE WHEN rn = CAST(ceil(0.75 * cnt) AS BIGINT) THEN v END) AS q3
      |              FROM r, n)
      |SELECT l.l_orderkey, l.l_linenumber,
      |       CASE WHEN l.l_extendedprice <= c.q1 THEN 1 WHEN l.l_extendedprice <= c.q2 THEN 2
      |            WHEN l.l_extendedprice <= c.q3 THEN 3 ELSE 4 END AS price_quartile
      |FROM lineitem l CROSS JOIN cuts c
      |ORDER BY l.l_orderkey, l.l_linenumber, price_quartile""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val cuts = exactQuantilesScalable(li, "l_extendedprice", Seq(0.25, 0.5, 0.75))
    quantileBucket(li, "l_extendedprice", "price_quartile", cuts)
      .select("l_orderkey", "l_linenumber", "price_quartile")
      .orderBy("l_orderkey", "l_linenumber", "price_quartile")
  }

  /** Approximate distinct count via a KMV (k-minimum-values) sketch, the
    * classic DV estimator: hash every element, keep the k smallest distinct
    * hashes, estimate DV ≈ (k-1)·M/h_k (hashes uniform in [0, M)). Chosen
    * over HyperLogLog deliberately: Spark's HLL++ state is not replayable in
    * another engine, while KMV over the shared 31-base polynomial hash is
    * pure relational algebra — BOTH engines compute the identical estimate,
    * so even the "approximate" operator is hash-check oracled (same design
    * rule as the literal-plane LSH replay).
    *
    * Scale shape: one distinct-shuffle on (group, hash) — 16-byte rows —
    * then a per-group top-k that plans as WindowGroupLimit (map-side heaps,
    * no global sort). Estimator error ~ 1/√k ≈ 6% at k=256 (spec-pinned);
    * `n_exact` is the exact distinct count of hash values (collision-
    * coalesced identically in both engines). */
  val qApproxDistinct: QueryDef = q("q_approx_distinct")({
    val hv = graft.ext.Dedup.polyDuck("w")
    s"""WITH toks AS (SELECT lang, unnest(string_split(lower(text), ' ')) AS w
       |              FROM documents),
       |     h AS (SELECT DISTINCT lang, $hv AS hv FROM toks WHERE w <> ''),
       |     r AS (SELECT lang, hv,
       |                  row_number() OVER (PARTITION BY lang ORDER BY hv) AS rn FROM h),
       |     tk AS (SELECT lang, count(*) AS n_k, max(hv) AS hk
       |            FROM r WHERE rn <= 256 GROUP BY lang),
       |     ex AS (SELECT lang, count(*) AS n_exact FROM h GROUP BY lang)
       |SELECT ex.lang, n_exact,
       |       CAST(CASE WHEN n_k < 256 THEN n_k
       |                 ELSE (255 * 1000000007) // greatest(hk, 1) END AS BIGINT) AS n_est
       |FROM ex JOIN tk USING (lang) ORDER BY lang""".stripMargin}) { (s, d) =>
    val hashes = Tables.documents(s, d)
      .select(col("lang"), explode(split(lower(col("text")), " ")).as("w"))
      .where(col("w") =!= "")
      .select(col("lang"), graft.functions.TextHashes.polyHash(col("w")).as("hv"))
      .distinct()
    val topk = hashes
      .withColumn("rn", row_number().over(Window.partitionBy("lang").orderBy("hv")))
      .where(col("rn") <= 256)
      .groupBy("lang").agg(count(lit(1)).as("n_k"), max("hv").as("hk"))
    hashes.groupBy("lang").agg(count(lit(1)).as("n_exact"))
      .join(topk, Seq("lang"))
      .select(col("lang"), col("n_exact"),
        when(col("n_k") < 256, col("n_k"))
          .otherwise(expr("CAST((255 * 1000000007) DIV greatest(hk, 1) AS BIGINT)"))
          .as("n_est"))
      .orderBy("lang")
  }

  val defs: Seq[QueryDef] = Seq(qStringIndexer, qStringIndexerScalable,
    qApproxQuantile, qQuantileBucket,
    qPercentile, qApproxDistinct)
}
