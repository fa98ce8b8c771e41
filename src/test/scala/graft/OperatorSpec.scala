package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.MLlite

/** Operator edge cases: argmax tie-breaks, StringIndexer ordering, quantile
  * rule vs Spark's Greenwald–Khanna sketch, casts (SURVEY.md §5.3).
  */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  test("argmax window tie-break picks the lowest key among equal maxima") {
    val df = Seq(("g1", 10, 1), ("g1", 10, 2), ("g2", 5, 3)).toDF("g", "v", "k")
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("k").asc)
    val top = df.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("g", "k").as[(String, Int)].collect().toMap
    assert(top === Map("g1" -> 1, "g2" -> 3))
  }

  test("stringIndex orders by frequency desc then value asc, 0-based double") {
    val df = Seq("b", "b", "a", "a", "c").toDF("v")
    val idx = MLlite.stringIndex(df, "v", "idx")
      .select("v", "idx").distinct().as[(String, Double)].collect().toMap
    // a and b tie at 2 → alphabetical: a=0, b=1; c (freq 1) = 2
    assert(idx === Map("a" -> 0.0, "b" -> 1.0, "c" -> 2.0))
  }

  test("stringIndex on a numeric column breaks ties numerically, joins on the native type") {
    // lexicographic would order "10" < "9"; the native-type fit must not
    val df = Seq(9, 9, 10, 10, 2).toDF("v")
    val idx = MLlite.stringIndex(df, "v", "idx")
      .select("v", "idx").distinct().as[(Int, Double)].collect().toMap
    assert(idx === Map(9 -> 0.0, 10 -> 1.0, 2 -> 2.0))
    // and the mapping column keeps the input's type (no string coercion)
    assert(MLlite.stringIndex(df, "v", "idx").schema("v").dataType ===
      org.apache.spark.sql.types.IntegerType)
  }

  test("GK sketch at relativeError=0 equals the nearest-rank rule (the oracle's rule)") {
    val li = Tables.lineitem(spark, sf)
    val gk = MLlite.exactQuantiles(li, "l_extendedprice", Seq(0.25, 0.5, 0.75))
    // independent computation of the ceil(p*n) nearest-rank rule
    val sorted = li.select("l_extendedprice").as[Double].collect().sorted
    val rankRule = MLlite.exactQuantileRanks(sorted.length.toLong, Seq(0.25, 0.5, 0.75))
      .map(r => sorted(r.toInt - 1))
    assert(gk === rankRule, s"GK $gk vs rank-rule $rankRule")
  }

  test("bounded two-pass quantiles equal GK(0) (bit-identical cut values)") {
    val li = Tables.lineitem(spark, sf)
    val ps = Seq(0.25, 0.5, 0.75)
    val scalable = MLlite.exactQuantilesScalable(li, "l_extendedprice", ps)
    val gk = MLlite.exactQuantiles(li, "l_extendedprice", ps)
    assert(scalable === gk, s"scalable $scalable vs GK(0) $gk")
    // degenerate bucketing (everything in one bucket) still lands exactly
    val tiny = Seq(5.0, 1.0, 3.0, 2.0, 4.0).toDF("v")
    assert(MLlite.exactQuantilesScalable(tiny, "v", ps, buckets = 1) ===
      Seq(2.0, 3.0, 4.0)) // ceil(p*5) ranks = 2,3,4
    // NULLs are excluded, matching the GK path (approxQuantile ignores nulls):
    // with them counted, n would inflate and every rank would shift
    val withNulls = Seq(Some(5.0), None, Some(1.0), Some(3.0), None,
      Some(2.0), Some(4.0)).toDF("v")
    assert(MLlite.exactQuantilesScalable(withNulls, "v", ps, buckets = 2) ===
      Seq(2.0, 3.0, 4.0))
  }

  test("footer-derived balancing cuts: file-backed path active, results identical to sketch cuts") {
    // r21: balancingCuts reads parquet footers for file-backed frames. Pin
    // (a) the fast path actually fires on a written parquet (non-empty,
    // finite, sorted, strictly inside [min,max]); (b) quantiles through it
    // equal the sketch-cut path bit-for-bit, nulls and all-null files
    // included (cut choice must never change results).
    val dir = Tables.scratch("footer_cuts_spec")
    Seq(Some(10.0), Some(2.0), None, Some(7.5), Some(4.0), Some(1.0))
      .toDF("v").repartition(2).write.mode("overwrite").parquet(dir)
    // an extra file that is ALL NULL for v: must not abort the fast path
    Seq.empty[Option[Double]].toDF("v")
      .union(Seq(Option.empty[Double], Option.empty[Double]).toDF("v"))
      .coalesce(1).write.mode("append").parquet(dir)
    val df = spark.read.parquet(dir)
    val cuts = MLlite.balancingCuts(df, "v", 4)
    assert(cuts.nonEmpty && cuts.sameElements(cuts.sorted))
    assert(cuts.forall(c => c > 1.0 && c < 10.0 && java.lang.Double.isFinite(c)))
    val ps = Seq(0.25, 0.5, 0.75)
    val viaFooter = MLlite.exactQuantilesScalable(df, "v", ps)
    // sketch-cut path forced by a non-file-backed twin of the same rows
    val viaSketch = MLlite.exactQuantilesScalable(
      df.as[Option[Double]].collect().toSeq.toDF("v"), "v", ps)
    assert(viaFooter === viaSketch, s"footer $viaFooter vs sketch $viaSketch")
    assert(viaFooter === MLlite.exactQuantiles(df, "v", ps))
    // rank through footer cuts equals the single-partition window rank
    val fast = ops.Scale.globalRankScalable(df.where(col("v").isNotNull), "v",
      desc = false, "rnk", buckets = 4)
      .select("v", "rnk").as[(Double, Long)].collect().toMap
    val slow = df.where(col("v").isNotNull)
      .withColumn("rnk", rank().over(Window.orderBy(col("v").asc)).cast("long"))
      .select("v", "rnk").as[(Double, Long)].collect().toMap
    assert(fast === slow)
  }

  test("quantileBucket boundaries are inclusive on the left cut") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val out = MLlite.quantileBucket(df, "v", "b", Seq(1.0, 2.0, 3.0))
      .select("v", "b").as[(Double, Int)].collect().toMap
    assert(out === Map(1.0 -> 1, 2.0 -> 2, 3.0 -> 3, 4.0 -> 4))
  }

  test("cast double→string round-trips integral doubles like the reference") {
    // `jobs/vdt4.py:63`: sizeRelatedTable double → string feeds StringIndexer
    val out = Seq(17.0, 0.5).toDF("v")
      .select(col("v").cast("string").as("s")).as[String].collect().toSet
    assert(out === Set("17.0", "0.5"))
  }

  test("rowwise mean over dynamic column set folds left-to-right") {
    val df = Seq((1.0, 2.0, 3.0, 6.0)).toDF("a", "b", "c", "d")
    val cols = df.columns.map(col(_))
    val m = df.withColumn("m", cols.reduce(_ + _) / lit(cols.length))
      .select("m").as[Double].head()
    assert(m === 3.0)
  }

  test("asof join: inclusive at equal ts, null before first right row") {
    import graft.ops.AsofJoin
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 1.5), (1L, 15L, 2.5)).toDF("k", "t", "v")
    val out = AsofJoin.asofJoin(left, right, "k", "t", "v")
      .select("lid", "__asof").as[(Long, Option[Double])].collect().toMap
    assert(out === Map(100L -> Some(1.5), 101L -> Some(2.5), 102L -> None))
  }

  test("asof join resolves duplicate right (key, ts) rows to the largest value, repeatably") {
    import graft.ops.AsofJoin
    val left = Seq((1L, 10L, 100L)).toDF("k", "t", "lid")
    // three right rows at the same instant, shuffled across partitions
    val right = Seq((1L, 10L, 2.5), (1L, 10L, 7.5), (1L, 10L, 5.0))
      .toDF("k", "t", "v").repartition(3)
    (1 to 3).foreach { _ =>
      val out = AsofJoin.asofJoin(left, right, "k", "t", "v")
        .select("__asof").as[Option[Double]].head()
      assert(out === Some(7.5), "tie must deterministically pick the max value")
      val tol = AsofJoin.asofJoinTolerance(left, right, "k", "t", "v", tol = 100L)
        .select("__asof").as[Option[Double]].head()
      assert(tol === Some(7.5))
    }
  }

  test("first/last_value use the full-partition frame, not the default running frame") {
    // with the DEFAULT frame (range unbounded preceding..current row),
    // last_value would return the CURRENT row's key — the classic trap the
    // explicit frame in qFirstLast avoids; pin the intended semantics here
    val out = ops.Analytic.qFirstLast.impl(spark, sf)
      .select("o_custkey", "first_ok", "last_ok")
      .as[(Long, Long, Long)].collect()
    val expect = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(min("o_orderkey").as("mn"), max("o_orderkey").as("mx"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    out.foreach { case (ck, fo, lo) => assert((fo, lo) === expect(ck)) }
  }

  test("analytic windows are keyed: no single-partition WindowExec in the plans") {
    // a window without PARTITION BY funnels the table through one task —
    // the scale hazard the global-rank parity queries document; the NEW
    // analytic queries must all partition their windows
    Seq(ops.Analytic.qFirstLast, ops.Analytic.qPercentRank).foreach { qd =>
      val plan = qd.impl(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("SinglePartition"), s"${qd.name} plans SinglePartition:\n$plan")
    }
  }

  test("grouping sets aggregates both dimensions in one pass (single Expand)") {
    val plan = ops.Analytic.qGroupingSets.impl(spark, sf)
      .queryExecution.executedPlan.toString
    assert("(?i)expand".r.findAllIn(plan).size >= 1)
    // one scan of lineitem, not one per grouping set
    assert("Scan parquet".r.findAllIn(plan).size === 1, s"multiple scans:\n$plan")
  }

  test("KMV sketch estimates distinct tokens within ~1/sqrt(k) of the truth") {
    val out = ops.MLlite.qApproxDistinct.impl(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (lang, exact, est) =>
      if (exact < 256) assert(est === exact, s"$lang: below k the sketch is exact")
      else {
        val rel = math.abs(est - exact).toDouble / exact
        assert(rel < 0.25, s"$lang: KMV estimate $est vs exact $exact (rel err $rel)")
      }
    }
    // the per-lang top-k plans as map-side heaps, not a per-group full sort
    val plan = ops.MLlite.qApproxDistinct.impl(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$plan")
  }

  test("sql-text subqueries decorrelate to joins, not per-row loops") {
    val plan = ops.Extras.qSqlText.impl(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("subquery"),
      s"correlated subquery survived decorrelation:\n$plan")
    assert("(?i)join".r.findAllIn(plan).size >= 2, s"expected two joins:\n$plan")
  }

  test("driver contract: entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet ++
      Registry.all.filter(_.oracle.isEmpty).map(_.name))
  }

  test("versioned queries survive repeated invocation (scratch isolation)") {
    val d1 = ops.Versioned.qVtWriteVersions.impl(spark, sf).count()
    val d2 = ops.Versioned.qVtWriteVersions.impl(spark, sf).count()
    assert(d1 === d2 && d1 > 0)
  }
}
