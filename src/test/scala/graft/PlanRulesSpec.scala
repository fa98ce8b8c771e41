package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Custom optimizer rules injected via GraftExtensions: plan shape AND
  * result equality vs the un-extended session. */
class PlanRulesSpec extends SparkSpec {

  test("LevenshteinPrefilter adds the length guard and the threshold DP") {
    val shared = spark
    // truth from the UN-extended session (plain full-DP levenshtein);
    // parquet-backed input so the Filter survives optimization (a literal
    // LocalRelation would be constant-folded away before the rule matters)
    def query(s: SparkSession) = {
      Tables.documents(s, sf)
        .where(levenshtein(substring(col("text"), 1, 6), lit("common")) <= 3)
        .select("doc_id")
    }
    val expected = query(spark).collect().map(_.getLong(0)).toSet
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val df = query(s2)
      val optimized = df.queryExecution.optimizedPlan.toString
      // the rewrite happened: length guard + 3-arg (thresholded) levenshtein
      assert(optimized.contains("abs("), s"no length guard in:\n$optimized")
      assert("levenshtein\\(.*Some\\(3\\)\\)".r.findFirstIn(optimized).isDefined,
        s"no thresholded levenshtein in:\n$optimized")
      // semantics preserved exactly
      assert(df.collect().map(_.getLong(0)).toSet === expected)
      // the cast form that DataFrame code produces rewrites too
      val casted = Tables.documents(s2, sf)
        .where(levenshtein(substring(col("text"), 1, 6), lit("common")).cast("long") <= 3L)
        .select("doc_id")
      val castedPlan = casted.queryExecution.optimizedPlan.toString
      assert("levenshtein\\(.*Some\\(3\\)\\)".r.findFirstIn(castedPlan).isDefined,
        s"cast form not rewritten:\n$castedPlan")
      assert(casted.collect().map(_.getLong(0)).toSet === expected)
      // a Long threshold above Int.MaxValue must NOT be rewritten: the Int
      // cast would wrap it negative, flipping an always-true predicate
      val big = Tables.documents(s2, sf)
        .where(levenshtein(substring(col("text"), 1, 6), lit("common")) <= 3000000000L)
        .select("doc_id")
      val bigPlan = big.queryExecution.optimizedPlan.toString
      assert("levenshtein\\(.*Some\\(".r.findFirstIn(bigPlan).isEmpty,
        s"oversized threshold was rewritten:\n$bigPlan")
      assert(big.count() === Tables.documents(s2, sf).count()) // stays always-true
      // negative thresholds are likewise untouched (always-false predicate)
      val neg = Tables.documents(s2, sf)
        .where(levenshtein(substring(col("text"), 1, 6), lit("common")) <= -1)
      assert("levenshtein\\(.*Some\\(".r
        .findFirstIn(neg.queryExecution.optimizedPlan.toString).isEmpty)
      assert(neg.count() === 0L)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
