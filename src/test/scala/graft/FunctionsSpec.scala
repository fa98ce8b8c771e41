package graft

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{FloatVecDot, GraftExtensions}

/** Native expression behavior: SQL registration via SparkSessionExtensions,
  * type checking, and null handling. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("GraftExtensions registers float_vec_dot for SQL text") {
    // getOrCreate returns the suite's shared session (extensions ignored) —
    // clear the active/default session so a NEW SparkSession (same context)
    // is built WITH the extensions, then restore the shared one.
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
        .createOrReplaceTempView("vecs")
      val r = s2.sql("SELECT float_vec_dot(a, b) AS d FROM vecs").as[Double].head()
      assert(r === 11.0)
      s2.catalog.dropTempView("vecs")
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("FloatVecDot rejects non-array inputs at analysis time") {
    val df = Seq((1, 2)).toDF("a", "b")
    // Spark 4 analyzes eagerly: the mismatch surfaces at select() already
    val e = intercept[AnalysisException](
      df.select(FloatVecDot.fdot(col("a"), col("b"))).collect())
    assert(e.getMessage.contains("array<float|double>"))
  }

  test("FloatVecDot is null-safe on null arrays") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val out = df.select(FloatVecDot.fdot(col("a"), col("b")).as("d"))
      .collect().head
    assert(out.isNullAt(0))
  }
}
