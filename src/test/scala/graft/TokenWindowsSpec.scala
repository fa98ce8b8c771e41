package graft

import org.apache.spark.sql.functions._

import graft.functions.TokenWindows

/** The r21 native token-window kernel must be VALUE-IDENTICAL to the HOF
  * chain it replaced — `transform(sequence(...), i -> array_join(slice(
  * split(text, ' '), i*st+1, w), ' '))` — for both window-count
  * conventions; the repeated-passage / chunking oracle rows hash these
  * windows (via sha2) bit-for-bit. */
class TokenWindowsSpec extends SparkSpec {
  import spark.implicits._

  private val edge = Seq(
    "", " ", "  ", "a", "a b", "a  b", " lead tok", "trail tok ",
    "one two three four five six seven", ("tok " * 95).trim, "éé 😀 x y z",
    ("word " * 23).trim + " tail")

  private def hof(w: Int, st: Int, chunked: Boolean) = {
    val count = if (chunked) s"(n - 1) DIV $st" else s"greatest((n - $w) DIV $st, 0L)"
    expr(s"transform(sequence(0L, $count), i -> array_join(slice(toks, CAST(i * $st + 1 AS INT), $w), ' '))")
  }

  private def compare(w: Int, st: Int, chunked: Boolean): Unit = {
    val df = edge.toDF("text")
      .union(Tables.documents(spark, "/root/testdata/sf0.001").select(col("text")))
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n", size(col("toks")).cast("long"))
    val native =
      if (chunked) TokenWindows.chunked(col("text"), w, st)
      else TokenWindows.strided(col("text"), w, st)
    val bad = df.select(hof(w, st, chunked).as("h"), native.as("m"))
      .where(not(col("h") <=> col("m"))).count()
    assert(bad === 0, s"w=$w st=$st chunked=$chunked")
  }

  test("strided windows equal the HOF chain (passage shape 20/10)") { compare(20, 10, chunked = false) }
  test("strided windows equal the HOF chain (tight 3/1)") { compare(3, 1, chunked = false) }
  test("chunked windows equal the HOF chain (chunk shape 64/48)") { compare(64, 48, chunked = true) }
  test("chunked windows equal the HOF chain (5/2)") { compare(5, 2, chunked = true) }

  test("token_windows of NULL is NULL") {
    val r = Seq(Option.empty[String]).toDF("text")
      .select(TokenWindows.strided(col("text"), 4, 2)).collect().head
    assert(r.isNullAt(0))
  }
}
