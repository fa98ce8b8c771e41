package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.functions.TextHashes

/** The r21 native hash kernels must be VALUE-IDENTICAL to the HOF
  * formulations they replaced (Dedup.polySql / minhashSignature) — the
  * dedup family's oracle rows hash these values bit-for-bit. */
class TextHashesSpec extends SparkSpec {
  import spark.implicits._

  private val edge = Seq(
    "", "a", "abc", "a b", "a  b", " lead", "trail ", "éx", "😀y", "abé😀",
    "one two three four five", "x" * 200, ("tok " * 50).trim)

  test("poly_hash equals the aggregate(split(s,'')) HOF on edge cases and real docs") {
    val hof = expr(Dedup.polySql("s"))
    val df = edge.toDF("s")
      .union(Tables.documents(spark, "/root/testdata/sf0.001").select(col("text").as("s")))
    val bad = df.select(col("s"), hof.as("h"), TextHashes.polyHash(col("s")).as("n"))
      .where(not(col("h") <=> col("n"))).count()
    assert(bad === 0)
  }

  test("poly_hash of NULL is NULL") {
    val r = Seq(Option.empty[String]).toDF("s")
      .select(TextHashes.polyHash(col("s"))).collect().head
    assert(r.isNullAt(0))
  }

  test("poly_hash_all equals transform(arr, sh -> polySql(sh)) incl. null elements") {
    val df = Seq(
      Seq("a", "bc", ""), Seq.empty[String]
    ).toDF("arr")
      .union(Seq(Tuple1(Seq[String]("x", null, "y"))).toDF("arr"))
    val bad = df.select(
      expr(s"transform(arr, sh -> ${Dedup.polySql("sh")})").as("h"),
      TextHashes.polyHashAll(col("arr")).as("n"))
      .where(not(col("h") <=> col("n"))).count()
    assert(bad === 0)
  }

  test("minhash_sig equals the transform/array_min HOF on real shingle hashes") {
    val k = 32
    val a = (0 until k).map(Dedup.affineA).toArray
    val b = (0 until k).map(Dedup.affineB).toArray
    val aLit = a.mkString("array(", ", ", ")")
    val bLit = b.mkString("array(", ", ", ")")
    val hof = expr(s"transform(sequence(0, ${k - 1}), h -> array_min(transform(" +
      s"basehashes, x -> (element_at($aLit, h + 1) * x + element_at($bLit, h + 1)) % ${Dedup.P})))")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("shingles", Dedup.shingles(col("text")))
      .withColumn("basehashes", TextHashes.polyHashAll(col("shingles")))
    val withEmpty = docs.select("basehashes")
      .union(Seq(Tuple1(Seq.empty[Long])).toDF("basehashes"))
    val bad = withEmpty.select(hof.as("h"),
      TextHashes.minhashSig(col("basehashes"), k, a, b).as("n"))
      .where(not(col("h") <=> col("n"))).count()
    assert(bad === 0)
  }
}
