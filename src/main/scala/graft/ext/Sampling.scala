package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}
import graft.QueryDef.{sql => q}

/** Deterministic sampling and split assignment over `documents` — the
  * reproducibility workhorses of a training-data pipeline. Spark's own
  * `df.sample` draws from a partition-dependent RNG (irreproducible across
  * cluster layouts and unreplayable in SQL), so all three operators below
  * use a multiplicative hash of the STABLE doc_id instead:
  *
  *   bucket(id) = ((id mod (2^31-1)) * 2654435761) mod 1000
  *
  * (Knuth multiplicative hash, with the id pre-reduced mod the Mersenne
  * prime 2^31-1 so the product is at most ~5.7e18 < 2^63-1 for ANY int64
  * id: without the reduction, `id * 2654435761` overflows for ids ≥ ~4.3e9
  * — Spark would wrap silently, changing the sample's composition, while
  * DuckDB raises an overflow error. The reduction keeps both engines exact
  * and in agreement at any id scale.)
  *
  * The draw is a pure row-local projection — no shuffle, no RNG state, the
  * same rows selected on 1 executor or 1000 — and DuckDB replays it exactly.
  */
object Sampling {

  /** Knuth multiplicative-hash bucket in [0, 1000), overflow-safe for all
    * non-negative int64 ids (see the pre-reduction note above). */
  def hashBucket(id: Column): Column =
    pmod(pmod(id, lit(2147483647L)) * lit(2654435761L), lit(1000L))

  private val bucketSql = "(doc_id % 2147483647) * 2654435761 % 1000"

  /** 10% reproducible sample: keep rows whose bucket falls below 100. */
  val qSampleHash: QueryDef = q("q_sample_hash")(
    s"""SELECT doc_id, lang, $bucketSql AS bucket FROM documents
       |WHERE $bucketSql < 100 ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .withColumn("bucket", hashBucket(col("doc_id")))
      .where(col("bucket") < 100)
      .select("doc_id", "lang", "bucket")
      .orderBy("doc_id")
  }

  /** Deterministic train/val/test assignment (80/10/10 by hash bucket):
    * every re-run, every cluster size, every engine assigns each doc to the
    * same split — the property that keeps eval sets uncontaminated when the
    * corpus is re-processed. */
  val qSplitAssign: QueryDef = q("q_split_assign")(
    s"""SELECT doc_id,
       |       CASE WHEN $bucketSql < 800 THEN 'train'
       |            WHEN $bucketSql < 900 THEN 'val'
       |            ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val b = hashBucket(col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        when(b < 800, "train").when(b < 900, "val").otherwise("test").as("split"))
      .orderBy("doc_id")
  }

  /** Stratified sample: exactly min(50, |stratum|) docs per language, chosen
    * in hash order (NOT doc_id order, which would bias toward old docs).
    * One shuffle on the stratum key; the per-group top-k plans as
    * WindowGroupLimit (map-side heaps), not a full sort of the corpus. */
  val qSampleStratified: QueryDef = q("q_sample_stratified")(
    s"""SELECT doc_id, lang FROM (
       |  SELECT doc_id, lang,
       |         row_number() OVER (PARTITION BY lang
       |                            ORDER BY $bucketSql, doc_id) AS rn
       |  FROM documents) WHERE rn <= 50 ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(hashBucket(col("doc_id")), col("doc_id"))))
      .where(col("rn") <= 50)
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(qSampleHash, qSplitAssign, qSampleStratified)
}
