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

  /** Temperature-scaled source mixing (the multilingual/multi-domain rebalance
    * of XLM-R §3.1 / GPT-3 §2.2: sample source s with probability ∝ size_s^α,
    * α=0.5, size measured in BYTES — the unit production mixes weight by):
    * compute each source's weight, convert the per-source budget into
    * a REPETITION SCHEDULE — n_copies per document, possibly 0 (downsample)
    * or ≥2 (upsample a rare source) — deterministically, so every re-run and
    * every engine draws the identical corpus.
    *
    * Exactness across engines (the distributed-float recipe): sqrt is
    * IEEE-correctly-rounded in both JVMs and C, each sqrt is scaled to
    * micro-unit int64 (floor(x·10⁶+0.5)) and the normalizing sum is INTEGER —
    * order-independent — so the weight division is one double/double op with
    * bit-identical operands. The fractional part of a document's expected
    * copy count is resolved by a second, offset Knuth hash draw (decorrelated
    * from the 10%-sample draw by the +998244353 offset), keeping the whole
    * schedule a pure row-local projection after one tiny per-source agg that
    * BROADCASTS back — the corpus itself never shuffles.
    *
    * 100 TB shape: the per-source table is O(#sources) rows (dozens), the
    * join is a broadcast hash join, and the schedule column costs one hash +
    * compare per row. */
  val qMixTemperature: QueryDef = {
    val budget = 2000.0 // total sampled docs across sources (per-SF literal)
    val drawSql = "((doc_id % 2147483647) * 2654435761 + 998244353) % 1000"
    q("q_mix_temperature")(
      s"""WITH counts AS (
         |  SELECT source, count(*) AS n,
         |         CAST(floor(sqrt(CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS ss
         |  FROM documents GROUP BY source),
         |tot AS (SELECT CAST(sum(ss) AS BIGINT) AS stot FROM counts),
         |rates AS (
         |  SELECT source, n,
         |         ($budget * (CAST(ss AS DOUBLE) / CAST(stot AS DOUBLE)))
         |           / CAST(n AS DOUBLE) AS rate
         |  FROM counts, tot)
         |SELECT d.doc_id, d.source,
         |       CAST(floor(r.rate) AS BIGINT) +
         |         (CASE WHEN $drawSql <
         |            CAST(floor((r.rate - floor(r.rate)) * 1000 + 0.5) AS BIGINT)
         |          THEN 1 ELSE 0 END) AS n_copies
         |FROM documents d JOIN rates r ON d.source = r.source
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val counts = docs.groupBy("source")
        .agg(count(lit(1)).as("n"), sum("n_chars").cast(LongType).as("bytes"))
        .withColumn("ss",
          floor(sqrt(col("bytes").cast(DoubleType)) * 1000000 + lit(0.5)).cast(LongType))
      val total = counts.agg(sum("ss").cast(LongType).as("stot"))
      val rates = counts.crossJoin(broadcast(total))
        .withColumn("rate",
          (lit(budget) * (col("ss").cast(DoubleType) / col("stot").cast(DoubleType)))
            / col("n").cast(DoubleType))
        .select("source", "rate")
      val draw = pmod(pmod(col("doc_id"), lit(2147483647L)) * lit(2654435761L)
        + lit(998244353L), lit(1000L))
      docs.join(broadcast(rates), Seq("source"))
        .select(col("doc_id"), col("source"),
          (floor(col("rate")).cast(LongType) +
            when(draw < floor((col("rate") - floor(col("rate"))) * 1000 + lit(0.5))
              .cast(LongType), 1L).otherwise(0L)).as("n_copies"))
        .orderBy("doc_id")
    }
  }

  val defs: Seq[QueryDef] = Seq(qSampleHash, qSplitAssign, qSampleStratified,
    qMixTemperature)
}
