package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}
import graft.QueryDef.{sql => q}

/** End-to-end training-corpus curation in ONE declarative pipeline — the shape
  * a 100 TB data-prep job actually has, composed from this library's stages:
  *
  *   documents → quality score → keep/review filter → exact dedup survivor
  *   → join embeddings (shared id) → relevance score vs a probe vector
  *   → per-language top-k by relevance
  *
  * One narrow pass for scoring, one fingerprint-keyed shuffle for dedup, a
  * key-partitioned join to attach vectors (ids are co-partitionable), a
  * broadcast probe vector, and one per-language window. Fully oracle-checked:
  * every stage is deterministic SQL-expressible arithmetic.
  */
object CorpusPipeline {

  /** Probe vector for relevance scoring: deterministic unit-ish ramp. */
  private val probe: Array[Double] = Array.tabulate(64)(i => (i + 1) / 64.0)

  val qCorpusPipeline: QueryDef = q("q_corpus_pipeline")({
    val probeLit = probe.map(_.toString).mkString("[", ", ", "]")
    s"""WITH scored AS (
       |  SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS chars,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
       |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS dwords,
       |         sha256(text) AS content_sha
       |  FROM documents),
       |     quality AS (
       |  SELECT *, (CASE WHEN chars BETWEEN 100 AND 2000 THEN 2 WHEN chars >= 50 THEN 1 ELSE 0 END +
       |             CASE WHEN words >= 20 THEN 1 ELSE 0 END +
       |             CASE WHEN CAST(dwords AS DOUBLE) / CAST(words AS DOUBLE) >= 0.3 THEN 1 ELSE 0 END) AS q
       |  FROM scored),
       |     kept AS (SELECT * FROM quality WHERE q >= 2),
       |     dedup AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY content_sha),
       |     joined AS (
       |  SELECT k.doc_id, k.lang, k.q,
       |         list_aggregate(list_transform(list_zip(e.embedding, $probeLit),
       |           p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') AS relevance
       |  FROM dedup d JOIN kept k ON d.doc_id = k.doc_id
       |               JOIN embeddings e ON e.vec_id = k.doc_id),
       |     ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY lang
       |                  ORDER BY relevance DESC, doc_id) AS INTEGER) AS rnk FROM joined)
       |SELECT lang, rnk, doc_id, q, relevance FROM ranked WHERE rnk <= 20
       |ORDER BY lang, rnk""".stripMargin
  }) { (s, d) =>
    val docs = Tables.documents(s, d)
    val words = split(col("text"), " ")
    val chars = length(col("text")).cast(LongType)
    val nWords = size(words).cast(LongType)
    val dWords = size(array_distinct(words)).cast(LongType)
    val quality =
      (when(chars.between(100, 2000), 2).when(chars >= 50, 1).otherwise(0) +
        when(nWords >= 20, 1).otherwise(0) +
        when(dWords.cast(DoubleType) / nWords.cast(DoubleType) >= 0.3, 1).otherwise(0))
    val kept = docs.select(col("doc_id"), col("lang"),
      quality.as("q"), sha2(col("text"), 256).as("content_sha"))
      .where(col("q") >= 2)
    val survivors = kept.groupBy("content_sha").agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val probeCol = array(probe.map(lit(_)).toIndexedSeq: _*)
    val joined = survivors
      .join(kept, "doc_id")
      .join(Tables.embeddings(s, d), col("vec_id") === col("doc_id"))
      .withColumn("relevance", graft.functions.FloatVecDot.fdot(col("embedding"), probeCol))
      .select("doc_id", "lang", "q", "relevance")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("relevance").desc, col("doc_id").asc)
    joined.withColumn("rnk", row_number().over(w).cast(IntegerType)).where(col("rnk") <= 20)
      .select("lang", "rnk", "doc_id", "q", "relevance")
      .orderBy("lang", "rnk")
  }

  val defs: Seq[QueryDef] = Seq(qCorpusPipeline)
}
