package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}
import graft.QueryDef.{sql => q, rowsOnly}

/** Training-data deduplication over the `documents` table — exact, MinHash-LSH,
  * SimHash, and n-gram Jaccard. All candidate generation is BUCKETED (band
  * join / signature join), never all-pairs: at 100 TB the only shuffles are
  * keyed on content fingerprints, so work scales with duplicate density, not
  * with n². Hash primitives are Spark's codegen'd `sha2`/`xxhash64` — no UDFs.
  */
object Dedup {

  /** Exact dedup: group on a content fingerprint (sha256) and keep the lowest
    * doc_id — the survivor rule common in corpus pipelines. Hashing first
    * means the shuffle carries 64-byte keys, not document bodies. */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.withColumn("content_sha", sha2(col("text"), 256))
      .groupBy("content_sha").agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))

  val qDedupExact: QueryDef = q("q_dedup_exact")(
    """SELECT sha256(text) AS content_sha, min(doc_id) AS doc_id, count(*) AS n_copies
      |FROM documents GROUP BY sha256(text) ORDER BY doc_id""".stripMargin) { (s, d) =>
    exactDedup(Tables.documents(s, d))
      .select("content_sha", "doc_id", "n_copies").orderBy("doc_id")
  }

  /** Keyed dedup (`dropDuplicates(keys)` semantics with a deterministic
    * survivor): one row per (lang, source), keeping the lowest doc_id. */
  val qDedupKeyed: QueryDef = q("q_dedup_keyed")(
    """SELECT lang, source, min(doc_id) AS doc_id, count(*) AS n_in_group
      |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin) { (s, d) =>
    Tables.documents(s, d).groupBy("lang", "source")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_in_group"))
      .orderBy("lang", "source")
  }

  /** Word 3-shingles of the given text column (falls back to the whole text
    * when shorter), deduplicated per document. Built from the passed Column —
    * works over any string expression, not just a column named `text`. */
  def shingles(text: Column): Column = {
    val toks = split(text, " ")
    array_distinct(when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", slice(toks, i, lit(3)))))
      .otherwise(array(text)))
  }

  /** MinHash signature: k independent minimums of `xxhash64(shingle, seed)`.
    * One pass over the shingle array per row, no shuffle. */
  def minhashSignature(k: Int): Column =
    expr(s"transform(sequence(0, ${k - 1}), h -> aggregate(shingles, 9223372036854775807L, (acc, sh) -> least(acc, xxhash64(sh, h))))")

  /** MinHash + LSH banding near-dup detection (SURVEY.md §7 step 6).
    *
    * shingle → k=32 minhash → 8 bands × 4 rows → band-bucket join →
    * exact-Jaccard verification of candidates only. Returns doc-level
    * `(doc_id, n_near_dups, min_dup_id)`; thresh is the verified Jaccard cut.
    *
    * Scale: candidate generation shuffles on (band, band_hash) — duplicate
    * clusters co-locate, disjoint docs never meet. The Jaccard verify join
    * re-shuffles only candidate doc_ids (a tiny fraction of the corpus).
    */
  def minhashNearDups(docs: DataFrame, k: Int = 32, bands: Int = 8,
                      thresh: Double = 0.5): DataFrame = {
    val verified = minhashPairs(docs, k, bands, thresh)
    val pairsBoth = verified.select(col("a").as("doc_id"), col("b").as("dup"))
      .union(verified.select(col("b").as("doc_id"), col("a").as("dup")))
    docs.select("doc_id").join(pairsBoth, Seq("doc_id"), "left")
      .groupBy("doc_id")
      .agg(count(col("dup")).as("n_near_dups"), min(col("dup")).as("min_dup_id"))
  }

  /** Verified near-dup pairs (a < b, exact Jaccard >= thresh) — the edge list
    * consumed by [[DedupCluster.connectedComponents]]. */
  def minhashPairs(docs: DataFrame, k: Int = 32, bands: Int = 8,
                   thresh: Double = 0.5): DataFrame = {
    val withSig = docs.select(col("doc_id"), col("text"))
      .withColumn("shingles", shingles(col("text")))
      .withColumn("sig", minhashSignature(k))
    val rowsPerBand = k / bands
    val banded = withSig.select(col("doc_id"), posexplode(
      expr(s"transform(sequence(0, ${bands - 1}), b -> xxhash64(concat_ws(',', transform(slice(sig, b * $rowsPerBand + 1, $rowsPerBand), x -> cast(x AS STRING)))))"))
      .as(Seq("band", "band_hash")))
    val l = banded.as("l"); val r = banded.as("r")
    val candidates = l.join(r,
        col("l.band") === col("r.band") && col("l.band_hash") === col("r.band_hash") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b")).distinct()
    val sh = withSig.select(col("doc_id"), col("shingles"))
    candidates
      .join(sh.select(col("doc_id").as("a"), col("shingles").as("sh_a")), "a")
      .join(sh.select(col("doc_id").as("b"), col("shingles").as("sh_b")), "b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b"))).cast(DoubleType))
      .where(col("jaccard") >= thresh)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Not SQL-oracle-expressible (xxhash64 has no DuckDB twin) — rows-only
    * here; planted-duplicate recall is asserted in DedupSpec. */
  val qDedupMinhash: QueryDef = rowsOnly("q_dedup_minhash") { (s, d) =>
    minhashNearDups(Tables.documents(s, d))
      .orderBy("doc_id")
  }

  /** 64-bit SimHash from whitespace tokens: per token take xxhash64, add ±1
    * per bit position, sign-collapse to a fingerprint. Near-dups = equal
    * 16-bit band of the fingerprint (Hamming-adjacent candidates). The input
    * column NAME is spliced into the SQL lambda (variable bit-shifts have no
    * DSL form), so callers choose the column instead of it being hardcoded. */
  def simhash(textColName: String): Column =
    expr(s"""aggregate(sequence(0, 63), cast(0L AS BIGINT), (acc, j) ->
      |  acc | (CASE WHEN aggregate(split(`$textColName`, ' '), 0L,
      |                 (s, tok) -> s + (CASE WHEN ((xxhash64(tok) >> j) & 1L) = 1L THEN 1L ELSE -1L END)) > 0
      |         THEN shiftleft(1L, j) ELSE 0L END))""".stripMargin)

  def simhashNearDups(docs: DataFrame): DataFrame = {
    val withSim = docs.select(col("doc_id"), col("text"))
      .withColumn("simhash", simhash("text"))
    val banded = withSim.select(col("doc_id"), col("simhash"), posexplode(
      expr("transform(sequence(0, 3), b -> (simhash >> (b * 16)) & 65535L)"))
      .as(Seq("band", "band_val")))
    val l = banded.as("l"); val r = banded.as("r")
    val cand = l.join(r, col("l.band") === col("r.band") &&
        col("l.band_val") === col("r.band_val") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b")).distinct()
    val pairsBoth = cand.select(col("a").as("doc_id")).union(cand.select(col("b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_candidates"))
    withSim.select("doc_id", "simhash").join(pairsBoth, Seq("doc_id"), "left")
      .withColumn("n_candidates", coalesce(col("n_candidates"), lit(0L)))
  }

  val qDedupSimhash: QueryDef = rowsOnly("q_dedup_simhash") { (s, d) =>
    simhashNearDups(Tables.documents(s, d)).orderBy("doc_id")
  }

  /** Exact n-gram (character 5-gram) Jaccard within cheap buckets
    * (lang, length-band): the bucketing bounds the pair count; the verify is
    * exact set Jaccard via array_intersect/union. MinHash above is the
    * at-scale prefilter; this is the precise variant for bounded buckets. */
  def ngramJaccardDups(docs: DataFrame, n: Int = 5, thresh: Double = 0.4): DataFrame = {
    val grams = docs.select(col("doc_id"), col("lang"),
        (col("n_chars") / 100).cast(IntegerType).as("len_band"),
        expr(s"array_distinct(transform(sequence(1, greatest(1, length(text) - ${n - 1})), i -> substring(text, i, $n)))").as("grams"))
    val l = grams.as("l"); val r = grams.as("r")
    l.join(r, col("l.lang") === col("r.lang") && col("l.len_band") === col("r.len_band") &&
        col("l.doc_id") < col("r.doc_id"))
      .withColumn("jaccard",
        size(array_intersect(col("l.grams"), col("r.grams"))).cast(DoubleType) /
          size(array_union(col("l.grams"), col("r.grams"))).cast(DoubleType))
      .where(col("jaccard") >= thresh)
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"), col("jaccard"))
  }

  /** Doc-level n-gram Jaccard profile, FULLY oracle-checked: for every doc,
    * the candidate count, best Jaccard, and minimum partner id among its
    * (lang, length-band) bucket — pure set arithmetic, so DuckDB reproduces
    * it exactly (int-ratio divisions are bit-deterministic). */
  val qDedupNgram: QueryDef = q("q_dedup_ngram")(
    """WITH g AS (SELECT doc_id, lang, CAST(n_chars // 100 AS INTEGER) AS len_band,
      |                  list_distinct(list_transform(
      |                    generate_series(1, greatest(1, CAST(length(text) AS INTEGER) - 4)),
      |                    i -> substr(text, i, 5))) AS grams
      |           FROM documents),
      |     p AS (SELECT l.doc_id AS a, r.doc_id AS b,
      |                  CAST(len(list_intersect(l.grams, r.grams)) AS DOUBLE) /
      |                  CAST(len(list_distinct(list_concat(l.grams, r.grams))) AS DOUBLE) AS jac
      |           FROM g l JOIN g r ON l.lang = r.lang AND l.len_band = r.len_band
      |                            AND l.doc_id < r.doc_id),
      |     bo AS (SELECT a AS doc_id, b AS partner, jac FROM p
      |            UNION ALL SELECT b, a, jac FROM p)
      |SELECT d.doc_id, count(bo.partner) AS n_cand, max(bo.jac) AS best_jac,
      |       min(bo.partner) AS min_partner
      |FROM documents d LEFT JOIN bo ON d.doc_id = bo.doc_id
      |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val grams = docs.select(col("doc_id"), col("lang"),
      (col("n_chars") / 100).cast(IntegerType).as("len_band"),
      expr("array_distinct(transform(sequence(1, greatest(1, length(text) - 4)), i -> substring(text, i, 5)))").as("grams"))
    val l = grams.as("l"); val r = grams.as("r")
    val pairs = l.join(r, col("l.lang") === col("r.lang") &&
        col("l.len_band") === col("r.len_band") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"),
        (size(array_intersect(col("l.grams"), col("r.grams"))).cast(DoubleType) /
          size(array_union(col("l.grams"), col("r.grams"))).cast(DoubleType)).as("jac"))
    val both = pairs.select(col("a").as("doc_id"), col("b").as("partner"), col("jac"))
      .union(pairs.select(col("b").as("doc_id"), col("a").as("partner"), col("jac")))
    docs.select("doc_id").join(both, Seq("doc_id"), "left")
      .groupBy("doc_id")
      .agg(count(col("partner")).as("n_cand"), max(col("jac")).as("best_jac"),
        min(col("partner")).as("min_partner"))
      .orderBy("doc_id")
  }

  /** Embedding-cosine near-dup: sign-LSH bucket (8 deterministic seed-42
    * hyperplanes) then exact cosine within bucket — same shape as
    * Similarity.annTopK. FULLY oracle-checked: the planes are literals, both
    * engines fold the 64 products in index order, so bucket signs and cosine
    * values are bit-identical and DuckDB replays the whole pipeline. */
  val qDedupEmbedding: QueryDef = q("q_dedup_embedding")({
    def duckDot(a: String, plane: Array[Double]): String = {
      val lit = plane.map(_.toString).mkString("[", ", ", "]")
      s"list_aggregate(list_transform(list_zip($a, $lit), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"
    }
    val bucketSql = Similarity.hyperplanes().zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN ${duckDot("embedding", p)} >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    def dotSelf(x: String) =
      s"list_aggregate(list_transform($x, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), 'sum')"
    val cosSql =
      s"""(list_aggregate(list_transform(list_zip(l.embedding, r.embedding),
         |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') /
         |  (sqrt(${dotSelf("l.embedding")}) * sqrt(${dotSelf("r.embedding")})))""".stripMargin
    s"""WITH b AS (SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings),
       |     p AS (SELECT l.vec_id AS a, r.vec_id AS b2, $cosSql AS cos
       |           FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id),
       |     f AS (SELECT * FROM p WHERE cos >= 0.95),
       |     bo AS (SELECT a AS vec_id, b2 AS partner FROM f UNION ALL SELECT b2, a FROM f)
       |SELECT e.vec_id, count(bo.partner) AS n_near
       |FROM embeddings e LEFT JOIN bo ON e.vec_id = bo.vec_id
       |GROUP BY e.vec_id ORDER BY e.vec_id""".stripMargin
  }) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val bucketed = emb.withColumn("bucket", Similarity.lshBucket(col("embedding")))
    val l = bucketed.as("l"); val r = bucketed.as("r")
    val pairs = l.join(r, col("l.bucket") === col("r.bucket") && col("l.vec_id") < col("r.vec_id"))
      .withColumn("cos", Similarity.cosine(col("l.embedding"), col("r.embedding")))
      .where(col("cos") >= 0.95)
      .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"))
    val both = pairs.select(col("a").as("vec_id"), col("b").as("partner"))
      .union(pairs.select(col("b").as("vec_id"), col("a").as("partner")))
    emb.select("vec_id").join(both, Seq("vec_id"), "left")
      .groupBy("vec_id").agg(count(col("partner")).as("n_near"))
      .orderBy("vec_id")
  }

  val defs: Seq[QueryDef] = Seq(qDedupExact, qDedupKeyed, qDedupMinhash,
    qDedupSimhash, qDedupNgram, qDedupEmbedding)
}
