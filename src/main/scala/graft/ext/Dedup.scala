package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}
import graft.QueryDef.{sql => q}

/** Training-data deduplication over the `documents` table — exact, MinHash-LSH,
  * SimHash, and n-gram Jaccard. All candidate generation is BUCKETED (band
  * join / signature join), never all-pairs: at 100 TB the only shuffles are
  * keyed on content fingerprints, so work scales with duplicate density, not
  * with n². Hash primitives are codegen'd built-in expressions — no UDFs; the
  * hash family is a seeded 31-base polynomial (not xxhash64) so the DuckDB
  * oracle replays signatures, bands, and candidate sets bit-for-bit.
  *
  * Scale hardening against bucket blowup (the classic 100 TB failure: a
  * boilerplate cluster of k near-identical docs meets in one band bucket and
  * produces k²/2 candidate pairs):
  *  1. exact duplicates are COLLAPSED to one representative (sha256 group)
  *     before any banding, and re-attached as O(k) star edges afterwards;
  *  2. each band bucket keeps at most `bucketCap` docs (deterministic lowest
  *     doc_id order), bounding per-bucket pairs at cap²/2. Both steps are
  *     deterministic, so the oracle SQL replays them too.
  */
object Dedup {

  // ---- SQL-replayable hash primitives ------------------------------------

  /** Modulus for every polynomial/affine hash: keeps all products in int64
    * (a·x ≤ (1e9+6)² < 2⁶³) in both engines. */
  val P = 1000000007L

  /** Affine hash-family constants (family i: x → (aᵢ·x + bᵢ) mod P). Both the
    * Spark expression and the oracle SQL splice the SAME literals, so minhash
    * signatures and simhash bit-draws replay exactly in DuckDB. */
  def affineA(i: Int): Long = ((2L * i + 1) * 2654435761L) % P
  def affineB(i: Int): Long = ((i + 1L) * 998244353L) % P
  private def sparkArr(xs: Seq[Long]): String = xs.mkString("array(", ", ", ")")
  private def duckList(xs: Seq[Long]): String = xs.mkString("([", ", ", "])")

  /** 31-base char-polynomial hash of Spark SQL string expression `e` — the
    * same rolling hash as `q_doc_fingerprint` (TextAnalysis.scala), chosen
    * over xxhash64 because DuckDB has no xxhash64 twin. */
  def polySql(e: String): String =
    s"aggregate(split($e, ''), CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + CAST(ascii(c) AS BIGINT)) % $P)"

  /** DuckDB twin of [[polySql]] — folds the identical character sequence. */
  def polyDuck(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split_regex($e, ''), c -> CAST(ascii(c) AS BIGINT))), (acc, c) -> (acc * 31 + c) % $P)"

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

  /** MinHash signature over a precomputed `basehashes` column (one polynomial
    * hash per shingle): k independent affine-permutation minimums. One pass
    * over the array per row, no shuffle, and exactly replayable in SQL —
    * computed by the native codegen kernel (TextHashes.scala); the HOF twin
    * it replaced is pinned value-equal in TextHashesSpec. */
  def minhashSignature(k: Int): Column =
    graft.functions.TextHashes.minhashSig(col("basehashes"), k,
      (0 until k).map(affineA).toArray, (0 until k).map(affineB).toArray)

  /** Element-wise polynomial hash of an array<string> column — the native
    * twin of `transform(arr, sh -> polySql(sh))`. */
  def polyHashAll(arr: Column): Column = graft.functions.TextHashes.polyHashAll(arr)

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

  /** Near-dup pair SPANNING set (a < b): exact-duplicate star edges
    * (representative → member, Jaccard 1.0 by construction) unioned with
    * Jaccard-verified MinHash pairs over the distinct-content representatives.
    * Connectivity-equivalent to the full pair set — exactly what
    * [[DedupCluster.connectedComponents]] needs — at O(members) instead of
    * O(members²) edges for an exact-duplicate cluster.
    *
    * `bucketCap`: at most this many (lowest-doc_id) docs survive per band
    * bucket — candidates from a pathological near-identical flood are bounded
    * at cap²/2 per bucket; a dropped doc can still pair in its 7 other bands.
    */
  def minhashPairs(docs: DataFrame, k: Int = 32, bands: Int = 8,
                   thresh: Double = 0.5, bucketCap: Int = 64): DataFrame = {
    // 1. collapse exact duplicates: one representative (min doc_id) per sha256
    val withSha = docs.select(col("doc_id"), col("text"))
      .withColumn("sha", sha2(col("text"), 256))
    // texts in a group are identical (sha = sha256(text)), so text can sit in
    // the GROUP KEY: same groups, same shuffle bytes, but no string in the
    // aggregation buffer — which would disqualify HashAggregateExec and force
    // a SortAggregate with a per-partition sort before both agg stages
    val reps = withSha.groupBy("sha", "text")
      .agg(min("doc_id").as("doc_id"))
    val siblings = withSha.join(reps.select(col("sha"), col("doc_id").as("rep_id")), "sha")
      .where(col("doc_id") =!= col("rep_id"))
      .select(col("rep_id").as("a"), col("doc_id").as("b"), lit(1.0).as("jaccard"))
    // 2. shingle → polynomial base hashes → k-minhash over representatives only
    val withSig = reps.select(col("doc_id"), col("text"))
      .withColumn("shingles", shingles(col("text")))
      .withColumn("basehashes", polyHashAll(col("shingles")))
      .withColumn("sig", minhashSignature(k))
    val rowsPerBand = k / bands
    val banded = withSig.select(col("doc_id"), posexplode(
      expr(s"transform(sequence(0, ${bands - 1}), b -> aggregate(slice(sig, b * $rowsPerBand + 1, $rowsPerBand), CAST(7 AS BIGINT), (acc, x) -> (acc * 1000003 + x) % $P))"))
      .as(Seq("band", "band_hash")))
      // 3. deterministic per-bucket cap (shuffles once on the band key either way)
      .withColumn("rn", row_number().over(
        Window.partitionBy("band", "band_hash").orderBy("doc_id")))
      .where(col("rn") <= bucketCap).drop("rn")
    val l = banded.as("l"); val r = banded.as("r")
    val candidates = l.join(r,
        col("l.band") === col("r.band") && col("l.band_hash") === col("r.band_hash") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b")).distinct()
    val sh = withSig.select(col("doc_id"), col("shingles"))
    val verified = candidates
      .join(sh.select(col("doc_id").as("a"), col("shingles").as("sh_a")), "a")
      .join(sh.select(col("doc_id").as("b"), col("shingles").as("sh_b")), "b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b"))).cast(DoubleType))
      .where(col("jaccard") >= thresh)
      .select(col("a"), col("b"), col("jaccard"))
    verified.union(siblings)
  }

  /** DuckDB CTE chain replaying [[minhashPairs]] (ending in `pr(a, b)`, the
    * spanning pair set): sha collapse, shingles, polynomial minhash, band
    * fold, bucket cap, Jaccard verify, star re-attach. Same literals as the
    * Spark expressions, so every intermediate agrees bit-for-bit. Shared by
    * the minhash profile oracle below and DedupCluster's clustering oracle. */
  private[ext] def minhashPairsCtes(k: Int = 32, bands: Int = 8, thresh: Double = 0.5,
                                    bucketCap: Int = 64): String = {
    val a = duckList((0 until k).map(affineA)); val b = duckList((0 until k).map(affineB))
    val rpb = k / bands
    s"""ws AS (SELECT doc_id, text, sha256(text) AS sha FROM documents),
       |     reps AS (SELECT sha, text, min(doc_id) AS doc_id FROM ws GROUP BY sha, text),
       |     sib AS (SELECT r.doc_id AS a, w.doc_id AS b FROM ws w
       |             JOIN reps r ON w.sha = r.sha AND w.doc_id <> r.doc_id),
       |     sh AS (SELECT doc_id, CASE WHEN len(string_split(text, ' ')) >= 3
       |              THEN list_distinct(list_transform(
       |                     generate_series(1, len(string_split(text, ' ')) - 2),
       |                     i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')))
       |              ELSE [text] END AS shingles FROM reps),
       |     bh AS (SELECT doc_id, shingles,
       |              list_transform(shingles, s2 -> ${polyDuck("s2")}) AS basehashes FROM sh),
       |     sg AS (SELECT doc_id, list_transform(generate_series(0, ${k - 1}), h ->
       |              list_aggregate(list_transform(basehashes,
       |                x -> ($a[h + 1] * x + $b[h + 1]) % $P), 'min')) AS sig FROM bh),
       |     bd0 AS (SELECT doc_id, b AS band,
       |              list_reduce(list_prepend(CAST(7 AS BIGINT), list_slice(sig, b * $rpb + 1, b * $rpb + $rpb)),
       |                (acc, x) -> (acc * 1000003 + x) % $P) AS band_hash
       |             FROM sg, generate_series(0, ${bands - 1}) t(b)),
       |     bd AS (SELECT doc_id, band, band_hash FROM
       |              (SELECT doc_id, band, band_hash,
       |                      row_number() OVER (PARTITION BY band, band_hash ORDER BY doc_id) AS rn
       |               FROM bd0) WHERE rn <= $bucketCap),
       |     cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b FROM bd l JOIN bd r
       |              ON l.band = r.band AND l.band_hash = r.band_hash AND l.doc_id < r.doc_id),
       |     ver AS (SELECT c.a, c.b FROM cand c
       |             JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b
       |             WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
       |                   CAST(len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS DOUBLE) >= $thresh),
       |     pr AS (SELECT a, b FROM ver UNION ALL SELECT a, b FROM sib)""".stripMargin
  }

  /** Oracle replaying [[minhashNearDups]]'s doc-level profile end-to-end. */
  private def minhashOracle(): String =
    s"""WITH ${minhashPairsCtes()},
       |     bo AS (SELECT a AS doc_id, b AS dup FROM pr UNION ALL SELECT b, a FROM pr)
       |SELECT d.doc_id, count(bo.dup) AS n_near_dups, min(bo.dup) AS min_dup_id
       |FROM documents d LEFT JOIN bo ON d.doc_id = bo.doc_id
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  /** Fully oracle-checked: DuckDB replays the whole minhash pipeline. */
  val qDedupMinhash: QueryDef = q("q_dedup_minhash")(minhashOracle()) { (s, d) =>
    minhashNearDups(Tables.documents(s, d))
      .orderBy("doc_id")
  }

  /** Spark SQL fragment: per-token polynomial hashes of a text column. */
  private def tokhashesSql(textColName: String): String =
    s"transform(split(`$textColName`, ' '), tok -> ${polySql("tok")})"

  /** 64-bit SimHash body over a token-hash array expression: bit j is the
    * sign of the sum over tokens of ±1 drawn from affine family j — one
    * base hash per token, 64 cheap affine draws per (token, bit). Bits are
    * disjoint, so summing the shifted contributions IS the bitwise OR (bit 63
    * lands on the int64 sign — well-defined two's complement in both
    * engines). */
  private def simhashExpr(tokhashesExpr: String): String = {
    val a = sparkArr((0 until 64).map(affineA)); val b = sparkArr((0 until 64).map(affineB))
    s"""aggregate(sequence(0, 63), CAST(0 AS BIGINT), (acc, j) ->
       |  acc + (CASE WHEN aggregate($tokhashesExpr, CAST(0 AS BIGINT),
       |                 (s2, x) -> s2 + (CASE WHEN ((element_at($a, j + 1) * x + element_at($b, j + 1)) % $P) % 2 = 1
       |                                  THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END)) > 0
       |         THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END))""".stripMargin
  }

  /** SimHash of an arbitrary text column (the column NAME is spliced into
    * the SQL lambda, so callers choose the column). */
  def simhash(textColName: String): Column = expr(simhashExpr(tokhashesSql(textColName)))

  /** Near-dup candidates = equal 16-bit band of the fingerprint, with the
    * same deterministic per-bucket cap as minhash (lowest doc_id survives). */
  def simhashNearDups(docs: DataFrame, bucketCap: Int = 256): DataFrame = {
    val withSim = docs.select(col("doc_id"), col("text"))
      .withColumn("tokhashes", polyHashAll(split(col("text"), " ")))
      .withColumn("simhash", expr(simhashExpr("tokhashes")))
    val banded = withSim.select(col("doc_id"), col("simhash"), posexplode(
      expr("transform(sequence(0, 3), b -> (simhash >> (b * 16)) & 65535L)"))
      .as(Seq("band", "band_val")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("band", "band_val").orderBy("doc_id")))
      .where(col("rn") <= bucketCap).drop("rn")
    val l = banded.as("l"); val r = banded.as("r")
    val cand = l.join(r, col("l.band") === col("r.band") &&
        col("l.band_val") === col("r.band_val") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b")).distinct()
    val pairsBoth = cand.select(col("a").as("doc_id")).union(cand.select(col("b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_candidates"))
    withSim.select("doc_id", "simhash").join(pairsBoth, Seq("doc_id"), "left")
      .withColumn("n_candidates", coalesce(col("n_candidates"), lit(0L)))
  }

  /** DuckDB replay of [[simhashNearDups]]: same token hashes, same 64 affine
    * bit-draws (bit 63 as an explicit int64-min literal — DuckDB rejects
    * 1<<63), same banding, cap, and candidate counts. */
  private def simhashOracle(bucketCap: Int = 256): String = {
    val a = duckList((0 until 64).map(affineA)); val b = duckList((0 until 64).map(affineB))
    s"""WITH th AS (SELECT doc_id, list_transform(string_split(text, ' '),
       |              tok -> ${polyDuck("tok")}) AS tokhashes FROM documents),
       |     sm AS (SELECT doc_id, CAST(list_aggregate(list_transform(generate_series(0, 63), j ->
       |              CASE WHEN CAST(list_aggregate(list_transform(tokhashes, x ->
       |                     CASE WHEN (($a[j + 1] * x + $b[j + 1]) % $P) % 2 = 1 THEN 1 ELSE -1 END),
       |                   'sum') AS BIGINT) > 0
       |                   THEN (CASE WHEN j = 63 THEN CAST(-9223372036854775808 AS BIGINT)
       |                         ELSE CAST(1 AS BIGINT) << j END)
       |                   ELSE CAST(0 AS BIGINT) END), 'sum') AS BIGINT) AS simhash FROM th),
       |     bd0 AS (SELECT doc_id, b AS band, (simhash >> (b * 16)) & 65535 AS band_val
       |             FROM sm, generate_series(0, 3) t(b)),
       |     bd AS (SELECT doc_id, band, band_val FROM
       |              (SELECT doc_id, band, band_val,
       |                      row_number() OVER (PARTITION BY band, band_val ORDER BY doc_id) AS rn
       |               FROM bd0) WHERE rn <= $bucketCap),
       |     cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b FROM bd l JOIN bd r
       |              ON l.band = r.band AND l.band_val = r.band_val AND l.doc_id < r.doc_id),
       |     bo AS (SELECT a AS doc_id FROM cand UNION ALL SELECT b FROM cand),
       |     cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_candidates FROM bo GROUP BY doc_id)
       |SELECT s.doc_id, s.simhash, COALESCE(c.n_candidates, CAST(0 AS BIGINT)) AS n_candidates
       |FROM sm s LEFT JOIN cnt c ON s.doc_id = c.doc_id ORDER BY s.doc_id""".stripMargin
  }

  /** Fully oracle-checked: DuckDB replays the whole simhash pipeline. */
  val qDedupSimhash: QueryDef = q("q_dedup_simhash")(simhashOracle()) { (s, d) =>
    simhashNearDups(Tables.documents(s, d)).orderBy("doc_id")
  }

  /** Exact n-gram (character 5-gram) Jaccard within cheap buckets
    * (lang, length-band), with the same two blowup guards as minhash: exact
    * duplicates collapse to a representative first (star edges at Jaccard
    * 1.0), and each bucket keeps at most `bucketCap` representatives in
    * deterministic doc_id order. A doc lives in exactly ONE bucket here, so
    * the cap is a documented top-N truncation (a dropped doc pairs with
    * nothing) — MinHash above remains the at-scale prefilter. */
  def ngramJaccardDups(docs: DataFrame, n: Int = 5, thresh: Double = 0.4,
                       bucketCap: Int = 64): DataFrame = {
    val withSha = docs.select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      .withColumn("sha", sha2(col("text"), 256))
    val reps = withSha.groupBy("sha").agg(min("doc_id").as("doc_id"),
      min("lang").as("lang"), min("n_chars").as("n_chars"), min("text").as("text"))
    val siblings = withSha.join(reps.select(col("sha"), col("doc_id").as("rep_id")), "sha")
      .where(col("doc_id") =!= col("rep_id"))
      .select(col("rep_id").as("a"), col("doc_id").as("b"), lit(1.0).as("jaccard"))
    val grams = reps.select(col("doc_id"), col("lang"),
        (col("n_chars") / 100).cast(IntegerType).as("len_band"),
        expr(s"array_distinct(transform(sequence(1, greatest(1, length(text) - ${n - 1})), i -> substring(text, i, $n)))").as("grams"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang", "len_band").orderBy("doc_id")))
      .where(col("rn") <= bucketCap).drop("rn")
    val l = grams.as("l"); val r = grams.as("r")
    l.join(r, col("l.lang") === col("r.lang") && col("l.len_band") === col("r.len_band") &&
        col("l.doc_id") < col("r.doc_id"))
      .withColumn("jaccard",
        size(array_intersect(col("l.grams"), col("r.grams"))).cast(DoubleType) /
          size(array_union(col("l.grams"), col("r.grams"))).cast(DoubleType))
      .where(col("jaccard") >= thresh)
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"), col("jaccard"))
      .union(siblings)
  }

  /** Doc-level n-gram Jaccard profile, FULLY oracle-checked: for every doc,
    * the candidate count, best Jaccard, and minimum partner id. Exact
    * duplicates collapse to representatives (star candidates at Jaccard 1.0)
    * and buckets are capped, exactly as in [[ngramJaccardDups]] — pure set
    * arithmetic plus deterministic row_number, so DuckDB reproduces every
    * intermediate exactly (int-ratio divisions are bit-deterministic). */
  val qDedupNgram: QueryDef = q("q_dedup_ngram")(
    """WITH ws AS (SELECT doc_id, lang, n_chars, text, sha256(text) AS sha FROM documents),
      |     reps AS (SELECT sha, min(doc_id) AS doc_id, min(lang) AS lang,
      |                     min(n_chars) AS n_chars, min(text) AS text
      |              FROM ws GROUP BY sha),
      |     sib AS (SELECT r.doc_id AS a, w.doc_id AS b, 1.0 AS jac FROM ws w
      |             JOIN reps r ON w.sha = r.sha AND w.doc_id <> r.doc_id),
      |     g0 AS (SELECT doc_id, lang, CAST(n_chars // 100 AS INTEGER) AS len_band,
      |                  list_distinct(list_transform(
      |                    generate_series(1, greatest(1, CAST(length(text) AS INTEGER) - 4)),
      |                    i -> substr(text, i, 5))) AS grams
      |           FROM reps),
      |     g AS (SELECT doc_id, lang, len_band, grams FROM
      |             (SELECT *, row_number() OVER (PARTITION BY lang, len_band ORDER BY doc_id) AS rn
      |              FROM g0) WHERE rn <= 64),
      |     p0 AS (SELECT l.doc_id AS a, r.doc_id AS b,
      |                  CAST(len(list_intersect(l.grams, r.grams)) AS DOUBLE) /
      |                  CAST(len(list_distinct(list_concat(l.grams, r.grams))) AS DOUBLE) AS jac
      |           FROM g l JOIN g r ON l.lang = r.lang AND l.len_band = r.len_band
      |                            AND l.doc_id < r.doc_id),
      |     p AS (SELECT a, b, jac FROM p0 UNION ALL SELECT a, b, jac FROM sib),
      |     bo AS (SELECT a AS doc_id, b AS partner, jac FROM p
      |            UNION ALL SELECT b, a, jac FROM p)
      |SELECT d.doc_id, count(bo.partner) AS n_cand, max(bo.jac) AS best_jac,
      |       min(bo.partner) AS min_partner
      |FROM documents d LEFT JOIN bo ON d.doc_id = bo.doc_id
      |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val withSha = docs.select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      .withColumn("sha", sha2(col("text"), 256))
    val reps = withSha.groupBy("sha").agg(min("doc_id").as("doc_id"),
      min("lang").as("lang"), min("n_chars").as("n_chars"), min("text").as("text"))
    val siblings = withSha.join(reps.select(col("sha"), col("doc_id").as("rep_id")), "sha")
      .where(col("doc_id") =!= col("rep_id"))
      .select(col("rep_id").as("a"), col("doc_id").as("b"), lit(1.0).as("jac"))
    val grams = reps.select(col("doc_id"), col("lang"),
      (col("n_chars") / 100).cast(IntegerType).as("len_band"),
      expr("array_distinct(transform(sequence(1, greatest(1, length(text) - 4)), i -> substring(text, i, 5)))").as("grams"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang", "len_band").orderBy("doc_id")))
      .where(col("rn") <= 64).drop("rn")
    val l = grams.as("l"); val r = grams.as("r")
    val pairs = l.join(r, col("l.lang") === col("r.lang") &&
        col("l.len_band") === col("r.len_band") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"),
        (size(array_intersect(col("l.grams"), col("r.grams"))).cast(DoubleType) /
          size(array_union(col("l.grams"), col("r.grams"))).cast(DoubleType)).as("jac"))
      .union(siblings)
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

  /** Edit-distance (Levenshtein) near-dup: the character-level complement of
    * the token-set measures above — catches small in-place edits (typo fixes,
    * template variable substitutions) that shift every shingle. Same blowup
    * guards as ngram: exact duplicates collapse to a sha256 representative
    * first (star pairs at distance 0), candidates come from ONE cheap
    * (lang, 50-char length band) bucket each, capped at `bucketCap` in
    * deterministic doc_id order; the distance runs on a `prefixLen`-char
    * prefix so each comparison is O(prefixLen²) regardless of doc size.
    * Both engines implement classic unit-cost Levenshtein → identical ints. */
  def editDistanceDups(docs: DataFrame, prefixLen: Int = 40, maxDist: Int = 10,
                       bucketCap: Int = 64): DataFrame = {
    val withSha = docs.select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      .withColumn("sha", sha2(col("text"), 256))
    val reps = withSha.groupBy("sha").agg(min("doc_id").as("doc_id"),
      min("lang").as("lang"), min("n_chars").as("n_chars"), min("text").as("text"))
    val siblings = withSha.join(reps.select(col("sha"), col("doc_id").as("rep_id")), "sha")
      .where(col("doc_id") =!= col("rep_id"))
      .select(col("rep_id").as("a"), col("doc_id").as("b"), lit(0L).as("dist"))
    val banded = reps.select(col("doc_id"), col("lang"),
        expr("n_chars div 50").as("len_band"),
        substring(col("text"), 1, prefixLen).as("pfx"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang", "len_band").orderBy("doc_id")))
      .where(col("rn") <= bucketCap).drop("rn")
    val l = banded.as("l"); val r = banded.as("r")
    l.join(r, col("l.lang") === col("r.lang") && col("l.len_band") === col("r.len_band") &&
        col("l.doc_id") < col("r.doc_id"))
      .withColumn("dist", levenshtein(col("l.pfx"), col("r.pfx")).cast(LongType))
      .where(col("dist") <= maxDist)
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"), col("dist"))
      .union(siblings)
  }

  /** Doc-level edit-distance profile, fully oracle-checked (same output
    * shape as the ngram profile: candidate count, best distance, min
    * partner). */
  val qDedupEdit: QueryDef = q("q_dedup_edit")(
    """WITH ws AS (SELECT doc_id, lang, n_chars, text, sha256(text) AS sha FROM documents),
      |     reps AS (SELECT sha, min(doc_id) AS doc_id, min(lang) AS lang,
      |                     min(n_chars) AS n_chars, min(text) AS text
      |              FROM ws GROUP BY sha),
      |     sib AS (SELECT r.doc_id AS a, w.doc_id AS b, CAST(0 AS BIGINT) AS dist FROM ws w
      |             JOIN reps r ON w.sha = r.sha AND w.doc_id <> r.doc_id),
      |     g0 AS (SELECT doc_id, lang, n_chars // 50 AS len_band,
      |                   substr(text, 1, 40) AS pfx FROM reps),
      |     g AS (SELECT doc_id, lang, len_band, pfx FROM
      |             (SELECT *, row_number() OVER (PARTITION BY lang, len_band ORDER BY doc_id) AS rn
      |              FROM g0) WHERE rn <= 64),
      |     p0 AS (SELECT l.doc_id AS a, r.doc_id AS b,
      |                   CAST(levenshtein(l.pfx, r.pfx) AS BIGINT) AS dist
      |            FROM g l JOIN g r ON l.lang = r.lang AND l.len_band = r.len_band
      |                             AND l.doc_id < r.doc_id
      |            WHERE levenshtein(l.pfx, r.pfx) <= 10),
      |     p AS (SELECT a, b, dist FROM p0 UNION ALL SELECT a, b, dist FROM sib),
      |     bo AS (SELECT a AS doc_id, b AS partner, dist FROM p
      |            UNION ALL SELECT b, a, dist FROM p)
      |SELECT d.doc_id, count(bo.partner) AS n_near,
      |       min(bo.dist) AS best_dist, min(bo.partner) AS min_partner
      |FROM documents d LEFT JOIN bo ON d.doc_id = bo.doc_id
      |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val pairs = editDistanceDups(Tables.documents(s, d))
    val bo = pairs.select(col("a").as("doc_id"), col("b").as("partner"), col("dist"))
      .union(pairs.select(col("b").as("doc_id"), col("a").as("partner"), col("dist")))
    Tables.documents(s, d).select("doc_id").join(bo, Seq("doc_id"), "left")
      .groupBy("doc_id").agg(count(col("partner")).as("n_near"),
        min(col("dist")).as("best_dist"), min(col("partner")).as("min_partner"))
      .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(qDedupExact, qDedupKeyed, qDedupMinhash,
    qDedupSimhash, qDedupNgram, qDedupEmbedding, qDedupEdit)
}
