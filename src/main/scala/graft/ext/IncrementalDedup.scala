package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}
import graft.QueryDef.{sql => q}
import graft.vt.VersionedTable

/** Incremental corpus dedup: screen an ARRIVAL INCREMENT against an existing
  * versioned corpus snapshot without ever re-pairing the corpus with itself —
  * the shape a continuously-ingesting training-data pipeline actually runs
  * (the reference's lakeFS branch-per-ingest workflow, `README.md:85-127`,
  * composed with the MinHash machinery of [[Dedup]]).
  *
  * The increment is read through [[VersionedTable.changes]]' append-only fast
  * path — the plan scans ONLY the delta files of v0→v1, never the corpus
  * snapshot (commit-metadata decision, zero I/O). Work then scales with the
  * increment: exact screening is a sha semi-join (64-byte keys), near-dup
  * screening bands the increment against the corpus representatives' capped
  * band buckets — increment docs meet only co-bucketed corpus docs, never
  * all of them.
  *
  * Corpus-side signatures are PERSISTED as a companion versioned table
  * ([[maintainSignatureTable]]) maintained per corpus commit from the CDC
  * delta alone — the same O(delta) IVM pattern as `q_vt_incremental`
  * (`ops/Versioned.scala`). The profile therefore never touches corpus TEXT:
  * its plan scans only the signature table plus the increment's delta files
  * (pinned by a VersionedTableSpec inputFiles assertion). Shingling + K
  * minhash passes — the expensive per-byte work — happen exactly once per
  * document, at ingest, not once per screening run.
  *
  * Every stage replays bit-identically in DuckDB over the same corpus /
  * increment split (`doc_id % 5`), so the whole incremental pipeline —
  * exact flags, candidate generation, Jaccard verification — is
  * hash-compared against the oracle, while the versioned read path it runs
  * through is pinned by VersionedTableSpec's CDC tests.
  */
object IncrementalDedup {
  import Dedup.{P, polySql, polyDuck, shingles, minhashSignature, affineA, affineB}

  private val K = 32
  private val Bands = 8
  private val RowsPerBand = K / Bands
  private val Cap = 64
  private val Thresh = 0.5

  private def withSig(df: DataFrame): DataFrame =
    df.withColumn("shingles", shingles(col("text")))
      .withColumn("basehashes", Dedup.polyHashAll(col("shingles")))
      .withColumn("sig", minhashSignature(K))

  private def bandFold: String =
    s"transform(sequence(0, ${Bands - 1}), b -> aggregate(slice(sig, b * $RowsPerBand + 1, " +
      s"$RowsPerBand), CAST(7 AS BIGINT), (acc, x) -> (acc * 1000003 + x) % $P))"

  /** Signature rows for a set of docs: `(doc_id, sha, shingles, sig)` — the
    * text itself is deliberately NOT carried: sha covers exact screening,
    * sig covers banding, shingles cover Jaccard verification of the few
    * candidates. (Storing shingles trades ~text-sized storage for never
    * re-reading candidate docs' text at screening time; persisting only the
    * K-long sig and point-reading candidates is the lower-storage variant.) */
  private def sigRows(docs: DataFrame): DataFrame = {
    // spread the per-byte work (shingling + K minhash folds) across the
    // cluster: the input often arrives as a 1-2 file snapshot/delta whose
    // partitioning would otherwise serialize the signature build on one core
    val spread = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    withSig(spread.select(col("doc_id"), col("text")))
      .withColumn("sha", sha2(col("text"), 256))
      .select("doc_id", "sha", "shingles", "sig")
  }

  /** Advance the companion SIGNATURE TABLE to the corpus table's head:
    * version N of `sigVt` holds `(doc_id, sha, shingles, sig)` for every doc
    * in version N of `vt`. The O(increment) walk — CDC-delta appends,
    * full-snapshot rebuild on non-append intervals, commitRange-bounded
    * catch-up — is the shared [[CompanionTable.maintain]] pattern. */
  def maintainSignatureTable(vt: VersionedTable, sigVt: VersionedTable,
                             branch: String = "main"): Unit =
    CompanionTable.maintain(vt, sigVt, branch)(sigRows)

  /** Profile of one arrival increment against the corpus snapshot:
    * `(doc_id, is_exact_dup, exact_rep, n_near, min_partner)` per increment
    * doc, where near-dup screening runs only for docs that are not already
    * exact duplicates (the standard drop-exact-first cascade). The corpus
    * side is read EXCLUSIVELY from the persisted signature table — the plan
    * never scans corpus text (VersionedTableSpec pins this via inputFiles). */
  def incrementalProfile(docs: DataFrame, scratch: String): DataFrame = {
    val vt = VersionedTable.create(Tables.scratch(scratch))
    val sigVt = VersionedTable.create(Tables.scratch(scratch + "_sigs"))
    vt.write(docs.where(col("doc_id") % 5 =!= 0), "main", "v0: corpus snapshot")
    maintainSignatureTable(vt, sigVt) // one-time O(corpus) build at ingest
    vt.write(docs.where(col("doc_id") % 5 === 0), "main", "v1: arrival increment",
      mode = "append")
    maintainSignatureTable(vt, sigVt) // O(increment) append
    profileAgainstSignatures(vt, sigVt, corpusVersion = 0, incTo = 1)
  }

  /** The screening itself: increment delta (CDC fast path — only v0→v1 delta
    * files) against the signature table at `corpusVersion`. */
  def profileAgainstSignatures(vt: VersionedTable, sigVt: VersionedTable,
                               corpusVersion: Long, incTo: Long): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    // append-only CDC fast path: scans ONLY the increment's delta files
    val inc = vt.changes(spark, "main", corpusVersion, incTo).drop("change_type")
    screenAgainstSignatures(inc, sigVt.readVersion(spark, "main", corpusVersion))
  }

  /** Screen ANY increment DataFrame `(doc_id, text, …)` against a signature
    * snapshot `(doc_id, sha, shingles, sig)`: exact sha semi-join, banded
    * near-dup candidates against capped rep buckets, Jaccard verification —
    * work ∝ increment, corpus text never touched. Shared by the batch oracle
    * row ([[profileAgainstSignatures]]) and the streaming ingest
    * ([[graft.streaming.EventsStreaming.dedupIngestBatch]]). */
  def screenAgainstSignatures(inc: DataFrame, sigs0: DataFrame): DataFrame = {
    // exact-dup collapse on the SIGNATURE table: min doc_id per sha is the
    // representative (primitive agg buffer → HashAggregate), then a self
    // equi-join on doc_id = rep_id recovers the rep's stored shingles/sig —
    // no corpus text is ever read, and nothing is ever re-shingled
    val corpusReps = sigs0.groupBy("sha").agg(min("doc_id").as("rep_id"))
    val corpusSig = sigs0
      .join(corpusReps.select(col("rep_id")), col("doc_id") === col("rep_id"))
      .select(col("rep_id"), col("shingles"), col("sig"))
    val screened = inc.select(col("doc_id"), col("text"))
      .withColumn("sha", sha2(col("text"), 256))
      .join(corpusReps.select(col("sha"), col("rep_id")), Seq("sha"), "left")
    val fresh = screened.where(col("rep_id").isNull).select("doc_id", "text")

    // near-dup screening: increment bands probe the corpus reps' capped buckets
    val corpusBanded = corpusSig
      .select(col("rep_id"), posexplode(expr(bandFold)).as(Seq("band", "band_hash")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("band", "band_hash").orderBy("rep_id")))
      .where(col("rn") <= Cap).drop("rn")
    val incSig = withSig(fresh)
    val incBanded = incSig
      .select(col("doc_id"), posexplode(expr(bandFold)).as(Seq("band", "band_hash")))
    val candidates = incBanded.join(corpusBanded, Seq("band", "band_hash"))
      .select(col("doc_id"), col("rep_id")).distinct()
    val verified = candidates
      .join(incSig.select(col("doc_id"), col("shingles").as("sh_i")), "doc_id")
      .join(corpusSig.select(col("rep_id"), col("shingles").as("sh_c")), "rep_id")
      .withColumn("jaccard",
        size(array_intersect(col("sh_i"), col("sh_c"))).cast(DoubleType) /
          size(array_union(col("sh_i"), col("sh_c"))).cast(DoubleType))
      .where(col("jaccard") >= Thresh)
    val profile = verified.groupBy("doc_id")
      .agg(count(col("rep_id")).as("n_near"), min(col("rep_id")).as("min_partner"))

    screened.select(col("doc_id"), col("rep_id"))
      .join(profile, Seq("doc_id"), "left")
      .select(col("doc_id"), col("rep_id").isNotNull.as("is_exact_dup"),
        col("rep_id").as("exact_rep"),
        coalesce(col("n_near"), lit(0L)).as("n_near"), col("min_partner"))
      .orderBy("doc_id")
  }

  private def oracleSql: String = {
    val a = (0 until K).map(affineA).mkString("([", ", ", "])")
    val b = (0 until K).map(affineB).mkString("([", ", ", "])")
    s"""WITH cw AS (SELECT doc_id, text, sha256(text) AS sha FROM documents WHERE doc_id % 5 <> 0),
       |     creps AS (SELECT sha, text, min(doc_id) AS rep_id FROM cw GROUP BY sha, text),
       |     iw AS (SELECT doc_id, text, sha256(text) AS sha FROM documents WHERE doc_id % 5 = 0),
       |     ex AS (SELECT iw.doc_id, iw.text, creps.rep_id FROM iw
       |            LEFT JOIN creps ON iw.sha = creps.sha),
       |     csh AS (SELECT rep_id, CASE WHEN len(string_split(text, ' ')) >= 3
       |              THEN list_distinct(list_transform(
       |                     generate_series(1, len(string_split(text, ' ')) - 2),
       |                     i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')))
       |              ELSE [text] END AS shingles FROM creps),
       |     cbh AS (SELECT rep_id, shingles,
       |              list_transform(shingles, s2 -> ${polyDuck("s2")}) AS basehashes FROM csh),
       |     csg AS (SELECT rep_id, shingles, list_transform(generate_series(0, ${K - 1}), h ->
       |              list_aggregate(list_transform(basehashes,
       |                x -> ($a[h + 1] * x + $b[h + 1]) % $P), 'min')) AS sig FROM cbh),
       |     cbd0 AS (SELECT rep_id, b AS band,
       |              list_reduce(list_prepend(CAST(7 AS BIGINT),
       |                list_slice(sig, b * $RowsPerBand + 1, b * $RowsPerBand + $RowsPerBand)),
       |                (acc, x) -> (acc * 1000003 + x) % $P) AS band_hash
       |             FROM csg, generate_series(0, ${Bands - 1}) t(b)),
       |     cbd AS (SELECT rep_id, band, band_hash FROM
       |              (SELECT rep_id, band, band_hash,
       |                      row_number() OVER (PARTITION BY band, band_hash ORDER BY rep_id) AS rn
       |               FROM cbd0) WHERE rn <= $Cap),
       |     fresh AS (SELECT doc_id, text FROM ex WHERE rep_id IS NULL),
       |     ish AS (SELECT doc_id, CASE WHEN len(string_split(text, ' ')) >= 3
       |              THEN list_distinct(list_transform(
       |                     generate_series(1, len(string_split(text, ' ')) - 2),
       |                     i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')))
       |              ELSE [text] END AS shingles FROM fresh),
       |     ibh AS (SELECT doc_id, shingles,
       |              list_transform(shingles, s2 -> ${polyDuck("s2")}) AS basehashes FROM ish),
       |     isg AS (SELECT doc_id, shingles, list_transform(generate_series(0, ${K - 1}), h ->
       |              list_aggregate(list_transform(basehashes,
       |                x -> ($a[h + 1] * x + $b[h + 1]) % $P), 'min')) AS sig FROM ibh),
       |     ibd AS (SELECT doc_id, b AS band,
       |              list_reduce(list_prepend(CAST(7 AS BIGINT),
       |                list_slice(sig, b * $RowsPerBand + 1, b * $RowsPerBand + $RowsPerBand)),
       |                (acc, x) -> (acc * 1000003 + x) % $P) AS band_hash
       |             FROM isg, generate_series(0, ${Bands - 1}) t(b)),
       |     cand AS (SELECT DISTINCT i.doc_id, c.rep_id FROM ibd i
       |              JOIN cbd c ON i.band = c.band AND i.band_hash = c.band_hash),
       |     ver AS (SELECT cand.doc_id, cand.rep_id FROM cand
       |             JOIN isg ON isg.doc_id = cand.doc_id
       |             JOIN csg ON csg.rep_id = cand.rep_id
       |             WHERE CAST(len(list_intersect(isg.shingles, csg.shingles)) AS DOUBLE) /
       |                   CAST(len(list_distinct(list_concat(isg.shingles, csg.shingles))) AS DOUBLE)
       |                   >= $Thresh),
       |     prof AS (SELECT doc_id, count(rep_id) AS n_near, min(rep_id) AS min_partner
       |              FROM ver GROUP BY doc_id)
       |SELECT ex.doc_id, (ex.rep_id IS NOT NULL) AS is_exact_dup, ex.rep_id AS exact_rep,
       |       coalesce(prof.n_near, 0) AS n_near, prof.min_partner
       |FROM ex LEFT JOIN prof ON ex.doc_id = prof.doc_id
       |ORDER BY ex.doc_id""".stripMargin
  }

  val qDedupIncremental: QueryDef = q("q_dedup_incremental")(oracleSql) { (s, d) =>
    incrementalProfile(Tables.documents(s, d), "inc_dedup_vt")
  }

  // ---- split bench timing (r12 verdict #4) --------------------------------
  // The combined row above times the ONE-TIME O(corpus) signature ingest plus
  // the screening on every run, which buried the claim that matters — the
  // screen is O(increment). These two entries time the phases separately:
  // ingest REBUILDS the corpus + signature tables on every call (that is
  // what it measures); screen reuses the session-cached build and times
  // nothing but the increment screening. Both are ALSO correctness rows:
  // screen replays the full q_dedup_incremental oracle, ingest pins the
  // signature-table version counts.

  private val prebuilt =
    scala.collection.mutable.Map.empty[String, (VersionedTable, VersionedTable)]

  private def builtTables(s: org.apache.spark.sql.SparkSession, d: String,
                          rebuild: Boolean): (VersionedTable, VersionedTable) =
    synchronized {
      if (rebuild) prebuilt.remove(d)
      prebuilt.getOrElseUpdate(d, {
        val docs = Tables.documents(s, d)
        val tag = Integer.toHexString(d.hashCode & 0x7fffffff)
        val vt = VersionedTable.create(Tables.scratch(s"inc_dedup_ing_$tag"))
        val sigVt = VersionedTable.create(Tables.scratch(s"inc_dedup_sig_$tag"))
        vt.write(docs.where(col("doc_id") % 5 =!= 0), "main", "v0: corpus snapshot")
        maintainSignatureTable(vt, sigVt)
        vt.write(docs.where(col("doc_id") % 5 === 0), "main", "v1: arrival increment",
          mode = "append")
        maintainSignatureTable(vt, sigVt)
        (vt, sigVt)
      })
    }

  /** Signature INGEST alone: corpus v0 build + increment append, signatures
    * maintained per commit. Output pins the companion table's shape. */
  val qDedupIncIngest: QueryDef = q("q_dedup_inc_ingest")(
    """SELECT CAST(0 AS BIGINT) AS version, count(*) AS n_sigs
      |FROM documents WHERE doc_id % 5 <> 0
      |UNION ALL
      |SELECT CAST(1 AS BIGINT) AS version, count(*) AS n_sigs FROM documents
      |ORDER BY version""".stripMargin) { (s, d) =>
    val (_, sigVt) = builtTables(s, d, rebuild = true)
    sigVt.readVersion(s, "main", 0)
      .agg(count(lit(1)).as("n_sigs")).select(lit(0L).as("version"), col("n_sigs"))
      .unionByName(sigVt.readVersion(s, "main", 1)
        .agg(count(lit(1)).as("n_sigs")).select(lit(1L).as("version"), col("n_sigs")))
      .orderBy("version")
  }

  /** SCREEN alone: the per-increment work a standing pipeline actually pays —
    * sha semi-join + banded candidates + Jaccard verify against the
    * PERSISTED signatures; the corpus text is never read (inputFiles-pinned
    * in VersionedTableSpec). Same oracle as the combined row. */
  val qDedupIncScreen: QueryDef = q("q_dedup_inc_screen")(oracleSql) { (s, d) =>
    val (vt, sigVt) = builtTables(s, d, rebuild = false)
    profileAgainstSignatures(vt, sigVt, corpusVersion = 0, incTo = 1)
  }

  val defs: Seq[QueryDef] = Seq(qDedupIncremental, qDedupIncIngest, qDedupIncScreen)
}
