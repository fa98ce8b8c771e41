package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}
import graft.QueryDef.{sql => q}
import graft.vt.VersionedTable

/** PERSISTED repeated-passage detection (r14 verdict #2): the
  * [[TextAnalysis.qRepeatedPassages]] materialization boundary made real.
  * The self-contained oracle query evaluates the corpus subtree twice
  * (Catalyst's column pruning specializes the two consumers' partial
  * aggregates, defeating exchange reuse) — fine at test scale, wrong at
  * 100 TB where tokenize+hash dominates. Here the collapsed
  * `(doc_id, h, idxs, cnt)` window-signature relation is a VERSIONED
  * COMPANION TABLE maintained O(increment) per corpus commit
  * ([[CompanionTable.maintain]], the same walk as the dedup signature
  * table), and BOTH consumers — the per-doc census and the cut-list —
  * derive from the persisted relation: the per-byte tokenize+hash runs
  * once per document at ingest, never per consumer, never per screening
  * pass. The shuffles downstream of ingest carry 64-byte digests and
  * tiny ordinal arrays, no window text.
  *
  * Window convention matches [[TextAnalysis.qRepeatedPassages]] exactly
  * (20-token windows, stride 10, trailing window short, ≥2 distinct docs =
  * duplicated), so the derived census/cut-list replay the SAME DuckDB
  * oracles as the self-contained forms — equality of the persisted path
  * with the recompute path IS the maintenance-correctness claim.
  */
object IncrementalPassages {

  private val (w, st) = (20, 10)

  /** Collapsed window-signature rows for a doc set: `(doc_id, h, idxs, cnt)`
    * — sha-256 digest of each stride window, the sorted in-doc window
    * ordinals carrying it, and their count. Row-local per document (the
    * [[CompanionTable.maintain]] contract); the explode never leaves the
    * scan stage, and the input is spread first so a 1-2-file delta doesn't
    * serialize the per-byte work on one core. */
  def passageRows(docs: DataFrame): DataFrame = {
    val spread = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    spread.select(col("doc_id"), col("text"))
      .withColumn("wins", graft.functions.TokenWindows.strided(col("text"), w, st))
      .select(col("doc_id"), posexplode(col("wins")).as(Seq("win_idx", "win")))
      .withColumn("h", sha2(col("win"), 256)).drop("win")
      .groupBy("doc_id", "h")
      .agg(sort_array(collect_list(col("win_idx").cast(LongType))).as("idxs"),
        count(lit(1)).as("cnt"))
  }

  /** Advance the companion PASSAGE TABLE to the corpus table's head:
    * version N of `sigVt` holds [[passageRows]] of every doc in version N
    * of `vt` — O(increment) per append commit. */
  def maintainPassageTable(vt: VersionedTable, sigVt: VersionedTable,
                           branch: String = "main"): Unit =
    CompanionTable.maintain(vt, sigVt, branch)(passageRows)

  /** Per-doc census from the PERSISTED relation — identical output to
    * [[TextAnalysis.qRepeatedPassages]], but the plan reads only the
    * signature table: one hash aggregate for the per-digest doc counts, one
    * keyed join, one per-doc aggregate. No text, no tokenize. */
  def censusFrom(sigs: DataFrame): DataFrame = {
    val byH = sigs.groupBy("h").agg(count(lit(1)).as("nd"))
    sigs.join(byH, "h").groupBy("doc_id")
      .agg(sum("cnt").as("n_windows"),
        sum(when(col("nd") >= 2, col("cnt")).otherwise(0L)).as("n_dup_windows"))
      .select(col("doc_id"), col("n_windows"), col("n_dup_windows"),
        (col("n_dup_windows").cast(DoubleType) / col("n_windows").cast(DoubleType))
          .as("dup_ratio"))
      .orderBy("doc_id")
  }

  /** Cut-list from the PERSISTED relation — identical output to
    * [[TextAnalysis.qRepeatedSpans]]: every duplicated window's (doc,
    * ordinal, 1-based start token, partner-doc count). Output ∝ duplicated
    * spans, input ∝ signature rows, corpus text untouched. */
  def cutListFrom(sigs: DataFrame): DataFrame = {
    val byH = sigs.groupBy("h").agg(count(lit(1)).as("nd"))
    sigs.join(byH.where(col("nd") >= 2), "h")
      .select(col("doc_id"), explode(col("idxs")).as("win_idx"), col("nd"))
      .select(col("doc_id"), col("win_idx"),
        (col("win_idx") * st + 1).as("start_token"), col("nd").as("n_docs"))
      .orderBy("doc_id", "win_idx")
  }

  // ---- oracle rows (split bench timing, like IncrementalDedup) ------------
  // ingest REBUILDS corpus + passage tables on every call (it times the
  // O(corpus)+O(increment) signature build); census/spans reuse the
  // session-cached build and time nothing but the derived consumers.

  private val prebuilt =
    scala.collection.mutable.Map.empty[String, (VersionedTable, VersionedTable)]

  private def builtTables(s: SparkSession, d: String,
                          rebuild: Boolean): (VersionedTable, VersionedTable) =
    synchronized {
      if (rebuild) prebuilt.remove(d)
      prebuilt.getOrElseUpdate(d, {
        val docs = Tables.documents(s, d)
        val tag = Integer.toHexString(d.hashCode & 0x7fffffff)
        val vt = VersionedTable.create(Tables.scratch(s"inc_pass_vt_$tag"))
        val sigVt = VersionedTable.create(Tables.scratch(s"inc_pass_sig_$tag"))
        vt.write(docs.where(col("doc_id") % 5 =!= 0), "main", "v0: corpus snapshot")
        maintainPassageTable(vt, sigVt)
        vt.write(docs.where(col("doc_id") % 5 === 0), "main", "v1: arrival increment",
          mode = "append")
        maintainPassageTable(vt, sigVt)
        (vt, sigVt)
      })
    }

  /** Passage-signature INGEST alone: corpus v0 build + increment append.
    * Output pins the companion relation's per-version cardinality (distinct
    * (doc, window) pairs — the collapse is part of the contract). */
  val qRepeatedIncIngest: QueryDef = q("q_repeated_inc_ingest")(
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
      |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
      |     w0 AS (SELECT doc_id, unnest(list_transform(
      |                     range(0, greatest((n - 20) // 10 + 1, 1)),
      |                     i -> array_to_string(list_slice(toks, i * 10 + 1, i * 10 + 20), ' '))) AS win
      |            FROM t),
      |     w AS (SELECT DISTINCT doc_id, win FROM w0)
      |SELECT CAST(0 AS BIGINT) AS version, count(*) AS n_rows FROM w WHERE doc_id % 5 <> 0
      |UNION ALL
      |SELECT CAST(1 AS BIGINT) AS version, count(*) AS n_rows FROM w
      |ORDER BY version""".stripMargin) { (s, d) =>
    val (_, sigVt) = builtTables(s, d, rebuild = true)
    sigVt.readVersion(s, "main", 0)
      .agg(count(lit(1)).as("n_rows")).select(lit(0L).as("version"), col("n_rows"))
      .unionByName(sigVt.readVersion(s, "main", 1)
        .agg(count(lit(1)).as("n_rows")).select(lit(1L).as("version"), col("n_rows")))
      .orderBy("version")
  }

  /** Census from the persisted relation — SAME oracle as the self-contained
    * q_repeated_passages: the persisted path must reproduce the recompute
    * path bit-for-bit over the full corpus (v1 = all docs). */
  val qRepeatedIncCensus: QueryDef =
    q("q_repeated_inc_census")(TextAnalysis.qRepeatedPassages.oracle.get) { (s, d) =>
      val (_, sigVt) = builtTables(s, d, rebuild = false)
      censusFrom(sigVt.read(s, "main"))
    }

  /** Cut-list from the persisted relation — SAME oracle as the
    * self-contained q_repeated_spans. */
  val qRepeatedIncSpans: QueryDef =
    q("q_repeated_inc_spans")(TextAnalysis.qRepeatedSpans.oracle.get) { (s, d) =>
      val (_, sigVt) = builtTables(s, d, rebuild = false)
      cutListFrom(sigVt.read(s, "main"))
    }

  val defs: Seq[QueryDef] = Seq(qRepeatedIncIngest, qRepeatedIncCensus,
    qRepeatedIncSpans)
}
