package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}
import graft.QueryDef.{sql => q}

/** Training-corpus curation operators (round 8): the filters and transforms
  * a production pretraining pipeline runs between raw crawl and tokenizer —
  * PII redaction, C4-style blocklist filtering, Gopher-style repetition
  * signals, inverse-DF term weighting, and context-window sequence packing.
  * Every op is row-local or one keyed shuffle; the packing window is
  * per-shard (the distributed packing recipe), never single-partition.
  */
object Curation {

  /** RE2-safe patterns (no backrefs/lookaround): identical semantics in
    * Java's regex and DuckDB's RE2. */
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** PII redaction: mask emails and phone numbers, count what was masked —
    * the audit trail a compliance pass needs. Pure row-local regex
    * (codegen'd), no shuffle; the corpus streams through once. */
  val qPiiRedact: QueryDef = q("q_pii_redact")(
    s"""SELECT doc_id,
       |       regexp_replace(regexp_replace(text, '$emailRe', '<EMAIL>', 'g'),
       |                      '$phoneRe', '<PHONE>', 'g') AS redacted,
       |       CAST(len(regexp_extract_all(text, '$emailRe')) AS INTEGER) AS n_emails,
       |       CAST(len(regexp_extract_all(text, '$phoneRe')) AS INTEGER) AS n_phones
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        regexp_replace(regexp_replace(col("text"), lit(emailRe), lit("<EMAIL>")),
          lit(phoneRe), lit("<PHONE>")).as("redacted"),
        regexp_count(col("text"), lit(emailRe)).cast(IntegerType).as("n_emails"),
        regexp_count(col("text"), lit(phoneRe)).cast(IntegerType).as("n_phones"))
      .orderBy("doc_id")
  }

  /** C4-style blocklist filter: flag documents whose text contains any
    * blocklisted term as a whole word. One alternation regex — a 10k-term
    * production list compiles the same way (or becomes a token semi-join,
    * which q_decontaminate already exercises). */
  private val blockRe = "\\b(casino|jackpot|lottery|viagra)\\b"

  val qBlocklist: QueryDef = q("q_blocklist")(
    s"""SELECT doc_id,
       |       regexp_matches(lower(text), '$blockRe') AS blocked,
       |       CAST(len(regexp_extract_all(lower(text), '$blockRe')) AS INTEGER) AS n_hits
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        lower(col("text")).rlike(blockRe).as("blocked"),
        regexp_count(lower(col("text")), lit(blockRe)).cast(IntegerType).as("n_hits"))
      .orderBy("doc_id")
  }

  /** Gopher-style repetition signal: fraction of duplicated word 3-grams per
    * document (1 - distinct/total). High values mark boilerplate/spam for
    * the quality gate. Row-local array ops — unlike [[Dedup.shingles]] the
    * gram list here is NOT deduplicated (the duplication IS the signal). */
  val qRepetitionRatio: QueryDef = q("q_repetition_ratio")(
    """WITH t AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      |           FROM documents),
      |     g AS (SELECT doc_id,
      |                  CASE WHEN len(toks) >= 3
      |                       THEN list_transform(range(1, len(toks) - 1),
      |                              i -> array_to_string(list_slice(toks, i, i + 2), ' '))
      |                       ELSE [array_to_string(toks, ' ')] END AS grams
      |           FROM t)
      |SELECT doc_id,
      |       CAST(len(grams) AS INTEGER) AS n_grams,
      |       CAST(len(list_distinct(grams)) AS INTEGER) AS n_distinct,
      |       CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE) / len(grams) AS rep_ratio
      |FROM g ORDER BY doc_id""".stripMargin) { (s, d) =>
    val toks = filter(split(lower(col("text")), " "), x => x =!= "")
    val grams = when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", slice(toks, i, lit(3)))))
      .otherwise(array(concat_ws(" ", toks)))
    Tables.documents(s, d)
      .select(col("doc_id"), grams.as("grams"))
      .select(col("doc_id"),
        size(col("grams")).as("n_grams"),
        size(array_distinct(col("grams"))).as("n_distinct"),
        ((size(col("grams")) - size(array_distinct(col("grams")))).cast(DoubleType) /
          size(col("grams"))).as("rep_ratio"))
      .orderBy("doc_id")
  }

  /** Top-3 characteristic terms per document by tf × inverse-DF, with an
    * INTEGER weighting (tf * (1e6 div df)) instead of `tf*ln(N/df)` — same
    * ranking monotonicity, but integer division is bit-identical across
    * engines while libm's `ln` is not. Plan: one explode + two keyed aggs +
    * a broadcast-sized df join + a per-doc top-k window (WindowGroupLimit →
    * map-side heaps). */
  val qTfidfTerms: QueryDef = q("q_tfidf_terms")(
    """WITH toks AS (SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS term
      |              FROM documents),
      |     tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
      |     df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
      |     scored AS (SELECT tf.doc_id, tf.term,
      |                       CAST(tf.tf * (1000000 // df.df) AS BIGINT) AS score
      |                FROM tf JOIN df ON tf.term = df.term),
      |     ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
      |                                 ORDER BY score DESC, term) AS INTEGER) AS rnk
      |                FROM scored)
      |SELECT doc_id, term, score, rnk FROM ranked WHERE rnk <= 3
      |ORDER BY doc_id, rnk""".stripMargin) { (s, d) =>
    // r21: spread the single-split documents scan so tokenize+explode runs
    // on every core (a 5 GB corpus file is still ≤ a few splits — the
    // repartition is what parallelizes the per-byte work at any scale), and
    // derive df FROM tf instead of re-tokenizing: tf has exactly one row per
    // (doc_id, term), so count(*) over a term window IS countDistinct(doc_id)
    // — expressed as a window (not a self-join) so the tokenize+aggregate
    // subtree is computed ONCE instead of twice (guide §2.3/§2.4).
    val docs = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
    val toks = docs
      .select(col("doc_id"),
        explode(filter(split(lower(col("text")), " "), x => x =!= "")).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .select(col("doc_id"), col("term"),
        expr("CAST(tf * (1000000L div df) AS BIGINT)").as("score"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rnk", row_number().over(w).cast(IntegerType)).where(col("rnk") <= 3)
      .select("doc_id", "term", "score", "rnk")
      .orderBy("doc_id", "rnk")
  }

  /** Context-window sequence packing: stream documents in id order, assign
    * each to the 2048-token window its cumulative offset falls in —
    * concat-and-chunk packing, sharded. The running sum is per-shard
    * (PARTITION BY doc_id % 8), which is exactly how distributed packing
    * runs in production (each worker packs its shard); pack ids are made
    * globally unique by prefixing the shard. No single-partition window. */
  val qPackSequences: QueryDef = q("q_pack_sequences")(
    """WITH t AS (SELECT doc_id, CAST(doc_id % 8 AS BIGINT) AS shard,
      |                  CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS BIGINT) AS n_tokens
      |           FROM documents),
      |     o AS (SELECT doc_id, shard, n_tokens,
      |                  CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      |                                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |                         - n_tokens AS BIGINT) AS offset_in_shard
      |           FROM t)
      |SELECT doc_id, shard, n_tokens, offset_in_shard,
      |       CAST(shard * 1000000 + offset_in_shard // 2048 AS BIGINT) AS pack_id
      |FROM o ORDER BY doc_id""".stripMargin) { (s, d) =>
    val toks = size(filter(split(lower(col("text")), " "), x => x =!= "")).cast(LongType)
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"), pmod(col("doc_id"), lit(8)).cast(LongType).as("shard"),
        toks.as("n_tokens"))
      .withColumn("offset_in_shard", sum("n_tokens").over(w) - col("n_tokens"))
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("offset_in_shard"),
        expr("shard * 1000000L + (offset_in_shard div 2048)").as("pack_id"))
      .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(qPiiRedact, qBlocklist, qRepetitionRatio,
    qTfidfTerms, qPackSequences)
}
