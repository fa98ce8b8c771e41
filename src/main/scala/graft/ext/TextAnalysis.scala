package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}
import graft.QueryDef.{sql => q, rowsOnly}

/** Text analysis over `documents` — the per-document statistics a training
  * corpus pipeline computes before filtering: length/word stats, quality
  * scoring, language-ID, token counting, fingerprinting. Everything is
  * row-local built-in expressions (one narrow pass, no shuffle except the
  * final presentation sort), so the operators are embarrassingly parallel at
  * any scale.
  */
object TextAnalysis {

  /** Core per-doc stats: chars, whitespace words, distinct words, uniqueness. */
  val qTextStats: QueryDef = q("q_text_stats")(
    """SELECT doc_id, CAST(length(text) AS BIGINT) AS chars,
      |       CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
      |       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS distinct_words,
      |       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
      |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS uniq_ratio
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val words = split(col("text"), " ")
    Tables.documents(s, d).select(col("doc_id"),
      length(col("text")).cast(LongType).as("chars"),
      size(words).cast(LongType).as("words"),
      size(array_distinct(words)).cast(LongType).as("distinct_words"),
      (size(array_distinct(words)).cast(DoubleType) / size(words).cast(DoubleType))
        .as("uniq_ratio"))
      .orderBy("doc_id")
  }

  /** Marker tokens per language for the n-gram/stopword language-ID
    * heuristic. Deliberately tiny — the point is the operator shape
    * (score-per-language then argmax), not lexicon quality. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "fr" -> Seq("le", "la", "et"),
    "de" -> Seq("der", "die", "und"),
    "es" -> Seq("el", "los", "y"),
    "zh" -> Seq("的", "是", "了"))

  private def markerScore(markers: Seq[String]): Column =
    markers.map(m => size(filter(split(col("text"), " "), t => t === lit(m))))
      .reduce(_ + _).cast(LongType)

  /** Language-ID: count marker-token hits per language, argmax with a fixed
    * tie order (first language in [[langMarkers]] order wins). Row-local; the
    * per-language scores are also emitted so the oracle pins the whole
    * computation, not just the argmax. */
  val qLangId: QueryDef = q("q_lang_id")({
    val langs = langMarkers.map(_._1)
    val scoreSql = langMarkers.map { case (lg, ms) =>
      val terms = ms.map(m => s"len(list_filter(string_split(text, ' '), t -> t = '$m'))").mkString(" + ")
      s"CAST($terms AS BIGINT) AS score_$lg"
    }.mkString(",\n       ")
    val g = s"greatest(${langs.map(lg => s"score_$lg").mkString(", ")})"
    val caseArms = langs.map(lg => s"WHEN score_$lg = $g THEN '$lg'").mkString(" ")
    s"""WITH scored AS (SELECT doc_id, lang,
       |       $scoreSql
       |FROM documents)
       |SELECT doc_id, lang, ${langs.map(lg => s"score_$lg").mkString(", ")},
       |       CASE $caseArms END AS predicted
       |FROM scored ORDER BY doc_id""".stripMargin
  }) { (s, d) =>
    val scored = Tables.documents(s, d).select(
      (col("doc_id") +: col("lang") +:
        langMarkers.map { case (lg, ms) => markerScore(ms).as(s"score_$lg") }): _*)
    val maxScore = greatest(langMarkers.map { case (lg, _) => col(s"score_$lg") }: _*)
    val predicted = langMarkers.foldRight(lit(null).cast(StringType)) { case ((lg, _), acc) =>
      when(col(s"score_$lg") === maxScore, lit(lg)).otherwise(acc)
    } // foldRight ⇒ the FIRST matching language in langMarkers order wins ties
    scored.withColumn("predicted", predicted).orderBy("doc_id")
  }

  /** Token counting: whitespace tokens plus a BPE-ish regex tokenization
    * (letter runs / single digits / single punctuation), the standard
    * pre-tokenizer shape. */
  val qTokenCount: QueryDef = q("q_token_count")(
    """SELECT doc_id,
      |       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      |       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]')) AS BIGINT) AS bpe_ish_tokens
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(col("doc_id"),
      size(split(col("text"), " ")).cast(LongType).as("ws_tokens"),
      size(expr("regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]', 0)")).cast(LongType)
        .as("bpe_ish_tokens"))
      .orderBy("doc_id")
  }

  /** Document fingerprint: 31-base polynomial rolling hash over characters
    * mod 1e9+7 — cheap order-sensitive content id (distinct from the
    * order-insensitive sha256 in Dedup). Folded left-to-right in both
    * engines, so values agree exactly. */
  val qDocFingerprint: QueryDef = q("q_doc_fingerprint")(
    """SELECT doc_id,
      |       list_reduce(list_prepend(CAST(0 AS BIGINT),
      |         list_transform(string_split_regex(text, ''), c -> CAST(ascii(c) AS BIGINT))),
      |         (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(col("doc_id"),
      graft.functions.TextHashes.polyHash(col("text")).as("fingerprint"))
      .orderBy("doc_id")
  }

  /** Quality scoring: length band + uniqueness + marker-hit signals combined
    * into an integer score and a keep/review/drop verdict — the filter stage
    * of a corpus pipeline, expressed as pure relational conditionals. */
  val qQualityScore: QueryDef = q("q_quality_score")(
    """WITH s AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS chars,
      |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
      |                  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS dwords
      |           FROM documents)
      |SELECT doc_id,
      |       (CASE WHEN chars BETWEEN 100 AND 2000 THEN 2 WHEN chars >= 50 THEN 1 ELSE 0 END +
      |        CASE WHEN words >= 20 THEN 1 ELSE 0 END +
      |        CASE WHEN CAST(dwords AS DOUBLE) / CAST(words AS DOUBLE) >= 0.3 THEN 1 ELSE 0 END) AS quality,
      |       CASE WHEN (CASE WHEN chars BETWEEN 100 AND 2000 THEN 2 WHEN chars >= 50 THEN 1 ELSE 0 END +
      |                  CASE WHEN words >= 20 THEN 1 ELSE 0 END +
      |                  CASE WHEN CAST(dwords AS DOUBLE) / CAST(words AS DOUBLE) >= 0.3 THEN 1 ELSE 0 END) >= 3
      |            THEN 'keep' WHEN (CASE WHEN chars BETWEEN 100 AND 2000 THEN 2 WHEN chars >= 50 THEN 1 ELSE 0 END +
      |                  CASE WHEN words >= 20 THEN 1 ELSE 0 END +
      |                  CASE WHEN CAST(dwords AS DOUBLE) / CAST(words AS DOUBLE) >= 0.3 THEN 1 ELSE 0 END) = 2
      |            THEN 'review' ELSE 'drop' END AS verdict
      |FROM s ORDER BY doc_id""".stripMargin) { (s, d) =>
    val words = split(col("text"), " ")
    val chars = length(col("text")).cast(LongType)
    val nWords = size(words).cast(LongType)
    val dWords = size(array_distinct(words)).cast(LongType)
    val quality =
      (when(chars.between(100, 2000), 2).when(chars >= 50, 1).otherwise(0) +
        when(nWords >= 20, 1).otherwise(0) +
        when(dWords.cast(DoubleType) / nWords.cast(DoubleType) >= 0.3, 1).otherwise(0))
    Tables.documents(s, d).select(col("doc_id"), quality.as("quality"),
      when(quality >= 3, "keep").when(quality === 2, "review").otherwise("drop").as("verdict"))
      .orderBy("doc_id")
  }

  /** Out-of-vocabulary rate against a LEARNED corpus vocabulary: fit = the
    * top-100 tokens by corpus frequency (count desc, token asc), transform =
    * per-doc fraction of tokens outside it. The fit→broadcast→transform shape
    * mirrors StringIndexer; the division is exact-int arithmetic so the
    * oracle replays it bit-for-bit. A standard corpus-quality signal (high
    * OOV ≈ noise / wrong language / code). */
  val qOovRate: QueryDef = q("q_oov_rate")(
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |     vocab AS (SELECT w FROM (SELECT w, count(*) AS c,
      |                       row_number() OVER (ORDER BY count(*) DESC, w) AS rn
      |                FROM toks GROUP BY w) WHERE rn <= 100),
      |     per_doc AS (SELECT t.doc_id, count(*) AS n_tokens,
      |                        count(v.w) AS in_vocab
      |                 FROM toks t LEFT JOIN vocab v ON t.w = v.w
      |                 GROUP BY t.doc_id)
      |SELECT doc_id, n_tokens, in_vocab,
      |       CAST(n_tokens - in_vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_rate
      |FROM per_doc ORDER BY doc_id""".stripMargin) { (s, d) =>
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    // Top-100 via orderBy+limit → TakeOrderedAndProject (per-partition heaps
    // of 100, merged on the driver) — NOT a global single-partition window,
    // which would funnel the whole 10⁸-row corpus vocabulary through one task.
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc).limit(100)
      .select(col("w").as("vw"))
    toks.join(broadcast(vocab), col("w") === col("vw"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), count(col("vw")).as("in_vocab"))
      .withColumn("oov_rate",
        (col("n_tokens") - col("in_vocab")).cast(DoubleType) / col("n_tokens").cast(DoubleType))
      .orderBy("doc_id")
  }

  /** Corpus document frequency: in how many documents does each token occur
    * (tokens deduped per doc first), top 20 by (df desc, token) — the "fit"
    * statistic behind IDF weighting and stop-word discovery. One explode
    * (absorbed map-side by partial aggregation) + one hash shuffle on the
    * token; the top-k plans as TakeOrderedAndProject (per-partition heaps),
    * never a global sort of the vocabulary. */
  val qTermDf: QueryDef = q("q_term_df")(
    """WITH toks AS (SELECT DISTINCT doc_id, w FROM
      |                (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      |                 FROM documents))
      |SELECT w AS token, count(*) AS df
      |FROM toks WHERE w <> ''
      |GROUP BY w ORDER BY df DESC, token LIMIT 20""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(array_distinct(split(lower(col("text")), " "))).as("token"))
      .where(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token"))
      .limit(20)
  }

  /** Benchmark decontamination: flag training documents that share any word
    * 3-gram with the held-out evaluation set — the standard pre-training
    * hygiene step (an eval answer leaked into the corpus inflates the
    * benchmark). Eval membership here is the deterministic doc_id%97 slice
    * so the oracle has a closed form; in production the eval set is an
    * external table. Shape: eval grams are DISTINCT-deduped and BROADCAST
    * (eval sets are small by construction — benchmarks, not corpora), the
    * training side explodes row-locally and joins without shuffling the
    * corpus; the per-doc hit count is one keyed aggregation. Same shingle
    * definition as the MinHash pipeline ([[Dedup.shingles]]). */
  val qDecontaminate: QueryDef = q("q_decontaminate")({
    val gramsDuck =
      """CASE WHEN len(string_split(text, ' ')) >= 3
        |     THEN list_distinct(list_transform(
        |            generate_series(1, len(string_split(text, ' ')) - 2),
        |            i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')))
        |     ELSE [text] END""".stripMargin
    s"""WITH ev AS (SELECT text FROM documents WHERE doc_id % 97 = 0),
       |     tr AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0),
       |     evg AS (SELECT DISTINCT gram FROM
       |               (SELECT unnest($gramsDuck) AS gram FROM ev)),
       |     trg AS (SELECT DISTINCT doc_id, gram FROM
       |               (SELECT doc_id, unnest($gramsDuck) AS gram FROM tr)),
       |     h AS (SELECT t.doc_id, count(*) AS n FROM trg t
       |           JOIN evg e ON t.gram = e.gram GROUP BY t.doc_id)
       |SELECT tr.doc_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_eval_grams_hit,
       |       coalesce(h.n, 0) > 0 AS contaminated
       |FROM tr LEFT JOIN h ON tr.doc_id = h.doc_id ORDER BY tr.doc_id""".stripMargin
  }) { (s, d) =>
    val docs = Tables.documents(s, d)
    val isEval = pmod(col("doc_id"), lit(97)) === 0
    val evalGrams = docs.where(isEval)
      .select(explode(Dedup.shingles(col("text"))).as("gram")).distinct()
    val trainGrams = docs.where(!isEval)
      .select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("gram")).distinct()
    val hits = trainGrams.join(broadcast(evalGrams), "gram")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    docs.where(!isEval).select("doc_id").join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n"), lit(0L)).as("n_eval_grams_hit"),
        (coalesce(col("n"), lit(0L)) > 0).as("contaminated"))
      .orderBy("doc_id")
  }

  /** Fixed-token-window chunking with overlap — the preprocessing step that
    * turns variable-length documents into training-ready sequences: 64-token
    * windows starting every 48 tokens (16-token overlap so no boundary
    * context is lost), the trailing window short rather than dropped.
    * Same whitespace token convention as [[qTokenCount]].
    *
    * Scale shape (r13 verdict #4 — this was the worst non-parity 10× ratio):
    * the deterministic (doc_id, chunk_id) output order comes from range-
    * partitioning + sorting the COMPACT input (doc_id, text) and only then
    * running the chunk generator row-locally inside each sorted partition —
    * posexplode preserves row order and emits chunk_id ascending, so the
    * global order survives with ZERO post-explode exchange. The naive
    * `…posexplode….orderBy(doc_id, chunk_id)` shape shuffles ~1.33× the
    * corpus bytes (overlap inflation) across 4× the rows AND evaluates the
    * generator twice (once for range-bound sampling, once for the real
    * exchange); this one shuffles the corpus bytes exactly once. */
  val qChunkWindows: QueryDef = q("q_chunk_windows")(
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
      |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
      |     c AS (SELECT doc_id, n,
      |                  unnest(list_transform(range(0, (n - 1) // 48 + 1),
      |                    i -> {'cid': CAST(i AS INTEGER),
      |                          'chunk': array_to_string(list_slice(toks, i * 48 + 1, i * 48 + 64), ' ')})) AS u
      |           FROM t)
      |SELECT doc_id, u.cid AS chunk_id,
      |       LEAST(64, n - u.cid * 48) AS n_tokens, u.chunk AS chunk
      |FROM c ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
    val (w, st) = (64, 48)
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n", size(col("toks")).cast(LongType))
      // the chunk array is materialized BEFORE the generator select: a
      // generator rewrites sibling expressions and drops struct aliases
      .withColumn("chunks", graft.functions.TokenWindows.chunked(col("text"), w, st))
      .select(col("doc_id"), col("n"), posexplode(col("chunks")).as(Seq("chunk_id", "chunk")))
      .select(col("doc_id"), col("chunk_id"),
        least(lit(w.toLong), col("n") - col("chunk_id") * st).cast(LongType).as("n_tokens"),
        col("chunk"))
  }

  /** Corpus-level bigram familiarity: how "typical" each document's word
    * transitions are for THIS corpus — the integer-exact cousin of an n-gram
    * LM quality score (a log-prob LM score would not hash-match across
    * engines because libm `log` is not bit-identical; summed INTEGER corpus
    * counts divided once are). score(doc) = Σ corpusCount(bigram_i) /
    * n_bigrams. Low scores flag boilerplate-free but also out-of-domain or
    * garbled text — the standard cheap quality dial next to [[qOovRate]].
    * Plan: one generator, a keyed count, a keyed join back, a keyed sum —
    * every shuffle on the bigram or doc key, nothing quadratic. */
  val qBigramFamiliarity: QueryDef = q("q_bigram_familiarity")(
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
      |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
      |     b AS (SELECT doc_id, unnest(list_transform(range(1, n),
      |                    i -> toks[i] || ' ' || toks[i + 1])) AS bg FROM t),
      |     g AS (SELECT bg, count(*) AS cnt FROM b GROUP BY bg),
      |     s AS (SELECT b.doc_id, CAST(sum(g.cnt) AS BIGINT) AS total
      |           FROM b JOIN g USING (bg) GROUP BY b.doc_id)
      |SELECT t.doc_id, CAST(GREATEST(t.n - 1, 0) AS BIGINT) AS n_bigrams,
      |       coalesce(CAST(s.total AS DOUBLE) / NULLIF(CAST(t.n - 1 AS DOUBLE), 0), 0.0)
      |         AS familiarity
      |FROM t LEFT JOIN s ON t.doc_id = s.doc_id
      |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
    val t = Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n", size(col("toks")).cast(LongType))
    val b = t.withColumn("bgs", expr(
        """CASE WHEN n >= 2 THEN transform(sequence(1L, n - 1),
          |  i -> concat(element_at(toks, CAST(i AS INT)), ' ',
          |              element_at(toks, CAST(i AS INT) + 1)))
          |ELSE array() END""".stripMargin))
      .select(col("doc_id"), explode(col("bgs")).as("bg"))
    val g = b.groupBy("bg").agg(count(lit(1)).as("cnt"))
    val sTot = b.join(g, "bg").groupBy("doc_id").agg(sum("cnt").as("total"))
    t.join(sTot, Seq("doc_id"), "left")
      .select(col("doc_id"),
        greatest(col("n") - 1, lit(0L)).cast(LongType).as("n_bigrams"),
        coalesce(col("total").cast(DoubleType) /
          nullif(col("n").cast(DoubleType) - 1, lit(0.0)), lit(0.0)).as("familiarity"))
      .orderBy("doc_id")
  }

  /** Quality-stratified downsampling — the curation step that sets the
    * TRAINING MIXTURE: documents are bucketed by the [[qQualityScore]] rubric
    * and each stratum is kept at its own deterministic hash rate (quality ≥3
    * → 100%, =2 → 50%, else 10%) using [[Sampling.hashBucket]], so the
    * sample is reproducible row-by-row with no RNG and no partition-order
    * dependence. Output is the per-stratum (population, kept) census — one
    * hash aggregation after row-local scoring, nothing else. */
  val qQualityStratified: QueryDef = q("q_quality_stratified")(
    """WITH s AS (SELECT doc_id,
      |                  (CASE WHEN length(text) BETWEEN 100 AND 2000 THEN 2
      |                        WHEN length(text) >= 50 THEN 1 ELSE 0 END +
      |                   CASE WHEN len(string_split(text, ' ')) >= 20 THEN 1 ELSE 0 END +
      |                   CASE WHEN CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
      |                             CAST(len(string_split(text, ' ')) AS DOUBLE) >= 0.3
      |                        THEN 1 ELSE 0 END) AS quality,
      |                  (doc_id % 2147483647) * 2654435761 % 1000 AS bucket
      |           FROM documents),
      |     k AS (SELECT quality, bucket,
      |                  CASE WHEN quality >= 3 THEN 1000 WHEN quality = 2 THEN 500
      |                       ELSE 100 END AS thr FROM s)
      |SELECT quality, count(*) AS n_docs,
      |       CAST(sum(CASE WHEN bucket < thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM k GROUP BY quality ORDER BY quality""".stripMargin) { (s, d) =>
    val words = split(col("text"), " ")
    val chars = length(col("text")).cast(LongType)
    val nWords = size(words).cast(LongType)
    val dWords = size(array_distinct(words)).cast(LongType)
    val quality =
      (when(chars.between(100, 2000), 2).when(chars >= 50, 1).otherwise(0) +
        when(nWords >= 20, 1).otherwise(0) +
        when(dWords.cast(DoubleType) / nWords.cast(DoubleType) >= 0.3, 1).otherwise(0))
    val thr = when(col("quality") >= 3, 1000L).when(col("quality") === 2, 500L)
      .otherwise(100L)
    Tables.documents(s, d)
      .select(col("doc_id"), quality.as("quality"),
        Sampling.hashBucket(col("doc_id")).as("bucket"))
      .withColumn("thr", thr)
      .groupBy("quality")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("bucket") < col("thr"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy("quality")
  }

  /** Cross-document REPEATED-PASSAGE detection — the windowed form of
    * exact-substring training-data dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better": repeated ≥N-token spans
    * across documents degrade models even when whole docs are unique —
    * boilerplate, licenses, templated headers). Each doc is cut into
    * 20-token windows at stride 10 (adjacent windows overlap so a repeated
    * span ≥30 tokens is guaranteed to land a whole window inside it); a
    * window is DUPLICATED when it occurs in ≥2 distinct docs. Output is the
    * per-doc census (window count, duplicated-window count, ratio) that a
    * curation pass thresholds on.
    *
    * 100 TB shape: the keyed shuffle carries the windows' sha-256 DIGESTS,
    * never window text (the explode stays in the scan stage), and every
    * aggregate is a partial-combining hash aggregate — a heavy-hitter
    * boilerplate window never concentrates in one task. Occurrences
    * collapse first to the (digest, doc) relation `perDoc`; that relation
    * is the MATERIALIZATION BOUNDARY — the production form PERSISTS it as
    * an O(increment)-maintained versioned companion table and derives both
    * census and cut-list from the persisted copy ([[IncrementalPassages]],
    * oracle rows `q_repeated_inc_*`), so the per-byte tokenize+hash runs
    * once per corpus, not once per consumer. As a self-contained oracle
    * query here, the two
    * consumers each evaluate the corpus subtree (Catalyst's column pruning
    * specializes their partial aggregates, defeating exchange reuse) —
    * acceptable at test scale, persisted at production scale. A true
    * suffix-array ExactSubstr finds arbitrary-offset repeats; the stride
    * trades that completeness for linear, fully parallel work (the
    * standard large-corpus practice). */
  val qRepeatedPassages: QueryDef = q("q_repeated_passages")(
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
      |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
      |     w0 AS (SELECT doc_id, unnest(list_transform(
      |                     range(0, greatest((n - 20) // 10 + 1, 1)),
      |                     i -> array_to_string(list_slice(toks, i * 10 + 1, i * 10 + 20), ' '))) AS win
      |            FROM t),
      |     w AS (SELECT doc_id, sha256(win) AS h FROM w0),
      |     g AS (SELECT h, count(DISTINCT doc_id) AS nd FROM w GROUP BY h),
      |     d AS (SELECT w.doc_id, count(*) AS n_windows,
      |                  CAST(sum(CASE WHEN g.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows
      |           FROM w JOIN g USING (h) GROUP BY w.doc_id)
      |SELECT doc_id, n_windows, n_dup_windows,
      |       CAST(n_dup_windows AS DOUBLE) / CAST(n_windows AS DOUBLE) AS dup_ratio
      |FROM d ORDER BY doc_id""".stripMargin) { (s, d) =>
    val (w, st) = (20, 10)
    val wins = Tables.documents(s, d)
      .withColumn("wins", graft.functions.TokenWindows.strided(col("text"), w, st))
      .select(col("doc_id"), explode(col("wins")).as("win"))
      .withColumn("h", sha2(col("win"), 256)).drop("win") // digests shuffle, text never does
    // one corpus pass: collapse occurrences to (h, doc) rows; BOTH consumers
    // below sit on the identical (h, doc_id) exchange, which Spark's
    // ReuseExchange dedups — the corpus-scale stage (tokenize + hash +
    // explode + first shuffle) executes once, only the collapsed rows flow
    // twice. nd is a hash aggregate (partial combine, skew-safe), not a
    // window (which would buffer a heavy-hitter digest's rows in one task).
    val perDoc = wins.groupBy("h", "doc_id").agg(count(lit(1)).as("cnt"))
    val byH = perDoc.groupBy("h").agg(count(lit(1)).as("nd"))
    perDoc.join(byH, "h").groupBy("doc_id")
      .agg(sum("cnt").as("n_windows"),
        sum(when(col("nd") >= 2, col("cnt")).otherwise(0L)).as("n_dup_windows"))
      .select(col("doc_id"), col("n_windows"), col("n_dup_windows"),
        (col("n_dup_windows").cast(DoubleType) / col("n_windows").cast(DoubleType))
          .as("dup_ratio"))
      .orderBy("doc_id")
  }

  /** The ACTIONABLE companion of [[qRepeatedPassages]]: the duplicated
    * spans themselves — (doc, window ordinal, 1-based start token, partner
    * count) for every 20-token window occurring in ≥2 distinct docs. This
    * is the cut-list a curation job applies (drop or rewrite the span),
    * where the census row is the threshold dial. Same digest-keyed plan;
    * the output is ∝ duplicated spans, not corpus size. */
  val qRepeatedSpans: QueryDef = q("q_repeated_spans")(
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
      |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
      |     w0 AS (SELECT doc_id, unnest(list_transform(
      |                     range(0, greatest((n - 20) // 10 + 1, 1)),
      |                     i -> {'wi': CAST(i AS BIGINT),
      |                           'win': array_to_string(list_slice(toks, i * 10 + 1, i * 10 + 20), ' ')})) AS u
      |            FROM t),
      |     w AS (SELECT doc_id, u.wi AS win_idx, sha256(u.win) AS h FROM w0),
      |     g AS (SELECT h, count(DISTINCT doc_id) AS nd FROM w GROUP BY h)
      |SELECT w.doc_id, w.win_idx, w.win_idx * 10 + 1 AS start_token,
      |       CAST(g.nd AS BIGINT) AS n_docs
      |FROM w JOIN g USING (h) WHERE g.nd >= 2
      |ORDER BY w.doc_id, w.win_idx""".stripMargin) { (s, d) =>
    val (w, st) = (20, 10)
    val wins = Tables.documents(s, d)
      .withColumn("wins", graft.functions.TokenWindows.strided(col("text"), w, st))
      .select(col("doc_id"), posexplode(col("wins")).as(Seq("win_idx", "win")))
      .withColumn("h", sha2(col("win"), 256)).drop("win")
      .withColumn("win_idx", col("win_idx").cast(LongType))
    // occurrences collapse to (h, doc, ordinals[]) — the ordinal list is
    // tiny (same window repeated within one doc); nd is a skew-safe hash
    // aggregate; the collapsed relation is the materialization boundary a
    // production pipeline persists (see qRepeatedPassages)
    val perDoc = wins.groupBy("h", "doc_id")
      .agg(collect_list(col("win_idx")).as("idxs"))
    val byH = perDoc.groupBy("h").agg(count(lit(1)).as("nd"))
    perDoc.join(byH.where(col("nd") >= 2), "h")
      .select(col("doc_id"), explode(col("idxs")).as("win_idx"), col("nd"))
      .select(col("doc_id"), col("win_idx"),
        (col("win_idx") * st + 1).as("start_token"), col("nd").as("n_docs"))
      .orderBy("doc_id", "win_idx")
  }

  /** ARBITRARY-OFFSET exact-substring detection (r14 verdict #6) — the
    * completeness the stride form trades away: [[qRepeatedPassages]]'s
    * stride-10 windows only catch repeats long enough (≥ window+stride−1
    * tokens) to contain a stride-ALIGNED window, so a repeated span whose
    * copies sit at different offsets mod stride can be missed entirely.
    * This pass emits the length-`minLen` token gram at EVERY offset
    * (stride 1 — the Spark-shaped equivalent of the suffix-array ExactSubstr
    * of Lee et al. 2022: any repeat of ≥ minLen tokens contains an aligned
    * minLen-gram at SOME offset, so detection is complete at the threshold),
    * marks grams occurring in ≥2 distinct docs, and merges each doc's
    * consecutive matched offsets into MAXIMAL spans (gaps-and-islands:
    * offset − row_number is constant within a run).
    *
    * Output: one row per maximal repeated span — (doc_id, 1-based
    * start_token, end_token inclusive, span_tokens).
    *
    * Scale: stride-1 inflates the exploded relation ~minLen× over the
    * corpus (every token starts a gram) — this is the REAL cost of
    * completeness, which is why large-corpus practice runs the stride form
    * as the default and reserves this pass for high-value slices; digests
    * shuffle, gram text never leaves the scan stage, the distinct-doc count
    * is the same two-step skew-safe collapse as [[qRepeatedPassages]], and
    * the only window is partitioned BY doc (parallel, bounded by doc
    * length). */
  def repeatedExactSpans(docs: DataFrame, minLen: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n", size(col("toks")).cast(LongType))
      .withColumn("grams", expr(
        s"""CASE WHEN n >= $minLen THEN transform(sequence(0L, n - $minLen),
           |  i -> array_join(slice(toks, CAST(i + 1 AS INT), $minLen), ' '))
           |ELSE array() END""".stripMargin))
      .select(col("doc_id"), posexplode(col("grams")).as(Seq("o", "gram")))
      .withColumn("hh", sha2(col("gram"), 256)).drop("gram")
      .withColumn("o", col("o").cast(LongType))
    val nd = grams.groupBy("hh", "doc_id").agg(count(lit(1)).as("c"))
      .groupBy("hh").agg(count(lit(1)).as("nd"))
    val matched = grams.join(nd.where(col("nd") >= 2), "hh").select("doc_id", "o")
    val w = Window.partitionBy("doc_id").orderBy("o")
    matched.withColumn("grp", col("o") - row_number().over(w))
      .groupBy("doc_id", "grp")
      .agg((min("o") + 1).as("start_token"), (max("o") + minLen).as("end_token"),
        (max("o") - min("o") + minLen).as("span_tokens"))
      .select("doc_id", "start_token", "end_token", "span_tokens")
      .orderBy("doc_id", "start_token")
  }

  /** Oracle row for [[repeatedExactSpans]] over a SHIFTED-TWIN fixture built
    * relationally from `documents` (so DuckDB replays it bit-for-bit): a
    * small doc slice plus copies prefixed with 3 junk tokens. The 3-token
    * shift puts every copy at offset ≡ 3 mod 10, which the stride-10 window
    * form can never align with — exactly the miss this pass exists to catch
    * (ExtSpec proves the miss on a guaranteed-unique-token fixture). */
  val qRepeatedExact: QueryDef = q("q_repeated_exact")(
    """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 101 = 0),
      |     fix AS (SELECT doc_id, text FROM base
      |             UNION ALL
      |             SELECT doc_id + 1000000, 'pfx0 pfx1 pfx2 ' || text FROM base),
      |     t AS (SELECT doc_id, string_split(text, ' ') AS toks,
      |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM fix),
      |     g AS (SELECT doc_id, unnest(list_transform(range(0, greatest(n - 19, 0)),
      |                    i -> {'o': CAST(i AS BIGINT),
      |                          'gram': array_to_string(list_slice(toks, i + 1, i + 20), ' ')})) AS u
      |           FROM t),
      |     h AS (SELECT doc_id, u.o AS o, sha256(u.gram) AS hh FROM g),
      |     d AS (SELECT hh, count(DISTINCT doc_id) AS nd FROM h GROUP BY hh),
      |     m AS (SELECT h.doc_id, h.o FROM h JOIN d USING (hh) WHERE d.nd >= 2),
      |     runs AS (SELECT doc_id, o,
      |                     o - row_number() OVER (PARTITION BY doc_id ORDER BY o) AS grp
      |              FROM m)
      |SELECT doc_id, CAST(min(o) + 1 AS BIGINT) AS start_token,
      |       CAST(max(o) + 20 AS BIGINT) AS end_token,
      |       CAST(max(o) - min(o) + 20 AS BIGINT) AS span_tokens
      |FROM runs GROUP BY doc_id, grp ORDER BY doc_id, start_token""".stripMargin) { (s, d) =>
    val base = Tables.documents(s, d).where(pmod(col("doc_id"), lit(101)) === 0)
      .select(col("doc_id"), col("text"))
    val fix = base.unionByName(base.select((col("doc_id") + 1000000).as("doc_id"),
      concat(lit("pfx0 pfx1 pfx2 "), col("text")).as("text")))
    repeatedExactSpans(fix, minLen = 20)
  }

  val defs: Seq[QueryDef] = Seq(qTextStats, qLangId, qTokenCount,
    qDocFingerprint, qQualityScore, qOovRate, qTermDf, qDecontaminate,
    qChunkWindows, qBigramFamiliarity, qQualityStratified, qRepeatedPassages,
    qRepeatedSpans, qRepeatedExact)
}
