package graft

/** Central query registry: every operator from SURVEY.md §2 plus the
  * LLM-pipeline extensions, each a [[QueryDef]] with (when SQL-expressible)
  * its DuckDB oracle. SparkEntry derives the driver-contract maps from here.
  */
object Registry {

  val all: Seq[QueryDef] =
    ops.Relational.defs ++
      ops.Extras.defs ++
      ops.Analytic.defs ++
      ops.Scale.defs ++
      ops.AsofJoin.defs ++
      ops.MLlite.defs ++
      ops.Pipelines.defs ++
      ops.Versioned.defs ++
      ops.Wide.defs ++
      ext.Curation.defs ++
      ext.Dedup.defs ++
      ext.DedupCluster.defs ++
      ext.IncrementalDedup.defs ++
      ext.IncrementalPassages.defs ++
      ext.Similarity.defs ++
      ext.Ivf.defs ++
      ext.CorpusPipeline.defs ++
      ext.TextAnalysis.defs ++
      ext.HeavyHitters.defs ++
      ext.Sampling.defs ++
      ext.Multimodal.defs ++
      streaming.EventsStreaming.defs

  require(all.map(_.name).distinct.size == all.size,
    s"duplicate query names: ${all.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }.mkString(",")}")

  val byName: Map[String, QueryDef] = all.map(d => d.name -> d).toMap

  /** Headline queries timed by graft.Bench (the heavy/representative subset;
    * the full set runs under Verify for correctness). */
  val benchNames: Seq[String] = Seq(
    "q_vdt1", "q_vdt2", "q_vdt2_scalable", "q_vdt3", "q_vdt3_scalable",
    "q_vdt4", "q_vdt4_scalable",
    "q_agg_sum", "q_join_inner", "q_join_after_agg", "q_topk_per_group",
    "q_mode_per_group", "q_count_over", "q_sort_desc", "q_topk",
    "q_string_indexer", "q_quantile_bucket",
    "q_dedup_exact", "q_dedup_minhash", "q_topk_cosine", "q_ann_lsh",
    "q_text_stats", "q_token_count", "q_sessionize", "q_window_tumbling",
    "q_corpus_pipeline",
    "q_pii_redact", "q_tfidf_terms", "q_pack_sequences", "q_ann_ivf_trained",
    "q_dedup_incremental", "q_dedup_inc_ingest", "q_dedup_inc_screen",
    "q_zorder", "q_chunk_windows", "q_bigram_familiarity",
    "q_embed_quant", "q_ann_sq8",
    // wide-table shapes (r13 verdict #8): the reference's 54-double-column
    // frame costs per-column — these catch per-column regressions that only
    // show at many columns, in BOTH the sf0.1 and 10x scale runs
    "q_unpivot", "q_rowwise_mean", "q_hof", "q_resample",
    // r14 verdict #4/#5: the no-driver-labels indexer twin, and the heaviest
    // text query (full tokenize+explode) previously missing from both runs
    "q_string_indexer_scalable", "q_repeated_passages",
    // r14 verdict #2: the persisted passage relation — ingest times the
    // O(corpus)+O(increment) signature build, census times the derived
    // consumer that never re-tokenizes
    "q_repeated_inc_ingest", "q_repeated_inc_census",
    // r15: bounded-memory corpus token census (Misra-Gries)
    "q_heavy_hitters",
    // r16 verdict #3: the Delta interop family was invisible to the gates —
    // roundtrip/replicate pin the protocol paths at fixed (nation) size,
    // q_vt_delta_export_scale carries the sf-scaled export cost (distributed
    // DV build + multi-file CDF write + replayed read)
    "q_vt_delta_roundtrip", "q_vt_delta_replicate", "q_vt_delta_export_scale",
    // r17 verdict #6: a FILTERED merge-on-read read at orders scale — the
    // fallback-relation cost (now PrunedFilteredScan) visible to the 2×/10×
    // gates; the band leg should stay ~flat at 10× because pushed stats
    // prune to the same files
    "q_vt_mor_filter",
    // r17: the generalized MERGE at full orders scale (worst-case shape:
    // uniformly-spread matches touch every file) — detection join +
    // cardinality check + COW rewrite + insert union under the gates
    "q_vt_merge_scale",
    // r18: the STRING-keyed merge (doc_id/uuid shape) — strStats equi-key
    // pruning confines detection+rewrite to the source band's files
    "q_vt_merge_scale_str",
    // r18: the same MOR band read through the SQL catalog — the NATIVE
    // DSv2 batch (file-pruned, row-index DV subtraction) under the gates
    // next to its DSv1 twin q_vt_mor_filter
    "q_vt_mor_sql",
    // r18: bloom index build (O(n), the dominant cost) + point lookup on a
    // scattered string key under the 10x gate; the lookup-side file skip
    // itself is pinned by VtDataSourceSpec's ghost/numFiles evidence
    "q_vt_bloom_skip",
    // r19: SQL CTAS end-to-end (empty v0 + data v1 through the catalog) and
    // the foreign-Delta star join whose runtime join keys file-skip through
    // the dlite DSv2 catalog — both sf-scaled, both under the 10× gate
    "q_vt_ctas", "q_dlite_runtime_skip",
    // r19: the integral-key bloom build+lookup and selective compaction of
    // the hottest key quarter — the index build and the partial rewrite are
    // the O(n) costs that must stay sub-linear
    "q_vt_bloom_long", "q_vt_optimize_where",
    // r19b: atomic RTAS (staged files + one slot-CAS'd commit, both legs
    // sf-scaled over orders) and metadata-only ADD COLUMNS followed by an
    // sf-scaled INSERT — the DDL surface under the gates; plus the DSv2
    // catalog streaming read (fixed-size nation: snapshot batch + tailed
    // appends + a compaction streamed as silence — the cost is the
    // micro-batch engine, not rows)
    "q_vt_rtas", "q_vt_add_column", "q_vt_stream_table",
    // r19c: sf-scaled SQL CHECK-constraint flow (ADD validates the table,
    // two INSERTs pay the fused in-job guard), the table_changes CDF
    // function over appends + a COW delete, and the zero-copy SHALLOW
    // CLONE followed by a diverging append — the metadata-only clone cost
    // must stay flat while the reads ride the source files
    "q_vt_constraint", "q_vt_table_changes", "q_vt_clone",
    // r19c: the ANALYZE stats backfill — the one-time O(table) scan that
    // buys pruning (its cost is what must stay linear; the pruned band
    // read after it is the payoff)
    "q_vt_analyze",
    // r19b: the catalog-native streaming mirror — readStream.table →
    // writeStream.toTable, epoch files written by the tasks themselves and
    // published as one watermarked commit (fixed-size; the cost is two
    // micro-batch engine cycles)
    "q_vt_stream_mirror",
    // r20: RENAME/DROP COLUMN via name-mode column mapping — metadata-only
    // commits (the stats re-key is the only O(files) metadata work) followed
    // by an sf-scaled INSERT/read through the mapped write/read paths
    "q_vt_rename_column", "q_vt_drop_column",
    // r20b: foreign-Delta append — export an sf-scaled band, append the
    // twin band onto the stock log, read back through delta-lite
    "q_vt_delta_append")

  /** The FROZEN round-4 headline list. `benchNames` grows as operators land
    * (23 → 27 across rounds), so the all-queries `total` is not
    * round-comparable; Bench's `total_core` over THIS list is the metric the
    * 2×-baseline gate reads (BASELINE.md). Do not edit — freezing is the
    * point. */
  val benchCoreNames: Seq[String] = Seq(
    "q_vdt1", "q_vdt2", "q_vdt3", "q_vdt4",
    "q_agg_sum", "q_join_inner", "q_join_after_agg", "q_topk_per_group",
    "q_mode_per_group", "q_count_over", "q_sort_desc", "q_topk",
    "q_string_indexer", "q_quantile_bucket",
    "q_dedup_exact", "q_dedup_minhash", "q_topk_cosine", "q_ann_lsh",
    "q_text_stats", "q_token_count", "q_sessionize", "q_window_tumbling",
    "q_corpus_pipeline")
}
