package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching DuckDB oracle in `oracleSql`
  * (same column NAMES and engine-exact values — see Tables.dec2 and the
  * portable-hash design notes in graft.functions.PortableHash).
  */
object SparkEntry {

  /** Flagship: CDC snapshot-replay + validation end-to-end on sf0.001 —
    * reduce a change log to final state, diff it against a mutated copy,
    * return the per-status report (driver smoke-checks rows > 0).
    */
  def entry(spark: SparkSession): DataFrame =
    CdcQueries.diffSummary(spark, "/root/testdata/sf0.001")

  /** Production-flavor (xxhash64) variants, timed by Bench alongside
    * `queries` but NOT part of the correctness gate: xxhash64 has no
    * cross-engine oracle. DedupSpec pins them to the portable flavors'
    * results instead.
    */
  def benchExtras: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_minhash_fast" -> (DedupQueries.minHashLshFast _),
    "dedup_ngram_fast" -> (DedupQueries.ngramJaccardFast _),
    // skewed-key CDC join probe: one PK holds ~20% of events; the pair
    // measures what ScaleOps.saltedJoin buys (ScaleOpsSpec asserts the
    // two agree; dev/BENCH_NOTES.md records the measured delta)
    "cdc_skew_join_plain" -> (CdcQueries.cdcSkewJoinPlain _),
    "cdc_skew_join_salted" -> (CdcQueries.cdcSkewJoinSalted _),
    "cdc_skew_join_split" -> (CdcQueries.cdcSkewJoinSplit _),
    // A/B partner for cdc_scd2_merge: the general min_by(ts, seq) first-
    // event lookup (interpreted SortAggregate) vs the oracle-gated
    // time-leading min(ts) fast path (HashAggregate); CdcTemporalSpec
    // pins them bit-identical, PlanShapeSpec pins the physical split
    "cdc_scd2_merge_minby" -> (CdcQueries.cdcScd2MergeMinBy _)
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational coverage (SURVEY.md §2.2)
    "q1_pricing_summary" -> (RelationalQueries.q1PricingSummary _),
    "q6_forecast_revenue" -> (RelationalQueries.q6ForecastRevenue _),
    "q3_top_revenue" -> (RelationalQueries.q3TopRevenue _),
    "q5_local_revenue" -> (RelationalQueries.q5LocalRevenue _),
    "q_window_top_shipments" -> (RelationalQueries.qWindowTopShipments _),
    "q_rollup_orders" -> (RelationalQueries.qRollup _),
    "q_semi_anti_join" -> (RelationalQueries.qSemiAnti _),
    "q_set_ops" -> (RelationalQueries.qSetOps _),
    "q_event_windows" -> (RelationalQueries.qEventWindows _),
    // CDC core (SURVEY.md §2.1 S/O/K/D operators, set-based)
    "cdc_reduce" -> (CdcQueries.cdcReduce _),
    "cdc_reduce_maxby" -> (CdcQueries.cdcReduceMaxBy _),
    "cdc_diff_detail" -> (CdcQueries.diffDetail _),
    "cdc_diff_summary" -> (CdcQueries.diffSummary _),
    "cdc_chunk_digest" -> (CdcQueries.chunkDigest _),
    "cdc_bucket_digest" -> (CdcQueries.bucketDigest _),
    // CDC temporal verbs: time travel, SCD2 history, snapshot+delta
    "cdc_snapshot_asof" -> (CdcQueries.cdcSnapshotAsof _),
    "cdc_scd2" -> (CdcQueries.cdcScd2 _),
    "cdc_scd2_merge" -> (CdcQueries.cdcScd2Merge _),
    "cdc_merge_incremental" -> (CdcQueries.cdcMergeIncremental _),
    "q_json_extract" -> (RelationalQueries.qJsonExtract _),
    "q_scalar_funcs" -> (RelationalQueries.qScalarFuncs _),
    "q_cube_orders" -> (AdvancedQueries.qCube _),
    "q_distinct_agg" -> (AdvancedQueries.qDistinctAgg _),
    "q_sessionize" -> (AdvancedQueries.qSessionize _),
    "q_percentile" -> (AdvancedQueries.qPercentile _),
    "q_asof_join" -> (AdvancedQueries.qAsOfJoin _),
    "q_pivot" -> (AdvancedQueries.qPivot _),
    "q_unpivot" -> (AdvancedQueries.qUnpivot _),
    "q_scalar_subquery" -> (AdvancedQueries.qScalarSubquery _),
    // HLL sketch: internals are engine-specific, but the accuracy
    // CONTRACT is oracled — the query emits exact counts + within-eps
    // booleans, the oracle computes the exacts and asserts all-true
    "q_approx_distinct" -> (AdvancedQueries.qApproxDistinct _),
    "q_kmv_distinct" -> (AdvancedQueries.qKmvDistinct _),
    "q_kmv_groups" -> (AdvancedQueries.qKmvGroups _),
    // LLM-data-pipeline ops: dedup family
    "dedup_exact" -> (DedupQueries.exact _),
    "dedup_minhash_lsh" -> (DedupQueries.minHashLsh _),
    "dedup_lsh_recall" -> (DedupQueries.lshRecall _),
    "dedup_incremental" -> (DedupQueries.incrementalExact _),
    "dedup_incremental_lsh" -> (DedupQueries.incrementalLsh _),
    // indexed probes: same semantics/oracles as the recompute forms
    // above, but the corpus side reads the PERSISTED DedupIndex
    "dedup_incremental_indexed" -> (DedupQueries.incrementalExactIndexed _),
    "dedup_incremental_lsh_indexed" -> (DedupQueries.incrementalLshIndexed _),
    "dedup_incremental_bloom" -> (DedupQueries.incrementalBloom _),
    "dedup_simhash" -> (DedupQueries.simHash _),
    "dedup_simhash_near" -> (DedupQueries.simHashNearDups _),
    "dedup_simhash_buckets" -> (DedupQueries.simHashOversized _),
    // SimHash modality parity: incremental + index-served + maintained
    // lifecycle forms, each gated vs the live-corpus recompute oracle
    "dedup_incremental_simhash" -> (DedupQueries.incrementalSimHash _),
    "dedup_incremental_simhash_indexed" ->
      (DedupQueries.incrementalSimHashIndexed _),
    "dedup_incremental_simhash_absorbed" ->
      (DedupQueries.incrementalSimHashAbsorbed _),
    "dedup_incremental_simhash_retired" ->
      (DedupQueries.incrementalSimHashRetired _),
    "dedup_incremental_simhash_refreshed" ->
      (DedupQueries.incrementalSimHashRefreshed _),
    // media modality parity: incremental + index-served + maintained
    // lifecycle forms over BINARY image payloads (real decode path)
    "mm_ahash_incremental" -> (DedupQueries.incrementalAhash _),
    "mm_ahash_incremental_indexed" ->
      (DedupQueries.incrementalAhashIndexed _),
    // the AUDIO modality over BINARY WAV payloads (real RIFF parse +
    // energy hash; the media index serves it via its pinned coder)
    "mm_audiohash_incremental" ->
      (DedupQueries.incrementalAudioHash _),
    "mm_audiohash_incremental_indexed" ->
      (DedupQueries.incrementalAudioHashIndexed _),
    "mm_audiohash_incremental_absorbed" ->
      (DedupQueries.incrementalAudioHashAbsorbed _),
    "mm_audiohash_incremental_retired" ->
      (DedupQueries.incrementalAudioHashRetired _),
    "mm_audiohash_incremental_refreshed" ->
      (DedupQueries.incrementalAudioHashRefreshed _),
    "mm_audiohash_incremental_compacted" ->
      (DedupQueries.incrementalAudioHashCompacted _),
    "mm_audiohash_incremental_resurrected" ->
      (DedupQueries.incrementalAudioHashResurrected _),
    // the VIDEO modality over multi-frame GIF clip payloads (real
    // frame decode + temporally-pooled frame-sampled hash; the media
    // index serves it via its third pinned coder)
    "mm_framehash_incremental" ->
      (DedupQueries.incrementalFrameHash _),
    "mm_framehash_incremental_indexed" ->
      (DedupQueries.incrementalFrameHashIndexed _),
    "mm_framehash_incremental_absorbed" ->
      (DedupQueries.incrementalFrameHashAbsorbed _),
    "mm_framehash_incremental_retired" ->
      (DedupQueries.incrementalFrameHashRetired _),
    "mm_framehash_incremental_refreshed" ->
      (DedupQueries.incrementalFrameHashRefreshed _),
    "mm_framehash_incremental_compacted" ->
      (DedupQueries.incrementalFrameHashCompacted _),
    "mm_framehash_incremental_resurrected" ->
      (DedupQueries.incrementalFrameHashResurrected _),
    "mm_ahash_incremental_absorbed" ->
      (DedupQueries.incrementalAhashAbsorbed _),
    "mm_ahash_incremental_retired" ->
      (DedupQueries.incrementalAhashRetired _),
    "mm_ahash_incremental_refreshed" ->
      (DedupQueries.incrementalAhashRefreshed _),
    "mm_ahash_incremental_compacted" ->
      (DedupQueries.incrementalAhashCompacted _),
    "mm_ahash_incremental_resurrected" ->
      (DedupQueries.incrementalAhashResurrected _),
    "dedup_ngram_jaccard" -> (DedupQueries.ngramJaccard _),
    "dedup_edit_distance" -> (DedupQueries.editDistance _),
    "dedup_components" -> (DedupQueries.components _),
    "dedup_canonicalize" -> (DedupQueries.canonicalize _),
    "dedup_cluster_stats" -> (DedupQueries.clusterStats _),
    "dedup_canonicalize_best" -> (DedupQueries.canonicalizeBest _),
    "span_overlap" -> (DedupQueries.spanOverlap _),
    "dedup_spans_clean" -> (DedupQueries.spanDedupClean _),
    "text_quality_filter" -> (TextQueries.qualityFilter _),
    "text_gopher_rules" -> (TextQueries.gopherRules _),
    "shard_export" -> (PipelineQueries.shardExport _),
    // the capstone: filter → dedup-canonicalize → tokenize/shard as ONE
    // declared plan; the oracle replays all three stages in one chain,
    // gating the stage INTERACTIONS
    "pipeline_e2e" -> (PipelineQueries.pipelineE2e _),
    // similarity search
    "ann_brute_topk" -> (SimilarityQueries.bruteForceTopK _),
    "ann_jl_topk" -> (SimilarityQueries.jlTopK _),
    "ann_jl_indexed_topk" -> (SimilarityQueries.jlTopKIndexed _),
    "ann_lsh_topk" -> (SimilarityQueries.lshTopK _),
    "ann_binary_topk" -> (SimilarityQueries.binaryTopK _),
    "ann_binary_indexed_topk" -> (SimilarityQueries.binaryIndexedTopK _),
    "ann_pq_indexed_topk" -> (SimilarityQueries.pqIndexedTopK _),
    "ann_ivf_topk" -> (SimilarityQueries.ivfTopK _),
    "ann_ivf_refined" -> (SimilarityQueries.ivfRefinedTopK _),
    "embed_near_dups" -> (SimilarityQueries.cosineNearDups _),
    "embed_incremental" -> (SimilarityQueries.incrementalCosineNearDups _),
    "embed_incremental_indexed" ->
      (SimilarityQueries.incrementalCosineNearDupsIndexed _),
    "embed_incremental_sq8_indexed" ->
      (SimilarityQueries.incrementalCosineNearDupsSq8Indexed _),
    "dedup_incremental_absorbed" ->
      (DedupQueries.incrementalExactAbsorbed _),
    "dedup_incremental_lsh_absorbed" ->
      (DedupQueries.incrementalLshAbsorbed _),
    "embed_incremental_absorbed" ->
      (SimilarityQueries.incrementalCosineNearDupsAbsorbed _),
    "dedup_incremental_retired" ->
      (DedupQueries.incrementalExactRetired _),
    "dedup_incremental_lsh_retired" ->
      (DedupQueries.incrementalLshRetired _),
    "embed_incremental_retired" ->
      (SimilarityQueries.incrementalCosineNearDupsRetired _),
    "dedup_incremental_compacted" ->
      (DedupQueries.incrementalExactCompacted _),
    "dedup_incremental_lsh_compacted" ->
      (DedupQueries.incrementalLshCompacted _),
    "dedup_incremental_simhash_compacted" ->
      (DedupQueries.incrementalSimHashCompacted _),
    "embed_incremental_compacted" ->
      (SimilarityQueries.incrementalCosineNearDupsCompacted _),
    "dedup_incremental_refreshed" ->
      (DedupQueries.incrementalExactRefreshed _),
    "dedup_incremental_lsh_refreshed" ->
      (DedupQueries.incrementalLshRefreshed _),
    "embed_incremental_refreshed" ->
      (SimilarityQueries.incrementalCosineNearDupsRefreshed _),
    "embed_sq8_saturation" ->
      (SimilarityQueries.sq8SaturationReport _),
    "embed_incremental_sq8_refreshed" ->
      (SimilarityQueries.incrementalCosineNearDupsSq8Refreshed _),
    "embed_incremental_sq8_absorbed" ->
      (SimilarityQueries.incrementalCosineNearDupsSq8Absorbed _),
    "embed_incremental_sq8_retired" ->
      (SimilarityQueries.incrementalCosineNearDupsSq8Retired _),
    "dedup_incremental_resurrected" ->
      (DedupQueries.incrementalExactResurrected _),
    // text analysis
    "text_profile" -> (TextQueries.profile _),
    "text_fingerprint" -> (TextQueries.fingerprint _),
    "text_lang_dist" -> (TextQueries.langDist _),
    "text_quality_topk" -> (TextQueries.qualityTopK _),
    "corpus_split" -> (TextQueries.corpusSplit _),
    "corpus_source_mix" -> (TextQueries.sourceMix _),
    "text_repetition" -> (TextQueries.repetition _),
    "text_tokens_bpe" -> (TextQueries.tokensBpe _),
    "text_tokens_bpe_oov" -> (TextQueries.tokensBpeOov _),
    "text_token_ids" -> (TextQueries.tokenIds _),
    "text_lm_score" -> (TextQueries.lmScore _),
    "text_pmi_phrases" -> (TextQueries.pmiPhrases _),
    "decontaminate" -> (DedupQueries.decontaminateReport _),
    // training-pipeline assembly ops
    "pack_sequences" -> (PipelineQueries.packSequences _),
    "sample_stratified" -> (PipelineQueries.sampleStratified _),
    "corpus_mix_temperature" -> (PipelineQueries.corpusMixTemperature _),
    "corpus_importance_weights" -> (PipelineQueries.importanceWeights _),
    "corpus_datacard" -> (PipelineQueries.corpusDatacard _),
    "chunk_documents_cdc" -> (PipelineQueries.chunkDocumentsCdc _),
    "dedup_chunks" -> (PipelineQueries.dedupChunks _),
    "dedup_chunks_incremental" -> (PipelineQueries.dedupChunksIncremental _),
    "decontaminate_clean" -> (DedupQueries.decontaminateClean _),
    "decontaminate_semantic" ->
      (SimilarityQueries.semanticDecontaminationReport _),
    "decontaminate_semantic_clean" ->
      (SimilarityQueries.semanticDecontaminationClean _),
    "pii_redact" -> (PipelineQueries.piiRedact _),
    "vocab_topk" -> (PipelineQueries.vocabTopK _),
    "chunk_documents" -> (PipelineQueries.chunkDocuments _),
    "tfidf_topk" -> (PipelineQueries.tfidfTopK _),
    "text_bm25_topk" -> (RetrievalQueries.bm25TopK _),
    "text_bm25_indexed" -> (RetrievalQueries.bm25TopKIndexed _),
    "retrieval_hybrid_rrf" -> (RetrievalQueries.hybridRrf _),
    "retrieval_hybrid_rrf_indexed" -> (RetrievalQueries.hybridRrfIndexed _),
    "retrieval_hybrid_rrf_ivf" -> (RetrievalQueries.hybridRrfIvf _),
    "retrieval_hybrid_rrf_ivf_indexed" ->
      (RetrievalQueries.hybridRrfIvfIndexed _),
    "text_bm25_indexed_retired" ->
      (RetrievalQueries.bm25TopKIndexedRetired _),
    "text_bm25_indexed_compacted" ->
      (RetrievalQueries.bm25TopKIndexedCompacted _),
    "text_bm25_indexed_refreshed" ->
      (RetrievalQueries.bm25TopKIndexedRefreshed _),
    // exact-phrase search over positional postings (word ORDER, which
    // bag-of-terms BM25 cannot express) — recompute, index-served, and
    // the maintained-positions CDC gate
    "text_phrase_topk" -> (RetrievalQueries.phraseTopK _),
    "text_phrase_indexed" -> (RetrievalQueries.phraseTopKIndexed _),
    "text_phrase_indexed_refreshed" ->
      (RetrievalQueries.phraseTopKIndexedRefreshed _),
    "text_phrase_indexed_retired" ->
      (RetrievalQueries.phraseTopKIndexedRetired _),
    "text_phrase_indexed_compacted" ->
      (RetrievalQueries.phraseTopKIndexedCompacted _),
    "text_proximity_topk" -> (RetrievalQueries.proximityTopK _),
    "text_proximity_indexed" ->
      (RetrievalQueries.proximityTopKIndexed _),
    "retrieval_hybrid_rrf_phrase" ->
      (RetrievalQueries.hybridRrfPhrase _),
    "retrieval_hybrid_recall" -> (RetrievalQueries.hybridRecall _),
    "retrieval_e2e" -> (RetrievalQueries.retrievalE2e _),
    "retrieval_e2e_indexed" -> (RetrievalQueries.retrievalE2eIndexed _),
    // mm_features keeps the deterministic byte-histogram stub (itself
    // oracle-checked); mm_decode_* exercise the REAL pure-JVM BMP/WAV
    // codecs end-to-end with exact integer stats oracle-checked from md5
    "mm_features" -> (TextQueries.multimodalFeatures _),
    "mm_frame_sample" -> (TextQueries.multimodalFrames _),
    "mm_frames_gif" -> (TextQueries.multimodalFramesGif _),
    "mm_decode_bmp" -> (TextQueries.multimodalDecodeBmp _),
    "mm_decode_png" -> (TextQueries.multimodalDecodePng _),
    "mm_decode_jpeg" -> (TextQueries.multimodalDecodeJpeg _),
    "mm_audio_energy" -> (TextQueries.multimodalAudioEnergy _),
    "mm_decode_wav" -> (TextQueries.multimodalDecodeWav _),
    "mm_resize" -> (TextQueries.multimodalResize _),
    "mm_ahash_dedup" -> (TextQueries.multimodalAhashDedup _),
    "mm_ahash_near" -> (TextQueries.multimodalAhashNear _),
    "mm_audiohash_dedup" -> (TextQueries.multimodalAudioHashDedup _),
    "mm_audiohash_near" -> (TextQueries.multimodalAudioHashNear _),
    "mm_framehash_dedup" -> (TextQueries.multimodalFrameHashDedup _),
    "mm_framehash_near" -> (TextQueries.multimodalFrameHashNear _),
    "ann_sq8_topk" -> (SimilarityQueries.sq8TopK _),
    "ann_ivf_sq8_topk" -> (SimilarityQueries.ivfSq8TopK _),
    "ann_pq_topk" -> (SimilarityQueries.pqTopK _),
    "ann_pq_refined" -> (SimilarityQueries.pqRefinedTopK _),
    "ann_ivf_pq_topk" -> (SimilarityQueries.ivfPqTopK _),
    "ann_recall_report" -> (SimilarityQueries.annRecallReport _),
    "ann_recall_sampled" -> (SimilarityQueries.annRecallReportSampled _),
    "semantic_dedup" -> (SimilarityQueries.semanticDedup _),
    "semantic_dedup_indexed" -> (SimilarityQueries.semanticDedupIndexed _),
    "ann_ivf_sq8_indexed_topk" -> (SimilarityQueries.ivfSq8TopKIndexed _),
    "ann_ivf_sq8_retrained_topk" ->
      (SimilarityQueries.ivfSq8RetrainedTopK _),
    "ann_ivf_sq8_rebuilt_topk" ->
      (SimilarityQueries.ivfSq8RebuiltTopK _),
    "ann_ivf_drift" -> (SimilarityQueries.ivfDriftReport _),
    "text_utf8_profile" -> (TextQueries.utf8Profile _),
    "ngram_heavy_hitters" -> (TextQueries.ngramHeavyHitters _)
  )

  /** DuckDB-runnable oracle SQL per query (same parquet tables). */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> RelationalQueries.q1Sql,
    "q6_forecast_revenue" -> RelationalQueries.q6Sql,
    "q3_top_revenue" -> RelationalQueries.q3Sql,
    "q5_local_revenue" -> RelationalQueries.q5Sql,
    "q_window_top_shipments" -> RelationalQueries.qWindowSql,
    "q_rollup_orders" -> RelationalQueries.qRollupSql,
    "q_semi_anti_join" -> RelationalQueries.qSemiAntiSql,
    "q_set_ops" -> RelationalQueries.qSetOpsSql,
    "q_event_windows" -> RelationalQueries.qEventWindowsSql,
    "cdc_reduce" -> CdcQueries.cdcReduceSql,
    "cdc_reduce_maxby" -> CdcQueries.cdcReduceSql,
    "cdc_diff_detail" -> CdcQueries.diffDetailSql,
    "cdc_diff_summary" -> CdcQueries.diffSummarySql,
    "cdc_chunk_digest" -> CdcQueries.chunkDigestSql,
    "cdc_bucket_digest" -> CdcQueries.bucketDigestSql,
    "cdc_snapshot_asof" -> CdcQueries.cdcSnapshotAsofSql,
    "cdc_scd2" -> CdcQueries.cdcScd2Sql,
    // stored-history + delta must equal full-replay history exactly —
    // the merge shares the full SCD2 oracle (same gate style as
    // cdc_merge_incremental)
    "cdc_scd2_merge" -> CdcQueries.cdcScd2Sql,
    // the merge's oracle is the FULL replay — merge == recompute gate
    "cdc_merge_incremental" -> CdcQueries.cdcMergeIncrementalSql,
    "q_json_extract" -> RelationalQueries.qJsonExtractSql,
    "q_scalar_funcs" -> RelationalQueries.qScalarFuncsSql,
    "q_cube_orders" -> AdvancedQueries.qCubeSql,
    "q_distinct_agg" -> AdvancedQueries.qDistinctAggSql,
    "q_sessionize" -> AdvancedQueries.qSessionizeSql,
    "q_percentile" -> AdvancedQueries.qPercentileSql,
    "q_approx_distinct" -> AdvancedQueries.qApproxDistinctSql,
    "q_kmv_distinct" -> AdvancedQueries.qKmvDistinctSql,
    "q_kmv_groups" -> AdvancedQueries.qKmvGroupsSql,
    "q_asof_join" -> AdvancedQueries.qAsOfJoinSql,
    "q_pivot" -> AdvancedQueries.qPivotSql,
    "q_unpivot" -> AdvancedQueries.qUnpivotSql,
    "q_scalar_subquery" -> AdvancedQueries.qScalarSubquerySql,
    "dedup_exact" -> DedupQueries.exactSql,
    "dedup_minhash_lsh" -> DedupQueries.minHashLshSql,
    "dedup_lsh_recall" -> DedupQueries.lshRecallSql,
    "dedup_incremental" -> DedupQueries.incrementalExactSql,
    "dedup_incremental_lsh" -> DedupQueries.incrementalLshSql,
    // the indexed probes must reproduce the recompute forms bit-exactly,
    // so they share those forms' oracles
    "dedup_incremental_indexed" -> DedupQueries.incrementalExactSql,
    "dedup_incremental_lsh_indexed" -> DedupQueries.incrementalLshSql,
    "embed_incremental_indexed" ->
      SimilarityQueries.incrementalCosineNearDupsSql,
    "embed_incremental_sq8_indexed" ->
      SimilarityQueries.incrementalCosineNearDupsSq8IndexedSql,
    "dedup_incremental_absorbed" ->
      DedupQueries.incrementalExactAbsorbedSql,
    "dedup_incremental_lsh_absorbed" ->
      DedupQueries.incrementalLshAbsorbedSql,
    "embed_incremental_absorbed" ->
      SimilarityQueries.incrementalCosineNearDupsAbsorbedSql,
    "dedup_incremental_retired" ->
      DedupQueries.incrementalExactRetiredSql,
    "dedup_incremental_lsh_retired" ->
      DedupQueries.incrementalLshRetiredSql,
    "embed_incremental_retired" ->
      SimilarityQueries.incrementalCosineNearDupsRetiredSql,
    // compacted forms share the retired oracles: compaction must be
    // probe-invisible (live rows only, physically rewritten — incl. the
    // fmt-5 size deltas collapsed back to live counts)
    "dedup_incremental_compacted" ->
      DedupQueries.incrementalExactRetiredSql,
    "dedup_incremental_lsh_compacted" ->
      DedupQueries.incrementalLshRetiredSql,
    "dedup_incremental_simhash_compacted" ->
      DedupQueries.incrementalSimHashRetiredSql,
    "embed_incremental_compacted" ->
      SimilarityQueries.incrementalCosineNearDupsRetiredSql,
    // refresh/resurrection oracles recompute over the POST-UPDATE (or
    // post-cycle) corpus — the generational index must answer for it
    "dedup_incremental_refreshed" ->
      DedupQueries.incrementalExactRefreshedSql,
    "dedup_incremental_lsh_refreshed" ->
      DedupQueries.incrementalLshRefreshedSql,
    "embed_incremental_refreshed" ->
      SimilarityQueries.incrementalCosineNearDupsRefreshedSql,
    "embed_incremental_sq8_refreshed" ->
      SimilarityQueries.incrementalCosineNearDupsSq8RefreshedSql,
    "embed_incremental_sq8_absorbed" ->
      SimilarityQueries.incrementalCosineNearDupsSq8AbsorbedSql,
    "embed_incremental_sq8_retired" ->
      SimilarityQueries.incrementalCosineNearDupsSq8RetiredSql,
    // frozen-range saturation: the rebuild-vs-retrain decision signal
    "embed_sq8_saturation" -> SimilarityQueries.sq8SaturationReportSql,
    "dedup_incremental_resurrected" ->
      DedupQueries.incrementalExactResurrectedSql,
    "dedup_incremental_bloom" -> DedupQueries.incrementalBloomSql,
    "dedup_simhash" -> DedupQueries.simHashSql,
    "dedup_simhash_near" -> DedupQueries.simHashNearDupsSql,
    "dedup_simhash_buckets" -> DedupQueries.simHashOversizedSql,
    "dedup_incremental_simhash" -> DedupQueries.incrementalSimHashSql,
    "dedup_incremental_simhash_indexed" ->
      DedupQueries.incrementalSimHashSql,
    "dedup_incremental_simhash_absorbed" ->
      DedupQueries.incrementalSimHashAbsorbedSql,
    "dedup_incremental_simhash_retired" ->
      DedupQueries.incrementalSimHashRetiredSql,
    "dedup_incremental_simhash_refreshed" ->
      DedupQueries.incrementalSimHashRefreshedSql,
    "mm_ahash_incremental" -> DedupQueries.incrementalAhashSql,
    "mm_ahash_incremental_indexed" -> DedupQueries.incrementalAhashSql,
    "mm_audiohash_incremental" -> DedupQueries.incrementalAudioHashSql,
    "mm_audiohash_incremental_indexed" ->
      DedupQueries.incrementalAudioHashSql,
    "mm_audiohash_incremental_absorbed" ->
      DedupQueries.incrementalAudioHashAbsorbedSql,
    "mm_audiohash_incremental_retired" ->
      DedupQueries.incrementalAudioHashRetiredSql,
    "mm_audiohash_incremental_refreshed" ->
      DedupQueries.incrementalAudioHashRefreshedSql,
    // compaction is a physical rewrite, not a semantic change: the
    // retired live-corpus oracle gates the compacted audio index too
    "mm_audiohash_incremental_compacted" ->
      DedupQueries.incrementalAudioHashRetiredSql,
    "mm_audiohash_incremental_resurrected" ->
      DedupQueries.incrementalAudioHashResurrectedSql,
    "mm_framehash_incremental" -> DedupQueries.incrementalFrameHashSql,
    "mm_framehash_incremental_indexed" ->
      DedupQueries.incrementalFrameHashSql,
    "mm_framehash_incremental_absorbed" ->
      DedupQueries.incrementalFrameHashAbsorbedSql,
    "mm_framehash_incremental_retired" ->
      DedupQueries.incrementalFrameHashRetiredSql,
    "mm_framehash_incremental_refreshed" ->
      DedupQueries.incrementalFrameHashRefreshedSql,
    // compaction is a physical rewrite, not a semantic change: the
    // retired live-corpus oracle gates the compacted video index too
    "mm_framehash_incremental_compacted" ->
      DedupQueries.incrementalFrameHashRetiredSql,
    "mm_framehash_incremental_resurrected" ->
      DedupQueries.incrementalFrameHashResurrectedSql,
    "mm_ahash_incremental_absorbed" ->
      DedupQueries.incrementalAhashAbsorbedSql,
    "mm_ahash_incremental_retired" ->
      DedupQueries.incrementalAhashRetiredSql,
    "mm_ahash_incremental_refreshed" ->
      DedupQueries.incrementalAhashRefreshedSql,
    // compaction is a physical rewrite, not a semantic change: the
    // SAME live-corpus oracle gates the compacted media index
    "mm_ahash_incremental_compacted" ->
      DedupQueries.incrementalAhashRetiredSql,
    "mm_ahash_incremental_resurrected" ->
      DedupQueries.incrementalAhashResurrectedSql,
    "dedup_ngram_jaccard" -> DedupQueries.ngramJaccardSql,
    "dedup_edit_distance" -> DedupQueries.editDistanceSql,
    "dedup_components" -> DedupQueries.componentsSql,
    "dedup_canonicalize" -> DedupQueries.canonicalizeSql,
    "dedup_cluster_stats" -> DedupQueries.clusterStatsSql,
    "dedup_canonicalize_best" -> DedupQueries.canonicalizeBestSql,
    "span_overlap" -> DedupQueries.spanOverlapSql,
    "dedup_spans_clean" -> DedupQueries.spanDedupCleanSql,
    "text_quality_filter" -> TextQueries.qualityFilterSql,
    "text_gopher_rules" -> TextQueries.gopherRulesSql,
    "shard_export" -> PipelineQueries.shardExportSql,
    "pipeline_e2e" -> PipelineQueries.pipelineE2eSql,
    "ann_brute_topk" -> SimilarityQueries.bruteForceTopKSql,
    "ann_jl_topk" -> SimilarityQueries.jlTopKSql,
    // indexed probe must reproduce the recompute form bit-exactly, so it
    // shares that form's oracle
    "ann_jl_indexed_topk" -> SimilarityQueries.jlTopKSql,
    "ann_lsh_topk" -> SimilarityQueries.lshTopKSql,
    "ann_binary_topk" -> SimilarityQueries.binaryTopKSql,
    "ann_binary_indexed_topk" -> SimilarityQueries.binaryIndexedTopKSql,
    "ann_pq_indexed_topk" -> SimilarityQueries.pqIndexedTopKSql,
    "ann_ivf_topk" -> SimilarityQueries.ivfTopKSql,
    "ann_ivf_refined" -> SimilarityQueries.ivfRefinedTopKSql,
    "embed_near_dups" -> SimilarityQueries.cosineNearDupsSql,
    "embed_incremental" -> SimilarityQueries.incrementalCosineNearDupsSql,
    "text_profile" -> TextQueries.profileSql,
    "text_fingerprint" -> TextQueries.fingerprintSql,
    "text_lang_dist" -> TextQueries.langDistSql,
    "text_quality_topk" -> TextQueries.qualityTopKSql,
    "corpus_split" -> TextQueries.corpusSplitSql,
    "corpus_source_mix" -> TextQueries.sourceMixSql,
    "text_repetition" -> TextQueries.repetitionSql,
    "text_tokens_bpe" -> TextQueries.tokensBpeSql,
    "text_tokens_bpe_oov" -> TextQueries.tokensBpeOovSql,
    "text_token_ids" -> TextQueries.tokenIdsSql,
    "text_lm_score" -> TextQueries.lmScoreSql,
    "text_pmi_phrases" -> TextQueries.pmiPhrasesSql,
    "decontaminate" -> DedupQueries.decontaminateReportSql,
    "pack_sequences" -> PipelineQueries.packSequencesSql,
    "sample_stratified" -> PipelineQueries.sampleStratifiedSql,
    "corpus_mix_temperature" -> PipelineQueries.corpusMixTemperatureSql,
    "corpus_importance_weights" -> PipelineQueries.importanceWeightsSql,
    "corpus_datacard" -> PipelineQueries.corpusDatacardSql,
    "chunk_documents_cdc" -> PipelineQueries.chunkDocumentsCdcSql,
    "dedup_chunks" -> PipelineQueries.dedupChunksSql,
    "dedup_chunks_incremental" -> PipelineQueries.dedupChunksIncrementalSql,
    "decontaminate_clean" -> DedupQueries.decontaminateCleanSql,
    // embedding-space decontamination: same % 7 split, cosine >= 0.35
    // over LSH-blocked candidates instead of shared 5-gram shingles
    "decontaminate_semantic" ->
      SimilarityQueries.semanticDecontaminationReportSql,
    "decontaminate_semantic_clean" ->
      SimilarityQueries.semanticDecontaminationCleanSql,
    "pii_redact" -> PipelineQueries.piiRedactSql,
    "vocab_topk" -> PipelineQueries.vocabTopKSql,
    "chunk_documents" -> PipelineQueries.chunkDocumentsSql,
    "tfidf_topk" -> PipelineQueries.tfidfTopKSql,
    "text_bm25_topk" -> RetrievalQueries.bm25TopKSql,
    // the indexed probe must reproduce the recompute form bit-exactly —
    // one oracle gates both
    "text_bm25_indexed" -> RetrievalQueries.bm25TopKSql,
    "retrieval_hybrid_rrf" -> RetrievalQueries.hybridRrfSql,
    // both legs served from persisted indexes; one oracle gates both forms
    "retrieval_hybrid_rrf_indexed" -> RetrievalQueries.hybridRrfSql,
    // dense leg = IVF (the declared 100 TB path); the oracle replays the
    // IVF assignment exactly, so the fusion stays hash-gated
    "retrieval_hybrid_rrf_ivf" -> RetrievalQueries.hybridRrfIvfSql,
    // both legs index-served AND the dense leg probes the IVF lists'
    // SQ8 codes — the 100 TB hybrid default; the oracle replays
    // centroids, assignment, quantization and the asymmetric fold
    "retrieval_hybrid_rrf_ivf_indexed" ->
      RetrievalQueries.hybridRrfIvfIndexedSql,
    // generationally-maintained lexical index: oracles recompute over
    // the POST-CDC corpus, so stale df/postings/stats hash-mismatch
    "text_bm25_indexed_retired" -> RetrievalQueries.bm25IndexedRetiredSql,
    // compaction is a physical rewrite, not a semantic change: the
    // SAME live-corpus oracle gates the compacted index
    "text_bm25_indexed_compacted" ->
      RetrievalQueries.bm25IndexedRetiredSql,
    "text_bm25_indexed_refreshed" ->
      RetrievalQueries.bm25IndexedRefreshedSql,
    // phrase search: positional intersection replayed analytically;
    // the indexed form shares the recompute oracle, the refreshed form
    // recomputes over the post-update corpus
    "text_phrase_topk" -> RetrievalQueries.phraseTopKSql,
    "text_phrase_indexed" -> RetrievalQueries.phraseTopKSql,
    "text_phrase_indexed_refreshed" ->
      RetrievalQueries.phraseIndexedRefreshedSql,
    "text_phrase_indexed_retired" ->
      RetrievalQueries.phraseIndexedRetiredSql,
    "text_phrase_indexed_compacted" ->
      RetrievalQueries.phraseIndexedRetiredSql,
    "text_proximity_topk" -> RetrievalQueries.proximityTopKSql,
    "text_proximity_indexed" -> RetrievalQueries.proximityTopKSql,
    // exact-match boost: BM25 + phrase legs fused by RRF, BOTH legs
    // served by the ONE maintained lexical index (postings + positions)
    "retrieval_hybrid_rrf_phrase" ->
      RetrievalQueries.hybridRrfPhraseSql,
    // the hybrid quality gate: integer overlap/displacement of the
    // IVF-legged fusion vs the brute-legged fusion per nprobe —
    // oracle-exact measurement of an approximation, like dedup_lsh_recall
    "retrieval_hybrid_recall" -> RetrievalQueries.hybridRecallSql,
    // retrieval capstone: curate -> dedup -> derive retrieval structures
    // -> serve a hybrid batch, one DAG, stage interactions hash-gated
    "retrieval_e2e" -> RetrievalQueries.retrievalE2eSql,
    // the index-served capstone: same curation + lexical recompute
    // oracle, dense leg recomputed as the IVF-SQ8 chain over the
    // curated embeddings (== the rebuilt persisted index's state)
    "retrieval_e2e_indexed" -> RetrievalQueries.retrievalE2eIndexedSql,
    "mm_features" -> TextQueries.multimodalFeaturesSql,
    "mm_frame_sample" -> TextQueries.multimodalFramesSql,
    "mm_frames_gif" -> TextQueries.multimodalFramesGifSql,
    "mm_decode_bmp" -> TextQueries.multimodalDecodeBmpSql,
    "mm_decode_png" -> TextQueries.multimodalDecodePngSql,
    "mm_decode_jpeg" -> TextQueries.multimodalDecodeJpegSql,
    "mm_audio_energy" -> TextQueries.multimodalAudioEnergySql,
    "mm_decode_wav" -> TextQueries.multimodalDecodeWavSql,
    "mm_resize" -> TextQueries.multimodalResizeSql,
    "mm_ahash_dedup" -> TextQueries.multimodalAhashDedupSql,
    "mm_ahash_near" -> TextQueries.multimodalAhashNearSql,
    "mm_audiohash_dedup" -> TextQueries.multimodalAudioHashDedupSql,
    "mm_audiohash_near" -> TextQueries.multimodalAudioHashNearSql,
    "mm_framehash_dedup" -> TextQueries.multimodalFrameHashDedupSql,
    "mm_framehash_near" -> TextQueries.multimodalFrameHashNearSql,
    "ann_sq8_topk" -> SimilarityQueries.sq8TopKSql,
    "ann_ivf_sq8_topk" -> SimilarityQueries.ivfSq8TopKSql,
    "ann_pq_topk" -> SimilarityQueries.pqTopKSql,
    "ann_pq_refined" -> SimilarityQueries.pqRefinedTopKSql,
    "ann_ivf_pq_topk" -> SimilarityQueries.ivfPqTopKSql,
    "ann_recall_report" -> SimilarityQueries.annRecallReportSql,
    "ann_recall_sampled" -> SimilarityQueries.annRecallReportSampledSql,
    "semantic_dedup" -> SimilarityQueries.semanticDedupSql,
    "semantic_dedup_indexed" -> SimilarityQueries.semanticDedupIndexedSql,
    // the persisted-IVF probe is bit-identical to the recompute form,
    // so the same oracle SQL gates both
    "ann_ivf_sq8_indexed_topk" -> SimilarityQueries.ivfSq8TopKSql,
    // post-absorb retrain: centroids re-drawn from the absorbed corpus,
    // ranges still the frozen build-half geometry
    "ann_ivf_sq8_retrained_topk" ->
      SimilarityQueries.ivfSq8RetrainedTopKSql,
    // post-absorb rebuild: ranges AND centroids both re-derived from
    // the absorbed corpus, every stored code re-encoded — the fresh-
    // range complement of the retrained gate
    "ann_ivf_sq8_rebuilt_topk" ->
      SimilarityQueries.ivfSq8RebuiltTopKSql,
    "ann_ivf_drift" -> SimilarityQueries.ivfDriftSql,
    "text_utf8_profile" -> TextQueries.utf8ProfileSql,
    "ngram_heavy_hitters" -> TextQueries.ngramHeavyHittersSql
  )
}
