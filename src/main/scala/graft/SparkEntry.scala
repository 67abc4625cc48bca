package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator-inventory entries (SURVEY.md §2) to runnable
  * DataFrame builders over a scale-factor dir; `oracleSql` holds the DuckDB
  * equivalent for hash-verification. Column names/aliases match between the
  * two by construction (driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Mirror of the reference's county-vote pivot→ratio chain
    * (01_DataMerge.R:69-89): fact ⨝ broadcast dims → pivot → ratio. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pivotRatio(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pivot_ratio"       -> (Relational.pivotRatio _),
    "q_agg_sum"           -> (Relational.aggSum _),
    "q_group_mean_having" -> (Relational.groupMeanHaving _),
    "q_region_rollup"     -> (Relational.regionRollup _),
    // one-pass ROLLUP with grouping() flags (leaf + subtotal + total)
    "q_rollup"            -> (Relational.regionNationRollup _),
    // running total over the monthly aggregate (window AFTER agg)
    "q_cumsum"            -> (Relational.cumulativeSum _),
    // full grouping-set power set (margins + total) in one Expand pass
    "q_cube"              -> (Relational.segmentPriorityCube _),
    "q_minmax"            -> (Relational.minMax _),
    "q_distinct"          -> (Relational.distinctPairs _),
    "q_freq_table"        -> (Relational.freqTable _),
    "q_histogram"         -> (Relational.histogram _),
    "q_zscore"            -> (Relational.zscore _),
    "q_metrics"           -> (Relational.metrics _),
    // pairwise Pearson matrix from one exact-decimal cross-moment pass
    "q_corr_matrix"       -> (Relational.corrMatrix _),
    // daily-grid resample with forward fill + auditable gap flag
    "q_resample_ffill"    -> (Relational.resampleFfill _),
    // trailing 7-day RANGE-frame moving average (calendar-aware window)
    "q_moving_avg"        -> (Relational.movingAvg _),
    // ordered 3-step conversion funnel (earliest-completion state per user)
    "q_funnel"            -> (Behavior.funnel _),
    // weekly cohort retention grid (first-week cohorts × activity offsets)
    "q_cohort"            -> (Behavior.cohortRetention _),
    "q_na_profile"        -> (Relational.naProfileEvents _),
    // cleaning / projection surface (SURVEY §2.2)
    "q_cond_update"       -> (Cleaning.condUpdate _),
    "q_blank_to_null"     -> (Cleaning.blankToNull _),
    "q_select_rename"     -> (Cleaning.selectRenameDrop _),
    "q_schema_cast"       -> (Cleaning.schemaCast _),
    "q_date_filter"       -> (Cleaning.dateFilter _),
    "q_outlier_keepnull"  -> (Cleaning.outlierKeepNull _),
    "q_notnull_filter"    -> (Cleaning.notNullFilter _),
    "q_na_drop"           -> (Cleaning.naDrop _),
    "q_null_split"        -> (Cleaning.nullSplit _),
    "q_limit_slice"       -> (Cleaning.limitSlice _),
    "q_row_index"         -> (Cleaning.rowIndex _),
    // string/date function surface (SURVEY §2.8)
    "q_string_extract"    -> (Strings.stringExtract _),
    "q_date_parse"        -> (Strings.dateParse _),
    // dictionary edit-distance similarity join (length-banded candidates)
    "q_edit_join"         -> (Strings.editJoin _),
    // joins / sets / windows / top-k (SURVEY §2.3, §2.5-§2.7)
    "q_left_join"         -> (Joins.leftJoin _),
    "q_left_join_distinct"-> (Joins.leftJoinDistinct _),
    "q_union"             -> (Joins.unionAll _),
    "q_ntile"             -> (Joins.ntileDecile _),
    "q_topk"              -> (Joins.topK _),
    // categorical estimator (SURVEY §2.8 F12)
    "q_rare_other"        -> (RareCategory.query _),
    // reshape (SURVEY §2.9 M14)
    "q_melt"              -> (Relational.meltWideToLong _),
    // exact grouped quantiles (oracle = quantile_cont; approx variant is
    // the scale path, error-bound-tested in RelationalSpec)
    "q_percentile"        -> (Relational.percentiles _),
    // ANSI PERCENTILE_DISC: smallest actual value with cume_dist >= p
    "q_percentile_disc"   -> (Relational.percentileDisc _),
    // explicit GROUPING SETS: the asymmetric set list cube/rollup can't say
    "q_grouping_sets"     -> (Relational.groupingSetsProfile _),
    // robust outlier stats: median, MAD, 3-sigma-equivalent robust fence
    "q_mad"               -> (Relational.madOutliers _),
    // equi-depth histogram: decile-bounded buckets, ~n/10 rows each
    "q_equidepth"         -> (Relational.equiDepthHistogram _),
    // quantile normalization: per-segment deciles onto pooled reference
    "q_quantile_norm"     -> (Relational.quantileNorm _),
    // Lorenz curve + exact rank-formula Gini over customer spend
    "q_gini"              -> (Relational.giniLorenz _),
    // HLL++ distinct sketch beside the exact count — rows-only (sketches
    // aren't replayable cross-engine); error bound pinned in-engine
    "q_approx_distinct"   -> (Relational.approxDistinct _),
    // GK quantile sketch beside the exact answer — rows-only, self-gated
    // inside the exact ±2% rank band (200x the sketch's guarantee)
    "q_approx_pct"        -> ((s, d) => Relational.percentilesApprox(s, d)),
    // ML module (SURVEY §2.9) — model outputs: rows-only driver check
    "q_ols_forecast"      -> (graft.ml.OlsPipeline.query _),
    // grouped simple OLS: one closed-form fit per segment, exact moments
    "q_group_ols"         -> (graft.ml.OlsPipeline.groupedOls _),
    "q_ols_metrics"       -> (graft.ml.OlsPipeline.metricsLong _),
    // the one-hot design matrix the tree estimators consume, read back
    // from the assembled vector — the deterministic stage around the
    // self-gated ensembles, now oracle-hashed
    "q_feature_matrix"    -> (graft.ml.TreePipeline.featureMatrix _),
    "q_rf_importance"     -> (graft.ml.TreePipeline.rfImportance _),
    "q_gbt_metrics"       -> (graft.ml.TreePipeline.gbtMetrics _),
    "q_cv_tuning"         -> (graft.ml.TreePipeline.cvBestParams _),
    // LLM-pipeline dedup (brief first-class; SURVEY §7.1(7))
    "q_exact_dedup"       -> (Dedup.exactDedup _),
    // cross-doc repeated w-token spans (fp-prune-then-verify; per-doc
    // removal work-list) — the substring-grain pass between whole-doc
    // exact dedup and the similarity paths
    "q_substring_dedup"   -> ((s, d) => Dedup.substringDedup(s, d)),
    // the rewrite pass consuming the span work-list: hot-span coverage
    // masked out per doc, document re-emitted with covered tokens dropped
    "q_span_mask"         -> ((s, d) => Dedup.spanMask(s, d)),
    // suffix-grain arbitrary-length maximal repeated-span removal (Lee
    // et al.'s ExactSubstr semantics: site-grain repetition incl. in-doc,
    // maximal interval output) — the r15 judge-granted wire key
    "q_suffix_dedup"      -> ((s, d) => Dedup.suffixDedup(s, d)),
    "q_minhash_neardup"   -> ((s, d) => Dedup.minhashNearDup(s, d)),
    "q_simhash_neardup"   -> ((s, d) => Dedup.simhashNearDup(s, d)),
    "q_ngram_jaccard"     -> (Dedup.ngramJaccard _),
    // EXACT Jaccard>=9/10 self-join via prefix filtering (no sketch),
    // rolled up per doc (partner count + best match) for linear output
    "q_sim_join"          -> (Dedup.prefixSimJoin _),
    // minhash estimate vs exact jaccard on the planted ground truth
    "q_mh_accuracy"       -> (Dedup.minhashAccuracy _),
    // the engineered fix: same audit under tabulation hashing
    "q_mh_tabulation"     -> (Dedup.minhashTabulation _),
    "q_dedup_survivors"   -> (Dedup.dedupSurvivors _),
    // per-source signatures via the native mergeable minhash_agg
    // aggregate → pairwise slot-agreement Jaccard estimates
    "q_source_sim"        -> (Dedup.sourceSimilarity _),
    // the production dedup workload: a new batch classified against the
    // indexed history (exact hash hit → cross-set LSH → Jaccard verify)
    "q_incr_dedup"        -> (Dedup.incrementalDedup _),
    // bloom-prefiltered ingest dedup: history sketch probe classifies the
    // non-dup majority with zero shuffle; only "maybe" rows join
    "q_bloom_dedup"       -> (Dedup.bloomDedup _),
    // LLM-pipeline text analysis / similarity / multimodal (brief first-class)
    "q_lang_id"           -> (TextAnalysis.langId _),
    "q_quality"           -> (TextAnalysis.quality _),
    "q_token_count"       -> (TextAnalysis.tokenCount _),
    "q_fingerprint"       -> (TextAnalysis.fingerprint _),
    "q_tfidf"             -> ((s, d) => TextAnalysis.tfidf(s, d)),
    // inverted-index build: df + capped postings via two-stage top-k
    "q_inverted_index"    -> ((s, d) => TextAnalysis.invertedIndex(s, d)),
    // exact heavy hitters via mergeable Misra-Gries sketch + recount
    "q_heavy_hitters"     -> (TextAnalysis.heavyHitters _),
    // vocabulary coverage curve at top-k cutoffs (tokenizer sizing / OOV)
    "q_vocab_coverage"    -> (TextAnalysis.vocabCoverage _),
    // corpus curation: PII redaction, pretraining-mix sampling, sequence
    // packing (brief first-class; the steps between dedup and the trainer)
    "q_redact"            -> (Curation.redact _),
    "q_sample_mix"        -> (Curation.sampleMixture _),
    // per-domain document quota via the skew-proof two-stage top-k
    "q_domain_cap"        -> ((s, d) => Curation.domainCap(s, d)),
    // α=1/2 temperature-rebalanced mixture (sqrt is correctly rounded →
    // the rate derivation is cross-engine exact)
    "q_temp_mix"          -> (Curation.temperatureMix _),
    "q_seq_pack"          -> ((s, d) => Curation.seqPack(s, d)),
    // overlapping context-window chunking (long doc → training samples)
    "q_chunk_windows"     -> (Curation.chunkWindows _),
    // eval-overlap decontamination: broadcast benchmark 8-gram set vs the
    // corpus's word_ngrams — the pre-trainer hygiene pass
    "q_decontam"          -> (Curation.decontaminate _),
    // Gopher-style repetition metrics: one repeat_stats kernel pass/row
    "q_repetition"        -> (TextAnalysis.repetition _),
    // the LLM-side flagship: lang-ID → repetition → dedup → decontam →
    // redact as ONE lazy lineage (the curation mirror of q_e2e)
    "q_curate_chain"      -> (Curation.curateChain _),
    // key-derived shard assignment + per-shard write manifest
    "q_shard_manifest"    -> ((s, d) => Curation.shardManifest(s, d)),
    // iterative graph analytics: 5 power-iteration PageRank rounds in
    // exact integer micro-units (order-independent, oracle-replayable)
    "q_pagerank"          -> (Graph.pageRank _),
    // dataset-versioning: snapshot diff by content hash
    "q_snapshot_diff"     -> (Graph.snapshotDiff _),
    // degree-ordered triangle counting + clustering coefficient
    "q_triangles"         -> (Graph.triangles _),
    // dataset-versioning: CDC MERGE (delete/update/insert apply) profile
    "q_merge_upsert"      -> (Versioning.mergeUpsert _),
    // SCD Type-2 history build: change log → validity intervals
    "q_scd2"              -> (Versioning.scd2 _),
    // declarative data-quality expectation suite (FK/unique/range/null)
    "q_dq_checks"         -> (DqChecks.query _),
    // one-pass column profile: nulls/distincts/min/max per column
    "q_col_profile"       -> (DqChecks.colProfile _),
    // Benford first-digit forensic screen on the money column
    "q_benford"           -> (DqChecks.benford _),
    // incremental view maintenance: merge(history, delta) ≡ recompute
    "q_incr_agg"          -> (Versioning.incrementalAgg _),
    // market-basket co-purchase pairs: capped expansion, support + lift
    "q_copurchase"        -> (Basket.coPurchase _),
    // robust-stats winsorization at exact [p05, p95] in integer cents
    "q_winsorize"         -> (Relational.winsorize _),
    // cascading referential delete audit (tombstones propagate over FKs)
    "q_cascade_delete"    -> (Versioning.cascadeDelete _),
    // Z-order layout: Morton-key zone map for two-column data skipping
    "q_zorder"            -> (Layout.zOrderLayout _),
    // BPE tokenizer-training pair statistics (deterministic top-20)
    "q_bpe_pairs"         -> ((s, d) => TextAnalysis.bpePairs(s, d)),
    // LAG window: per-customer order-gap days, profiled per priority
    "q_lag_gaps"          -> (Relational.orderGaps _),
    "q_ann_topk"          -> (Similarity.bruteForceTopK _),
    "q_ann_lsh"           -> (Similarity.lshTopK _),
    "q_ann_ivf"           -> ((s, d) => Similarity.ivfTopK(s, d)),
    "q_embed_neardup"     -> ((s, d) => Similarity.cosineNearDup(s, d)),
    // embedding-space drift: per-dimension cohort centroid shift
    "q_embed_drift"       -> (Similarity.embedDrift _),
    // ANN recall audit: IVF result vs exact brute-force ground truth
    "q_ann_recall"        -> (Similarity.annRecall _),
    // embedding-modality survivor selection (pairs → components → keeper)
    "q_embed_survivors"   -> (Similarity.embedSurvivors _),
    "q_multimodal_meta"   -> (Multimodal.query _),
    // per-doc byte-level decode gate: header fields parsed from actual
    // payload bytes at fixed offsets; dims/pixel sums from the real codec
    "q_image_decode"      -> (Multimodal.decodeQuery _),
    // real javax.sound WAV decode: RIFF/fmt header bytes + decoder-framed
    // PCM sample sums, oracle-replayed from the doc_id spec
    "q_audio_decode"      -> (Multimodal.audioDecodeQuery _),
    // real MJPEG-style video: SOI-marker demux + per-sampled-frame ImageIO
    // JPEG decode, closed-form pixel sums replayed from the doc_id spec
    "q_video_frames"      -> (Multimodal.videoFramesQuery _),
    // county-cardinality geo join: 3,000 jittered quads, candidate-pruned
    // exact ray casting, full SQL replay (the reference's county scale)
    "q_geo_county"        -> (GeoJoin.countyQuery _),
    // sources/sinks (SURVEY §2.1)
    "q_csv_roundtrip"     -> (graft.sources.CsvIO.csvRoundTrip _),
    // JSONL (the LLM-corpus interchange format): declared-schema scan,
    // DROPMALFORMED corrupt lines, lossless text round-trip
    "q_jsonl_roundtrip"   -> (graft.sources.JsonIO.jsonlRoundTrip _),
    // ORC sink/source (the Hive-era columnar interchange format)
    "q_orc_roundtrip"     -> (graft.sources.CsvIO.orcRoundTrip _),
    "q_checkpoint_prune"  -> (graft.sources.CsvIO.checkpointPrune _),
    "q_bucketed_join"     -> ((s, d) => graft.sources.CsvIO.bucketedJoin(s, d)),
    // hot-key salted join (100 TB skew discipline; result == plain join)
    "q_skew_join"         -> (Skew.query _),
    // as-of temporal join (union + one window pass; oracle = DuckDB ASOF)
    "q_asof_join"         -> (AsOfJoin.query _),
    // the skew-resilient two-pass as-of through the SAME oracle
    "q_asof_skew"         -> (AsOfJoin.querySkew _),
    // bucketed interval join (equi-join on derived day bucket + residual)
    "q_range_join"        -> (RangeJoin.query _),
    "q_model_roundtrip"   -> (graft.ml.ModelIO.modelRoundTrip _),
    // event-time windows (SURVEY §2.10, §7.1(7))
    "q_window_tumbling"   -> (graft.streaming.EventWindows.tumbling _),
    "q_window_sliding"    -> (graft.streaming.EventWindows.sliding _),
    "q_window_session"    -> (graft.streaming.EventWindows.sessions _),
    // REAL Structured Streaming run (readStream → AvailableNow → memory
    // sink) sharing the batch tumbling oracle
    "q_stream_tumbling"   -> (graft.streaming.Streaming.streamTumbling _),
    // REAL streaming sliding windows (each event updates two window
    // states) sharing the batch sliding oracle
    "q_stream_sliding"    -> (graft.streaming.Streaming.streamSliding _),
    // REAL flatMapGroupsWithState sessionization run (readStream →
    // AvailableNow → Append memory sink); oracle = batch sessions minus
    // each user's still-open last session
    "q_stream_sessions"   -> (graft.streaming.Streaming.streamSessions _),
    // the sessionizer under REAL multi-batch arrival: 4 chronological
    // time-range files, one micro-batch each, disorder-covering watermark
    "q_stream_sessions_multi" ->
      (graft.streaming.Streaming.streamSessionsMulti _),
    // REAL stream-static join run (readStream ⋈ customer dim → windowed
    // agg); oracle = the equivalent batch join+agg
    "q_stream_enrich"     -> (graft.streaming.Streaming.streamEnrich _),
    // REAL stream-stream interval join (watermarked both sides; range
    // condition bounds the state); oracle = q_range_join's batch SQL
    "q_stream_range"      -> ((s, d) => graft.streaming.Streaming.streamRangeJoin(s, d)),
    // exactly-once streaming parquet sink (foreachBatch + dynamic
    // partition overwrite), gated by reading the sink back
    "q_stream_sink"       -> (graft.streaming.Streaming.streamToParquet _),
    // REAL watermarked streaming dedup run (readStream →
    // dropDuplicatesWithinWatermark → Append memory sink); oracle = the
    // deduped key set (survivor payload is processing-order dependent in
    // ANY engine, the key set is the stable contract)
    "q_stream_dedup"      -> (graft.streaming.Streaming.streamDedup _),
    // the ingest-side curation gate: lang-ID + repetition kernels running
    // statelessly per micro-batch over a documents file stream
    "q_stream_curate"     -> (graft.streaming.Streaming.streamCurate _),
    // REAL multi-batch stateful funnel (mapGroupsWithState greedy triple);
    // gated by the SAME oracle as the batch funnel
    "q_stream_funnel"     -> (graft.streaming.Streaming.streamFunnel _),
    // streaming drift monitor: daily windows vs broadcast baseline bins,
    // exact integer drift numerators — continuous form of q_value_drift
    "q_stream_drift"      -> (graft.streaming.Streaming.streamDrift _),
    // custom Misra-Gries UDAF inside streaming state: per-day top users
    "q_stream_topk"       -> (graft.streaming.Streaming.streamTopkUsers _),
    // streaming changepoint: counts as window state, two-sided finish
    "q_stream_cpt"        -> (graft.streaming.Streaming.streamChangepoint _),
    // REAL mapGroupsWithState run (per-user running totals, Update mode);
    // cents-in-double arithmetic makes the stateful fold exact → oracle =
    // the batch per-user aggregate
    "q_stream_totals"     -> (graft.streaming.Streaming.streamTotals _),
    // geo join (SURVEY §2.3 J5, §2.1 S7)
    "q_geo_join"          -> (GeoJoin.query _),
    // positional-append rewrite (SURVEY §2.7 U2, §2.3 J7)
    "q_cbind"             -> (Joins.cbindByIndex _),
    // EXISTS / NOT EXISTS as key-only-shuffle joins; full outer presence
    "q_semi_join"         -> (Joins.semiJoin _),
    "q_anti_join"         -> (Joins.antiJoin _),
    // ANSI INTERSECT/EXCEPT distinct set ops as explicit surface
    "q_set_ops"           -> (Joins.setOps _),
    // bag-semantics INTERSECT ALL / EXCEPT ALL (multiplicities pinned)
    "q_set_ops_all"       -> (Joins.setOpsAll _),
    // null-safe equi-join: NULL keys match (IS NOT DISTINCT FROM)
    "q_nullsafe_join"     -> (Joins.nullSafeJoin _),
    // latest-per-key via aggregate argmax (== the window rank-1 form)
    "q_latest_order"      -> (Joins.latestOrder _),
    // Welch z two-sample experiment readout from exact moments
    "q_ab_test"           -> (Behavior.abTest _),
    // last-touch attribution: purchases credited to the preceding channel
    "q_attribution"       -> (Behavior.attribution _),
    // RANK / DENSE_RANK / PERCENT_RANK tie semantics in one window pass
    "q_rank_funcs"        -> (Joins.rankFunctions _),
    // gaps-and-islands: longest consecutive-day streak distribution
    "q_streaks"           -> (Behavior.streaks _),
    // first-order Markov next-event transition matrix
    "q_markov"            -> (Behavior.markov _),
    // session-path mining: 30-min sessions clustered by their first-8
    // event-type path; top paths with conversion share
    "q_session_paths"     -> (Behavior.sessionPaths _),
    // chi-square independence cells for event_type x variant
    "q_chisq"             -> (Behavior.chiSquare _),
    // duration-weighted value means over irregular event arrivals
    "q_time_weighted"     -> (Behavior.timeWeighted _),
    // time-bound conversion: purchase preceded by a view within 1h
    "q_conversion_window" -> (Behavior.conversionWindow _),
    // numeric value-distribution drift: log2-cents bins, exact TVD numerators
    "q_value_drift"       -> (Behavior.valueDrift _),
    // robust MAD-fence anomaly alarm over per-type daily volumes
    "q_anomaly"           -> (Behavior.seriesAnomaly _),
    // skyline (Pareto frontier): bucketed dominance prune == brute force
    "q_skyline"           -> (Skyline.query _),
    // level-shift changepoint: two-sided 7-day window means + planted shift
    "q_changepoint"       -> (Behavior.changepoint _),
    // per-group top-k: 3 highest-revenue suppliers per nation
    "q_topk_group"        -> (Joins.topKPerGroup _),
    // PSI language-mix drift between two source cohorts
    "q_lang_drift"        -> (TextAnalysis.langDrift _),
    // interval-sweep peak concurrent users per day
    "q_concurrency"       -> (Behavior.concurrency _),
    // DAU / trailing-7-day WAU engagement ratio
    "q_stickiness"        -> (Behavior.stickiness _),
    // weight-proportional priority sampling over the corpus
    "q_weighted_sample"   -> ((s, d) => Curation.weightedSample(s, d)),
    // exact per-stratum top-k-by-hash sample, certified prefilter+fallback
    "q_stratified"        -> ((s, d) => Curation.stratifiedSample(s, d)),
    // Laplace-smoothed bigram LM fluency scoring (perplexity proxy)
    "q_bigram_lm"         -> (TextAnalysis.bigramScore _),
    // BM25 ranked retrieval with exact quarter-bit integer idf
    "q_bm25"              -> (TextAnalysis.bm25 _),
    // retrieval eval harness: P@5 / recall@10 / MRR vs independent labels
    "q_retrieval_eval"    -> (TextAnalysis.retrievalEval _),
    // grid-bucketed nearest-POI join with certified-radius fallback
    "q_geo_nearest"       -> (GeoJoin.nearestPoi _),
    // decile calibration-reliability curve on the OLS test split
    "q_calibration"       -> ((s, d) =>
      graft.ml.OlsPipeline.calibrationCurve(s, d)),
    "q_full_outer"        -> (Joins.fullOuterJoin _),
    // OLS diagnostics (SURVEY §2.9 M5) — rows-only
    "q_ols_diagnostics"   -> (graft.ml.Diagnostics.query _),
    // full 01+02 chain as one lineage (SURVEY §3.1, §7.1(3))
    "q_enrich_pipeline"   -> (graft.plans.EnrichPipeline.query _),
    // the flagship 01→03 chain: enrich → OLS fit → county forecast →
    // calibration as ONE lazy lineage through a single oracle
    "q_e2e"               -> (graft.ml.E2eChain.query _),
    // JSON column extraction (events.props)
    "q_json_extract"      -> (Relational.jsonExtract _),
  )

  /** One Lloyd round of the IVF coarse quantizer in DuckDB SQL: assignment
    * by first-minimum argmin over exact distances, then a canonical
    * vec_id-ordered left fold per list — the bit-identical replay of
    * `Similarity.kmeansCentroids` round `i` (prev = previous centroid CTE).
    * Empty lists keep their previous centroid via the LEFT JOIN COALESCE. */
  /** The fixed-size lowest-QueryK LCG query draw (Similarity.annQueryIds)
    * as a DuckDB CTE over `e` — shared by the three ANN oracles so the
    * query side of every ANN replay is CONSTANT at any corpus size. */
  private def annQueryCte: String =
    s"""qd AS (
       |  SELECT vec_id FROM (
       |    SELECT vec_id, ROW_NUMBER() OVER (ORDER BY
       |        ((vec_id % 2147483648) * 2654435761 + 7) % 2147483648,
       |        vec_id) AS qrn
       |    FROM e) WHERE qrn <= ${graft.operators.Similarity.QueryK})"""
      .stripMargin

  private def ivfRound(i: Int, prev: String): String =
    s"""a$i AS (
       |  SELECT vec_id, emb, list_id FROM (
       |    SELECT s.vec_id, s.emb, c.j AS list_id,
       |      ROW_NUMBER() OVER (PARTITION BY s.vec_id ORDER BY
       |        list_dot_product(c.c, c.c) - 2 * list_dot_product(c.c, s.emb),
       |        c.j) AS rn
       |    FROM samp s CROSS JOIN $prev c) WHERE rn = 1),
       |u$i AS (
       |  SELECT list_id,
       |    list_reduce(list(emb ORDER BY vec_id),
       |      (a, b) -> list_transform(range(1, len(a) + 1), x -> a[x] + b[x]))
       |      AS sumv,
       |    COUNT(*) AS n
       |  FROM a$i GROUP BY 1),
       |c$i AS (
       |  SELECT p.j, COALESCE(list_transform(u$i.sumv, v -> v / u$i.n), p.c)
       |    AS c
       |  FROM $prev p LEFT JOIN u$i ON u$i.list_id = p.j)""".stripMargin

  /** Shared CTE prefix replaying the deterministic OLS pipeline
    * (ml.OlsPipeline) in DuckDB: the constructed dataset (LCG noise, LCG
    * 75/25 split), the exact floor-quantized BIGINT-micros gram sums
    * (OlsPipeline.esum) over the training
    * rows, and the Cramer solve whose determinant expressions come from
    * the SAME permutation sequence as the driver fold (det4Sql ⇔ det4),
    * so both engines perform identical double operations in identical
    * order. `dsCtes` supplies the fit input (default: the lineitem replay
    * of OlsPipeline.dataset; q_e2e passes the enriched-orders ds) — it
    * must expose county, x1..x3, y, bucket, is_forecast. */
  private def olsPrefix(gramFilter: String,
                        dsCtes: String = lineitemDsCte): String = {
    def s(i: Int, j: Int) = s"s_${math.min(i, j)}_${math.max(i, j)}"
    val gramCells =
      (for (i <- 0 to 4; j <- i to 4 if !(i == 0 && j == 0)) yield {
        val x = Map(1 -> "x1", 2 -> "x2", 3 -> "x3", 4 -> "y")
        val term = if (i == 0) x(j) else s"${x(i)} * ${x(j)}"
        s"  CAST(SUM(CAST(FLOOR(($term) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS ${s(i, j)}"
      }) :+ "  CAST(COUNT(*) AS DOUBLE) AS s_0_0"
    val detA = graft.ml.OlsPipeline.det4Sql((i, j) => s(i, j))
    val betas = (0 to 3).map { k =>
      val detK = graft.ml.OlsPipeline.det4Sql((i, j) =>
        if (j == k) s"s_${i}_4" else s(i, j))
      s"  ($detK) / ($detA) AS b$k"
    }
    s"""$dsCtes,
       |g AS (
       |  SELECT
       |${gramCells.mkString(",\n")}
       |  FROM ds WHERE $gramFilter),
       |beta AS (
       |  SELECT
       |${betas.mkString(",\n")}
       |  FROM g)""".stripMargin
  }

  /** The lineitem fit-input CTE — OlsPipeline.dataset's replay (LCG noise,
    * LCG 75/25 bucket, forecast mask). */
  private def lineitemDsCte: String =
    s"""ds AS (
      |  SELECT l_orderkey, l_partkey % 500 AS county,
      |    l_quantity AS x1, l_discount AS x2, l_tax AS x3,
      |    ${graft.ml.OlsPipeline.labelSql} AS y,
      |    (((l_orderkey % 2147483648) * 1103515245 + 123) % 2147483648)
      |      >> 29 AS bucket,
      |    l_orderkey % 10 = 0 AS is_forecast
      |  FROM lineitem)""".stripMargin

  /** The enrich-chain CTEs (plans.EnrichPipeline replay): priority-ratio
    * dimension, rare-category frequency model, geo grid cell, the cleaning
    * filters — ending in the per-order `base`. ONE copy shared by
    * q_enrich_pipeline (aggregates it) and q_e2e (fits a regression on
    * it), so the two replays can't drift. */
  private def enrichBaseCtes: String =
    """piv AS (
      |  SELECT n.n_name,
      |    CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '1-URGENT'
      |      THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) * 100
      |      AS BIGINT) AS urgent_cents,
      |    CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '2-HIGH'
      |      THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) * 100
      |      AS BIGINT) AS high_cents
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY n.n_name),
      |ratio AS (
      |  SELECT n_name, CASE WHEN urgent_cents + high_cents = 0 THEN NULL
      |    ELSE ROUND(CAST(urgent_cents AS DOUBLE) /
      |               CAST(urgent_cents + high_cents AS DOUBLE), 6)
      |  END AS ratio FROM piv),
      |cats AS (
      |  SELECT *, o_orderstatus ||
      |    CASE WHEN o_orderkey % 50 = 0 THEN '_rare' ELSE '' END AS cat
      |  FROM orders),
      |freq AS (
      |  SELECT cat,
      |    CAST(COUNT(*) AS DOUBLE) /
      |      (SELECT CAST(COUNT(*) AS DOUBLE) FROM orders) AS share
      |  FROM cats GROUP BY 1),
      |base AS (
      |  SELECT o.o_orderkey,
      |    ((CAST(FLOOR((o.o_custkey * 7) % 120 - 60 + 0.25) AS BIGINT) + 60)
      |     + (CAST(FLOOR(((o.o_custkey * 13) % 36 * 10 - 180 + 0.25) / 10)
      |             AS BIGINT) + 18) * 120) % 25 AS region_id,
      |    CASE WHEN f.share >= 0.05 THEN o.cat
      |         ELSE 'Other' END AS status_cat,
      |    CAST(o.o_totalprice AS DECIMAL(18,2)) AS price,
      |    r.ratio
      |  FROM cats o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  LEFT JOIN ratio r ON n.n_name = r.n_name
      |  JOIN freq f ON o.cat = f.cat
      |  WHERE r.ratio IS NOT NULL
      |    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND (CAST(o.o_totalprice AS DECIMAL(18,2)) < 400000
      |         OR o.o_totalprice IS NULL))""".stripMargin

  /** The enriched-orders fit input for q_e2e (ml.E2eChain.dataset replay):
    * features from the ENRICHMENT products — ratio, exact-cents k$ price,
    * rare-category indicator — with the same LCG label/bucket machinery
    * as the lineitem ds, keyed on o_orderkey. */
  private def e2eDsCtes: String =
    s"""$enrichBaseCtes,
       |ds AS (
       |  SELECT o_orderkey, region_id AS county,
       |    ratio AS x1,
       |    CAST(CAST(price * 100 AS BIGINT) AS DOUBLE) / 10000000.0 AS x2,
       |    CASE WHEN status_cat = 'Other' THEN 1.0 ELSE 0.0 END AS x3,
       |    ratio * 3
       |      - CAST(CAST(price * 100 AS BIGINT) AS DOUBLE) / 10000000.0 * 200
       |      + CASE WHEN status_cat = 'Other' THEN 1.0 ELSE 0.0 END * 50
       |      + (CAST(((o_orderkey % 1000003) * 2654435761 + 7) % 1000003
       |              AS DOUBLE)
       |         / 1000003.0 * 10.0 - 5.0) AS y,
       |    (((o_orderkey % 2147483648) * 1103515245 + 123) % 2147483648)
       |      >> 29 AS bucket,
       |    -- residue 3, NOT 0: the %50 rare tail is a subset of residue 0
       |    -- and must stay in training (see ml.E2eChain.dataset)
       |    o_orderkey % 10 = 3 AS is_forecast
       |  FROM base)""".stripMargin

  /** Score→county-forecast→calibration tail shared verbatim by
    * q_ols_forecast and q_e2e — entirely in terms of ds/beta. */
  private def olsForecastBody: String =
    """fsc AS (
      |  SELECT county, b.b0 + x1 * b.b1 + x2 * b.b2 + x3 * b.b3 AS p
      |  FROM ds CROSS JOIN beta b WHERE is_forecast),
      |cty AS (
      |  SELECT county, COUNT(*) AS cnt,
      |    CAST(SUM(CAST(FLOOR((p) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT(*) AS f
      |  FROM fsc GROUP BY county HAVING COUNT(*) > 5),
      |tsc AS (
      |  SELECT county, b.b0 + x1 * b.b1 + x2 * b.b2 + x3 * b.b3 AS p, y
      |  FROM ds CROSS JOIN beta b
      |  WHERE NOT is_forecast AND bucket = 3),
      |tc AS (
      |  SELECT county, COUNT(*) AS cnt,
      |    CAST(SUM(CAST(FLOOR((p) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT(*) AS f,
      |    CAST(SUM(CAST(FLOOR((y) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT(*) AS a
      |  FROM tsc GROUP BY county HAVING COUNT(*) > 5),
      |calm AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(FLOOR((f) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sf,
      |    CAST(SUM(CAST(FLOOR((a) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sa,
      |    CAST(SUM(CAST(FLOOR((f * f) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sff,
      |    CAST(SUM(CAST(FLOOR((f * a) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sfa
      |  FROM tc),
      |cal AS (
      |  SELECT slope, (sa - slope * sf) / n AS icpt FROM (
      |    SELECT n, sf, sa,
      |      (n * sfa - sf * sa) / (n * sff - sf * sf) AS slope
      |    FROM calm)),
      |out AS (
      |  SELECT county, cnt,
      |    ROUND(f * cal.slope + cal.icpt, 4) AS calibrated_forecast
      |  FROM cty CROSS JOIN cal)
      |SELECT county, cnt, calibrated_forecast FROM out
      |ORDER BY county""".stripMargin

  /** DuckDB replay of ml.Diagnostics.query: the gram over ALL observed
    * rows (olsPrefix), the e²-weighted moment pass, then BP / VIF / HC0 as
    * the SAME closed-form algebra the driver runs — generated det3/det4
    * expansions, adjugate inverse rows, quadratic forms — term for term in
    * the same evaluation order. */
  private def olsDiagnosticsSql: String = {
    import graft.ml.OlsPipeline.{det3Sql, det4Sql}
    def sc(i: Int, j: Int) = s"s_${math.min(i, j)}_${math.max(i, j)}"
    def mc(i: Int, j: Int) = s"m_${math.min(i, j)}_${math.max(i, j)}"
    val detA = det4Sql(sc)
    val x = Map(1 -> "x1", 2 -> "x2", 3 -> "x3")
    val mCells = (for (i <- 0 to 3; j <- i to 3) yield {
      val term =
        if (i == 0 && j == 0) "e * e"
        else if (i == 0) s"(e * e) * ${x(j)}"
        else s"(e * e) * ${x(i)} * ${x(j)}"
      s"  CAST(SUM(CAST(FLOOR(($term) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS ${mc(i, j)}"
    }) :+ ("  CAST(SUM(CAST(FLOOR(((e * e) * (e * e)) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0" +
      " AS se4")
    val gammas = (0 to 3).map { k =>
      val dk = det4Sql((i, j) => if (j == k) mc(0, i) else sc(i, j))
      s"  ($dk) / ($detA) AS g$k"
    }
    val vifExprs = (1 to 3).map { j =>
      val o = (0 to 3).filterNot(_ == j)
      val d3 = det3Sql((r, c) => sc(o(r), o(c)))
      val deltas = (0 to 2).map { k =>
        "(" + det3Sql((r, c) => if (c == k) sc(o(r), j) else sc(o(r), o(c))) +
          s") / ($d3)"
      }
      val sse = s"${sc(j, j)} - ((${deltas(0)}) * ${sc(o(0), j)} + " +
        s"(${deltas(1)}) * ${sc(o(1), j)} + (${deltas(2)}) * ${sc(o(2), j)})"
      val sst = s"${sc(j, j)} - s_0_0 * (${sc(0, j)} / s_0_0) * " +
        s"(${sc(0, j)} / s_0_0)"
      s"  1.0 / (1.0 - (1.0 - ($sse) / ($sst))) AS v$j"
    }
    val invCells = (0 to 1).flatMap { r =>
      (0 to 3).map { j =>
        val rows = (0 to 3).filterNot(_ == j)
        val cols = (0 to 3).filterNot(_ == r)
        val minor = det3Sql((rr, cc) => sc(rows(rr), cols(cc)))
        val signed = if ((r + j) % 2 == 0) s"($minor)" else s"(- ($minor))"
        s"  $signed / ($detA) AS i$r$j"
      }
    }
    def quadExpr(r: Int) =
      (for (k <- 0 to 3; l <- 0 to 3)
        yield s"i$r$k * ${mc(k, l)} * i$r$l").mkString(" + ")
    s"""WITH ${olsPrefix("NOT is_forecast")},
       |em AS (
       |  SELECT (y - (b.b0 + x1 * b.b1 + x2 * b.b2 + x3 * b.b3)) AS e,
       |    x1, x2, x3
       |  FROM ds CROSS JOIN beta b WHERE NOT is_forecast),
       |mm AS (
       |  SELECT
       |${mCells.mkString(",\n")}
       |  FROM em),
       |gam AS (
       |  SELECT
       |${gammas.mkString(",\n")}
       |  FROM g CROSS JOIN mm),
       |bp AS (
       |  SELECT s_0_0 * (1.0 - sse / sst) AS lm FROM (
       |    SELECT s_0_0,
       |      se4 - (g0 * m_0_0 + g1 * m_0_1 + g2 * m_0_2 + g3 * m_0_3)
       |        AS sse,
       |      se4 - s_0_0 * (m_0_0 / s_0_0) * (m_0_0 / s_0_0) AS sst
       |    FROM g CROSS JOIN mm CROSS JOIN gam)),
       |vifs AS (
       |  SELECT
       |${vifExprs.mkString(",\n")}
       |  FROM g),
       |inv AS (
       |  SELECT
       |${invCells.mkString(",\n")}
       |  FROM g),
       |hc AS (
       |  SELECT sqrt(q0) AS se0, sqrt(q1) AS se1 FROM (
       |    SELECT ${quadExpr(0)} AS q0, ${quadExpr(1)} AS q1
       |    FROM inv CROSS JOIN mm))
       |SELECT ROUND(lm, 4) AS bp_lm, CAST(3 AS INTEGER) AS bp_df,
       |  ROUND(GREATEST(v1, v2, v3), 4) AS max_vif,
       |  ROUND(se0, 4) AS hc0_se_intercept, ROUND(se1, 4) AS hc0_se_qty
       |FROM bp CROSS JOIN vifs CROSS JOIN hc""".stripMargin
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  /** DuckDB exhaustive ground truth for the embedding near-dup corpus
    * (Similarity.nearDupCorpus): base ∪ planted +1M near copies, full
    * quadratic cosine, threshold 0.9. Ends with the `nd_pairs(a, b, cos)`
    * CTE shared by q_embed_neardup and q_embed_survivors. The cos is the
    * same left-to-right double accumulation on both sides (vec_dot /
    * list_dot_product), so the rounded values match bit-for-bit. */
  private def embedNdPrefix: String =
    """base AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
      |corpus AS (
      |  SELECT vec_id, emb FROM base
      |  UNION ALL
      |  SELECT vec_id + 1000000, [emb[1] + 0.05] || emb[2:]
      |  FROM base WHERE vec_id % 5 = 0),
      |n AS (
      |  SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS norm
      |  FROM corpus),
      |nd_pairs AS (
      |  SELECT a, b, cos FROM (
      |    SELECT x.vec_id AS a, y.vec_id AS b,
      |      ROUND(list_dot_product(x.emb, y.emb) / (x.norm * y.norm), 6)
      |        AS cos
      |    FROM n x JOIN n y ON x.vec_id < y.vec_id)
      |  WHERE cos >= 0.9)""".stripMargin

  /** The tabulation-family slot signature over a `ps` polyhash list —
    * the PRODUCTION MinHash family since r10 (Dedup.tabSlotSql; the
    * codegen `tabulation_sigs` kernel computes the same values). */
  private def tabMhExpr: String =
    s"""list_transform(range(0, ${graft.operators.Dedup.NumHashes}),
       |      j -> list_min(list_transform(ps,
       |        p -> ${graft.operators.Dedup.tabSlotSql})))""".stripMargin

  /** DuckDB replay of the MinHash-LSH candidate pipeline
    * (Dedup.signatures → candidatePairs → Jaccard verify): planted
    * corpus, distinct word 3-shingles, ONE polynomial code-point roll per
    * shingle (base 131 mod 2147483647 — mirrors PolyHash.minhashTab),
    * TABULATION slot signatures (`mht`, the r10 production family; the
    * retired affine family survives as the `mh` CTE solely for the
    * q_mh_accuracy before-record — unused CTEs are free), 4-value band
    * signatures grouped as lists with the 2..MaxBucket cap, then
    * exact-Jaccard verification of the candidates. Ends with the
    * `verified(a, b, jaccard)` CTE shared by q_minhash_neardup and
    * q_dedup_survivors. */
  private def minhashPrefix: String = {
    import graft.operators.Dedup.{Bands, MaxBucket, NumHashes, RowsPerBand}
    s"""corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0
       |  UNION ALL
       |  SELECT doc_id + 2000000, text || ' qq zz' FROM documents
       |  WHERE doc_id % 7 = 0),
       |sh AS (
       |  SELECT doc_id,
       |    list_distinct(CASE WHEN len(tokens) < 3
       |      THEN [array_to_string(tokens, ' ')]
       |      ELSE list_transform(range(0, len(tokens) - 2),
       |             i -> array_to_string(tokens[i+1:i+3], ' '))
       |    END) AS shingles
       |  FROM (SELECT doc_id,
       |          string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'),
       |                       ' ') AS tokens
       |        FROM corpus)),
       |ph AS (
       |  SELECT doc_id,
       |    list_transform(shingles, s ->
       |      CASE WHEN length(s) = 0 THEN 0 ELSE list_reduce(
       |        list_transform(range(1, length(s) + 1),
       |                       i -> CAST(unicode(s[i]) AS BIGINT)),
       |        (a, c) -> (a * 131 + c) % 2147483647) END) AS ps
       |  FROM sh),
       |mh AS (
       |  SELECT doc_id,
       |    list_transform(range(0, $NumHashes), j ->
       |      list_min(list_transform(ps, p ->
       |        ((1103515245 * (j + 1)) % 2147483647 * p
       |         + (12345 * (j + 1)) % 2147483647) % 2147483647))) AS mh
       |  FROM ph),
       |mht AS (
       |  SELECT doc_id,
       |    $tabMhExpr AS mh
       |  FROM ph),
       |bands AS (
       |  SELECT doc_id, bd,
       |    mh[bd * $RowsPerBand + 1 : bd * $RowsPerBand + $RowsPerBand]
       |      AS sig
       |  FROM mht, range(0, $Bands) r(bd)),
       |bucketed AS (
       |  SELECT bd, sig FROM bands GROUP BY bd, sig
       |  HAVING COUNT(*) BETWEEN 2 AND $MaxBucket),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x
       |  JOIN bucketed bk ON x.bd = bk.bd AND x.sig = bk.sig
       |  JOIN bands y ON x.bd = y.bd AND x.sig = y.sig
       |    AND x.doc_id < y.doc_id),
       |verified AS (
       |  SELECT c.a, c.b,
       |    ROUND(CAST(len(list_intersect(sa.shingles, sb.shingles))
       |               AS DOUBLE) /
       |          len(list_distinct(list_concat(sa.shingles, sb.shingles))),
       |      4) AS jaccard
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.a
       |  JOIN sh sb ON sb.doc_id = c.b)""".stripMargin
  }

  /** Shared by q_window_sliding and q_stream_sliding: the 2h/1h sliding
    * windows stated as a two-copy union (each event lands in two hourly
    * window starts). */
  private val slidingOracle: String =
    """WITH w AS (
      |  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
      |           AS win_start, value FROM events
      |  UNION ALL
      |  SELECT strftime(date_trunc('hour', ts) - INTERVAL 1 HOUR,
      |                  '%Y-%m-%d %H:%M:%S'), value FROM events)
      |SELECT win_start, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
      |    AS sum_value_cents
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin

  /** Shared by q_asof_join and q_asof_skew: two implementations, one
    * contract (DuckDB's native ASOF LEFT JOIN). */
  private val asofOracle: String =
    """WITH p AS (
      |  SELECT user_id, ts, MAX(value) AS p_value FROM events
      |  WHERE event_type = 'purchase' GROUP BY user_id, ts),
      |c AS (
      |  SELECT user_id, event_id, ts FROM events
      |  WHERE event_type = 'click')
      |SELECT c.user_id, c.event_id, c.ts,
      |  p.ts AS asof_ts, p.p_value AS asof_value
      |FROM c ASOF LEFT JOIN p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin

  /** Shared by q_range_join and q_stream_range: the batch bucket+residual
    * rewrite and the watermarked stream-stream join must both reproduce
    * the plain inequality join. */
  private val rangeOracle: String =
    """WITH p AS (
      |  SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id, event_id, ts FROM events
      |  WHERE event_type = 'click')
      |SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
      |  p.ts AS purchase_ts
      |FROM c JOIN p ON c.user_id = p.user_id
      |  AND c.ts >= p.ts AND c.ts < p.ts + INTERVAL 1 DAY""".stripMargin

  def oracleSql: Map[String, String] = oracleSqlBase +
    // ANN recall audit: composed from the two existing replays — the
    // brute-force ground truth LEFT JOIN the IVF result, per-query
    // overlap over the same deterministic structures
    ("q_ann_recall" ->
      s"""WITH bf AS (
         |${oracleSqlBase("q_ann_topk")}),
         |ivf AS (
         |${oracleSqlBase("q_ann_ivf")})
         |SELECT b.q_id, CAST(COUNT(*) AS BIGINT) AS k,
         |  CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_overlap,
         |  ROUND(CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL
         |      THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         |    AS recall
         |FROM bf b LEFT JOIN ivf i
         |  ON b.q_id = i.q_id AND b.neighbor_id = i.neighbor_id
         |GROUP BY b.q_id ORDER BY b.q_id""".stripMargin)

  private def oracleSqlBase: Map[String, String] = Map(
    "q_ols_diagnostics" -> olsDiagnosticsSql,
    // full replay of the deterministic OLS dataflow: fit (see olsPrefix),
    // score the forecast universe, county aggregation with exact-decimal
    // means, calibration meta-regression on the test counties, calibrated
    // output. Every formula mirrors the Scala text operator-for-operator.
    "q_ols_forecast" ->
      s"""WITH ${olsPrefix("NOT is_forecast AND bucket < 3")},
         |$olsForecastBody""".stripMargin,
    // grouped simple OLS: same label CTE, floor-micros moments and
    // formula association shapes as the Scala text
    "q_group_ols" -> graft.ml.OlsPipeline.groupedOlsOracleSql,
    // same fit; exact-moment RMSE/R² per split, long form
    "q_ols_metrics" ->
      s"""WITH ${olsPrefix("NOT is_forecast AND bucket < 3")},
         |sc AS (
         |  SELECT bucket, b.b0 + x1 * b.b1 + x2 * b.b2 + x3 * b.b3 AS p, y
         |  FROM ds CROSS JOIN beta b WHERE NOT is_forecast),
         |m1 AS (
         |  SELECT CASE WHEN bucket < 3 THEN 'train' ELSE 'test' END AS split,
         |    CAST(COUNT(*) AS DOUBLE) AS n,
         |    CAST(SUM(CAST(FLOOR((y) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sa,
         |    CAST(SUM(CAST(FLOOR((p) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sp,
         |    CAST(SUM(CAST(FLOOR((y * y) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS saa,
         |    CAST(SUM(CAST(FLOOR((p * p) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS spp,
         |    CAST(SUM(CAST(FLOOR((y * p) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sap,
         |    CAST(SUM(CAST(FLOOR(((p - y) * (p - y)) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0
         |      AS se2
         |  FROM sc GROUP BY 1),
         |m2 AS (
         |  SELECT split, sqrt(se2 / n) AS rmse,
         |    (n * sap - sa * sp) /
         |      sqrt((n * saa - sa * sa) * (n * spp - sp * sp)) AS r
         |  FROM m1)
         |SELECT split, 'r2' AS metric, ROUND(r * r, 4) AS value FROM m2
         |UNION ALL
         |SELECT split, 'rmse', ROUND(rmse, 4) FROM m2
         |ORDER BY split, metric""".stripMargin,
    // full SQL replay of the IVF ANN path at the CORPUS-DERIVED
    // parameterization (r10): lists = 2^(bitlen(n) div 2) ≈ √n (clamped
    // at 16 — the r9 constant at measured small SFs), probes =
    // 2^ceil(log₂(lists)/2) ≈ √lists (fraction shrinks as the corpus
    // grows), sample = 16·lists (min 256) — the same exact integer
    // arithmetic as
    // Similarity.listsForCount/probesForLists/sampleKFor. Lowest-LCG-hash
    // training sample, LCG-ordered init, three unrolled bit-deterministic
    // Lloyd rounds (see ivfRound), full-corpus assignment and the
    // fixed-size lowest-QueryK query fan-out with the final centroids,
    // exact cosine on candidates, top-k. Like q_ann_lsh, the approximate
    // structure itself is part of the verified contract.
    "q_ann_ivf" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS emb,
         |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
         |      AS norm
         |  FROM embeddings),
         |$annQueryCte,
         |params AS (
         |  SELECT lists,
         |    GREATEST(4, 1 << (length(bin(lists)) // 2)) AS probes,
         |    GREATEST(${Similarity.MinSampleK}, 16 * lists) AS sampk
         |  FROM (SELECT 1 << GREATEST(${Similarity.MinListsBits},
         |    length(bin((SELECT COUNT(*) FROM e))) // 2) AS lists)),
         |samp AS (
         |  SELECT vec_id, emb FROM (
         |    SELECT vec_id, emb, ROW_NUMBER() OVER (ORDER BY
         |        ((vec_id % 2147483648) * 2654435761 + 99) % 2147483648,
         |        vec_id) AS srn
         |    FROM e) WHERE srn <= (SELECT sampk FROM params)),
         |c0 AS (
         |  SELECT j, c FROM (
         |    SELECT CAST(ROW_NUMBER() OVER (ORDER BY
         |        ((vec_id % 2147483648) * 2654435761 + 99) % 2147483648,
         |        vec_id) AS BIGINT)
         |      AS j, emb AS c
         |    FROM samp) WHERE j <= (SELECT lists FROM params)),
         |${ivfRound(1, "c0")},
         |${ivfRound(2, "c1")},
         |${ivfRound(3, "c2")},
         |af AS (
         |  SELECT vec_id, list_id FROM (
         |    SELECT e.vec_id, c.j AS list_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |        list_dot_product(c.c, c.c) - 2 * list_dot_product(c.c, e.emb),
         |        c.j) AS rn
         |    FROM e CROSS JOIN c3 c) WHERE rn = 1),
         |pr AS (
         |  SELECT q_id, list_id FROM (
         |    SELECT e.vec_id AS q_id, c.j AS list_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |        list_dot_product(c.c, c.c) - 2 * list_dot_product(c.c, e.emb),
         |        c.j) AS rn
         |    FROM e CROSS JOIN c3 c
         |    WHERE e.vec_id IN (SELECT vec_id FROM qd))
         |  WHERE rn <= (SELECT probes FROM params)),
         |cand AS (
         |  SELECT DISTINCT pr.q_id, af.vec_id
         |  FROM pr JOIN af ON af.list_id = pr.list_id
         |  WHERE af.vec_id <> pr.q_id),
         |scored AS (
         |  SELECT cand.q_id, cand.vec_id,
         |    ROUND(list_dot_product(qe.emb, ce.emb) / (qe.norm * ce.norm), 6)
         |      AS cos
         |  FROM cand
         |  JOIN e qe ON qe.vec_id = cand.q_id
         |  JOIN e ce ON ce.vec_id = cand.vec_id),
         |ranked AS (
         |  SELECT q_id, vec_id,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |         ORDER BY cos DESC, vec_id) AS BIGINT) AS rank, cos
         |  FROM scored)
         |SELECT q_id, rank, vec_id AS neighbor_id, cos
         |FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    // decimal sums are emitted as BIGINT minor units on BOTH sides: the
    // driver hash covers the physical decimal encoding, which differs
    // between Spark parquet and DuckDB on multi-row outputs even when every
    // cell value matches; int64 is bit-identical across engines.
    "q_pivot_ratio" ->
      """WITH j AS (
        |  SELECT n.n_name, o.o_orderpriority,
        |         CAST(o.o_totalprice AS DECIMAL(18,2)) AS p
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |), piv AS (
        |  SELECT n_name,
        |    CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN p END),
        |             0) * 100 AS BIGINT) AS urgent_cents,
        |    CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN p END),
        |             0) * 100 AS BIGINT) AS high_cents,
        |    CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN p END),
        |             0) * 100 AS BIGINT) AS low_cents
        |  FROM j GROUP BY n_name
        |)
        |SELECT n_name, urgent_cents, high_cents, low_cents,
        |  CASE WHEN urgent_cents + high_cents = 0 THEN NULL
        |       ELSE ROUND(CAST(urgent_cents AS DOUBLE) /
        |                  CAST(urgent_cents + high_cents AS DOUBLE), 6)
        |  END AS ratio
        |FROM piv ORDER BY n_name""".stripMargin,
    "q_agg_sum" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty_x100,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_price_cents,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS sum_disc_price_x10k,
        |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
        |  COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_region_rollup" ->
      """SELECT r.r_name, COUNT(*) AS cnt,
        |  COUNT(DISTINCT n.n_name) AS nations,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS sum_price_cents
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin,
    "q_group_mean_having" ->
      """SELECT n.n_name, c.c_mktsegment, COUNT(*) AS cnt,
        |  ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |        / COUNT(*), 4) AS avg_price
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name, c.c_mktsegment
        |HAVING COUNT(*) > 10
        |ORDER BY n_name, c_mktsegment""".stripMargin,
    "q_minmax" ->
      """SELECT min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  min(CAST(l_extendedprice AS DECIMAL(18,2))) AS min_price,
        |  max(CAST(l_extendedprice AS DECIMAL(18,2))) AS max_price
        |FROM lineitem""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_freq_table" ->
      """SELECT event_type, COUNT(*) AS cnt,
        |  ROUND(CAST(COUNT(*) AS DOUBLE) /
        |        (SELECT CAST(COUNT(*) AS DOUBLE) FROM events), 6) AS share
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(FLOOR(value / 50) AS BIGINT) AS bucket, COUNT(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,
    // μ/σ from exact decimal sums (not AVG/STDDEV over doubles, whose
    // partial-merge order is engine/partition-dependent); the double
    // arithmetic mirrors Relational.zscore term for term
    "q_zscore" ->
      """WITH s AS (SELECT
        |    SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS sx,
        |    SUM(CAST(c_acctbal AS DECIMAL(18,2))
        |        * CAST(c_acctbal AS DECIMAL(18,2))) AS sxx,
        |    CAST(COUNT(*) AS DOUBLE) AS n
        |  FROM customer)
        |SELECT c_custkey,
        |  ROUND((c_acctbal - CAST(sx AS DOUBLE) / n) /
        |        NULLIF(SQRT((CAST(sxx AS DOUBLE)
        |              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
        |             / NULLIF(n - 1, 0)), 0), 6) AS z
        |FROM customer, s ORDER BY c_custkey""".stripMargin,
    // exact decimal moment sums (e = a−p = price·disc at scale 4; squares
    // at scale 8), closed-form corr²; mirrors Relational.metrics
    "q_metrics" ->
      """WITH r AS (SELECT
        |    CAST(l_extendedprice AS DECIMAL(19,2)) AS a,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |         * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(19,4)) AS e
        |  FROM lineitem),
        |r2 AS (SELECT a, e, CAST(a - e AS DECIMAL(19,4)) AS p FROM r),
        |s AS (SELECT
        |    CAST(COUNT(*) AS DOUBLE) AS n, COUNT(*) AS cnt,
        |    SUM(a) AS sa, SUM(p) AS sp, SUM(a * a) AS saa,
        |    SUM(p * p) AS spp, SUM(a * p) AS sap, SUM(e * e) AS se2
        |  FROM r2)
        |SELECT
        |  ROUND(SQRT(CAST(se2 AS DOUBLE) / n), 4) AS rmse,
        |  ROUND((n * CAST(sap AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sp AS DOUBLE))
        |        * (n * CAST(sap AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sp AS DOUBLE))
        |        / NULLIF((n * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
        |           * (n * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)), 0), 6) AS r2,
        |  cnt AS n
        |FROM s""".stripMargin,
    "q_na_profile" ->
      """SELECT
        |  ROUND(AVG(CASE WHEN event_id IS NULL THEN 1.0 ELSE 0.0 END), 6) AS na_frac_event_id,
        |  ROUND(AVG(CASE WHEN ts IS NULL THEN 1.0 ELSE 0.0 END), 6) AS na_frac_ts,
        |  ROUND(AVG(CASE WHEN user_id IS NULL THEN 1.0 ELSE 0.0 END), 6) AS na_frac_user_id,
        |  ROUND(AVG(CASE WHEN event_type IS NULL THEN 1.0 ELSE 0.0 END), 6) AS na_frac_event_type,
        |  ROUND(AVG(CASE WHEN value IS NULL THEN 1.0 ELSE 0.0 END), 6) AS na_frac_value,
        |  ROUND(AVG(CASE WHEN props IS NULL THEN 1.0 ELSE 0.0 END), 6) AS na_frac_props
        |FROM events""".stripMargin,
    "q_cond_update" ->
      """SELECT CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 'NONE'
        |            ELSE o_orderpriority END AS priority_norm,
        |  COUNT(*) AS cnt
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_blank_to_null" ->
      """SELECT COUNT(*) AS rows,
        |  COUNT(NULLIF(text, ''))   AS text_nonnull,
        |  COUNT(NULLIF(lang, ''))   AS lang_nonnull,
        |  COUNT(NULLIF(source, '')) AS source_nonnull
        |FROM documents""".stripMargin,
    "q_select_rename" ->
      """SELECT c_custkey AS id, c_name, c_mktsegment AS segment
        |FROM customer""".stripMargin,
    "q_schema_cast" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(FLOOR(l_quantity) AS INTEGER) AS qty_int,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents,
        |  CAST(l_shipdate AS DATE) AS ship_date,
        |  LOWER(l_returnflag) AS flag_lc
        |FROM lineitem""".stripMargin,
    "q_date_filter" ->
      """SELECT o_orderpriority, COUNT(*) AS cnt,
        |  CAST(MIN(o_orderdate) AS DATE) AS min_date,
        |  CAST(MAX(o_orderdate) AS DATE) AS max_date
        |FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_outlier_keepnull" ->
      """WITH e AS (SELECT event_type,
        |  CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value2
        |  FROM events)
        |SELECT event_type, COUNT(*) AS cnt, COUNT(value2) AS nonnull_cnt
        |FROM e WHERE value2 < 100 OR value2 IS NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_notnull_filter" ->
      """WITH e AS (SELECT event_type,
        |  CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value2
        |  FROM events)
        |SELECT event_type, COUNT(*) AS cnt
        |FROM e WHERE value2 IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_na_drop" ->
      """SELECT COUNT(*) AS rows_kept FROM events
        |WHERE event_id % 7 <> 0 AND event_id % 11 <> 0""".stripMargin,
    "q_null_split" ->
      """SELECT (CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END) IS NULL
        |         AS is_forecast,
        |  COUNT(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_limit_slice" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |ORDER BY c_custkey LIMIT 100""".stripMargin,
    "q_row_index" ->
      """SELECT CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) AS BIGINT) AS idx,
        |  c_custkey, c_mktsegment
        |FROM (SELECT * FROM customer ORDER BY c_custkey LIMIT 200)""".stripMargin,
    "q_string_extract" ->
      """WITH p AS (
        |  SELECT p_partkey, p_name, p_brand,
        |    CASE
        |      WHEN p_partkey % 3 = 0 THEN
        |        CONCAT(CAST(p_size * 10 AS VARCHAR), ' hp @ ',
        |               format('{:,}', 1000 + (p_partkey % 50) * 100), ' RPM')
        |      WHEN p_partkey % 3 = 1 THEN
        |        CONCAT(CAST(p_size * 10 AS VARCHAR), ' hp')
        |      ELSE 'N/A' END AS power_str
        |  FROM part)
        |SELECT p_partkey, power_str,
        |  TRY_CAST(string_split(power_str, ' ')[1] AS DOUBLE) AS hp,
        |  TRY_CAST(replace(list_extract(string_split(power_str, ' '), 4),
        |                   ',', '') AS DOUBLE) AS rpm,
        |  LOWER(CONCAT(p_brand, ':', string_split(p_name, ' ')[1])) AS label
        |FROM p""".stripMargin,
    "q_date_parse" ->
      """WITH o AS (
        |  SELECT o_totalprice,
        |    CAST(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d')
        |         AS DATE) AS parsed
        |  FROM orders)
        |SELECT COUNT(*) AS cnt, MIN(parsed) AS min_d, MAX(parsed) AS max_d,
        |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |        / COUNT(*), 4) AS avg_price
        |FROM o WHERE parsed > DATE '2000-06-15'""".stripMargin,
    "q_left_join" ->
      """SELECT c.c_mktsegment AS segment, COUNT(*) AS cnt,
        |  COUNT(c.c_custkey) AS matched
        |FROM orders o
        |LEFT JOIN (SELECT c_custkey, c_mktsegment FROM customer
        |           WHERE c_acctbal > 5000) c
        |  ON o.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_left_join_distinct" ->
      """SELECT DISTINCT l.l_suppkey, l.l_returnflag, s.s_name
        |FROM lineitem l
        |LEFT JOIN (SELECT s_suppkey, s_name FROM supplier
        |           WHERE s_acctbal > 0) s
        |  ON l.l_suppkey = s.s_suppkey""".stripMargin,
    "q_union" ->
      """SELECT c_mktsegment AS key, COUNT(*) AS cnt, 'customer' AS src
        |FROM customer GROUP BY 1
        |UNION ALL
        |SELECT o_orderpriority, COUNT(*), 'orders'
        |FROM orders GROUP BY 1
        |ORDER BY src, key""".stripMargin,
    "q_ntile" ->
      """WITH d AS (
        |  SELECT c_acctbal,
        |    NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
        |  FROM customer)
        |SELECT decile, COUNT(*) AS cnt,
        |  ROUND(MIN(c_acctbal), 2) AS lo, ROUND(MAX(c_acctbal), 2) AS hi
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_topk" ->
      """SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal
        |FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 15""".stripMargin,
    "q_rare_other" ->
      """WITH freq AS (
        |  SELECT source,
        |    CAST(COUNT(*) AS DOUBLE) /
        |      (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS share
        |  FROM documents GROUP BY 1)
        |SELECT CASE WHEN f.share >= 0.045 THEN d.source
        |            ELSE 'Other' END AS source2,
        |  COUNT(*) AS cnt
        |FROM documents d JOIN freq f ON d.source = f.source
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // DuckDB quantile_cont == Spark exact percentile (both R-7 linear
    // interpolation); rounded to 4dp on both sides
    "q_percentile" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 4)
        |    AS p50,
        |  ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95), 4)
        |    AS p95,
        |  ROUND(quantile_cont(CAST(l_discount AS DOUBLE), 0.5), 4)
        |    AS disc_p50
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_melt" ->
      """WITH w AS (
        |  SELECT l_returnflag,
        |    ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |          / COUNT(*), 4) AS avg_qty,
        |    ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |          / COUNT(*), 4) AS avg_price
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'avg_qty' AS metric, avg_qty AS value FROM w
        |UNION ALL
        |SELECT l_returnflag, 'avg_price', avg_price FROM w
        |ORDER BY 1, 2""".stripMargin,
    "q_exact_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, text || ' qq zz' FROM documents
        |  WHERE doc_id % 7 = 0)
        |SELECT md5(text) AS h, COUNT(*) AS cnt, MIN(doc_id) AS keep_id
        |FROM corpus GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY 1""".stripMargin,
    // substring-grain dedup: the oracle is the prune-free semantic
    // definition, so the hash match proves the fp prune lossless
    "q_substring_dedup" -> graft.operators.Dedup.substringDedupOracleSql,
    // span-mask rewrite: prune-free replay again — and the planted exact
    // dups must come out fully masked on both engines
    "q_span_mask" -> graft.operators.Dedup.spanMaskOracleSql,
    // suffix-grain maximal-span pass: prune-free replay at SITE grain
    // (span strings grouped with no per-doc distinct), islands via
    // row_number gaps — the hash match proves the fp prune lossless
    "q_suffix_dedup" -> graft.operators.Dedup.suffixDedupOracleSql,
    // prefix-filter similarity join: same global order, bound and verify
    "q_sim_join" -> graft.operators.Dedup.prefixSimJoinOracleSql,
    "q_ngram_jaccard" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, text || ' qq zz' FROM documents
        |  WHERE doc_id % 7 = 0),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(tokens) < 3
        |      THEN [array_to_string(tokens, ' ')]
        |      ELSE list_transform(range(0, len(tokens) - 2),
        |             i -> array_to_string(tokens[i+1:i+3], ' '))
        |    END) AS shingles
        |  FROM (SELECT doc_id,
        |          string_split(regexp_replace(lower(text), '\s+', ' ', 'g'),
        |                       ' ') AS tokens
        |        FROM corpus)),
        |pairs AS (
        |  SELECT o.doc_id AS a, n.doc_id AS b,
        |    o.shingles AS sh_a, n.shingles AS sh_b
        |  FROM sh o JOIN sh n ON n.doc_id = o.doc_id + 2000000
        |  WHERE o.doc_id < 1000000)
        |SELECT a, b,
        |  ROUND(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE) /
        |        len(list_distinct(list_concat(sh_a, sh_b))), 6) AS jaccard
        |FROM pairs ORDER BY a""".stripMargin,
    "q_quality" ->
      raw"""WITH t AS (
        |  SELECT doc_id, n_chars, text,
        |    string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')
        |      AS tokens
        |  FROM documents)
        |SELECT doc_id, n_chars,
        |  CAST(len(tokens) AS BIGINT) AS n_tok,
        |  ROUND(CAST(length(text) AS DOUBLE) / len(tokens), 4)
        |    AS mean_tok_len,
        |  ROUND(CAST(len(list_filter(tokens,
        |      t -> t IN (${graft.operators.TextAnalysis.sqlList(graft.operators.TextAnalysis.QualityStopwords)}))) AS DOUBLE)
        |    / len(tokens), 4) AS stopword_ratio
        |FROM t""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT)
        |    AS ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]'))
        |    AS BIGINT) AS re_tokens,
        |  CAST(length(text) AS BIGINT) AS chars
        |FROM documents""".stripMargin,
    "q_checkpoint_prune" ->
      """SELECT COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS sum_value_cents,
        |  MIN(event_id) AS min_id, MAX(event_id) AS max_id
        |FROM events WHERE event_type = 'click'""".stripMargin,
    // the oracle states the PLAIN join — the salted replication on the
    // Spark side must produce the identical row set for any salt assignment
    "q_skew_join" ->
      """WITH dim AS (
        |  SELECT event_type, MIN(event_id) AS first_id
        |  FROM events GROUP BY 1)
        |SELECT e.event_type, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS sum_value_cents,
        |  MAX(dim.first_id) AS first_id
        |FROM events e JOIN dim ON e.event_type = dim.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rollup" ->
      """SELECT r_name, n_name,
        |  CAST(GROUPING(r_name) AS BIGINT) AS g_region,
        |  CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS sum_price_cents
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY 3, 4, 1, 2""".stripMargin,
    "q_cube" ->
      """SELECT c_mktsegment AS segment, o_orderpriority AS priority,
        |  CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_segment,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS sum_price_cents
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY CUBE(c_mktsegment, o_orderpriority)
        |ORDER BY 3, 4, 1, 2""".stripMargin,
    "q_cumsum" ->
      """WITH m AS (
        |  SELECT o_orderpriority AS priority,
        |    strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS month_cents
        |  FROM orders GROUP BY 1, 2)
        |SELECT priority, month, month_cents,
        |  CAST(SUM(month_cents) OVER (PARTITION BY priority ORDER BY month
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_cents
        |FROM m ORDER BY priority, month""".stripMargin,
    // funnel/cohort: generated beside the operators so the step chain and
    // the week derivation can't drift between plan and oracle
    "q_funnel" -> graft.operators.Behavior.funnelOracleSql,
    "q_cohort" -> graft.operators.Behavior.cohortOracleSql,
    // streaming funnel: the batch funnel oracle gates the stateful fold
    "q_stream_funnel" -> graft.operators.Behavior.funnelOracleSql,
    // SCD2: collapse-then-close window chain, exact micros + BIGINT flag
    "q_scd2" -> graft.operators.Versioning.scd2OracleSql,
    // DQ suite: per-table conditional-aggregate counters + NOT EXISTS FKs
    "q_dq_checks" -> graft.operators.DqChecks.oracleSql,
    // column profile: same aggregate row unpivoted as UNION ALL branches
    "q_col_profile" -> graft.operators.DqChecks.colProfileOracleSql,
    // benford: same digit derivation, shared literal expectations
    "q_benford" -> graft.operators.DqChecks.benfordOracleSql,
    // vocab coverage: generated from the same VocabRanks + total order
    "q_vocab_coverage" -> graft.operators.TextAnalysis.vocabCoverageOracleSql,
    // edit join: semantic length-window form (banding is result-exact)
    "q_edit_join" -> graft.operators.Strings.editJoinOracleSql,
    // incremental agg: oracle = from-scratch aggregate (merge ≡ recompute)
    "q_incr_agg" -> graft.operators.Versioning.incrementalAggOracleSql,
    // co-purchase: same basket cap + total order, generated constants
    "q_copurchase" -> graft.operators.Basket.coPurchaseOracleSql,
    // winsorize: quantile_cont ≡ R-7 percentile; integer-cents clip
    "q_winsorize" -> graft.operators.Relational.winsorizeOracleSql,
    // cascade delete: EXISTS chains over the same planted tombstones
    "q_cascade_delete" -> graft.operators.Versioning.cascadeDeleteOracleSql,
    // RANGE frame over integer epoch-days: gaps shrink the trailing window;
    // exact BIGINT cents both sides, one IEEE division for the average
    "q_moving_avg" ->
      """WITH d AS (
        |  SELECT o_orderpriority AS priority,
        |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS day,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS day_cents
        |  FROM orders GROUP BY 1, 2),
        |w AS (
        |  SELECT priority, day, day_cents,
        |    CAST(SUM(day_cents) OVER (PARTITION BY priority ORDER BY day
        |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS w_cents,
        |    COUNT(*) OVER (PARTITION BY priority ORDER BY day
        |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS w_days
        |  FROM d)
        |SELECT priority, day, day_cents, w_cents, w_days,
        |  ROUND(CAST(w_cents AS DOUBLE) / w_days, 4) AS avg7_cents
        |FROM w ORDER BY priority, day""".stripMargin,
    "q_semi_join" ->
      """SELECT c_mktsegment AS segment, COUNT(*) AS cnt
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_anti_join" ->
      """SELECT c_mktsegment AS segment, COUNT(*) AS cnt
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // ANSI INTERSECT/EXCEPT are distinct set ops in both engines
    "q_set_ops" ->
      """WITH u AS (SELECT CAST(o_orderdate AS DATE) AS day FROM orders
        |           WHERE o_orderpriority = '1-URGENT'),
        |h AS (SELECT CAST(o_orderdate AS DATE) AS day FROM orders
        |      WHERE o_orderpriority = '2-HIGH')
        |SELECT day, 'both' AS tag FROM (SELECT day FROM u INTERSECT SELECT day FROM h)
        |UNION ALL
        |SELECT day, 'urgent_only' FROM (SELECT day FROM u EXCEPT SELECT day FROM h)
        |UNION ALL
        |SELECT day, 'high_only' FROM (SELECT day FROM h EXCEPT SELECT day FROM u)
        |ORDER BY tag, day""".stripMargin,
    // bag semantics: multiplicities min()'d / subtracted, then counted
    "q_set_ops_all" ->
      """WITH u AS (SELECT CAST(o_orderdate AS DATE) AS day FROM orders
        |           WHERE o_orderpriority = '1-URGENT'),
        |h AS (SELECT CAST(o_orderdate AS DATE) AS day FROM orders
        |      WHERE o_orderpriority = '2-HIGH'),
        |raw AS (
        |  SELECT day, 'both' AS tag
        |  FROM (SELECT day FROM u INTERSECT ALL SELECT day FROM h)
        |  UNION ALL
        |  SELECT day, 'urgent_only'
        |  FROM (SELECT day FROM u EXCEPT ALL SELECT day FROM h)
        |  UNION ALL
        |  SELECT day, 'high_only'
        |  FROM (SELECT day FROM h EXCEPT ALL SELECT day FROM u))
        |SELECT tag, day, COUNT(*) AS multiplicity
        |FROM raw GROUP BY 1, 2 ORDER BY tag, day""".stripMargin,
    // null-safe join: NULL keys match via IS NOT DISTINCT FROM
    "q_nullsafe_join" ->
      """WITH l AS (
        |  SELECT nullif(substring(o_orderpriority, 1, 1), '3') AS k0,
        |    COUNT(*) AS n_left
        |  FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1),
        |r AS (
        |  SELECT nullif(substring(o_orderpriority, 1, 1), '3') AS k1,
        |    COUNT(*) AS n_right
        |  FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1)
        |SELECT coalesce(l.k0, r.k1) AS key_digit,
        |  CAST(l.k0 IS NULL AND r.k1 IS NULL AS BIGINT) AS is_null_bucket,
        |  l.n_left, r.n_right
        |FROM l FULL OUTER JOIN r ON l.k0 IS NOT DISTINCT FROM r.k1
        |ORDER BY key_digit NULLS FIRST""".stripMargin,
    // triangles: same support gate, orientation and wedge order
    "q_triangles" -> Graph.trianglesOracleSql,
    // latest-per-key: oracle = the WINDOW form the aggregate must equal
    "q_latest_order" -> Joins.latestOrderOracleSql,
    // A/B: exact BIGINT moments, identical IEEE mean/var/z expressions
    "q_ab_test" -> graft.operators.Behavior.abTestOracleSql,
    // attribution: same carry-forward frame, exact cents
    "q_attribution" -> graft.operators.Behavior.attributionOracleSql,
    // Pearson matrix: generated from the same CorrCols/moment formula
    "q_corr_matrix" -> Relational.corrMatrixOracleSql,
    // streaks: same epoch-day islands (day - row_number invariant)
    "q_streaks" -> graft.operators.Behavior.streaksOracleSql,
    // Markov transitions: same (ts, event_id) order, one rounded division
    "q_markov" -> graft.operators.Behavior.markovOracleSql,
    // session paths: same micros gap rule, (ts, event_id) order, rn-capped
    // string_agg ≡ collect_list-of-structs path assembly
    "q_session_paths" -> graft.operators.Behavior.sessionPathsOracleSql,
    // chi-square cells: exact BIGINT margins, shared IEEE e/contrib shape
    "q_chisq" -> graft.operators.Behavior.chiSquareOracleSql,
    // time-weighted means: exact micros weights, DECIMAL(38,0) product sum
    "q_time_weighted" -> graft.operators.Behavior.timeWeightedOracleSql,
    // conversion window: EXISTS within the same exact micros interval
    "q_conversion_window" ->
      graft.operators.Behavior.conversionWindowOracleSql,
    // value drift: same midpoint/log2-cents bins, integer TVD numerators
    "q_value_drift" -> graft.operators.Behavior.valueDriftOracleSql,
    // series anomaly: same planted outage, R-7 medians and robust fence
    "q_anomaly" -> graft.operators.Behavior.seriesAnomalyOracleSql,
    // skyline: oracle IS the NOT EXISTS dominance definition
    "q_skyline" -> graft.operators.Skyline.oracleSql,
    // changepoint: same plant, RANGE frames and 15%-of-median flag
    "q_changepoint" -> graft.operators.Behavior.changepointOracleSql,
    // streaming changepoint: identical batch derivation — streaming
    // maintenance of the daily counts must reproduce it exactly
    "q_stream_cpt" -> graft.operators.Behavior.changepointOracleSql,
    // per-group top-k: same exact-decimal revenue and row_number tiebreak
    "q_topk_group" -> Joins.topKPerGroupOracleSql,
    // language drift: same Laplace smoothing, natural log on both sides
    "q_lang_drift" -> graft.operators.TextAnalysis.langDriftOracleSql,
    // concurrency sweep: RANGE-frame ties, starts-before-ends contract
    "q_concurrency" -> graft.operators.Behavior.concurrencyOracleSql,
    // stickiness: same grid fan-out, warm-up clipping, one division
    "q_stickiness" -> graft.operators.Behavior.stickinessOracleSql,
    // priority sampling: same LCG draw and exact integer div priority
    "q_weighted_sample" -> Curation.weightedSampleOracleSql,
    // stratified sample: oracle IS the brute-force per-stratum rank —
    // the hash match proves certified prefilter + fallback ≡ it
    "q_stratified" -> Curation.stratifiedOracleSql,
    // bigram LM: integer-bits surprisal, no transcendental anywhere
    "q_bigram_lm" -> graft.operators.TextAnalysis.bigramScoreOracleSql,
    // BM25: quarter-bit integer idf, fixed-order per-term fold
    "q_bm25" -> graft.operators.TextAnalysis.bm25OracleSql,
    // retrieval eval: same labels, rank order and integer-ratio metrics
    "q_retrieval_eval" ->
      graft.operators.TextAnalysis.retrievalEvalOracleSql,
    // percentile_disc: oracle states the ANSI cume_dist definition
    "q_percentile_disc" -> Relational.percentileDiscOracleSql,
    // grouping sets: native GROUPING SETS with GROUPING() flags
    "q_grouping_sets" -> Relational.groupingSetsOracleSql,
    // MAD: same R-7 medians, same consistency constant and fence
    "q_mad" -> Relational.madOutliersOracleSql,
    // equi-depth: same decile cut-points and strict bucket comparison
    "q_equidepth" -> Relational.equiDepthOracleSql,
    // quantile normalization: same cut-points, buckets, pooled reference
    "q_quantile_norm" -> Relational.quantileNormOracleSql,
    // gini/lorenz: same total order, tile rule and integer sums
    "q_gini" -> Relational.giniLorenzOracleSql,
    // nearest-POI: oracle is the exhaustive all-pairs argmin ground truth
    "q_geo_nearest" -> GeoJoin.nearestPoiOracleSql,
    // calibration curve: same fit CTEs, ANSI NTILE with full tiebreak,
    // floor-micros means — the reliability diagram replayed exactly
    "q_calibration" ->
      s"""WITH ${olsPrefix("NOT is_forecast AND bucket < 3")},
         |sc AS (
         |  SELECT l_orderkey, x1, x2, x3, y,
         |    b.b0 + x1 * b.b1 + x2 * b.b2 + x3 * b.b3 AS p
         |  FROM ds CROSS JOIN beta b
         |  WHERE NOT is_forecast AND bucket = 3),
         |t AS (
         |  SELECT y, p,
         |    NTILE(10) OVER (ORDER BY p, l_orderkey, x1, x2, x3) AS decile
         |  FROM sc),
         |m AS (
         |  SELECT decile, CAST(COUNT(*) AS DOUBLE) AS n,
         |    CAST(SUM(CAST(FLOOR(p * 1000000.0) AS BIGINT)) AS DOUBLE)
         |      / 1000000.0 AS sp,
         |    CAST(SUM(CAST(FLOOR(y * 1000000.0) AS BIGINT)) AS DOUBLE)
         |      / 1000000.0 AS sa
         |  FROM t GROUP BY 1)
         |SELECT CAST(decile AS BIGINT) AS decile, CAST(n AS BIGINT) AS n,
         |  ROUND(sp / n, 4) AS mean_pred, ROUND(sa / n, 4) AS mean_actual,
         |  ROUND(sp / n - sa / n, 4) AS gap
         |FROM m ORDER BY decile""".stripMargin,
    // ranking trio: same tie key (whole-unit balance), same windows;
    // percent_rank is one IEEE division of two exact ints on both sides
    "q_rank_funcs" ->
      """WITH c AS (
        |  SELECT c_custkey, c_mktsegment AS segment,
        |    ROUND(c_acctbal, -2) AS acctbal
        |  FROM customer),
        |r AS (
        |  SELECT c_custkey, segment, acctbal,
        |    CAST(ROW_NUMBER() OVER
        |      (PARTITION BY segment ORDER BY acctbal DESC, c_custkey)
        |      AS BIGINT) AS rn,
        |    CAST(RANK() OVER
        |      (PARTITION BY segment ORDER BY acctbal DESC) AS BIGINT) AS rnk,
        |    CAST(DENSE_RANK() OVER
        |      (PARTITION BY segment ORDER BY acctbal DESC) AS BIGINT) AS drnk,
        |    PERCENT_RANK() OVER
        |      (PARTITION BY segment ORDER BY acctbal DESC) AS prnk
        |  FROM c)
        |SELECT c_custkey, segment, acctbal, rn, rnk, drnk, prnk
        |FROM r WHERE rn <= 5 ORDER BY segment, rn""".stripMargin,
    // resample + ffill: integer epoch-day spine, IGNORE NULLS carry
    "q_resample_ffill" ->
      """WITH daily AS (
        |  SELECT event_type AS k,
        |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        |    COUNT(*) AS cnt
        |  FROM events
        |  WHERE datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 3 <> 1
        |  GROUP BY 1, 2),
        |b AS (SELECT k, MIN(d) AS mn, MAX(d) AS mx FROM daily GROUP BY 1),
        |spine AS (SELECT k, unnest(generate_series(mn, mx)) AS d FROM b),
        |j AS (
        |  SELECT s.k, s.d, daily.cnt
        |  FROM spine s LEFT JOIN daily ON s.k = daily.k AND s.d = daily.d)
        |SELECT k, d,
        |  last_value(cnt IGNORE NULLS) OVER
        |    (PARTITION BY k ORDER BY d
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt_ffill,
        |  CAST(cnt IS NULL AS BIGINT) AS is_gap
        |FROM j ORDER BY k, d""".stripMargin,
    "q_full_outer" ->
      """WITH c AS (
        |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day_c,
        |    COUNT(*) AS clicks
        |  FROM events WHERE event_type = 'click' AND day(ts) <= 20
        |  GROUP BY 1),
        |p AS (
        |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day_p,
        |    COUNT(*) AS purchases
        |  FROM events WHERE event_type = 'purchase' AND day(ts) >= 10
        |  GROUP BY 1)
        |SELECT COALESCE(day_c, day_p) AS day, clicks, purchases
        |FROM c FULL OUTER JOIN p ON day_c = day_p
        |ORDER BY 1""".stripMargin,
    // DuckDB's native ASOF JOIN is the oracle for the union+window
    // formulation: inclusive `>=` match, NULL state before the first
    // purchase (left semantics). q_asof_skew shares the SAME val — the
    // two-pass carry-forward rewrite must reproduce the single-window
    // as-of exactly, and sharing makes that identity structural.
    "q_asof_join" -> asofOracle,
    "q_asof_skew" -> asofOracle,
    // the oracle states the PLAIN inequality join; the Spark side's
    // bucket-refined equi-join + residual must be row-identical to it
    // (q_stream_range shares the val: streaming must reproduce batch)
    "q_range_join" -> rangeOracle,
    "q_stream_range" -> rangeOracle,
    // the batch statement of the streaming sink's day/type aggregate; the
    // Spark side must survive the foreachBatch write + partitioned
    // read-back losslessly
    "q_stream_sink" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  event_type, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS sum_value_cents
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // streaming dedup: the stable contract is the surviving KEY SET (which
    // duplicate row survives is processing-order dependent in any engine);
    // the 31-day watermark covers the events table's full disorder, so the
    // streamed first-seen set must equal batch DISTINCT
    "q_stream_dedup" ->
      """SELECT DISTINCT user_id AS content_hash FROM events
        |ORDER BY content_hash""".stripMargin,
    // streaming MG top-k: capacity 128 > 97 distinct buckets makes the
    // summary the exact count map — the oracle is exact per-day top-5
    // with the same (count desc, bucket-string asc) total order
    "q_stream_topk" ->
      """WITH b AS (
        |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    CAST(user_id % 97 AS VARCHAR) AS bucket
        |  FROM events),
        |g AS (SELECT day, bucket, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
        |r AS (
        |  SELECT day, bucket,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY day
        |      ORDER BY cnt DESC, bucket ASC) AS BIGINT) AS rank
        |  FROM g)
        |SELECT day, rank, bucket FROM r WHERE rank <= 5
        |ORDER BY day, rank""".stripMargin,
    // streaming drift monitor: the identical batch derivation — the
    // streaming windowed counts must reproduce it through the hash gate
    "q_stream_drift" ->
      """WITH ev AS (
        |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    CASE WHEN c IS NULL THEN -1 WHEN c <= 0 THEN 0
        |         ELSE CAST(length(bin(c)) AS BIGINT) END AS bin
        |  FROM (SELECT ts,
        |          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |        FROM events)),
        |b AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS bc FROM ev
        |      GROUP BY 1),
        |bt AS (SELECT bin, bc, SUM(bc) OVER () AS bt FROM b),
        |g AS (SELECT day, bin, CAST(COUNT(*) AS BIGINT) AS n FROM ev
        |      GROUP BY 1, 2),
        |t AS (SELECT day, bin, n, SUM(n) OVER (PARTITION BY day) AS dt
        |      FROM g)
        |SELECT t.day, t.bin, t.n, bt.bc,
        |  CAST(ABS(t.n * bt.bt - bt.bc * t.dt) AS BIGINT) AS drift_num
        |FROM t JOIN bt ON t.bin = bt.bin
        |ORDER BY t.day, t.bin""".stripMargin,
    // the stateless ingest gate: streaming execution must reproduce the
    // batch predicate exactly — the oracle is the curate-chain's first
    // two stage fragments (language argmax + duplicate-bigram fraction)
    // applied directly to documents
    "q_stream_curate" ->
      s"""WITH tok AS (
         |  SELECT doc_id,
         |    string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'),
         |                 ' ') AS ts
         |  FROM documents),
         |lang AS (
         |  SELECT doc_id, ts,
         |    CAST(len(list_filter(ts, x -> x IN
         |      (${graft.operators.TextAnalysis.sqlList(graft.operators.TextAnalysis.stopwords)})))
         |      AS DOUBLE) / greatest(len(ts), 1) AS s_en,
         |    CAST(len(list_filter(ts, x -> x IN
         |      ('der','die','das','und','ist','nicht','ein','zu','mit')))
         |      AS DOUBLE) / greatest(len(ts), 1) AS s_de,
         |    CAST(len(list_filter(ts, x -> x IN
         |      ('le','la','et','les','des','un','une','est','dans')))
         |      AS DOUBLE) / greatest(len(ts), 1) AS s_fr
         |  FROM tok),
         |en AS (
         |  SELECT doc_id, ts FROM lang
         |  WHERE s_en >= 0.01 AND s_en > s_fr AND s_en >= s_de),
         |bg AS (SELECT doc_id, unnest(list_transform(range(0, len(ts) - 1),
         |         i -> ts[i+1] || ' ' || ts[i+2])) AS b FROM en),
         |bm AS (SELECT doc_id, COUNT(DISTINCT b) AS uniq_bg
         |       FROM bg GROUP BY doc_id),
         |rep AS (
         |  SELECT en.doc_id, CAST(len(ts) AS BIGINT) AS n_tok,
         |    CASE WHEN len(ts) < 2 THEN 0.0
         |         ELSE ROUND(1.0 - CAST(COALESCE(uniq_bg, 0) AS DOUBLE) /
         |                    (len(ts) - 1), 4)
         |    END AS dup_2gram_frac
         |  FROM en LEFT JOIN bm USING (doc_id))
         |SELECT doc_id, n_tok, dup_2gram_frac FROM rep
         |WHERE dup_2gram_frac <= ${graft.operators.TextAnalysis.RepetitionThreshold}
         |ORDER BY doc_id""".stripMargin,
    // the stateful running-totals fold must reproduce the batch per-user
    // aggregate exactly (integer-valued cents in double are order-safe)
    "q_stream_totals" ->
      """SELECT user_id, COUNT(*) AS events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
        |    AS total_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // the oracle joins the ORIGINAL tables — the bucketed write + catalog
    // read + co-located SMJ on the Spark side must be lossless
    "q_bucketed_join" ->
      """SELECT c_mktsegment, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS sum_price_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the oracle states the round-trip INVARIANT independently: every row
    // of the training universe scored, zero prediction mismatches between
    // the fitted and the reloaded model
    "q_model_roundtrip" ->
      """SELECT COUNT(*) AS rows, CAST(0 AS BIGINT) AS mismatches
        |FROM lineitem WHERE l_orderkey % 45 = 1""".stripMargin,
    "q_csv_roundtrip" ->
      """SELECT COUNT(*) AS rows, COUNT(DISTINCT c_custkey) AS keys,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(28,2))
        |    AS sum_bal,
        |  MIN(c_name) AS min_name, MAX(c_mktsegment) AS max_segment
        |FROM customer""".stripMargin,
    // the JSONL write→corrupt-plant→DROPMALFORMED-read lifecycle must
    // reproduce the original table's profile exactly: equality proves
    // both the lossless text round-trip (sum of text lengths) and that
    // exactly the planted corrupt lines were dropped
    "q_jsonl_roundtrip" ->
      """SELECT COUNT(*) AS rows, COUNT(DISTINCT doc_id) AS keys,
        |  COUNT(DISTINCT lang) AS langs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(length(text)) AS BIGINT) AS sum_text_chars,
        |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        |FROM documents""".stripMargin,
    // ORC round-trip: equality against the same profile computed from the
    // original parquet proves the ORC write+read lossless
    "q_orc_roundtrip" ->
      """SELECT COUNT(*) AS rows, COUNT(DISTINCT l_orderkey) AS keys,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS sum_qty_cents,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS sum_price_cents,
        |  MIN(l_returnflag) AS min_flag, MAX(l_returnflag) AS max_flag
        |FROM lineitem""".stripMargin,
    // context-window chunking: the chunk count, window slices, and md5
    // fingerprints are replayed exactly (list slicing is 1-based inclusive
    // on both engines; `//`+`div` are both exact integer ceil-div)
    "q_chunk_windows" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    string_split(regexp_replace(text, '\\s+', ' ', 'g'), ' ')
         |      AS toks
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, toks,
         |    CAST(CASE WHEN len(toks) <= ${Curation.ChunkWin} THEN 1
         |      ELSE (len(toks) - ${Curation.ChunkWin} +
         |            ${Curation.ChunkStride} - 1) // ${Curation.ChunkStride}
         |           + 1 END AS BIGINT) AS nc
         |  FROM t),
         |x AS (
         |  SELECT doc_id, unnest(range(nc)) AS chunk_id, toks
         |  FROM c)
         |SELECT doc_id, chunk_id,
         |  CAST(len(toks[chunk_id * ${Curation.ChunkStride} + 1 :
         |        chunk_id * ${Curation.ChunkStride} + ${Curation.ChunkWin}])
         |    AS BIGINT) AS n_tok,
         |  md5(array_to_string(
         |    toks[chunk_id * ${Curation.ChunkStride} + 1 :
         |         chunk_id * ${Curation.ChunkStride} + ${Curation.ChunkWin}],
         |    ' ')) AS chunk_md5
         |FROM x ORDER BY doc_id, chunk_id""".stripMargin,
    "q_window_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |    AS hour_start,
        |  event_type, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS sum_value_cents
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // identical oracle: the streaming run must reproduce the batch result
    "q_stream_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |    AS hour_start,
        |  event_type, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS sum_value_cents
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the streaming join+agg must reproduce this batch join+agg
    "q_stream_enrich" ->
      """SELECT strftime(date_trunc('day', e.ts), '%Y-%m-%d') AS day,
        |  c.c_mktsegment AS segment, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS sum_value_cents
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_window_sliding" -> slidingOracle,
    // the streaming run must reproduce the batch sliding windows exactly
    "q_stream_sliding" -> slidingOracle,
    // streaming sessionizer: gaps-and-islands sessions, minus each user's
    // LAST session unless its event-time timeout fired. Non-last sessions
    // are always emitted (closed inline by the next event); a last session
    // is emitted only if timeout = end+30min (ms) is STRICTLY below the
    // final watermark = max(ts) (ms) — Spark fires timeouts on
    // `timeoutTimestamp < watermark`, both millisecond-truncated (see
    // Streaming.streamSessions).
    "q_stream_sessions" ->
      """WITH b AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |    THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM b),
        |sess AS (
        |  SELECT user_id, sid,
        |    strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |    MAX(ts) AS session_end,
        |    COUNT(*) AS cnt
        |  FROM s GROUP BY user_id, sid),
        |last AS (SELECT user_id, MAX(sid) AS sid FROM sess GROUP BY user_id),
        |mx AS (SELECT MAX(ts) AS mt FROM events)
        |SELECT sess.user_id, session_start, cnt
        |FROM sess
        |LEFT JOIN last ON sess.user_id = last.user_id AND sess.sid = last.sid
        |CROSS JOIN mx
        |WHERE last.sid IS NULL
        |   OR epoch_ms(session_end) + 1800000 < epoch_ms(mx.mt)
        |ORDER BY 1, 2""".stripMargin,
    // multi-batch sessionizer: same gaps-and-islands, but the emission
    // rule under a disorder-covering watermark — the watermark never
    // passes any event time, so NO timeout fires and every user's final
    // session is withheld; everything else emitted inline. File-boundary
    // independent (chronological range-split batches + within-batch sort
    // == batch sessionization), which is exactly why this oracle needs no
    // knowledge of the split.
    "q_stream_sessions_multi" ->
      """WITH b AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |    THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM b),
        |sess AS (
        |  SELECT user_id, sid,
        |    strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |    COUNT(*) AS cnt
        |  FROM s GROUP BY user_id, sid),
        |last AS (SELECT user_id, MAX(sid) AS sid FROM sess GROUP BY user_id)
        |SELECT sess.user_id, session_start, cnt
        |FROM sess
        |LEFT JOIN last ON sess.user_id = last.user_id AND sess.sid = last.sid
        |WHERE last.sid IS NULL
        |ORDER BY 1, 2""".stripMargin,
    "q_window_session" ->
      """WITH b AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |    THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM b)
        |SELECT user_id,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  COUNT(*) AS cnt
        |FROM s GROUP BY user_id, sid ORDER BY 1, 2""".stripMargin,
    "q_geo_join" ->
      """WITH p AS (
        |  SELECT c_custkey,
        |    (c_custkey * 7) % 120 - 60 + 0.25 AS lat,
        |    (c_custkey * 13) % 36 * 10 - 180 + 0.25 AS lon
        |  FROM customer),
        |cells AS (
        |  SELECT CAST(FLOOR(lat) AS BIGINT) AS lat_cell,
        |         CAST(FLOOR(lon / 10) AS BIGINT) AS lon_cell
        |  FROM p)
        |SELECT ((lat_cell + 60) + (lon_cell + 18) * 120) % 25 AS region_id,
        |  COUNT(*) AS cnt
        |FROM cells GROUP BY 1 ORDER BY 1""".stripMargin,
    // county-scale geo: full replay of GeoJoin.countyQuery — jittered
    // lattice vertices (integer LCG, one /1000.0), candidate window ±1
    // cell, and the 4-edge ray-cast crossing test in GeoJoin.contains'
    // exact (i, j=prev) pairing and operation order. Every double literal
    // is CAST to DOUBLE: DuckDB's bare 4.8 is DECIMAL (exact) while
    // Scala's is an inexact double — mixing them diverges in the last bit.
    // Horizontal frame edges: the crossing conjunct is false before the
    // division matters (NULL/inf both collapse to 0 in the CASE).
    // Exactly-one-owner per point is ASSERTED by the compare itself: a
    // double-claimed point would emit two oracle rows and break the match.
    "q_geo_county" ->
      """WITH p AS (
        |  SELECT c_custkey,
        |    CAST((c_custkey * 7) % 120 - 60 + 0.25 AS DOUBLE) AS lat,
        |    CAST((c_custkey * 13) % 36 * 10 - 180 + 0.25 AS DOUBLE) AS lon
        |  FROM customer),
        |p2 AS (
        |  SELECT c_custkey, lat, lon,
        |    CAST(FLOOR((lat + 60.0) / CAST(3.0 AS DOUBLE)) AS BIGINT) AS r0,
        |    CAST(FLOOR((lon + 180.0) / CAST(4.8 AS DOUBLE)) AS BIGINT) AS c0
        |  FROM p),
        |vtx AS (
        |  SELECT r, c,
        |    CASE WHEN r=0 OR r=40 OR c=0 OR c=75
        |      THEN -60.0 + CAST(3.0 AS DOUBLE) * r
        |      ELSE -60.0 + CAST(3.0 AS DOUBLE) * r +
        |        (((r*76 + c) * 2654435761 + 7) % 1000003 % 1201 - 600)
        |          / CAST(1000.0 AS DOUBLE) END AS vlat,
        |    CASE WHEN r=0 OR r=40 OR c=0 OR c=75
        |      THEN -180.0 + CAST(4.8 AS DOUBLE) * c
        |      ELSE -180.0 + CAST(4.8 AS DOUBLE) * c +
        |        (((r*76 + c) * 1103515245 + 12345) % 1000003 % 1921 - 960)
        |          / CAST(1000.0 AS DOUBLE) END AS vlon
        |  FROM range(0, 41) t1(r) CROSS JOIN range(0, 76) t2(c)),
        |quad AS (
        |  SELECT p2.c_custkey, p2.lat, p2.lon, t.r * 75 + t.c AS county_id,
        |    v0.vlat AS la0, v0.vlon AS lo0, v1.vlat AS la1, v1.vlon AS lo1,
        |    v2.vlat AS la2, v2.vlon AS lo2, v3.vlat AS la3, v3.vlon AS lo3
        |  FROM p2
        |  JOIN (SELECT r, c FROM range(0, 40) a(r) CROSS JOIN
        |        range(0, 75) b(c)) t
        |    ON t.r BETWEEN p2.r0 - 1 AND p2.r0 + 1
        |   AND t.c BETWEEN p2.c0 - 1 AND p2.c0 + 1
        |  JOIN vtx v0 ON v0.r = t.r     AND v0.c = t.c
        |  JOIN vtx v1 ON v1.r = t.r     AND v1.c = t.c + 1
        |  JOIN vtx v2 ON v2.r = t.r + 1 AND v2.c = t.c + 1
        |  JOIN vtx v3 ON v3.r = t.r + 1 AND v3.c = t.c),
        |hit AS (
        |  SELECT c_custkey, county_id FROM quad
        |  WHERE ((CASE WHEN (la0 > lat) <> (la3 > lat) AND
        |      lon < (lo3 - lo0) * (lat - la0) / (la3 - la0) + lo0
        |      THEN 1 ELSE 0 END)
        |    + (CASE WHEN (la1 > lat) <> (la0 > lat) AND
        |      lon < (lo0 - lo1) * (lat - la1) / (la0 - la1) + lo1
        |      THEN 1 ELSE 0 END)
        |    + (CASE WHEN (la2 > lat) <> (la1 > lat) AND
        |      lon < (lo1 - lo2) * (lat - la2) / (la1 - la2) + lo2
        |      THEN 1 ELSE 0 END)
        |    + (CASE WHEN (la3 > lat) <> (la2 > lat) AND
        |      lon < (lo2 - lo3) * (lat - la3) / (la2 - la3) + lo3
        |      THEN 1 ELSE 0 END)) % 2 = 1)
        |SELECT county_id, COUNT(*) AS n_pts
        |FROM hit GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cbind" ->
      """WITH base AS (SELECT * FROM customer ORDER BY c_custkey LIMIT 200),
        |a AS (SELECT ROW_NUMBER() OVER (ORDER BY c_custkey) AS idx, c_name
        |      FROM base),
        |b AS (SELECT ROW_NUMBER() OVER (ORDER BY c_custkey) AS idx,
        |             ROUND(c_acctbal, 2) AS acctbal
        |      FROM base)
        |SELECT CAST(idx AS BIGINT) AS idx, a.c_name, b.acctbal
        |FROM a JOIN b USING (idx) ORDER BY idx""".stripMargin,
    "q_enrich_pipeline" ->
      s"""WITH $enrichBaseCtes
         |SELECT region_id, status_cat, COUNT(*) AS cnt,
         |  CAST(SUM(price) * 100 AS BIGINT) AS sum_price_cents,
         |  MAX(ratio) AS max_ratio
         |FROM base GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the flagship chain: enrich (shared CTEs above, per-order `base`) →
    // constructed label → seeded split → exact gram/Cramer fit → score →
    // county forecast → calibration, all in ONE oracle — the same
    // forecast body q_ols_forecast uses, over the enriched ds
    "q_e2e" ->
      s"""WITH ${olsPrefix("NOT is_forecast AND bucket < 3", e2eDsCtes)},
         |$olsForecastBody""".stripMargin,
    // multimodal decode is REAL (javax.imageio) over images *generated*
    // deterministically from doc_id — so the oracle reconstructs the whole
    // decode contract from closed forms: the PNG signature+IHDR prefix is
    // spec-fixed given (w, h, 8-bit grayscale, no interlace); the manual
    // 24bpp BMP layout is byte-deterministic incl. file size (54 + padded
    // rows); and pixel(i) = (s+i) mod 256 sums via g(m) = 32640*(m div 256)
    // + r(r-1)/2 so sum_{i<n} = g(s+n) - g(s). The spec CTE below is the
    // oracle-side mirror of Multimodal.imageSpec.
    "q_multimodal_meta" ->
      """WITH spec AS (
        |  SELECT doc_id, 8 + doc_id % 24 AS w, 8 + (doc_id * 7) % 16 AS h,
        |    (doc_id * 131 + 17) % 256 AS s,
        |    CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS fmt
        |  FROM documents),
        |f AS (
        |  SELECT fmt, w, h,
        |    (32640*((s+w*h)//256) + ((s+w*h)%256)*((s+w*h)%256 - 1)//2)
        |    - (32640*(s//256) + (s%256)*((s%256) - 1)//2) AS px_sum
        |  FROM spec)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_assets,
        |  CAST(SUM(CASE WHEN fmt='png' THEN 1 ELSE 0 END) AS BIGINT) AS n_png,
        |  CAST(SUM(CASE WHEN fmt='bmp' THEN 1 ELSE 0 END) AS BIGINT) AS n_bmp,
        |  CAST(SUM(w*h) AS BIGINT) AS total_px,
        |  CAST(SUM(px_sum) AS BIGINT) AS total_px_sum,
        |  CAST(SUM(CASE WHEN fmt='bmp' THEN 54 + h*((3*w+3)//4*4)
        |            ELSE 0 END) AS BIGINT) AS bmp_bytes
        |FROM f""".stripMargin,
    // q_image_decode: per-doc gate. hdr_hex/hdr_w/hdr_h are parsed from the
    // ACTUAL encoder-produced bytes at fixed offsets on the Spark side; the
    // oracle rebuilds the expected bytes from the spec (PNG header prefix
    // concatenated per the PNG spec, BMP dims = spec dims). dec_* / px sums
    // are real ImageIO decoder output; rz_px_sum replays nearest-neighbor
    // source indexing at the fixed 10x8 target. n_bytes only for BMP —
    // PNG's deflate length is an encoder detail, not decode contract.
    "q_image_decode" ->
      """WITH spec AS (
        |  SELECT doc_id, 8 + doc_id % 24 AS w, 8 + (doc_id * 7) % 16 AS h,
        |    (doc_id * 131 + 17) % 256 AS s,
        |    CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS fmt
        |  FROM documents)
        |SELECT doc_id, fmt,
        |  CASE WHEN fmt='png'
        |    THEN '89504E470D0A1A0A0000000D49484452' || lpad(hex(w),8,'0')
        |         || lpad(hex(h),8,'0') || '0800000000'
        |    ELSE '424D' END AS hdr_hex,
        |  CAST(w AS BIGINT) AS hdr_w, CAST(h AS BIGINT) AS hdr_h,
        |  CAST(w AS BIGINT) AS dec_w, CAST(h AS BIGINT) AS dec_h,
        |  CAST(CASE WHEN fmt='png' THEN 1 ELSE 3 END AS BIGINT) AS dec_bands,
        |  CAST((32640*((s+w*h)//256) + ((s+w*h)%256)*((s+w*h)%256 - 1)//2)
        |    - (32640*(s//256) + (s%256)*((s%256) - 1)//2) AS BIGINT) AS px_sum,
        |  CAST(list_sum(flatten(list_transform(range(0, 8), ty ->
        |    list_transform(range(0, 10), tx ->
        |      (s + (ty*h//8)*w + (tx*w//10)) % 256)))) AS BIGINT) AS rz_px_sum,
        |  CAST(CASE WHEN fmt='bmp' THEN 54 + h*((3*w+3)//4*4) END AS BIGINT)
        |    AS n_bytes
        |FROM spec ORDER BY doc_id""".stripMargin,
    // audio decode: the WAV spec (rate/channels/frames/seed) is a pure
    // function of doc_id; the canonical 44-byte PCM header makes every
    // header field and the interleaved sample stream closed-form — the
    // Spark side must read them back from the real payload bytes and the
    // real javax.sound decoder
    "q_audio_decode" ->
      """WITH spec AS (
        |  SELECT doc_id,
        |    CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 11025
        |                    WHEN 2 THEN 16000 ELSE 22050 END AS rate,
        |    1 + doc_id % 2 AS ch, 64 + doc_id % 192 AS fr,
        |    (doc_id * 37 + 5) % 65536 AS seed
        |  FROM documents)
        |SELECT doc_id,
        |  '52494646' AS riff_hex, '57415645' AS wave_hex,
        |  CAST(ch AS BIGINT) AS hdr_channels,
        |  CAST(rate AS BIGINT) AS hdr_rate,
        |  CAST(16 AS BIGINT) AS hdr_bits,
        |  CAST(fr * ch * 2 AS BIGINT) AS data_bytes,
        |  CAST(rate AS BIGINT) AS dec_rate,
        |  CAST(ch AS BIGINT) AS dec_channels,
        |  CAST(16 AS BIGINT) AS dec_bits,
        |  CAST(fr AS BIGINT) AS dec_frames,
        |  CAST(list_sum(list_transform(range(0, fr * ch),
        |    i -> (seed + 13 * i) % 65536 - 32768)) AS BIGINT) AS sample_sum,
        |  CAST(44 + fr * ch * 2 AS BIGINT) AS n_bytes
        |FROM spec ORDER BY doc_id""".stripMargin,
    // the tree pipeline's one-hot design matrix, replayed end to end:
    // same sampled dataset (label non-null, l_orderkey % 15 = 1), the
    // LCG label, StringIndexer's documented frequencyDesc order with
    // alphabetical tie-break as a windowed rank, OneHotEncoder
    // dropLast=false as indicator columns plus the handleInvalid=keep
    // __unknown slot (oh_3 — structurally zero on seen data). The Spark
    // side emits the ASSEMBLED VECTOR's slots, so the whole feature stage
    // is inside the hash; row multiset compare needs no key column.
    "q_feature_matrix" ->
      """WITH ds AS (
        |  SELECT l_partkey % 500 AS county, l_returnflag,
        |    l_quantity, l_discount, l_tax,
        |    l_quantity * 3 - l_discount * 200 + l_tax * 50 +
        |      (CAST(((l_orderkey % 1000003) * 2654435761 + 7) % 1000003
        |            AS DOUBLE)
        |       / 1000003.0 * 10.0 - 5.0) AS label
        |  FROM lineitem
        |  WHERE l_orderkey % 10 <> 0 AND l_orderkey % 15 = 1),
        |idx AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, l_returnflag)
        |         - 1 AS BIGINT) AS flag_idx
        |  FROM ds GROUP BY 1)
        |SELECT d.county, i.flag_idx, d.label,
        |  d.l_quantity AS x_quantity, d.l_discount AS x_discount,
        |  d.l_tax AS x_tax,
        |  CAST(CASE WHEN i.flag_idx = 0 THEN 1 ELSE 0 END AS DOUBLE) AS oh_0,
        |  CAST(CASE WHEN i.flag_idx = 1 THEN 1 ELSE 0 END AS DOUBLE) AS oh_1,
        |  CAST(CASE WHEN i.flag_idx = 2 THEN 1 ELSE 0 END AS DOUBLE) AS oh_2,
        |  CAST(0 AS DOUBLE) AS oh_3
        |FROM ds d JOIN idx i ON d.l_returnflag = i.flag""".stripMargin,
    // video decode: the MJPEG-style container is concatenated REAL JPEG
    // frames; frames are solid gray (DC-only blocks reconstruct exactly
    // through the lossy codec — verified for all 256 grays at every spec
    // dim), so the demuxed frame count and each sampled frame's decoded
    // dims/pixel sum are closed-form in doc_id
    "q_video_frames" ->
      s"""WITH spec AS (
         |  SELECT doc_id, 16 + 8 * (doc_id % 3) AS w,
         |    16 + 8 * (doc_id % 2) AS h, 4 + doc_id % 5 AS n,
         |    (doc_id * 53 + 11) % 256 AS seed
         |  FROM documents),
         |f AS (SELECT doc_id, w, h, n, seed, unnest(range(0, n)) AS f
         |      FROM spec)
         |SELECT doc_id, CAST(n AS BIGINT) AS n_frames,
         |  CAST(f AS BIGINT) AS frame_idx,
         |  CAST(w AS BIGINT) AS dec_w, CAST(h AS BIGINT) AS dec_h,
         |  CAST(w * h * ((seed + 17 * f) % 256) AS BIGINT) AS px_sum
         |FROM f WHERE f % ${Multimodal.FrameStride} = 0
         |ORDER BY doc_id, frame_idx""".stripMargin,
    // TF-IDF mirrors term-for-term: integer tf/df/N, one double ln both
    // sides, rank over the ROUNDED score with a term tie-break
    "q_tfidf" ->
      raw"""WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(regexp_replace(lower(text), '\s+', ' ', 'g'),
        |           ' ')) AS term
        |  FROM documents),
        |filt AS (
        |  SELECT doc_id, term FROM toks
        |  WHERE length(term) > 0 AND term NOT IN
        |    (${graft.operators.TextAnalysis.sqlList(graft.operators.TextAnalysis.stopwords)})),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM filt GROUP BY 1, 2),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT t.doc_id, t.term,
        |    ROUND(t.tf * (ln((n.n_docs + 1.0) / (d.df + 1.0)) + 1.0), 6)
        |      AS tfidf
        |  FROM tf t JOIN dfreq d USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, tfidf,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
        |         ORDER BY tfidf DESC, term) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT doc_id, rank, term, tfidf
        |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    // inverted index: the oracle states the capped posting selection as a
    // plain per-term rank; the Spark side must reproduce it with the
    // skew-proof two-stage top-k (no full posting list ever sorted)
    "q_inverted_index" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    unnest(string_split(regexp_replace(lower(text), '\\s+', ' ',
         |           'g'), ' ')) AS term
         |  FROM documents),
         |filt AS (
         |  SELECT doc_id, term FROM toks
         |  WHERE length(term) > 0 AND term NOT IN
         |    (${graft.operators.TextAnalysis.sqlList(graft.operators.TextAnalysis.stopwords)})),
         |tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM filt GROUP BY 1, 2),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
         |          HAVING COUNT(*) >= ${TextAnalysis.IndexMinDf}),
         |ranked AS (
         |  SELECT t.term, d.df, t.doc_id, t.tf,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY t.term
         |         ORDER BY t.tf DESC, t.doc_id) AS BIGINT) AS rank
         |  FROM tf t JOIN dfreq d USING (term))
         |SELECT term, df, rank, doc_id, tf
         |FROM ranked WHERE rank <= ${TextAnalysis.IndexTopK}
         |ORDER BY term, rank""".stripMargin,
    // heavy hitters: the sketch only PRUNES (HhK >= HhFraction keeps the
    // MG guarantee above the report threshold), so the oracle is the
    // plain exact groupBy-HAVING the two-pass plan must equal
    "q_heavy_hitters" ->
      s"""WITH t AS (
         |  SELECT unnest(string_split(regexp_replace(lower(text), '\\s+',
         |         ' ', 'g'), ' ')) AS term
         |  FROM documents),
         |t2 AS (SELECT term FROM t WHERE length(term) > 0),
         |n AS (SELECT COUNT(*) AS n FROM t2)
         |SELECT term, COUNT(*) AS cnt
         |FROM t2, n
         |GROUP BY term, n.n
         |HAVING COUNT(*) > n.n // ${TextAnalysis.HhFraction}
         |ORDER BY cnt DESC, term""".stripMargin,
    // temperature mix: sqrt (unlike pow) is IEEE-correctly-rounded, so the
    // whole rate derivation — floor(1000·T·√n/(Σ√n·n)) — is bit-exact in
    // both engines; the keep decision is the q_sample_mix LCG replay
    "q_temp_mix" ->
      s"""WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
         |-- ssum folds in SORTED-LANG order (a plain SUM of doubles folds
         |-- in scan order — order-dependent; the Spark side folds the
         |-- collected counts the same way, so the rates are bit-exact)
         |s AS (SELECT list_reduce(list(sqrt(n) ORDER BY lang),
         |        (a, b) -> a + b) AS ssum,
         |      SUM(n) AS ntot FROM c),
         |r AS (
         |  SELECT lang, n, LEAST(1000, CAST(FLOOR(1000.0 *
         |    FLOOR(ntot * ${Curation.TempTargetPermille / 1000.0}) *
         |    sqrt(n) / (ssum * n)) AS BIGINT)) AS rate_permille
         |  FROM c, s),
         |d AS (
         |  SELECT doc_id, lang,
         |    CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT)
         |      AS n_tok,
         |    ((doc_id % 1000003) * 2654435761 + 7) % 1000003 % 1000 AS draw
         |  FROM documents)
         |SELECT d.lang, COUNT(*) AS n_docs, r.rate_permille,
         |  CAST(SUM(CASE WHEN draw < r.rate_permille THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_kept,
         |  CAST(SUM(CASE WHEN draw < r.rate_permille THEN n_tok ELSE 0 END)
         |    AS BIGINT) AS kept_tokens
         |FROM d JOIN r USING (lang)
         |GROUP BY d.lang, r.rate_permille ORDER BY d.lang""".stripMargin,
    // PageRank: integer micro-unit arithmetic makes the repeated
    // aggregation order-independent, so the oracle replays all 5 rounds
    // as unrolled CTEs generated from the same PrIters constant
    "q_pagerank" -> Graph.pageRankOracleSql,
    // snapshot diff: plain full-outer hash-compare replay
    "q_snapshot_diff" ->
      """WITH old AS (SELECT doc_id, md5(text) AS h_old FROM documents),
        |cur AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END)
        |      AS h_new
        |  FROM documents WHERE doc_id % 10 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, md5(text) FROM documents
        |  WHERE doc_id % 9 = 0),
        |j AS (
        |  SELECT COALESCE(o.doc_id, c.doc_id) AS doc_id,
        |    -- presence by KEY, not hash nullability (md5(NULL text) is
        |    -- NULL — a hash-null test would misreport a NULL-text doc
        |    -- present in both versions as 'added'); mirrors the Spark
        |    -- side's in_old/in_new markers and null-safe hash compare
        |    CASE WHEN o.doc_id IS NULL THEN 'added'
        |         WHEN c.doc_id IS NULL THEN 'removed'
        |         WHEN o.h_old IS DISTINCT FROM c.h_new THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM old o FULL OUTER JOIN cur c ON o.doc_id = c.doc_id)
        |SELECT status, COUNT(*) AS n,
        |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // CDC MERGE: same planted change-set, one full-outer join, delete wins
    "q_merge_upsert" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |chg AS (
        |  SELECT doc_id, 'D' AS op, CAST(NULL AS VARCHAR) AS c_text
        |  FROM base WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id, 'U', text || ' v2'
        |  FROM base WHERE doc_id % 10 <> 0 AND doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, 'U', text FROM base WHERE doc_id % 9 = 0),
        |m AS (
        |  SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
        |    COALESCE(c.c_text, b.text) AS text
        |  FROM base b FULL OUTER JOIN chg c ON b.doc_id = c.doc_id
        |  WHERE COALESCE(c.op, '') <> 'D')
        |SELECT doc_id % 16 AS bucket, COUNT(*) AS n,
        |  CAST(SUM(length(text)) AS BIGINT) AS sum_len,
        |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM m GROUP BY 1 ORDER BY bucket""".stripMargin,
    // Z-order zone map: interleave expression generated from the same
    // ZBits/ShardBits constants as the plan — bit layout can't drift
    "q_zorder" -> Layout.zOrderOracleSql,
    // BPE pair statistics: lateral-free unnest(generate_series) explosion;
    // (n DESC, pair ASC) is a total order so the top-20 cut is exact
    "q_bpe_pairs" ->
      """WITH pos AS (
        |  SELECT text, unnest(generate_series(1, length(text) - 1)) AS i
        |  FROM documents WHERE length(text) >= 2)
        |SELECT substring(text, CAST(i AS INT), 2) AS pair, COUNT(*) AS n
        |FROM pos GROUP BY 1
        |ORDER BY n DESC, pair ASC LIMIT 20""".stripMargin,
    // LAG gaps: exact epoch-day integers, same (day, orderkey) ordering
    "q_lag_gaps" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, o_orderpriority AS priority,
        |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS day
        |  FROM orders),
        |g AS (
        |  SELECT priority,
        |    day - lag(day) OVER
        |      (PARTITION BY o_custkey ORDER BY day, o_orderkey) AS gap
        |  FROM o)
        |SELECT priority, COUNT(*) AS n_gaps,
        |  CAST(SUM(gap) AS BIGINT) AS sum_gap_days,
        |  MIN(gap) AS min_gap_days, MAX(gap) AS max_gap_days
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY 1 ORDER BY priority""".stripMargin,
    // lang-ID is exact SQL: stopword counts are integers, the score division
    // is the same double op both sides, and the argmax tie-break (max score,
    // then max lang) mirrors Spark's greatest() over (score, lang) structs
    // via the fr→en→de CASE order.
    "q_lang_id" ->
      raw"""WITH t AS (
        |  SELECT lang,
        |    string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')
        |      AS tokens
        |  FROM documents),
        |s AS (
        |  SELECT lang,
        |    CAST(len(list_filter(tokens, x -> x IN
        |      (${graft.operators.TextAnalysis.sqlList(graft.operators.TextAnalysis.stopwords)})))
        |      AS DOUBLE) / greatest(len(tokens), 1) AS s_en,
        |    CAST(len(list_filter(tokens, x -> x IN
        |      ('der','die','das','und','ist','nicht','ein','zu','mit')))
        |      AS DOUBLE) / greatest(len(tokens), 1) AS s_de,
        |    CAST(len(list_filter(tokens, x -> x IN
        |      ('le','la','et','les','des','un','une','est','dans')))
        |      AS DOUBLE) / greatest(len(tokens), 1) AS s_fr
        |  FROM t),
        |b AS (
        |  SELECT lang, greatest(s_de, s_en, s_fr) AS best_s,
        |    CASE WHEN s_fr = greatest(s_de, s_en, s_fr) THEN 'fr'
        |         WHEN s_en = greatest(s_de, s_en, s_fr) THEN 'en'
        |         ELSE 'de' END AS best_l
        |  FROM s)
        |SELECT lang,
        |  CASE WHEN best_s >= 0.01 THEN best_l ELSE 'und' END AS pred_lang,
        |  COUNT(*) AS cnt
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // brute-force ANN is exactly SQL-expressible: DuckDB list_dot_product
    // over DOUBLE[] accumulates left-to-right in double, the same algorithm
    // as the codegen'd vec_dot loop, so cos matches bit-for-bit; ties in
    // the rounded cos break on vec_id in both engines.
    "q_ann_topk" ->
      s"""WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS emb,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
        |      AS norm
        |  FROM embeddings),
        |$annQueryCte,
        |q AS (SELECT vec_id AS q_id, emb AS q_emb, norm AS q_norm
        |      FROM e WHERE vec_id IN (SELECT vec_id FROM qd)),
        |scored AS (
        |  SELECT q.q_id, e.vec_id,
        |    ROUND(list_dot_product(q.q_emb, e.emb) / (q.q_norm * e.norm), 6)
        |      AS cos
        |  FROM q CROSS JOIN e WHERE e.vec_id <> q.q_id),
        |ranked AS (
        |  SELECT q_id, vec_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
        |         ORDER BY cos DESC, vec_id) AS BIGINT) AS rank, cos
        |  FROM scored)
        |SELECT q_id, rank, vec_id AS neighbor_id, cos
        |FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    // full SQL replay of the SRP-LSH ANN path at the COUNT-DERIVED
    // parameterization (r8): bits from the corpus count via
    // length(bin(n // TargetBucket)) — the same exact integer arithmetic
    // as Similarity.bitsForCount — and bands from the interpolated pinned
    // table (annBandsFor, StrictMath in the same JVM that emits this SQL).
    // Planes are LCG-derived with the probed dim as seed stride
    // (bit-identical doubles), sign-bit signatures, variable-width band
    // keys (first plane = high bit, matching the left-fold acc*2+v),
    // bucket-joined candidates, exact cosine on candidates only, top-k.
    // Approximate output, exact oracle — bits, bands, and the banding
    // itself are all part of the verified contract.
    "q_ann_lsh" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS emb,
         |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
         |      AS norm
         |  FROM embeddings),
         |$annQueryCte,
         |params AS (
         |  SELECT dim, bits,
         |    CASE bits ${(Similarity.MinBits to Similarity.MaxBitsAnn)
                 .map(b => s"WHEN $b THEN ${Similarity.annBandsFor(b)}")
                 .mkString(" ")} END AS bands
         |  FROM (SELECT
         |    (SELECT MAX(len(emb)) FROM e) AS dim,
         |    LEAST(${Similarity.MaxBitsAnn}, GREATEST(${Similarity.MinBits},
         |      length(bin(GREATEST(1,
         |        (SELECT COUNT(*) FROM e) // ${Similarity.TargetBucket})))))
         |      AS bits)),
         |planes AS (
         |  SELECT j, list_transform(range(0, pa.dim), d ->
         |    (((j * pa.dim + d) * 2654435761 + 12345) % 2147483648)
         |      / 2147483648.0 - 0.5) AS p
         |  FROM range(0, 256) r(j), params pa
         |  WHERE j < pa.bands * pa.bits),
         |bits_t AS (
         |  SELECT e.vec_id, p.j,
         |    CASE WHEN list_dot_product(p.p, e.emb) >= 0 THEN 1 ELSE 0 END
         |      AS bit
         |  FROM e CROSS JOIN planes p),
         |keys AS (
         |  SELECT vec_id, j // pa.bits AS band,
         |    SUM(bit << CAST(pa.bits - 1 - (j % pa.bits) AS INTEGER)) AS key
         |  FROM bits_t, params pa GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS q_id, c.vec_id
        |  FROM keys q JOIN keys c ON q.band = c.band AND q.key = c.key
        |  WHERE q.vec_id IN (SELECT vec_id FROM qd)
        |    AND c.vec_id <> q.vec_id),
        |scored AS (
        |  SELECT cand.q_id, cand.vec_id,
        |    ROUND(list_dot_product(qe.emb, ce.emb) / (qe.norm * ce.norm), 6)
        |      AS cos
        |  FROM cand
        |  JOIN e qe ON qe.vec_id = cand.q_id
        |  JOIN e ce ON ce.vec_id = cand.vec_id),
        |ranked AS (
        |  SELECT q_id, vec_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
        |         ORDER BY cos DESC, vec_id) AS BIGINT) AS rank, cos
        |  FROM scored)
        |SELECT q_id, rank, vec_id AS neighbor_id, cos
        |FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    // PII redaction: planted corpus mirrored verbatim; DuckDB needs the
    // 'g' flag to match Spark's replace-all regexp_replace semantics; the
    // patterns are dialect-portable (no backreferences/lookaround, same
    // language under Java regex and RE2); redacted text is verified by
    // the same rolling fingerprint as q_fingerprint
    "q_redact" ->
      s"""WITH pii AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 11 = 0
         |      THEN ' reach me at alice.w@example.com ok' ELSE '' END ||
         |    CASE WHEN doc_id % 13 = 0
         |      THEN ' call 555-123-4567 today' ELSE '' END ||
         |    CASE WHEN doc_id % 17 = 0
         |      THEN ' from 10.0.42.7 gateway' ELSE '' END AS text
         |  FROM documents),
         |red AS (
         |  SELECT doc_id, text,
         |    regexp_replace(regexp_replace(regexp_replace(text,
         |      '${Curation.EmailRe}', '<EMAIL>', 'g'),
         |      '${Curation.PhoneRe}', '<PHONE>', 'g'),
         |      '${Curation.IpRe}', '<IP>', 'g') AS rtext
         |  FROM pii)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${Curation.EmailRe}'))
         |    AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(text, '${Curation.PhoneRe}'))
         |    AS BIGINT) AS n_phone,
         |  CAST(len(regexp_extract_all(text, '${Curation.IpRe}'))
         |    AS BIGINT) AS n_ip,
         |  CASE WHEN length(rtext) = 0 THEN 0 ELSE list_reduce(
         |    list_transform(range(1, length(rtext) + 1),
         |                   i -> CAST(unicode(rtext[i]) AS BIGINT)),
         |    (acc, c) -> (acc * 131 + c) % 1000000007) END AS red_fp
         |FROM red""".stripMargin,
    // mixture sampling: the LCG keep-decision is exact integer arithmetic
    // (operands < 2^52), replayed bit-for-bit; CASE mirrors the sorted
    // when-chain (conditions disjoint, so order is immaterial)
    "q_sample_mix" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT)
        |      AS n_tok,
        |    ((doc_id % 1000003) * 2654435761 + 7) % 1000003 % 1000 <
        |      CASE lang WHEN 'de' THEN 500 WHEN 'en' THEN 800
        |                WHEN 'es' THEN 300 WHEN 'fr' THEN 400
        |                WHEN 'zh' THEN 200 ELSE 100 END AS keep
        |  FROM documents)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT)
        |    AS kept_tokens
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    // per-domain quota: the oracle states the cap as a plain per-source
    // rank over the LCG draw; the Spark side must reproduce it with the
    // skew-proof two-stage selection (partial heads per input partition,
    // then the global per-source rank over ≤ k·P survivors)
    "q_domain_cap" ->
      s"""WITH h AS (
         |  SELECT source, doc_id,
         |    ((doc_id % 1000003) * 2654435761 + 13) % 1000003 AS h
         |  FROM documents),
         |r AS (
         |  SELECT source, doc_id,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY source
         |         ORDER BY h, doc_id) AS BIGINT) AS rank
         |  FROM h)
         |SELECT source, rank, doc_id FROM r
         |WHERE rank <= ${Curation.DomainCapK}
         |ORDER BY source, rank""".stripMargin,
    // sequence packing: the oracle states the concat-and-chunk rule as a
    // plain exclusive-prefix window; the Spark side must reproduce it with
    // its distributed two-pass prefix sum (no single-task window)
    // token budget interpolated from Curation.DefaultBudgetTokens — the
    // single constant the Spark registration also uses (raw interpolator:
    // the \s+ pattern must reach DuckDB's regex engine untouched)
    "q_seq_pack" ->
      raw"""WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT)
        |      AS n_tok
        |  FROM documents),
        |p AS (
        |  -- DuckDB SUM(BIGINT) widens to DECIMAL(38,0); cast back so the
        |  -- bin division stays BIGINT like the Spark side
        |  SELECT doc_id, n_tok,
        |    CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS prefix
        |  FROM t)
        |SELECT prefix // ${Curation.DefaultBudgetTokens} AS bin,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    // eval-overlap decontamination: full replay — the benchmark snippet
    // derivation (tokens 5..28 of every 13th doc), the planted leaked
    // docs, the distinct word 8-grams (DecontamGramSize interpolated from
    // the one shared constant) and the overlap fractions. The corpus side
    // never self-joins; only benchmark-gram hits reach the aggregate.
    "q_decontam" -> {
      val g = Curation.DecontamGramSize
      s"""WITH tok AS (
         |  SELECT doc_id,
         |    string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'),
         |                 ' ') AS ts
         |  FROM documents),
         |bench AS (
         |  SELECT doc_id AS bench_id, ts[5:28] AS st
         |  FROM tok WHERE doc_id % 13 = 5 AND len(ts) >= 28),
         |corpus AS (
         |  SELECT doc_id, ts FROM tok
         |  UNION ALL
         |  SELECT bench_id + 4000000, list_concat(st, ['xx', 'yy'])
         |  FROM bench),
         |bgrams AS (
         |  SELECT DISTINCT unnest(list_transform(range(0, len(st) - ${g - 1}),
         |    i -> array_to_string(st[i+1:i+$g], ' '))) AS gram
         |  FROM bench),
         |grams AS (
         |  SELECT doc_id,
         |    list_distinct(CASE WHEN len(ts) < $g
         |      THEN [array_to_string(ts, ' ')]
         |      ELSE list_transform(range(0, len(ts) - ${g - 1}),
         |             i -> array_to_string(ts[i+1:i+$g], ' '))
         |    END) AS gs
         |  FROM corpus),
         |expl AS (
         |  SELECT doc_id, CAST(len(gs) AS BIGINT) AS n_grams,
         |    unnest(gs) AS gram
         |  FROM grams)
         |SELECT e.doc_id, e.n_grams, COUNT(*) AS n_hit,
         |  ROUND(CAST(COUNT(*) AS DOUBLE) / n_grams, 4) AS overlap_frac,
         |  CAST(COUNT(*) AS DOUBLE) / n_grams >= ${Curation.ContamThreshold}
         |    AS contaminated
         |FROM expl e JOIN bgrams b ON e.gram = b.gram
         |GROUP BY e.doc_id, e.n_grams
         |ORDER BY e.doc_id""".stripMargin
    },
    // repetition metrics: the oracle states the set-based explode +
    // groupBy(doc_id, token) form; the Spark side must reproduce it with
    // the one-pass repeat_stats kernel (per-row hash maps, no shuffle)
    "q_repetition" ->
      s"""WITH tok AS (
         |  SELECT doc_id,
         |    string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'),
         |                 ' ') AS ts
         |  FROM documents),
         |t1 AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tok,
         |         unnest(ts) AS t FROM tok),
         |tc AS (SELECT doc_id, ANY_VALUE(n_tok) AS n_tok, t, COUNT(*) AS c
         |       FROM t1 GROUP BY doc_id, t),
         |tm AS (SELECT doc_id, ANY_VALUE(n_tok) AS n_tok, MAX(c) AS top_cnt,
         |         COUNT(*) AS uniq_tok FROM tc GROUP BY doc_id),
         |bg AS (SELECT doc_id, unnest(list_transform(range(0, len(ts) - 1),
         |         i -> ts[i+1] || ' ' || ts[i+2])) AS b FROM tok),
         |bm AS (SELECT doc_id, COUNT(DISTINCT b) AS uniq_bg
         |       FROM bg GROUP BY doc_id)
         |SELECT tm.doc_id, n_tok, top_cnt, uniq_tok,
         |  COALESCE(uniq_bg, 0) AS uniq_bg,
         |  ROUND(CAST(top_cnt AS DOUBLE) / n_tok, 4) AS top_tok_frac,
         |  ROUND(1.0 - CAST(uniq_tok AS DOUBLE) / n_tok, 4) AS dup_tok_frac,
         |  CASE WHEN n_tok < 2 THEN 0.0
         |       ELSE ROUND(1.0 - CAST(uniq_bg AS DOUBLE) / (n_tok - 1), 4)
         |  END AS dup_2gram_frac,
         |  CASE WHEN n_tok < 2 THEN 0.0
         |       ELSE ROUND(1.0 - CAST(uniq_bg AS DOUBLE) / (n_tok - 1), 4)
         |  END > ${TextAnalysis.RepetitionThreshold} AS repetitive
         |FROM tm LEFT JOIN bm USING (doc_id)
         |ORDER BY tm.doc_id""".stripMargin,
    // shard manifest: the LCG shard decision is the q_sample_mix integer
    // arithmetic (operands < 2^52, bit-exact); the checksum is bit_xor of
    // the q_fingerprint roll — order-independent, so engine-side
    // aggregation order can't matter
    "q_shard_manifest" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    ((doc_id % 1000003) * 2654435761 + 7) % 1000003 %
         |      ${Curation.DefaultShards} AS shard,
         |    CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT)
         |      AS n_tok,
         |    CASE WHEN length(text) = 0 THEN 0 ELSE list_reduce(
         |      list_transform(range(1, length(text) + 1),
         |                     i -> CAST(unicode(text[i]) AS BIGINT)),
         |      (acc, c) -> (acc * 131 + c) % 1000000007) END AS fp
         |  FROM documents)
         |SELECT shard, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS tokens,
         |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
         |  bit_xor(fp) AS fp_xor
         |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    // the composed curation chain: every stage's oracle fragment chained
    // as CTEs in pipeline order — language argmax (q_lang_id), duplicate
    // -bigram fraction (q_repetition), md5 keep-first (q_exact_dedup),
    // benchmark-gram overlap (q_decontam), PII planting + redaction
    // fingerprint (q_redact). One SQL statement = one lineage, matching
    // the Spark side's single-lineage composition claim.
    "q_curate_chain" -> {
      val g = Curation.DecontamGramSize
      s"""WITH d0 AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0),
         |tok AS (
         |  SELECT doc_id, text,
         |    string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'),
         |                 ' ') AS ts
         |  FROM d0),
         |lang AS (
         |  SELECT doc_id, text, ts,
         |    CAST(len(list_filter(ts, x -> x IN
         |      (${graft.operators.TextAnalysis.sqlList(graft.operators.TextAnalysis.stopwords)})))
         |      AS DOUBLE) / greatest(len(ts), 1) AS s_en,
         |    CAST(len(list_filter(ts, x -> x IN
         |      ('der','die','das','und','ist','nicht','ein','zu','mit')))
         |      AS DOUBLE) / greatest(len(ts), 1) AS s_de,
         |    CAST(len(list_filter(ts, x -> x IN
         |      ('le','la','et','les','des','un','une','est','dans')))
         |      AS DOUBLE) / greatest(len(ts), 1) AS s_fr
         |  FROM tok),
         |en AS (
         |  SELECT doc_id, text, ts FROM lang
         |  WHERE greatest(s_de, s_en, s_fr) >= 0.01
         |    AND CASE WHEN s_fr = greatest(s_de, s_en, s_fr) THEN 'fr'
         |             WHEN s_en = greatest(s_de, s_en, s_fr) THEN 'en'
         |             ELSE 'de' END = 'en'),
         |bgr AS (SELECT doc_id, unnest(list_transform(range(0, len(ts) - 1),
         |          i -> ts[i+1] || ' ' || ts[i+2])) AS b FROM en),
         |bgm AS (SELECT doc_id, COUNT(DISTINCT b) AS uniq_bg
         |        FROM bgr GROUP BY doc_id),
         |rep AS (
         |  SELECT en.doc_id, text, ts, CAST(len(ts) AS BIGINT) AS n_tok,
         |    CASE WHEN len(ts) < 2 THEN 0.0
         |         ELSE ROUND(1.0 - CAST(COALESCE(uniq_bg, 0) AS DOUBLE) /
         |                    (len(ts) - 1), 4)
         |    END AS dup_2gram_frac
         |  FROM en LEFT JOIN bgm USING (doc_id)),
         |lowrep AS (SELECT * FROM rep
         |           WHERE dup_2gram_frac <= ${TextAnalysis.RepetitionThreshold}),
         |ded AS (
         |  SELECT * FROM lowrep
         |  WHERE doc_id IN (SELECT MIN(doc_id) FROM lowrep
         |                   GROUP BY md5(text))),
         |btok AS (
         |  SELECT doc_id,
         |    string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'),
         |                 ' ') AS bts
         |  FROM documents),
         |bench AS (SELECT bts[5:28] AS st FROM btok
         |          WHERE doc_id % 13 = 5 AND len(bts) >= 28),
         |bgrams AS (
         |  SELECT DISTINCT unnest(list_transform(range(0, len(st) - ${g - 1}),
         |    i -> array_to_string(st[i+1:i+$g], ' '))) AS gram
         |  FROM bench),
         |dg AS (
         |  SELECT doc_id,
         |    list_distinct(CASE WHEN len(ts) < $g
         |      THEN [array_to_string(ts, ' ')]
         |      ELSE list_transform(range(0, len(ts) - ${g - 1}),
         |             i -> array_to_string(ts[i+1:i+$g], ' '))
         |    END) AS gs
         |  FROM ded),
         |hits AS (SELECT doc_id, CAST(len(gs) AS BIGINT) AS n_grams,
         |           unnest(gs) AS gram FROM dg),
         |contam AS (
         |  SELECT h.doc_id FROM hits h JOIN bgrams USING (gram)
         |  GROUP BY h.doc_id, h.n_grams
         |  HAVING CAST(COUNT(*) AS DOUBLE) / n_grams >=
         |    ${Curation.ContamThreshold}),
         |clean AS (SELECT * FROM ded
         |          WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
         |pii AS (
         |  SELECT doc_id, n_tok, dup_2gram_frac,
         |    text ||
         |    CASE WHEN doc_id % 11 = 0
         |      THEN ' reach me at alice.w@example.com ok' ELSE '' END ||
         |    CASE WHEN doc_id % 13 = 0
         |      THEN ' call 555-123-4567 today' ELSE '' END ||
         |    CASE WHEN doc_id % 17 = 0
         |      THEN ' from 10.0.42.7 gateway' ELSE '' END AS ptext
         |  FROM clean),
         |red AS (
         |  SELECT doc_id, n_tok, dup_2gram_frac, ptext,
         |    regexp_replace(regexp_replace(regexp_replace(ptext,
         |      '${Curation.EmailRe}', '<EMAIL>', 'g'),
         |      '${Curation.PhoneRe}', '<PHONE>', 'g'),
         |      '${Curation.IpRe}', '<IP>', 'g') AS rtext
         |  FROM pii)
         |SELECT doc_id, n_tok, dup_2gram_frac,
         |  CAST(len(regexp_extract_all(ptext, '${Curation.EmailRe}'))
         |    AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(ptext, '${Curation.PhoneRe}'))
         |    AS BIGINT) AS n_phone,
         |  CAST(len(regexp_extract_all(ptext, '${Curation.IpRe}'))
         |    AS BIGINT) AS n_ip,
         |  CASE WHEN length(rtext) = 0 THEN 0 ELSE list_reduce(
         |    list_transform(range(1, length(rtext) + 1),
         |                   i -> CAST(unicode(rtext[i]) AS BIGINT)),
         |    (acc, c) -> (acc * 131 + c) % 1000000007) END AS red_fp
         |FROM red""".stripMargin
    },
    // Rabin–Karp char-stream fold: DuckDB list_reduce seeds with the first
    // element, which equals Spark's aggregate from zero ((0*131+c0)%p = c0).
    // length() (characters), not strlen() (bytes): the Spark side rolls
    // over code points, and s[i] indexes characters — byte length would
    // hash garbage positions on any non-ASCII text.
    "q_fingerprint" ->
      """SELECT doc_id,
        |  CASE WHEN length(text) = 0 THEN 0
        |       ELSE list_reduce(
        |         list_transform(range(1, length(text) + 1),
        |                        i -> CAST(unicode(text[i]) AS BIGINT)),
        |         (acc, c) -> (acc * 131 + c) % 1000000007)
        |  END AS fingerprint
        |FROM documents""".stripMargin,
    // exhaustive quadratic ground truth: every pair with Jaccard >= 0.5.
    // The Spark side generates candidates with banded MinHash-LSH (never
    // all-pairs); equality against this oracle demonstrates zero false
    // negatives on the planted corpus (deterministic hashes -> stable)
    // full SQL replay of the MinHash-LSH operator — shingles, poly-roll +
    // tabulation-slot signatures (the r10 production family), banded
    // buckets (capped), exact-Jaccard
    // verification — so the oracle states the LSH's ACTUAL output. An
    // exhaustive ground-truth oracle only matches when banding recall
    // happens to be 1, which provably fails at some SFs (sf0.001: two
    // true pairs miss all 5 bands).
    "q_minhash_neardup" ->
      s"""WITH $minhashPrefix
         |SELECT a, b, jaccard FROM verified WHERE jaccard >= 0.5
         |ORDER BY a, b""".stripMargin,
    // tabulation audit: same corpus/shingle/polyhash CTEs, slot hashes
    // from the XOR-of-byte-tables family (xor() — DuckDB ^ is pow)
    "q_mh_tabulation" ->
      s"""WITH $minhashPrefix,
         |mtab AS (SELECT doc_id, mh AS mh2 FROM mht)
         |SELECT o.doc_id AS a, n.doc_id AS b,
         |  CAST(len(list_filter(list_transform(range(1, ${
           graft.operators.Dedup.NumHashes + 1}),
         |    i -> o.mh2[i] = n.mh2[i]), z -> z)) AS BIGINT) AS est_matches,
         |  ROUND(CAST(len(list_filter(list_transform(range(1, ${
           graft.operators.Dedup.NumHashes + 1}),
         |    i -> o.mh2[i] = n.mh2[i]), z -> z)) AS DOUBLE) / ${
           graft.operators.Dedup.NumHashes}.0, 6) AS est_jaccard,
         |  ROUND(CAST(len(list_intersect(so.shingles, sn.shingles))
         |      AS DOUBLE) /
         |    len(list_distinct(list_concat(so.shingles, sn.shingles))), 6)
         |    AS exact_jaccard,
         |  ROUND(ABS(
         |    CAST(len(list_filter(list_transform(range(1, ${
           graft.operators.Dedup.NumHashes + 1}),
         |      i -> o.mh2[i] = n.mh2[i]), z -> z)) AS DOUBLE) / ${
           graft.operators.Dedup.NumHashes}.0 -
         |    CAST(len(list_intersect(so.shingles, sn.shingles)) AS DOUBLE) /
         |      len(list_distinct(list_concat(so.shingles, sn.shingles)))),
         |    6) AS abs_err
         |FROM mtab o
         |JOIN mtab n ON n.doc_id = o.doc_id + 2000000
         |JOIN sh so ON so.doc_id = o.doc_id
         |JOIN sh sn ON sn.doc_id = n.doc_id
         |WHERE o.doc_id < 1000000 AND o.doc_id % 7 = 0
         |ORDER BY a""".stripMargin,
    // sketch accuracy: the same replayed signatures, planted pair set,
    // slot-match estimate vs exact shingle jaccard (unused CTEs are free)
    "q_mh_accuracy" ->
      s"""WITH $minhashPrefix
         |SELECT o.doc_id AS a, n.doc_id AS b,
         |  CAST(len(list_filter(list_transform(range(1, ${
           graft.operators.Dedup.NumHashes + 1}),
         |    i -> o.mh[i] = n.mh[i]), z -> z)) AS BIGINT) AS est_matches,
         |  ROUND(CAST(len(list_filter(list_transform(range(1, ${
           graft.operators.Dedup.NumHashes + 1}),
         |    i -> o.mh[i] = n.mh[i]), z -> z)) AS DOUBLE) / ${
           graft.operators.Dedup.NumHashes}.0, 6) AS est_jaccard,
         |  ROUND(CAST(len(list_intersect(so.shingles, sn.shingles))
         |      AS DOUBLE) /
         |    len(list_distinct(list_concat(so.shingles, sn.shingles))), 6)
         |    AS exact_jaccard,
         |  ROUND(ABS(
         |    CAST(len(list_filter(list_transform(range(1, ${
           graft.operators.Dedup.NumHashes + 1}),
         |      i -> o.mh[i] = n.mh[i]), z -> z)) AS DOUBLE) / ${
           graft.operators.Dedup.NumHashes}.0 -
         |    CAST(len(list_intersect(so.shingles, sn.shingles)) AS DOUBLE) /
         |      len(list_distinct(list_concat(so.shingles, sn.shingles)))),
         |    6) AS abs_err
         |FROM mh o
         |JOIN mh n ON n.doc_id = o.doc_id + 2000000
         |JOIN sh so ON so.doc_id = o.doc_id
         |JOIN sh sn ON sn.doc_id = n.doc_id
         |WHERE o.doc_id < 1000000 AND o.doc_id % 7 = 0
         |ORDER BY a""".stripMargin,
    // survivor selection: connected components over the SAME replayed
    // LSH pair set; the oracle computes the transitive closure with a
    // recursive CTE — equal results prove the pointer-jumping fixpoint
    // converged to true components.
    "q_dedup_survivors" ->
      s"""WITH RECURSIVE $minhashPrefix,
         |pairs AS (SELECT a, b FROM verified WHERE jaccard >= 0.5),
         |edges AS (
         |  SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
         |reach(node, label) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.node),
         |comp AS (SELECT node, MIN(label) AS label FROM reach GROUP BY node)
         |SELECT label AS survivor_id, COUNT(*) AS n_members,
         |  MAX(node) AS max_member
         |FROM comp GROUP BY 1 ORDER BY 1""".stripMargin,
    // incremental dedup: full replay — planted batch, md5 exact hits,
    // signatures over history ∪ surviving batch (same math as
    // minhashPrefix), history-side capped band buckets probed by batch
    // bands ONLY (cross-set candidates), exact-Jaccard verify, then the
    // three-way classification. NULL matched_id marks genuinely-new docs.
    "q_incr_dedup" ->
      s"""WITH hist AS (SELECT doc_id, text FROM documents),
         |batch AS (
         |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
         |  WHERE doc_id % 5 = 0
         |  UNION ALL
         |  SELECT doc_id + 2000000, text || ' qq zz' FROM documents
         |  WHERE doc_id % 7 = 0
         |  UNION ALL
         |  SELECT doc_id + 3000000, reverse(text) FROM documents
         |  WHERE doc_id % 9 = 0),
         |hh AS (SELECT md5(text) AS h, MIN(doc_id) AS hid
         |       FROM hist GROUP BY 1),
         |exact AS (
         |  SELECT b.doc_id, hh.hid FROM batch b
         |  JOIN hh ON md5(b.text) = hh.h),
         |rest AS (
         |  SELECT * FROM batch
         |  WHERE doc_id NOT IN (SELECT doc_id FROM exact)),
         |alld AS (SELECT doc_id, text FROM hist
         |         UNION ALL SELECT doc_id, text FROM rest),
         |sh AS (
         |  SELECT doc_id,
         |    list_distinct(CASE WHEN len(tokens) < 3
         |      THEN [array_to_string(tokens, ' ')]
         |      ELSE list_transform(range(0, len(tokens) - 2),
         |             i -> array_to_string(tokens[i+1:i+3], ' '))
         |    END) AS shingles
         |  FROM (SELECT doc_id,
         |          string_split(regexp_replace(lower(text), '\\s+', ' ',
         |                                      'g'), ' ') AS tokens
         |        FROM alld)),
         |ph AS (
         |  SELECT doc_id,
         |    list_transform(shingles, s ->
         |      CASE WHEN length(s) = 0 THEN 0 ELSE list_reduce(
         |        list_transform(range(1, length(s) + 1),
         |                       i -> CAST(unicode(s[i]) AS BIGINT)),
         |        (a, c) -> (a * 131 + c) % 2147483647) END) AS ps
         |  FROM sh),
         |mh AS (
         |  SELECT doc_id,
         |    $tabMhExpr AS mh
         |  FROM ph),
         |bands AS (
         |  SELECT doc_id, bd,
         |    mh[bd * ${graft.operators.Dedup.RowsPerBand} + 1 :
         |       bd * ${graft.operators.Dedup.RowsPerBand} +
         |       ${graft.operators.Dedup.RowsPerBand}] AS sig
         |  FROM mh, range(0, ${graft.operators.Dedup.Bands}) r(bd)),
         |hbuck AS (
         |  SELECT bd, sig, list(doc_id ORDER BY doc_id) AS ids
         |  FROM bands WHERE doc_id < 1000000 GROUP BY bd, sig
         |  HAVING COUNT(*) <= ${graft.operators.Dedup.MaxBucket}),
         |cand AS (
         |  SELECT DISTINCT b.doc_id AS bid, unnest(k.ids) AS hid
         |  FROM bands b JOIN hbuck k ON b.bd = k.bd AND b.sig = k.sig
         |  WHERE b.doc_id >= 1000000),
         |near AS (
         |  SELECT c.bid AS doc_id, MIN(c.hid) AS hid
         |  FROM cand c
         |  JOIN sh sb ON sb.doc_id = c.bid
         |  JOIN sh sh2 ON sh2.doc_id = c.hid
         |  WHERE CAST(len(list_intersect(sb.shingles, sh2.shingles))
         |          AS DOUBLE) /
         |        len(list_distinct(list_concat(sb.shingles, sh2.shingles)))
         |        >= 0.5
         |  GROUP BY 1)
         |SELECT doc_id, 'exact_dup' AS status, hid AS matched_id FROM exact
         |UNION ALL SELECT doc_id, 'near_dup', hid FROM near
         |UNION ALL
         |SELECT doc_id, 'new', CAST(NULL AS BIGINT) FROM rest
         |WHERE doc_id NOT IN (SELECT doc_id FROM near)
         |ORDER BY doc_id""".stripMargin,
    // bloom prefilter dedup: the bloom sketch is pure pruning — the final
    // classification is decided by the exact md5 confirm join, so the
    // oracle is the plain hash-join statement of the same classification
    "q_bloom_dedup" ->
      """WITH hh AS (SELECT md5(text) AS h, MIN(doc_id) AS hid
        |            FROM documents GROUP BY 1),
        |batch AS (
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
        |  WHERE doc_id % 4 = 0
        |  UNION ALL
        |  SELECT doc_id + 3000000, reverse(text) FROM documents
        |  WHERE doc_id % 6 = 0)
        |SELECT b.doc_id,
        |  CASE WHEN hh.hid IS NULL THEN 'new' ELSE 'exact_dup' END
        |    AS status,
        |  hh.hid AS matched_id
        |FROM batch b LEFT JOIN hh ON md5(b.text) = hh.h
        |ORDER BY b.doc_id""".stripMargin,
    // per-source merged signatures: the oracle replays the per-document
    // signature pipeline (same math as minhashPrefix, over the raw
    // documents table with source carried), folds each source's
    // element-wise slot minima — the explode/groupBy statement of what
    // the native mergeable minhash_agg computes in one pass — then the
    // slot-agreement estimate. Integer slots, one exact double division.
    "q_source_sim" ->
      s"""WITH sh AS (
         |  SELECT doc_id, source,
         |    list_distinct(CASE WHEN len(tokens) < 3
         |      THEN [array_to_string(tokens, ' ')]
         |      ELSE list_transform(range(0, len(tokens) - 2),
         |             i -> array_to_string(tokens[i+1:i+3], ' '))
         |    END) AS shingles
         |  FROM (SELECT doc_id, source,
         |          string_split(regexp_replace(lower(text), '\\s+', ' ',
         |                                      'g'), ' ') AS tokens
         |        FROM documents)),
         |ph AS (
         |  SELECT doc_id, source,
         |    list_transform(shingles, s ->
         |      CASE WHEN length(s) = 0 THEN 0 ELSE list_reduce(
         |        list_transform(range(1, length(s) + 1),
         |                       i -> CAST(unicode(s[i]) AS BIGINT)),
         |        (a, c) -> (a * 131 + c) % 2147483647) END) AS ps
         |  FROM sh),
         |mh AS (
         |  SELECT doc_id, source,
         |    $tabMhExpr AS mh
         |  FROM ph),
         |slots AS (
         |  SELECT source, j, MIN(mh[j + 1]) AS v
         |  FROM mh, range(0, ${graft.operators.Dedup.NumHashes}) r(j)
         |  GROUP BY 1, 2),
         |sig AS (
         |  SELECT source, list(v ORDER BY j) AS sig FROM slots GROUP BY 1)
         |SELECT a.source AS src_a, b.source AS src_b,
         |  ROUND(CAST(len(list_filter(
         |      range(0, ${graft.operators.Dedup.NumHashes}),
         |      i -> a.sig[i + 1] = b.sig[i + 1])) AS DOUBLE)
         |    / ${graft.operators.Dedup.NumHashes}, 4) AS est_jaccard
         |FROM sig a JOIN sig b ON a.source < b.source
         |ORDER BY 1, 2""".stripMargin,
    // exact replay of the SimHash operator — polynomial token hashes, 64
    // bit-votes, 16-bit chunk banding, Hamming filter — in pure SQL. The
    // pair set mirrors the banding semantics (pairs sharing >= 1 chunk).
    "q_simhash_neardup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, text || ' qq zz' FROM documents
        |  WHERE doc_id % 7 = 0),
        |tok AS (
        |  SELECT doc_id,
        |    unnest(string_split(regexp_replace(lower(text), '\s+', ' ', 'g'),
        |           ' ')) AS t
        |  FROM corpus),
        |th AS (
        |  -- length() (characters), not strlen() (bytes): the Spark kernel
        |  -- rolls CODE POINTS and t[i] indexes characters — byte length
        |  -- would hash garbage positions on non-ASCII text (same fix as
        |  -- the q_fingerprint / q_minhash_neardup oracles)
        |  SELECT doc_id,
        |    CASE WHEN length(t) = 0 THEN 0 ELSE list_reduce(
        |      list_transform(range(1, length(t) + 1),
        |                     i -> CAST(unicode(t[i]) AS BIGINT)),
        |      (a, c) -> (a * 131 + c) % 2147483647) END AS h1,
        |    CASE WHEN length(t) = 0 THEN 0 ELSE list_reduce(
        |      list_transform(range(1, length(t) + 1),
        |                     i -> CAST(unicode(t[i]) AS BIGINT)),
        |      (a, c) -> (a * 137 + c) % 2147483629) END AS h2
        |  FROM tok),
        |bits AS (
        |  SELECT doc_id, b,
        |    SUM(CASE WHEN ((CASE WHEN b < 32 THEN h1 >> CAST(b AS INTEGER)
        |                    ELSE h2 >> CAST(b - 32 AS INTEGER) END) & 1) = 1
        |        THEN 1 ELSE -1 END) AS v
        |  FROM th, range(0, 64) r(b) GROUP BY 1, 2),
        |sim AS (
        |  SELECT doc_id,
        |    SUM(CASE WHEN v >= 0 THEN 1::BIGINT << CAST(b AS INTEGER)
        |        ELSE 0 END) AS simhash
        |  FROM bits GROUP BY 1),
        |chunks AS (
        |  SELECT doc_id, simhash, c,
        |    (simhash >> CAST(c * 16 AS INTEGER)) & 65535 AS key
        |  FROM sim, range(0, 4) r(c)),
        |bucketed AS (
        |  SELECT c, key FROM chunks GROUP BY c, key
        |  HAVING COUNT(*) BETWEEN 2 AND 100)
        |SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
        |  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
        |FROM chunks x
        |JOIN bucketed bk ON x.c = bk.c AND x.key = bk.key
        |JOIN chunks y
        |  ON x.c = y.c AND x.key = y.key AND x.doc_id < y.doc_id
        |WHERE bit_count(xor(x.simhash, y.simhash)) <= 10
        |ORDER BY a, b""".stripMargin,
    // embedding drift: same cohorts, floor-micros quantization, shapes
    "q_embed_drift" -> Similarity.embedDriftOracleSql,
    // exhaustive quadratic ground truth over the planted near-dup corpus;
    // the Spark side generates candidates via banded SRP-LSH only. cos is
    // the same left-to-right double accumulation on both sides (vec_dot /
    // list_dot_product), so the rounded values match bit-for-bit.
    "q_embed_neardup" ->
      s"""WITH $embedNdPrefix
         |SELECT a, b, cos FROM nd_pairs ORDER BY a, b""".stripMargin,
    // embedding survivor selection: transitive closure of the SAME
    // exhaustive ground-truth pair set via a recursive CTE — equal
    // results prove the banded candidates + pointer-jumping fixpoint
    // found the true components (mirror of q_dedup_survivors).
    "q_embed_survivors" ->
      s"""WITH RECURSIVE $embedNdPrefix,
         |edges AS (
         |  SELECT a, b FROM nd_pairs UNION ALL SELECT b, a FROM nd_pairs),
         |reach(node, label) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.node),
         |comp AS (SELECT node, MIN(label) AS label FROM reach GROUP BY node)
         |SELECT label AS survivor_id, COUNT(*) AS n_members,
         |  MAX(node) AS max_member
         |FROM comp GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS sum_k,
        |  MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
