package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{abs, col, countDistinct, lit, when}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is one operator from SURVEY.md §2 (or a §7
  * scale extension); entries with SQL-expressible semantics carry a
  * DuckDB oracle in `oracleSql` (same column names/aliases on both
  * sides — the driver's compare sorts columns by name before hashing).
  */
object SparkEntry {
  import graft.analytics.{Relational => R, EventOps => E}
  import graft.text.{TextOps => T}
  import graft.dedup.{DedupOps => D}
  import graft.vector.{VectorOps => V}
  import graft.graph.{GraphOps => G}

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    R.revenueByNation(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_global_stats"      -> (R.globalStats _),
    "q02_revenue_by_flag"   -> (R.revenueByFlag _),
    "q03_quality_gate"      -> (R.qualityGate _),
    "q04_conditional_agg"   -> (R.conditionalAgg _),
    "q05_csv_parse"         -> (R.csvParse _),
    "q06_dedup_first_wins"  -> (R.dedupFirstWins _),
    "q07_revenue_by_nation" -> (R.revenueByNation _),
    "q08_topk_per_group"    -> (R.topOrdersPerPriority _),
    "q09_running_window"    -> (R.runningCustomerSpend _),
    "q10_setops"            -> (R.customerSetOps _),
    "q11_rollup"            -> (R.rollupByFlagStatus _),
    "q12_json_extract"      -> (E.jsonExtract _),
    "q13_tumbling_window"   -> (E.tumblingCounts _),
    "q14_sessionize"        -> (E.sessionize _),
    "q15_token_stats"       -> (T.tokenStats _),
    "q16_lang_id"           -> (T.langId _),
    "q17_quality_score"     -> (T.qualityScore _),
    "q18_fingerprint"       -> (T.fingerprint _),
    "q19_exact_dedup"       -> (D.exactDedup _),
    "q20_ngram_jaccard"     -> (D.ngramJaccard _),
    "q21_minhash_lsh"       -> (D.minhashLsh _),
    "q22_simhash"           -> (D.simhash _),
    "q23_embed_neardup"     -> (V.nearDupPairs _),
    "q24_knn_brute"         -> (V.knnBrute _),
    "q25_ann_lsh"           -> (V.annLsh _),
    // Structured Streaming twin of q13: drains the events directory with
    // Trigger.AvailableNow and must produce the same windows as the
    // batch query (same oracle).
    "q26_stream_tumbling"   -> ((s: org.apache.spark.sql.SparkSession, dir: String) =>
      graft.streaming.EventsStream.runAvailableNow(
        s, graft.streaming.EventsStream.tumblingCounts(
          graft.streaming.EventsStream.source(s, dir)), "q26_stream_tumbling")),
    "q27_subquery"          -> (R.aboveAvgOrders _),
    "q28_asof_join"         -> (E.asofJoin _),
    "q29_topk_custom"       -> (R.topOrdersPerPriorityCustom _),
    "q30_salted_join"       -> (R.saltedJoinAgg _),
    "q31_label_centroids"   -> (V.labelCentroids _),
    "q32_top_terms"         -> (T.topTermsPerLang _),
    "q33_percentiles"       -> (R.pricePercentiles _),
    "q34_minhash_estimate"  -> (D.minhashEstimate _),
    "q35_ann_ivf"           -> (V.annIvf _),
    "q36_chunking"          -> (T.chunkDocs _),
    "q37_redact"            -> (T.redact _),
    "q38_stratified"        -> (T.stratifiedSample _),
    "q39_tfidf"             -> (T.tfidfTopTerms _),
    "q40_lead_lag"          -> (E.leadLagDeltas _),
    "q41_semi_anti"         -> (R.semiAntiCustomers _),
    "q42_cube"              -> (R.cubeByStatusPriority _),
    "q43_binary_meta"       -> ((s: SparkSession, dir: String) =>
      graft.multimodal.MultimodalOps.binaryMeta(s, dir)),
    // Sketch operators (HLL++ distinct, approx percentiles): the sketch
    // value itself is engine-specific, so the oracle checks the exact
    // twin plus an integer within-bound flag — hash-green iff the
    // sketch's error bound actually holds.
    "q44_approx_distinct"   -> (R.approxDistinct _),
    "q45_approx_percentile" -> (R.approxPercentiles _),
    // Streaming twin of q14's sessions through the NATIVE session_window
    // operator (watermarked state store) — oracle re-derives the same
    // sessions from the batch lag formulation.
    "q46_stream_session"    -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventsStream.runAvailableNow(
        s, graft.streaming.EventsStream.sessionize(
          graft.streaming.EventsStream.source(s, dir)), "q46_stream_session")),
    // Arbitrary stateful streaming (mapGroupsWithState, Update mode):
    // per-user running stats; the update-mode sink keeps one row per
    // user per micro-batch, so the read keeps only each user's final
    // state — correct for any number of files/micro-batches.
    "q47_stream_userstats"  -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventsStream.latestUserStats(
        graft.streaming.EventsStream.runAvailableNow(
          s, graft.streaming.EventsStream.userStats(
            graft.streaming.EventsStream.source(s, dir)), "q47_stream_userstats",
          outputMode = "update"))),
    "q48_pivot"             -> (R.pivotQtyByStatus _),
    "q49_array_funcs"       -> (T.arrayFuncs _),
    "q50_rank_suite"        -> (R.rankSuite _),
    "q51_string_funcs"      -> (R.stringFuncs _),
    "q52_date_funcs"        -> (R.dateFuncs _),
    "q53_grouping_sets"     -> (R.groupingSetsTotals _),
    "q54_map_funcs"         -> (E.mapFuncs _),
    "q55_setops_all"        -> (R.setOpsAll _),
    "q56_range_window"      -> (R.rangeWindowBand _),
    "q57_unpivot"           -> (R.unpivotMetrics _),
    "q58_regexp_extract"    -> (R.regexExtract _),
    "q59_null_funcs"        -> (R.nullFuncs _),
    "q60_interval_join"     -> (E.intervalJoin _),
    // Stream-stream interval join (two watermarked file streams over
    // the same events directory) — same oracle as the batch q60.
    "q61_stream_interval"   -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventsStream.runAvailableNow(
        s, graft.streaming.EventsStream.intervalJoin(
          graft.streaming.EventsStream.source(s, dir),
          graft.streaming.EventsStream.source(s, dir)), "q61_stream_interval",
        outputMode = "append")),
    "q62_outer_join"        -> (R.outerJoinOrders _),
    "q63_select_subquery"   -> (R.selectScalarSubquery _),
    "q64_value_windows"     -> (R.valueWindows _),
    "q65_collect_aggs"      -> (R.collectAggs _),
    "q66_predicate_aggs"    -> (R.predicateAggs _),
    "q67_stats_aggs"        -> (R.statsAggs _),
    "q68_minhash_group_sig" -> (D.minhashGroupSig _),
    "q69_binary_files"      -> ((s: SparkSession, dir: String) =>
      graft.multimodal.MultimodalOps.binaryFiles(s, dir)),
    "q70_minhash_agg_native" -> (D.minhashGroupSigNative _),
    "q71_knn_int8"          -> (V.knnInt8 _),
    "q72_dedup_clusters"    -> (D.dedupClusters _),
    "q73_simhash_neardup"   -> (D.simhashNearDup _),
    // Streaming stateful dedup (ingest-side drop-seen-keys): only the
    // key set is emitted, so the intra-batch row race can't leak into
    // the compare; oracle = batch DISTINCT over the same keys.
    "q74_stream_dedup"      -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventsStream.runAvailableNow(
        s, graft.streaming.EventsStream.dedupKeys(
          graft.streaming.EventsStream.source(s, dir)), "q74_stream_dedup",
        outputMode = "append")),
    "q75_contamination"     -> (D.contamination _),
    "q76_seq_packing"       -> (T.seqPacking _),
    "q77_mixture_audit"     -> (T.mixtureAudit _),
    "q78_repetition"        -> (T.repetitionScore _),
    "q79_knn_pq"            -> (V.knnPq _),
    "q80_kmeans"            -> (V.kmeansFit _),
    "q81_ivf_trained"       -> (V.annIvfTrained _),
    "q82_frame_sample"      -> ((s: SparkSession, dir: String) =>
      graft.multimodal.MultimodalOps.frameSamples(s, dir)),
    "q83_random_projection" -> (V.randomProjection _),
    "q84_knn_rp"            -> (V.knnRp _),
    "q85_stream_chunks"     -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventsStream.runAvailableNow(
        s, graft.streaming.EventsStream.chunkEvents(
          graft.streaming.EventsStream.source(s, dir)), "q85_stream_chunks",
        outputMode = "append")),
    "q86_upsert"            -> (R.upsertCustomers _),
    "q87_scd2"              -> (E.scd2History _),
    "q88_ingest_dedup"      -> (D.ingestDedup _),
    "q89_mixture_sample"    -> (T.mixtureSample _),
    "q90_sliding_window"    -> (E.slidingCounts _),
    "q91_stream_sliding"    -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventsStream.runAvailableNow(
        s, graft.streaming.EventsStream.slidingCounts(
          graft.streaming.EventsStream.source(s, dir)), "q91_stream_sliding")),
    "q92_resize_plan"       -> ((s: SparkSession, dir: String) =>
      graft.multimodal.MultimodalOps.resizePlans(s, dir)),
    // Production streaming dedup: dropDuplicatesWithinWatermark (state
    // bounded by the dedup window); delay covers the testdata span, so
    // the bounded drain is exact DISTINCT and the batch oracle applies.
    "q93_stream_dedup_wm"   -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventsStream.runAvailableNow(
        s, graft.streaming.EventsStream.dedupKeysWithinWatermark(
          graft.streaming.EventsStream.source(s, dir)), "q93_stream_dedup_wm",
        outputMode = "append")),
    "q94_decontaminate"     -> (D.decontaminate _),
    "q95_jsonl_roundtrip"   -> (graft.sources.FormatRoundtrip.jsonlRoundtrip _),
    "q96_orc_roundtrip"     -> (graft.sources.FormatRoundtrip.orcRoundtrip _),
    "q97_hash_split"        -> (T.hashSplit _),
    "q98_consensus_neardup" -> (D.consensusNearDup _),
    // Bucketed-storage join: executes with AQE+broadcast pinned off and
    // REQUIREs a zero-Exchange plan — the co-located join path is
    // value-verified AND self-asserting.
    "q99_bucketed_join"     -> (graft.sources.Bucketing.bucketedJoin _),
    "q100_foreachbatch_sink" -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventsStream.foreachBatchSink(s, dir)),
    // Stream-static join: per-batch dimension enrich (no state store),
    // static side broadcast — the third streaming join form beside
    // stream-stream (q61) and the batch twins.
    "q101_stream_static"    -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventsStream.runAvailableNow(
        s, graft.streaming.EventsStream.streamStaticNationRollup(
          graft.streaming.EventsStream.source(s, dir),
          graft.tables.Tables.customer(s, dir)), "q101_stream_static")),
    "q102_cogroup"          -> (E.cogroupReconcile _),
    "q103_csv_roundtrip"    -> (graft.sources.FormatRoundtrip.csvRoundtrip _),
    // The graft_* SQL function registry surface, driven from SQL text
    // (registerInto installs the codegen'd expressions into the
    // harness-owned session).
    "q104_sql_functions"    -> (T.sqlSurface _),
    "q105_dedup_keep_best"  -> (D.dedupKeepBest _),
    // The "no silent caps" ledger: per-band bucket stats in rep space
    // for both banded near-dup families — the aggregate a production
    // run reads before the pair join to size the job.
    "q106_band_bucket_ledger" -> (D.bandBucketLedger _),
    // Substring-level dedup ledger: cross-doc repeated W-token spans
    // inside otherwise-distinct docs (posting-list election, no pairs).
    "q107_substring_dedup"  -> (D.substringDedup _),
    // SemDeDup: k-means clusters bound the cosine pair space; keep-first
    // election within each similarity neighborhood.
    "q108_semdedup"         -> (V.semDedup _),
    // Per-language dedup funnel: every doc attributed to the first stage
    // that would drop it (exact -> near cluster -> substring majority),
    // plus surviving docs/tokens for the mixture audit.
    "q109_dedup_funnel"     -> (D.dedupFunnel _),
    // Ordered conversion funnel (view -> click -> purchase), per-stage
    // user counts + basis-point rates; three same-key aggregates.
    "q110_event_funnel"     -> (E.eventFunnel _),
    // Dense hourly grid with explicit zero rows for silent hours;
    // spine generated with sequence/explode, zero-fill joins the
    // aggregated side only.
    "q111_gapfill_hourly"   -> (E.gapfillHourly _),
    // Cross-source contamination matrix: distinct shared W-token spans
    // per source pair + containment bp; postings shape, no doc pairs.
    "q112_source_overlap"   -> (D.sourceOverlap _),
    // Gopher-style quality rule bundle: per-rule integer inputs + 0/1
    // keep verdict; pure narrow map.
    "q113_quality_rules"    -> (T.qualityRules _),
    // Deterministic systematic PPS sample: token-mass grid selection,
    // all-integer (no RNG), reproducible run-over-run.
    "q114_pps_sample"       -> (T.ppsSample _),
    // Z-order (Morton) tile summary: 2-D clustering evidence in
    // relational form; physical row-group skipping in ZOrderPlanSpec.
    "q115_zorder_layout"    -> (graft.sources.ZOrder.zorderLayout _),
    // Frequent items via native Misra-Gries TypedImperativeAggregate:
    // exact heavy hitters + sketch-membership flag (q44/q45 convention).
    "q116_heavy_hitters"    -> (T.heavyHitters _),
    // Hourly active users: exact windowed DISTINCT aggregate.
    "q117_window_distinct"  -> (E.windowDistinctUsers _),
    // Retention triangle: first-seen cohorts x day offset.
    "q118_cohort_retention" -> (E.cohortRetention _),
    // Event-type transition matrix: per-user consecutive pairs -> global
    // Markov counts + bp shares.
    "q119_event_transitions" -> (E.eventTransitions _),
    // Market-basket co-purchase pairs: per-order C(size,2) fanout,
    // support-thresholded rollup.
    "q120_copurchase"       -> (R.copurchasePairs _),
    // dbt-style constraint audit: FK anti-joins + domain checks with
    // violation counts and pass flags.
    "q121_constraint_audit" -> (R.constraintAudit _),
    // Multi-source BFS hop labeling over the co-purchase graph:
    // K statically-unrolled frontier joins, min-combined.
    "q122_graph_bfs"        -> (G.graphBfs _),
    // Degree-oriented triangle census + global clustering coefficient.
    "q123_triangle_stats"   -> (G.triangleStats _),
    // Integer-mass PageRank: K unrolled share/sum rounds, bit-exact.
    "q124_pagerank"         -> (G.pageRank _),
    // "Customers also bought": per-part top-5 co-purchase recos via the
    // custom GroupedTopK bounded-heap operator.
    "q125_copurchase_topk"  -> (R.copurchaseTopK _),
    // Real-codec decode gate: PPM/WAV round trip with decoded-unit
    // checksums the oracle re-derives in closed form.
    "q126_decode_stats"     -> ((s: SparkSession, dir: String) =>
      graft.multimodal.MultimodalOps.decodeStats(s, dir)),
    // q122's BFS run to CONVERGENCE: driver-gated frontier loop with
    // per-round lineage truncation, exact at any diameter.
    "q127_bfs_converged"    -> (G.graphBfsConverged _),
    // DOULION edge-sampled triangle estimate: deterministic hash
    // sampling, 1/p^3 scale-up, oracle hash-matches the estimate.
    "q128_triangle_est"     -> (G.triangleEstimate _),
    // q110's conversion funnel on a live stream: per-user
    // mapGroupsWithState machine, update-mode sink, batch rollup —
    // same oracle as the batch funnel.
    "q129_stream_funnel"    -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventsStream.funnelRollup(
        graft.streaming.EventsStream.runAvailableNow(
          s, graft.streaming.EventsStream.funnelStages(
            graft.streaming.EventsStream.source(s, dir)), "q129_stream_funnel",
          outputMode = "update"))),
    // Gopher-style n-gram repetition rules: modal/duplicated gram mass
    // per doc via the GramFreqStats native expression — zero shuffle.
    "q130_repetition_rules" -> (T.repetitionRules _),
    // Perceptual (aHash) exact-dup grouping over REAL decoded pixels:
    // linear collapsed form, one fixed-width hash-keyed shuffle.
    "q131_phash_groups"     -> ((s: SparkSession, dir: String) =>
      graft.multimodal.MultimodalOps.phashGroups(s, dir)),
    // Perceptual NEAR-dup pairs over DISTINCT hashes: 8-band blocking,
    // pigeonhole-exact at hamming<=7, bit_count(xor) verify.
    "q132_phash_neardup"    -> ((s: SparkSession, dir: String) =>
      graft.multimodal.MultimodalOps.phashNeardup(s, dir)),
    // Unigram-LM-style commonality scoring: corpus token counts joined
    // back per doc, all-integer (sum/min freq + rare-token bp).
    "q133_token_commonality" -> (T.tokenCommonality _),
    // q72's cluster map via alternating large-star/small-star: O(log n)
    // rounds instead of O(diameter); same output, same oracle.
    "q134_cc_star"          -> (D.dedupClustersStar _),
    // VAD-style audio energy segmentation over real decoded PCM:
    // zero-shuffle narrow emit, gaps-and-islands oracle twin.
    "q135_audio_segments"   -> ((s: SparkSession, dir: String) =>
      graft.multimodal.MultimodalOps.audioSegments(s, dir)),
    // Matryoshka prefix-dim kNN: free-slice truncated shortlist,
    // exact full-dim re-rank — q84's shape without a projection.
    "q136_knn_matryoshka"   -> (V.knnMatryoshka _),
    // Last-touch purchase attribution: strictly-preceding range-frame
    // window, 30-min lookback, per-channel revenue rollup.
    "q137_attribution"      -> (E.purchaseAttribution _),
    // Per-language lower-median quality routing: exact integer
    // quantile threshold per stratum, keep/drop verdicts.
    "q138_quality_route"    -> (T.qualityQuantileRoute _),
    // Incremental perceptual ingest gate: batch images probe the
    // corpus phash index, (hamming, rep)-elected verdicts.
    "q139_phash_ingest"     -> ((s: SparkSession, dir: String) =>
      graft.multimodal.MultimodalOps.phashIngestGate(s, dir)),
    // Multimodal training-sample manifest: dedup canonicality +
    // quality routing + decoded asset features, composed verbatim.
    "q140_manifest"         -> ((s: SparkSession, dir: String) =>
      graft.multimodal.MultimodalOps.trainingManifest(s, dir)),
    // q137's attribution on a live stream: per-user mapGroupsWithState
    // replay in event-time order, update-mode sink, channel rollup.
    "q141_stream_attrib"    -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventsStream.attributionRollup(
        graft.streaming.EventsStream.runAvailableNow(
          s, graft.streaming.EventsStream.attributionStages(
            graft.streaming.EventsStream.source(s, dir)), "q141_stream_attrib",
          outputMode = "update"))),
    // Compressed-container decode gate: our PNG encoder (real deflate)
    // round-tripped through the JDK's independent ImageIO reader;
    // checksum + aHash over the decoded pixels, oracled in closed form.
    "q142_png_decode"       -> ((s: SparkSession, dir: String) =>
      graft.multimodal.MultimodalOps.pngDecodeStats(s, dir)),
    // HTML/boilerplate extraction (C4/WET first stage): deterministic
    // page wrap -> head/script/style/comment/tag strip + entity decode;
    // oracle asserts the round trip lands exactly on the source text.
    "q143_html_extract"     -> (T.htmlExtractStats _),
    // Learned BPE: distributed merge-table training (1-row argmax per
    // round) + native codegen'd application; the oracle re-learns the
    // merges relationally and re-applies them via a vocab join.
    "q144_bpe_tokens"       -> (graft.text.BpeOps.bpeTokenStats _),
    // Asymmetric containment dedup (prefix-filtered set-similarity
    // join): catches quote-inclusion/boilerplate-expansion pairs whose
    // symmetric Jaccard — and therefore the whole MinHash family — sits
    // below threshold; oracle is the brute-force inverted-index form.
    "q145_containment"      -> (D.containmentDedup _),
    // Trained quality classifier: distributed full-batch GD in integer
    // micro-units with an algebraic-sigmoid link, engineered to be
    // cross-engine bit-exact; the oracle re-runs the whole training
    // relationally (q144's unrolled-CTE convention) and must land on
    // identical weights (w_fp pins it per row).
    "q146_quality_classifier" -> ((s: SparkSession, dir: String) =>
      graft.text.QualityClassifier.classify(s, dir)),
    // Char-bigram LM fluency scoring (the CCNet perplexity-filter
    // shape, log-free): all-integer mean transition likelihood +
    // head/middle/tail routing; model is a broadcast-sized count table.
    "q147_lm_fluency"       -> ((s: SparkSession, dir: String) =>
      graft.text.LmFluency.lmFluency(s, dir)),
    // Audio resample ladder: real RIFF decode + integer box-mean
    // decimation to canonical rates, per-asset-local (zero shuffle);
    // sample-level oracle re-derived from generator arithmetic.
    "q148_audio_resample"   -> ((s: SparkSession, dir: String) =>
      graft.multimodal.MultimodalOps.audioResample(s, dir)),
    // Trained multiclass lang-id (fastText shape): five one-vs-rest
    // linear classifiers over marker-count features, bit-exact integer
    // GD (q146 apparatus); beats the q16 marker heuristic on held-out
    // docs; the oracle re-trains relationally to identical weights.
    "q149_lang_id_trained"  -> ((s: SparkSession, dir: String) =>
      graft.text.LangIdTrained.langIdTrained(s, dir)),
    // Lossy JPEG decode gate with dead-letter routing: real ImageIO
    // encode/decode + our independent T.81 frame-header walker; oracle
    // pins the deterministic surface, fidelity is gated in-query.
    "q150_jpeg_decode"      -> ((s: SparkSession, dir: String) =>
      graft.multimodal.MultimodalOps.jpegDecodeStats(s, dir)),
    // Unicode NFC normalization: codegen'd canonical composition
    // (JDK Normalizer) vs DuckDB's independent nfc_normalize; the
    // fingerprint-safe pre-pass the exact-dedup family needs on a
    // real web corpus (composed/decomposed twins collapse).
    "q151_nfc_normalize"    -> ((s: SparkSession, dir: String) =>
      graft.text.UnicodeOps.nfcNormalize(s, dir)),
    // Canonical-URL dedup: real codegen'd canonicalizer (scheme/host
    // case, default ports, fragments, tracking params, trailing
    // slash); oracle derives the canonical arithmetically; classes
    // group on the 64-bit canonical fingerprint, never the string.
    "q152_url_canon"        -> ((s: SparkSession, dir: String) =>
      graft.text.UrlOps.urlCanonDedup(s, dir)),
    // Content-defined chunking: rolling-hash boundaries localize
    // shared runs at sub-document granularity (storage-dedup shape);
    // oracle recomputes boundaries from explicit window substrings.
    "q153_cdc_chunks"       -> ((s: SparkSession, dir: String) =>
      graft.dedup.CdcOps.cdcChunkDedup(s, dir)),
    // Mojibake repair: strict latin1->utf8 re-decode with
    // conservative firing; clean accented text must pass untouched.
    "q154_mojibake"         -> ((s: SparkSession, dir: String) =>
      graft.text.UnicodeOps.mojibakeRepair(s, dir)),
    // Histogram-exact per-lang quantiles + GK sketch bound check:
    // the scale path for q138's designed-sort median.
    "q155_quantile_sketch"  -> (T.qualityQuantileSketch _),
    // Reaggregatable HLL partials: daily sketch table -> merged
    // per-type estimates without re-reading raw; bound-checked.
    "q156_hll_rollup"       -> (E.hllRollup _),
    // Robust per-lang outlier audit: median/MAD over the value
    // histogram (50% breakdown point vs mean/stddev's 0%).
    "q161_mad_outliers"     -> (T.madOutliers _),
    // Per-nation revenue trend: closed-form all-integer OLS from one
    // sufficient-statistics aggregate over the month rollup.
    "q162_group_trend"      -> (R.groupTrend _),
    // Cross-source overlap from mergeable bottom-k (KMV) sketches:
    // O(k) per-source summaries replace the fp-keyed exact join;
    // exact branch emitted beside the estimate to pin the error.
    "q163_kmv_overlap"      -> ((s: SparkSession, dir: String) =>
      graft.dedup.KmvSketch.kmvOverlap(s, dir)),
    // Multi-touch linear attribution: exact credit conservation,
    // time-to-conversion curve, unattributed ledger row.
    "q195_linear_attribution" -> (E.linearAttribution _),
    // k-core decomposition: driver-gated peel loop, per-round ONE
    // degree aggregate + two id-keyed semi-joins, edge set shrinks
    // monotonically; oracle unrolls the cascade.
    "q196_kcore"            -> (G.kCore _),
    // Snapshot drift gate: exact integer-ppm total-variation distance
    // per stream, single fused histogram pass vs the oracle's
    // two-pass FULL OUTER form.
    "q197_drift_monitor"    -> ((s: SparkSession, dir: String) =>
      graft.analytics.DriftOps.driftMonitor(s, dir)),
    // l-diversity audit: two-level re-aggregation vs the oracle's
    // per-class COUNT(DISTINCT); k-ok-but-l-bad ledger column.
    "q198_l_diversity"      -> ((s: SparkSession, dir: String) =>
      graft.analytics.PrivacyOps.lDiversityAudit(s, dir)),
    // t-closeness audit: ppm-quantized ordinal EMD between each QI
    // class's sensitive CDF and the global CDF on a dense band grid.
    "q199_t_closeness"      -> ((s: SparkSession, dir: String) =>
      graft.analytics.PrivacyOps.tClosenessAudit(s, dir)),
    // Padding-waste batching audit: arrival-order vs length-bucketed
    // loader strategies priced on the same corpus, waste in ppm.
    "q200_padding_waste"    -> (T.paddingWaste _),
    // TextRank keywords: weighted integer-mass PageRank over the
    // token co-occurrence graph, K unrolled rounds, bit-exact.
    "q201_textrank"         -> ((s: SparkSession, dir: String) =>
      graft.text.TextRank.textRank(s, dir)),
    // DP histogram release: two-sided geometric noise from an exact
    // dyadic inverse-CDF ladder, seeded per cell — ε = ln 2.
    "q202_dp_histogram"     -> ((s: SparkSession, dir: String) =>
      graft.analytics.DpRelease.dpHistogram(s, dir)),
    // q197 as a live ingest gate: streamed current-window histogram
    // (bounded band state) + static reference; ledger ≡ batch form.
    "q203_stream_drift"     -> ((s: SparkSession, dir: String) =>
      graft.analytics.DriftOps.driftStream(s, dir)),
    // Isotonic (PAVA) calibration of the quality score per source:
    // exact scaled-floor means, oracle is the minimax closed form.
    "q204_isotonic"         -> ((s: SparkSession, dir: String) =>
      graft.text.IsotonicOps.isotonicCalibration(s, dir)),
    // Greedy k-center coreset selection: K farthest-point rounds,
    // integer-exact quantized distances, per-round coverage radius.
    "q205_kcenter"          -> ((s: SparkSession, dir: String) =>
      graft.vector.CoresetOps.kCenter(s, dir)),
    // First-order Markov next-event predictor: trained on the first
    // 80% of the time span, scored on the held-out 20%, exact ppm.
    "q206_markov_eval"      -> (E.markovEval _),
    // Label-propagation communities: K synchronous majority-vote
    // rounds (tie -> min label), deterministic, bit-exact vs the
    // unrolled-CTE oracle; the density complement to q134's CC.
    "q208_label_prop"       -> (G.labelProp _),
    // BM25-shaped lexical retrieval: integer-exact Okapi saturation +
    // monotone rational idf, per-query top-10 through GroupedTopK.
    "q209_bm25"             -> ((s: SparkSession, dir: String) =>
      graft.text.SearchOps.bm25Retrieval(s, dir)),
    // chi-square discriminative terms per source: exact 2x2 presence
    // contingency through DECIMAL(38,0), top-5 vocabulary drift ledger.
    "q210_chi2_terms"       -> (T.chi2Terms _),
    // Power-iteration dominant eigendirection of the embedding
    // second-moment matrix: one 256-cell Gram pass + 6 exact integer
    // renormalized rounds; Rayleigh quotient emitted beside.
    "q211_power_iteration"  -> (V.powerIteration _),
    // Count-Min sketch over shingles: mergeable native counter agg,
    // point estimates bit-exact vs a full relational counter rebuild.
    "q212_countmin"         -> (T.countMinShingles _),
    // GSP-style gapped sequential triples with distinct-user support:
    // one window pass + bounded expansion, never a timeline self-join.
    "q213_seq_patterns"     -> (E.seqPatterns _),
    // Seasonal-naive forecast-error ledger (MASE baseline): dense grid
    // + one type-keyed window pass for both lags, exact integer ppm.
    "q217_seasonal_naive"   -> (E.seasonalNaiveError _),
    // Pareto-front (skyline) data selection on (quality, length):
    // bucket prune + exact range-window sweep vs the quadratic oracle.
    "q219_skyline"          -> (T.skylineDocs _),
    // Term-proximity rerank of the BM25 page: minimal cover span via
    // the running-max sweep, one (query, doc)-keyed window pass.
    "q220_term_proximity"   -> ((s: SparkSession, dir: String) =>
      graft.text.SearchOps.termProximity(s, dir)),
    // Snapshot diff through the manifest: O(1) root verdict per source
    // + the leaf-level edited/removed explanation ledger.
    "q221_manifest_diff"    -> ((s: SparkSession, dir: String) =>
      graft.text.MerkleOps.manifestDiff(s, dir)),
    // Reliability diagram + ECE for the q146 classifier: exact integer
    // algebraic-sigmoid probabilities, decile bins, weighted gap.
    "q222_reliability"      -> ((s: SparkSession, dir: String) =>
      graft.text.QualityClassifier.reliabilityDiagram(s, dir)),
    // Theil-Sen robust trend: exact median of calendar-bounded pairwise
    // slopes beside the OLS fit, sign-agreement flag.
    "q223_theil_sen"        -> (R.theilSenTrend _),
    // HITS hubs/authorities on the directed customer->part graph:
    // exact-integer mutual-reinforcement rounds, max-renormalized.
    "q224_hits"             -> (G.hits _),
    // Split-conformal admission gate on the learned quality score:
    // distribution-free coverage knob, exact order-stat threshold.
    "q225_conformal"        -> ((s: SparkSession, dir: String) =>
      graft.text.QualityClassifier.conformalGate(s, dir)),
    // Tabular CUSUM level-shift detection on the dense hourly grid:
    // exact prefix-sum/running-min identity, cross-multiplied mean.
    "q226_cusum"            -> (E.cusumChangepoint _),
    // Kendall-tau order concordance of the RP sketch vs exact cosine:
    // C(10,2) pairs per probe, exact integer tau in ppm.
    "q227_kendall_tau"      -> (V.kendallTau _),
    // Rendezvous (HRW) vs mod-hash resharding audit: per-shard
    // placement + moved-key ledger at k=8 -> 9, one narrow map.
    "q228_hrw_shards"       -> ((s: SparkSession, dir: String) =>
      graft.sources.ShardOps.shardRebalance(s, dir)),
    // Link prediction on the co-purchase graph: common-neighbor,
    // Jaccard, and resource-allocation scores for distance-2 pairs.
    "q229_link_prediction"  -> (G.linkPrediction _),
    // Multiclass eval of the heuristic lang-id: per-class P/R/F1 +
    // accuracy, macro-F1, and Cohen's kappa, all exact integers.
    "q230_langid_eval"      -> (T.langIdEval _),
    // q226 live: hourly-count cells as bounded streaming state, the
    // drained grid swept by the shared CUSUM identity.
    "q231_stream_cusum"     -> (E.cusumStream _),
    // Rank-exact trimmed + winsorized means from the value histogram:
    // robust location beside q161's median/MAD.
    "q232_trimmed_mean"     -> (T.trimmedMean _),
    // Simpson/HHI mixture concentration per stratification axis,
    // effective strata count — exact ppm, no log.
    "q233_mixture_diversity" -> (T.mixtureDiversity _),
    // Jackknife leave-one-month-out OLS influence with exact
    // cross-multiplied slope deltas and sign-flip flags.
    "q234_trend_influence"  -> (R.trendInfluence _),
    // CART stump per source: exact integer Gini split selection on the
    // binned quality score, confusion ledger + training accuracy.
    "q235_gini_stump"       -> ((s: SparkSession, dir: String) =>
      graft.text.GiniStump.giniStump(s, dir)),
    // Absorbing-chain conversion: K integer-mass rounds over q119's
    // empirical transition matrix, purchase pinned absorbing.
    "q236_absorb_prob"      -> (E.absorbProb _),
    // Pairwise source TV over the shared top-V vocabulary: the
    // inner-join decomposition, integer ppm shares.
    "q237_lexical_drift"    -> ((s: SparkSession, dir: String) =>
      graft.analytics.DriftOps.lexicalDrift(s, dir)),
    // Directed association rules over co-purchase pairs: exact integer
    // confidence and lift (triple product widened decimal/HUGEINT).
    "q238_assoc_rules"      -> (R.assocRules _),
    // Kaplan-Meier time-to-conversion with right censoring: iterated
    // integer floor survival, flatMapGroups fold vs recursive-CTE oracle.
    "q239_kaplan_meier"     -> (E.kaplanMeier _),
    // RFM quintile segmentation against exact value-quantile cutoffs:
    // one customer rollup, 12 broadcast cutoffs, 125-cell grid.
    "q240_rfm"              -> (R.rfmSegments _),
    // Per-label embedding quality profile: exact quantized norms,
    // percentile_disc, duplicate-vector ledger.
    "q241_vector_profile"   -> (V.vectorProfile _),
    // T5-style span-corruption plan: keyed-hash offsets, one span per
    // full block — non-overlapping by construction, no RNG.
    "q242_span_mask"        -> (T.spanMaskPlan _),
    // Exact two-sample KS per source vs rest: sup CDF gap with
    // denominators cleared, argmax value emitted.
    "q243_ks_audit"         -> (T.ksAudit _),
    // Near-dup clusters route atomically to HRW shards via their rep;
    // ledger quantifies what naive doc-keyed routing would split.
    "q244_cluster_shards"   -> ((s: SparkSession, dir: String) =>
      graft.sources.ShardOps.clusterShards(s, dir)),
    // Random-walk-with-restart proximity to one brand's catalog:
    // q124's integer-mass rounds, teleport concentrated on the seeds.
    "q245_ppr_brand"        -> (G.pprBrand _),
    // Kish effective sample size of the waterfill mixture: exact
    // floored importance weights, ppm-scale-cancelled ratio.
    "q246_mixture_ess"      -> ((s: SparkSession, dir: String) =>
      graft.text.MixturePlan.mixtureEss(s, dir)),
    // q233 live: stratum-count cells as bounded streaming state, the
    // drained table rolled up by the shared HHI arithmetic.
    "q247_stream_diversity" -> (T.mixtureDiversityStream _),
    // Good-Turing unseen-mass estimate per language: f1/N ppm plus the
    // frequency-of-frequencies head — the vocabulary-coverage gauge.
    "q248_good_turing"      -> (T.goodTuring _),
    // Two-generation parquet schema evolution (added column + widened
    // ids) read back through one explicit target schema.
    "q249_schema_evolution" -> ((s: SparkSession, dir: String) =>
      graft.sources.SchemaEvolution.schemaEvolution(s, dir)),
    // Maximal duplicated spans >= 50 tokens (Lee et al. substring
    // dedup): window fingerprints, hash election, island merge.
    "q250_dup_spans"        -> ((s: SparkSession, dir: String) =>
      graft.dedup.SpanDedup.dupSpans(s, dir)),
    // Apriori triples at a RELATIVE (basket-fraction) min-support —
    // the scale-invariant production form; threshold = one in 75k.
    "q251_itemsets_relsup"  -> (R.tripleItemsetsRelSup _),
    // Graph ANN: deterministic NN-Descent kNN-graph build + NSW beam
    // search over kNN ∪ random expander edges — the retrieval path
    // where IVF's recall/probe trade is poor (r11 verdict ask #1).
    "q252_ann_graph"        -> (V.annGraph _),
    // Geometry-routed ANN front door: a 2NN intrinsic-dimension probe
    // selects trained IVF (flat geometry) vs the graph index (manifold
    // geometry) per corpus; runs both diagnostic corpora (r12 verdict
    // ask #1). The oracle replays probe + route + BOTH pipelines.
    "q253_ann_router"       -> (V.annRouter _),
    // End-to-end curation pipeline: dedup funnel -> conformal gate ->
    // waterfill prefix-take -> cluster-atomic split -> manifest, one
    // DAG over documents; oracle nests the stage oracles (r12 ask #7).
    "q254_curation_pipeline" -> ((s: SparkSession, dir: String) =>
      graft.text.CurationPipeline.curationManifest(s, dir)),
    // Incremental curation refresh: the arriving batch (top 10% of the
    // id space) probes the standing corpus state (fingerprint index,
    // LSH bands, gram postings, bucketed per-doc columns) instead of
    // re-running the pipeline; per-refresh shuffle is O(batch), and
    // the oracle is q254's FULL RECOMPUTE over corpus+batch (r13
    // verdict ask #1: the scale-correct alternative to the reference's
    // daily WRITE_TRUNCATE re-run).
    "q255_curation_refresh" -> ((s: SparkSession, dir: String) =>
      graft.text.CurationRefresh.curationRefresh(s, dir)),
    // Persisted-index ANN serving (r13 ask #2): build once into
    // centroid + cell-bucketed tables (q256) / edge-list + vector
    // tables (q257); every later invocation pays only the search.
    // Oracles are q81's / q252's full re-derivations, so stored-index
    // drift is a hash mismatch.
    "q256_ann_ivf_serve"    -> ((s: SparkSession, dir: String) =>
      graft.vector.AnnIndexStore.annIvfServe(s, dir)),
    "q257_ann_graph_serve"  -> ((s: SparkSession, dir: String) =>
      graft.vector.AnnIndexStore.annGraphServe(s, dir)),
    // q213 live: per-user bounded buffer completes gapped triples at
    // ingest; drained emissions collapse to the batch support ledger.
    // The drain lands via a foreachBatch parquet sink — q218 emits up
    // to gap² rows per event (~9M at sf1) and the memory sink funnels
    // all of them through one driver-side append.
    "q218_stream_seqpat"    -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventsStream.seqSupportRollup(
        graft.streaming.EventsStream.runAvailableNowViaParquet(
          s, graft.streaming.EventsStream.seqOccurrences(
            graft.streaming.EventsStream.source(s, dir)), "q218_stream_seqpat"))),
    // Per-source Merkle root over doc fingerprints: O(log n) pairing
    // rounds, content-addressed corpus provenance in one root compare.
    "q216_merkle_manifest"  -> ((s: SparkSession, dir: String) =>
      graft.text.MerkleOps.merkleManifest(s, dir)),
    // Hybrid sparse+dense retrieval: BM25 arm + PRF-seeded integer-dot
    // dense arm, integer RRF fusion, both pages through GroupedTopK.
    "q215_hybrid_retrieval" -> ((s: SparkSession, dir: String) =>
      graft.text.SearchOps.hybridRetrieval(s, dir)),
    // Streaming Count-Min: the aggregate state IS the sketch (fixed
    // counters per type); probe estimates bit-equal the batch rebuild.
    "q214_stream_countmin"  -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventsStream.runAvailableNow(
        s, graft.streaming.EventsStream.countMinUsers(
          graft.streaming.EventsStream.source(s, dir)), "q214_stream_countmin",
        outputMode = "complete")),
    // Exact MAP@10 of the raw RP sketch ranking vs exact cosine truth:
    // rational precision terms cleared by lcm(1..10) — no floats.
    "q207_map_eval"         -> (V.mapEval _),
    // Streaming LOCF: per-user carry state repairs missingness at
    // ingest; per-user ledger equals the batch window form.
    "q194_stream_fill"      -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventsStream.runAvailableNow(
        s, graft.streaming.EventsStream.forwardFillStream(
          graft.streaming.EventsStream.source(s, dir)), "q194_stream_fill",
        outputMode = "complete")),
    // Exact AUC for q146's classifier: Mann-Whitney rank statistic
    // with tie-averaged ranks kept integral by doubling.
    "q193_auc_exact"        -> ((s: SparkSession, dir: String) =>
      graft.text.QualityClassifier.aucExact(s, dir)),
    // PMI collocation mining: log-free integer ranking of adjacent
    // token pairs vs independence (Church & Hanks).
    "q192_pmi_collocations" -> ((s: SparkSession, dir: String) =>
      graft.text.CalibrateOps.pmiCollocations(s, dir)),
    // Duplicate-discounted effective corpus size: each doc weighs
    // 1/|near-dup cluster|; per-lang dedup discount in bp.
    "q191_effective_size"   -> ((s: SparkSession, dir: String) =>
      graft.dedup.EffectiveSize.effectiveSize(s, dir)),
    // Reciprocal-rank fusion of the exact and prefix-dim rankings —
    // the calibration-free hybrid-retrieval combiner.
    "q190_rrf_fusion"       -> (V.rrfFusion _),
    // LOCF forward-fill imputation with planted missingness ledger.
    "q188_forward_fill"     -> (E.forwardFill _),
    // Gaps-and-islands run-length bot detection per user.
    "q189_bot_runs"         -> (E.botRuns _),
    // Log-scale dwell histogram: integer power-of-4 bucket ladder
    // over same-user inter-event gaps (the HDR/Prometheus shape).
    "q187_dwell_histogram"  -> (E.dwellHistogram _),
    // Apriori frequent triples: candidate generation from frequent
    // pairs + downward-closure pruning; oracle is the naive cubic
    // join — hash equality proves the pruning lossless.
    "q186_triple_itemsets"  -> (R.tripleItemsets _),
    // Mixed-language audit: per-chunk marker votes roll up to a
    // majority/minority verdict per document (the CCNet paragraph
    // consistency screen).
    "q185_mixed_lang"       -> ((s: SparkSession, dir: String) =>
      graft.text.MixedLang.mixedLangAudit(s, dir)),
    // IDF-weighted near-dup: integer weight tiers via the replication
    // reduction — unweighted Jaccard of replicated sets IS the
    // weighted Jaccard; q21's LSH stack applies unchanged.
    "q184_weighted_minhash" -> ((s: SparkSession, dir: String) =>
      graft.dedup.WeightedMinHash.weightedNearDup(s, dir)),
    // Label-outlier detection: vectors farthest from their own label
    // centroid (the Confident-Learning geometric screen).
    "q183_label_outliers"   -> (V.labelOutliers _),
    // Session path mining: top navigation paths over q14's sessions;
    // order-safe concatenation (struct sort, not collect_list luck).
    "q181_session_paths"    -> (E.sessionPaths _),
    // Waterfilling mixture allocation: max-min fair split of a token
    // budget under per-source availability; all-integer, exact sum.
    "q182_mixture_waterfill" -> ((s: SparkSession, dir: String) =>
      graft.text.MixturePlan.mixtureWaterfill(s, dir)),
    // Stratified k-fold: round-robin deal within each language after
    // a deterministic hash shuffle; per-stratum fold spread ≤ 1.
    "q179_stratified_folds" -> ((s: SparkSession, dir: String) =>
      graft.text.FoldOps.stratifiedFolds(s, dir)),
    // Benford first-digit audit: integer CASE-ladder digit binning,
    // per-mille deviation vs fixed Benford constants.
    "q180_benford_audit"    -> ((s: SparkSession, dir: String) =>
      graft.analytics.ForensicsOps.benfordAudit(s, dir)),
    // Audio constellation matching: energy-peak-pair hashes index
    // every track; frame-aligned clips identified by offset-histogram
    // vote (the Shazam shape, all-integer past the codec).
    "q178_audio_match"      -> ((s: SparkSession, dir: String) =>
      graft.multimodal.AudioMatch.audioMatch(s, dir)),
    // Permissive JSON parse with corrupt-record routing: three
    // planted failure classes ledgered per event type.
    "q177_json_deadletter"  -> (E.jsonDeadletter _),
    // Cross-source rank calibration: within-source rank percentiles
    // make per-source score distributions uniform; top-quartile
    // shares before/after show the repair.
    "q176_rank_calibrate"   -> ((s: SparkSession, dir: String) =>
      graft.text.CalibrateOps.rankCalibrate(s, dir)),
    // Incremental MV maintenance: delta aggregated alone and merged
    // into stored partials; oracle IS the full recompute.
    "q175_mv_merge"         -> ((s: SparkSession, dir: String) =>
      graft.analytics.MvMaintain.mvMerge(s, dir)),
    // Format-crossing pixel dedup: decoded-pixel digests collapse the
    // same image across PPM and PNG containers (container-byte hashing
    // provably misses these).
    "q174_pixel_dedup"      -> ((s: SparkSession, dir: String) =>
      graft.multimodal.PixelDedup.pixelDedup(s, dir)),
    // Trailing-window rate anomaly: hourly counts vs trailing-24h
    // mean via exact integer cross-multiplication; warm-up gated.
    "q173_rate_anomaly"     -> (E.rateAnomaly _),
    // Schema-driven single-pass column profiler (the Deequ shape):
    // all 5·n_cols stats in one aggregate, per-type canonical min/max.
    "q172_profile"          -> ((s: SparkSession, dir: String) =>
      graft.analytics.Profiler.profileTables(s, dir)),
    // Bloom-pruned contamination screening: mergeable bloom build
    // over eval shingles, codegen'd bit probes on the corpus side,
    // exact verify on survivors only; candidates ledgered beside hits.
    "q171_bloom_contam"     -> ((s: SparkSession, dir: String) =>
      graft.dedup.BloomOps.bloomDecontaminate(s, dir)),
    // Streaming KMV: the bottom-k TypedImperativeAggregate as
    // Structured Streaming state; sketch statistics and estimate
    // are BIT-equal to the batch oracle (order-invariant integers).
    "q170_stream_kmv"       -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventsStream.runAvailableNow(
        s, graft.streaming.EventsStream.kmvUsers(
          graft.streaming.EventsStream.source(s, dir)), "q170_stream_kmv",
        outputMode = "complete")),
    // Stupid Backoff word-trigram LM (Brants'07): counts trained on
    // the q97 train split score held-out docs; per-tier hit ledger,
    // all-integer micro-unit scores.
    "q169_backoff_lm"       -> ((s: SparkSession, dir: String) =>
      graft.text.BackoffLm.backoffScore(s, dir)),
    // Leakage-safe split: near-dup clusters (star CC over verified
    // q21 pairs) route atomically to train/val/test by rep-keyed
    // hash; cross_split_pairs audit column pinned at zero.
    "q168_cluster_split"    -> ((s: SparkSession, dir: String) =>
      graft.dedup.SplitOps.clusterSplit(s, dir)),
    // Shot-boundary detection over concatenated-PPM video clips:
    // frame-to-frame SAD thresholding in one mapPartitions pass;
    // oracle re-derives every SAD via the closed form.
    "q167_scene_detect"     -> ((s: SparkSession, dir: String) =>
      graft.multimodal.VideoOps.sceneDetect(s, dir)),
    // Keyed snapshot diff: one full-outer join on the key classifies
    // added/removed/changed(+column mask)/unchanged into a ledger.
    "q165_snapshot_diff"    -> ((s: SparkSession, dir: String) =>
      graft.analytics.SnapshotDiff.snapshotDiff(s, dir)),
    // k-anonymity audit over a generalization ladder: one GROUPING
    // SETS pass sizes every QI class at all three levels.
    "q166_k_anonymity"      -> ((s: SparkSession, dir: String) =>
      graft.analytics.PrivacyOps.kAnonymityAudit(s, dir)),
    // Per-domain document caps with a dropped-mass ledger; kept
    // selection via the GroupedTopK custom physical operator (O(1)
    // state per group), skewed synthetic domains so the cap bites.
    "q164_domain_cap"       -> ((s: SparkSession, dir: String) =>
      graft.text.DomainOps.domainCap(s, dir)),
    // Entity resolution: symmetric-delete (SymSpell) blocking +
    // levenshtein verify; oracle is the naive quadratic form,
    // proving the blocking is complete at distance 1.
    "q160_entity_resolution" -> ((s: SparkSession, dir: String) =>
      graft.dedup.EntityResolution.entityResolution(s, dir)),
    // Index-accelerated exact substring search: gram-postings
    // intersection (no false negatives) + contains verify; the
    // oracle IS the naive full-scan form, proving equivalence.
    "q158_substring_search" -> ((s: SparkSession, dir: String) =>
      graft.text.SearchOps.substringSearch(s, dir)),
    // Temporal-split leakage audit: per-split counts + cross-boundary
    // user leakage in basis points (the time-split analog of q75/q94).
    "q159_leakage_audit"    -> (E.leakageAudit _),
    // q156 on a live stream: the streaming aggregate's state IS the
    // sketch (fixed registers per type, never per-user state);
    // estimate bound-checked against the batch-exact count.
    "q157_stream_sketch"    -> ((s: SparkSession, dir: String) => {
      val est = graft.streaming.EventsStream.runAvailableNow(
        s, graft.streaming.EventsStream.sketchRollup(
          graft.streaming.EventsStream.source(s, dir)), "q157_stream_sketch",
        outputMode = "complete")
      val exact = graft.tables.Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
      est.join(exact, "event_type")
        .select(col("event_type"), col("exact_users"),
          when(abs(col("est") - col("exact_users")) * 100
            <= col("exact_users") * 5, 1L).otherwise(0L).as("within_bound"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q01_global_stats"      -> R.globalStatsSql,
    "q02_revenue_by_flag"   -> R.revenueByFlagSql,
    "q03_quality_gate"      -> R.qualityGateSql,
    "q04_conditional_agg"   -> R.conditionalAggSql,
    "q05_csv_parse"         -> R.csvParseSql,
    "q06_dedup_first_wins"  -> R.dedupFirstWinsSql,
    "q07_revenue_by_nation" -> R.revenueByNationSql,
    "q08_topk_per_group"    -> R.topOrdersPerPrioritySql,
    "q09_running_window"    -> R.runningCustomerSpendSql,
    "q10_setops"            -> R.customerSetOpsSql,
    "q11_rollup"            -> R.rollupByFlagStatusSql,
    "q12_json_extract"      -> E.jsonExtractSql,
    "q13_tumbling_window"   -> E.tumblingCountsSql,
    "q14_sessionize"        -> E.sessionizeSql,
    "q15_token_stats"       -> T.tokenStatsSql,
    "q16_lang_id"           -> T.langIdSql,
    "q17_quality_score"     -> T.qualityScoreSql,
    "q18_fingerprint"       -> T.fingerprintSql,
    "q19_exact_dedup"       -> D.exactDedupSql,
    "q20_ngram_jaccard"     -> D.ngramJaccardSql,
    "q21_minhash_lsh"       -> D.minhashLshSql,
    "q22_simhash"           -> D.simhashSql,
    "q23_embed_neardup"     -> V.nearDupPairsSql,
    "q24_knn_brute"         -> V.knnBruteSql,
    "q25_ann_lsh"           -> V.annLshSql,
    "q26_stream_tumbling"   -> E.tumblingCountsSql,
    "q27_subquery"          -> R.aboveAvgOrdersSql,
    "q28_asof_join"         -> E.asofJoinSql,
    "q29_topk_custom"       -> R.topOrdersPerPrioritySql,
    "q30_salted_join"       -> R.saltedJoinAggSql,
    "q31_label_centroids"   -> V.labelCentroidsSql,
    "q32_top_terms"         -> T.topTermsPerLangSql,
    "q33_percentiles"       -> R.pricePercentilesSql,
    "q34_minhash_estimate"  -> D.minhashEstimateSql,
    "q35_ann_ivf"           -> V.annIvfSql,
    "q36_chunking"          -> T.chunkDocsSql,
    "q37_redact"            -> T.redactSql,
    "q38_stratified"        -> T.stratifiedSampleSql,
    "q39_tfidf"             -> T.tfidfTopTermsSql,
    "q40_lead_lag"          -> E.leadLagDeltasSql,
    "q41_semi_anti"         -> R.semiAntiCustomersSql,
    "q42_cube"              -> R.cubeByStatusPrioritySql,
    "q43_binary_meta"       -> graft.multimodal.MultimodalOps.binaryMetaSql,
    "q44_approx_distinct"   -> R.approxDistinctSql,
    "q45_approx_percentile" -> R.approxPercentilesSql,
    "q46_stream_session"    -> E.streamSessionizeSql,
    "q47_stream_userstats"  -> E.userStatsSql,
    "q48_pivot"             -> R.pivotQtyByStatusSql,
    "q49_array_funcs"       -> T.arrayFuncsSql,
    "q50_rank_suite"        -> R.rankSuiteSql,
    "q51_string_funcs"      -> R.stringFuncsSql,
    "q52_date_funcs"        -> R.dateFuncsSql,
    "q53_grouping_sets"     -> R.groupingSetsTotalsSql,
    "q54_map_funcs"         -> E.mapFuncsSql,
    "q55_setops_all"        -> R.setOpsAllSql,
    "q56_range_window"      -> R.rangeWindowBandSql,
    "q57_unpivot"           -> R.unpivotMetricsSql,
    "q58_regexp_extract"    -> R.regexExtractSql,
    "q59_null_funcs"        -> R.nullFuncsSql,
    "q60_interval_join"     -> E.intervalJoinSql,
    "q61_stream_interval"   -> E.intervalJoinSql,
    "q62_outer_join"        -> R.outerJoinOrdersSql,
    "q63_select_subquery"   -> R.selectScalarSubquerySql,
    "q64_value_windows"     -> R.valueWindowsSql,
    "q65_collect_aggs"      -> R.collectAggsSql,
    "q66_predicate_aggs"    -> R.predicateAggsSql,
    "q67_stats_aggs"        -> R.statsAggsSql,
    "q68_minhash_group_sig" -> D.minhashGroupSigSql,
    "q69_binary_files"      -> graft.multimodal.MultimodalOps.binaryFilesSql,
    "q70_minhash_agg_native" -> D.minhashGroupSigSql,
    "q71_knn_int8"          -> V.knnInt8Sql,
    "q72_dedup_clusters"    -> D.dedupClustersSql,
    "q73_simhash_neardup"   -> D.simhashNearDupSql,
    "q74_stream_dedup"      -> "SELECT DISTINCT user_id, event_type FROM events",
    "q75_contamination"     -> D.contaminationSql,
    "q76_seq_packing"       -> T.seqPackingSql,
    "q77_mixture_audit"     -> T.mixtureAuditSql,
    "q78_repetition"        -> T.repetitionScoreSql,
    "q79_knn_pq"            -> V.knnPqSql,
    "q80_kmeans"            -> V.kmeansFitSql,
    "q81_ivf_trained"       -> V.annIvfTrainedSql,
    "q82_frame_sample"      -> graft.multimodal.MultimodalOps.frameSamplesSql,
    "q83_random_projection" -> V.randomProjectionSql,
    "q84_knn_rp"            -> V.knnRpSql,
    "q85_stream_chunks"     -> graft.streaming.EventsStream.chunkEventsSql,
    "q86_upsert"            -> R.upsertCustomersSql,
    "q87_scd2"              -> E.scd2HistorySql,
    "q88_ingest_dedup"      -> D.ingestDedupSql,
    "q89_mixture_sample"    -> T.mixtureSampleSql,
    "q90_sliding_window"    -> E.slidingCountsSql,
    "q91_stream_sliding"    -> E.slidingCountsSql,
    "q92_resize_plan"       -> graft.multimodal.MultimodalOps.resizePlansSql,
    "q93_stream_dedup_wm"   -> "SELECT DISTINCT user_id, event_type FROM events",
    "q94_decontaminate"     -> D.decontaminateSql,
    "q95_jsonl_roundtrip"   -> graft.sources.FormatRoundtrip.jsonlRoundtripSql,
    "q96_orc_roundtrip"     -> graft.sources.FormatRoundtrip.orcRoundtripSql,
    "q97_hash_split"        -> T.hashSplitSql,
    "q98_consensus_neardup" -> D.consensusNearDupSql,
    "q99_bucketed_join"     -> graft.sources.Bucketing.bucketedJoinSql,
    "q100_foreachbatch_sink" -> graft.streaming.EventsStream.foreachBatchSinkSql,
    "q101_stream_static"    -> graft.streaming.EventsStream.streamStaticNationRollupSql,
    "q102_cogroup"          -> E.cogroupReconcileSql,
    "q103_csv_roundtrip"    -> graft.sources.FormatRoundtrip.csvRoundtripSql,
    "q104_sql_functions"    -> T.sqlSurfaceSql,
    "q105_dedup_keep_best"  -> D.dedupKeepBestSql,
    "q106_band_bucket_ledger" -> D.bandBucketLedgerSql,
    "q107_substring_dedup"  -> D.substringDedupSql,
    "q108_semdedup"         -> V.semDedupSql,
    "q109_dedup_funnel"     -> D.dedupFunnelSql,
    "q110_event_funnel"     -> E.eventFunnelSql,
    "q111_gapfill_hourly"   -> E.gapfillHourlySql,
    "q112_source_overlap"   -> D.sourceOverlapSql,
    "q113_quality_rules"    -> T.qualityRulesSql,
    "q114_pps_sample"       -> T.ppsSampleSql,
    "q115_zorder_layout"    -> graft.sources.ZOrder.zorderLayoutSql,
    "q116_heavy_hitters"    -> T.heavyHittersSql,
    "q117_window_distinct"  -> E.windowDistinctUsersSql,
    "q118_cohort_retention" -> E.cohortRetentionSql,
    "q119_event_transitions" -> E.eventTransitionsSql,
    "q120_copurchase"       -> R.copurchasePairsSql,
    "q121_constraint_audit" -> R.constraintAuditSql,
    "q122_graph_bfs"        -> G.graphBfsSql,
    "q123_triangle_stats"   -> G.triangleStatsSql,
    "q124_pagerank"         -> G.pageRankSql,
    "q125_copurchase_topk"  -> R.copurchaseTopKSql,
    "q126_decode_stats"     -> graft.multimodal.MultimodalOps.decodeStatsSql,
    "q127_bfs_converged"    -> G.graphBfsConvergedSql,
    "q128_triangle_est"     -> G.triangleEstimateSql,
    "q129_stream_funnel"    -> E.eventFunnelSql,
    "q130_repetition_rules" -> T.repetitionRulesSql,
    "q131_phash_groups"     -> graft.multimodal.MultimodalOps.phashGroupsSql,
    "q132_phash_neardup"    -> graft.multimodal.MultimodalOps.phashNeardupSql,
    "q133_token_commonality" -> T.tokenCommonalitySql,
    "q134_cc_star"          -> D.dedupClustersSql,
    "q135_audio_segments"   -> graft.multimodal.MultimodalOps.audioSegmentsSql,
    "q136_knn_matryoshka"   -> V.knnMatryoshkaSql,
    "q137_attribution"      -> E.purchaseAttributionSql,
    "q138_quality_route"    -> T.qualityQuantileRouteSql,
    "q139_phash_ingest"     -> graft.multimodal.MultimodalOps.phashIngestGateSql,
    "q140_manifest"         -> graft.multimodal.MultimodalOps.trainingManifestSql,
    "q141_stream_attrib"    -> E.purchaseAttributionSql,
    "q142_png_decode"       -> graft.multimodal.MultimodalOps.pngDecodeStatsSql,
    "q143_html_extract"     -> T.htmlExtractStatsSql,
    "q144_bpe_tokens"       -> graft.text.BpeOps.bpeTokenStatsSql,
    "q145_containment"      -> D.containmentDedupSql,
    "q146_quality_classifier" -> graft.text.QualityClassifier.classifySql,
    "q147_lm_fluency"       -> graft.text.LmFluency.lmFluencySql,
    "q148_audio_resample"   -> graft.multimodal.MultimodalOps.audioResampleSql,
    "q149_lang_id_trained"  -> graft.text.LangIdTrained.langIdTrainedSql,
    "q150_jpeg_decode"      -> graft.multimodal.MultimodalOps.jpegDecodeStatsSql,
    "q151_nfc_normalize"    -> graft.text.UnicodeOps.nfcNormalizeSql,
    "q152_url_canon"        -> graft.text.UrlOps.urlCanonDedupSql,
    "q153_cdc_chunks"       -> graft.dedup.CdcOps.cdcChunkDedupSql,
    "q154_mojibake"         -> graft.text.UnicodeOps.mojibakeRepairSql,
    "q155_quantile_sketch"  -> T.qualityQuantileSketchSql,
    "q156_hll_rollup"       -> E.hllRollupSql,
    "q158_substring_search" -> graft.text.SearchOps.substringSearchSql,
    "q159_leakage_audit"    -> E.leakageAuditSql,
    "q160_entity_resolution" -> graft.dedup.EntityResolution.entityResolutionSql,
    "q161_mad_outliers"     -> T.madOutliersSql,
    "q162_group_trend"      -> R.groupTrendSql,
    "q163_kmv_overlap"      -> graft.dedup.KmvSketch.kmvOverlapSql,
    "q164_domain_cap"       -> graft.text.DomainOps.domainCapSql,
    "q165_snapshot_diff"    -> graft.analytics.SnapshotDiff.snapshotDiffSql,
    "q166_k_anonymity"      -> graft.analytics.PrivacyOps.kAnonymityAuditSql,
    "q167_scene_detect"     -> graft.multimodal.VideoOps.sceneDetectSql,
    "q168_cluster_split"    -> graft.dedup.SplitOps.clusterSplitSql,
    "q169_backoff_lm"       -> graft.text.BackoffLm.backoffScoreSql,
    "q171_bloom_contam"     -> graft.dedup.BloomOps.bloomDecontaminateSql,
    "q172_profile"          -> graft.analytics.Profiler.profileTablesSql,
    "q173_rate_anomaly"     -> E.rateAnomalySql,
    "q174_pixel_dedup"      -> graft.multimodal.PixelDedup.pixelDedupSql,
    "q175_mv_merge"         -> graft.analytics.MvMaintain.mvMergeSql,
    "q176_rank_calibrate"   -> graft.text.CalibrateOps.rankCalibrateSql,
    "q177_json_deadletter"  -> E.jsonDeadletterSql,
    "q178_audio_match"      -> graft.multimodal.AudioMatch.audioMatchSql,
    "q179_stratified_folds" -> graft.text.FoldOps.stratifiedFoldsSql,
    "q180_benford_audit"    -> graft.analytics.ForensicsOps.benfordAuditSql,
    "q181_session_paths"    -> E.sessionPathsSql,
    "q182_mixture_waterfill" -> graft.text.MixturePlan.mixtureWaterfillSql,
    "q183_label_outliers"   -> V.labelOutliersSql,
    "q184_weighted_minhash" -> graft.dedup.WeightedMinHash.weightedNearDupSql,
    "q185_mixed_lang"       -> graft.text.MixedLang.mixedLangAuditSql,
    // default: Apriori-pruned oracle (the cubic join exceeds DuckDB's
    // budget on dense corpora); SPARK_GRAFT_CUBIC_ORACLE=true swaps in
    // the naive cubic form for an algorithm-independent spot check on
    // each new scale corpus (equivalent by downward closure).
    "q186_triple_itemsets"  -> (if (sys.env.get("SPARK_GRAFT_CUBIC_ORACLE")
        .contains("true")) R.tripleItemsetsCubicSql else R.tripleItemsetsSql),
    "q187_dwell_histogram"  -> E.dwellHistogramSql,
    "q188_forward_fill"     -> E.forwardFillSql,
    "q189_bot_runs"         -> E.botRunsSql,
    "q190_rrf_fusion"       -> V.rrfFusionSql,
    "q191_effective_size"   -> graft.dedup.EffectiveSize.effectiveSizeSql,
    "q192_pmi_collocations" -> graft.text.CalibrateOps.pmiCollocationsSql,
    "q193_auc_exact"        -> graft.text.QualityClassifier.aucExactSql,
    "q195_linear_attribution" -> E.linearAttributionSql,
    "q196_kcore"            -> G.kCoreSql,
    "q197_drift_monitor"    -> graft.analytics.DriftOps.driftMonitorSql,
    "q198_l_diversity"      -> graft.analytics.PrivacyOps.lDiversityAuditSql,
    "q199_t_closeness"      -> graft.analytics.PrivacyOps.tClosenessAuditSql,
    "q200_padding_waste"    -> T.paddingWasteSql,
    "q201_textrank"         -> graft.text.TextRank.textRankSql,
    "q202_dp_histogram"     -> graft.analytics.DpRelease.dpHistogramSql,
    // the streaming twin must reproduce the batch drift ledger exactly
    "q203_stream_drift"     -> graft.analytics.DriftOps.driftMonitorSql,
    "q204_isotonic"         -> graft.text.IsotonicOps.isotonicCalibrationSql,
    "q205_kcenter"          -> graft.vector.CoresetOps.kCenterSql,
    "q206_markov_eval"      -> E.markovEvalSql,
    "q208_label_prop"       -> G.labelPropSql,
    "q209_bm25"             -> graft.text.SearchOps.bm25RetrievalSql,
    "q210_chi2_terms"       -> T.chi2TermsSql,
    "q211_power_iteration"  -> V.powerIterationSql,
    "q212_countmin"         -> T.countMinShinglesSql,
    "q213_seq_patterns"     -> E.seqPatternsSql,
    "q214_stream_countmin"  -> graft.streaming.EventsStream.countMinUsersSql,
    "q215_hybrid_retrieval" -> graft.text.SearchOps.hybridRetrievalSql,
    "q216_merkle_manifest"  -> graft.text.MerkleOps.merkleManifestSql,
    "q217_seasonal_naive"   -> E.seasonalNaiveErrorSql,
    "q219_skyline"          -> T.skylineDocsSql,
    "q220_term_proximity"   -> graft.text.SearchOps.termProximitySql,
    "q221_manifest_diff"    -> graft.text.MerkleOps.manifestDiffSql,
    "q222_reliability"      -> graft.text.QualityClassifier.reliabilityDiagramSql,
    "q223_theil_sen"        -> R.theilSenTrendSql,
    "q224_hits"             -> G.hitsSql,
    "q225_conformal"        -> graft.text.QualityClassifier.conformalGateSql,
    "q226_cusum"            -> E.cusumChangepointSql,
    "q227_kendall_tau"      -> V.kendallTauSql,
    "q228_hrw_shards"       -> graft.sources.ShardOps.shardRebalanceSql,
    "q229_link_prediction"  -> G.linkPredictionSql,
    "q230_langid_eval"      -> T.langIdEvalSql,
    // the streaming accumulation must land on the batch CUSUM ledger
    "q231_stream_cusum"     -> E.cusumChangepointSql,
    "q232_trimmed_mean"     -> T.trimmedMeanSql,
    "q233_mixture_diversity" -> T.mixtureDiversitySql,
    "q234_trend_influence"  -> R.trendInfluenceSql,
    "q235_gini_stump"       -> graft.text.GiniStump.giniStumpSql,
    "q236_absorb_prob"      -> E.absorbProbSql,
    "q237_lexical_drift"    -> graft.analytics.DriftOps.lexicalDriftSql,
    "q238_assoc_rules"      -> R.assocRulesSql,
    "q239_kaplan_meier"     -> E.kaplanMeierSql,
    "q240_rfm"              -> R.rfmSegmentsSql,
    "q241_vector_profile"   -> V.vectorProfileSql,
    "q242_span_mask"        -> T.spanMaskPlanSql,
    "q243_ks_audit"         -> T.ksAuditSql,
    "q244_cluster_shards"   -> graft.sources.ShardOps.clusterShardsSql,
    "q245_ppr_brand"        -> G.pprBrandSql,
    "q246_mixture_ess"      -> graft.text.MixturePlan.mixtureEssSql,
    // the streamed strata must land on the batch diversity ledger
    "q247_stream_diversity" -> T.mixtureDiversitySql,
    "q248_good_turing"      -> T.goodTuringSql,
    "q249_schema_evolution" -> graft.sources.SchemaEvolution.schemaEvolutionSql,
    "q250_dup_spans"        -> graft.dedup.SpanDedup.dupSpansSql,
    "q251_itemsets_relsup"  -> R.tripleItemsetsRelSupSql,
    "q252_ann_graph"        -> V.annGraphSql,
    "q253_ann_router"       -> V.annRouterSql,
    "q254_curation_pipeline" -> graft.text.CurationPipeline.curationManifestSql,
    // q255's oracle IS the full recompute of the q254 composition over
    // corpus+batch — incremental maintenance vs recomputation equality
    // is exactly what the hash compare checks.
    "q255_curation_refresh" -> graft.text.CurationPipeline.curationManifestSql,
    // q256/q257 oracles re-derive train + index + search from the raw
    // parquet — the serving path must match a fresh build exactly.
    "q256_ann_ivf_serve"    -> V.annIvfTrainedSql,
    "q257_ann_graph_serve"  -> V.annGraphSql,
    // the streaming twin must reproduce the batch q213 ledger exactly
    "q218_stream_seqpat"    -> E.seqPatternsSql,
    "q207_map_eval"         -> V.mapEvalSql,
    "q194_stream_fill"      ->
      """WITH p AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN event_id % 7 = 0 THEN NULL
        |              ELSE CAST(round(value * 100, 0) AS BIGINT) END AS v
        |  FROM events),
        |f AS (
        |  SELECT user_id, v,
        |         last_value(v IGNORE NULLS) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |  FROM p)
        |SELECT user_id,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
        |       CAST(sum(CASE WHEN v IS NULL AND filled IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_imputed,
        |       CAST(sum(CASE WHEN filled IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unfillable,
        |       CAST(sum(CASE WHEN v IS NULL THEN coalesce(filled, 0) ELSE 0 END) AS BIGINT) AS imputed_mass_c
        |FROM f GROUP BY 1""".stripMargin,
    "q170_stream_kmv"       -> {
      import graft.dedup.KmvSketch.{K, Ua, Ub}
      val P = graft.functions.TextExprs.P
      s"""WITH h AS (
         |  SELECT DISTINCT event_type, ($Ua * user_id + $Ub) % $P AS h
         |  FROM events),
         |r AS (SELECT event_type, h,
         |             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |      FROM h),
         |s AS (SELECT event_type, h FROM r WHERE rn <= $K),
         |a AS (SELECT event_type,
         |             CAST(count(*) AS BIGINT) AS k_used,
         |             CAST(max(h) AS BIGINT) AS kth_h,
         |             CAST(sum(h) AS BIGINT) AS sk_sum
         |      FROM s GROUP BY 1)
         |SELECT event_type, k_used, kth_h, sk_sum,
         |       CAST(CASE WHEN k_used < $K THEN k_used
         |                 ELSE ${(K - 1).toLong * P} // kth_h END AS BIGINT) AS est_users
         |FROM a""".stripMargin
    },
    "q157_stream_sketch"    ->
      """SELECT event_type,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |       CAST(1 AS BIGINT) AS within_bound
        |FROM events GROUP BY 1""".stripMargin
  )
}
