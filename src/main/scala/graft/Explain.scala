package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dumps formatted physical plans for the headline queries → PLANS.md.
  * Run after plan-affecting changes: `sbt "runMain graft.Explain"`.
  * The plans are the scale story — pushdown, broadcast choices, exchange
  * counts — in reviewable form (PlanAuditSpec asserts the load-bearing
  * properties; this file is for humans).
  */
object Explain {
  private val Headline = Seq(
    "q01_pricing_summary", // partial+final hash aggregate
    "q02_filter_project",  // pushdown + pruning
    "q05_minute_metrics",  // tumbling window conditional counts
    "q08_merge_upsert",    // latest-wins merge
    "q09_trending",        // broadcast dim join + top-k
    "q11_region_revenue",  // multiway broadcast join chain
    "q13_asof_join",       // as-of via union-tag window
    "q23_lsh_candidates",  // LSH candidate join + cached signatures
    "q24_ngram_jaccard",   // shingle-level equi-join + pair-count agg
    "q26_cosine_topk",     // native graft_dot + rank window
    "q27_embedding_neardup", // bucket self-join + broadcast bucket-size guard
    "q28_ann_lsh",         // sign-LSH probe + broadcast guard + WindowGroupLimit
    "q41_range_join",      // bucket-replicated range join (no product join)
    "q45_tfidf_top",       // explode → tf agg → token-window df → per-doc top-k
    "q47_edit_distance",   // LSH candidates + per-candidate Levenshtein
    "q50_centroid_assign", // k-means E-step: broadcast centroids + argmin
    "q52_part_revenue",    // fact⋈dim equi-join + two-key rollup
    "q57_interval_overlap", // overlap-bucket equi-join + residual predicate
    "q58_fact_user_engagement", // Silver wide table: as-of + sessionize + JSON
    "q59_layout_pruning",  // hidden-partition pruning from a raw-ts predicate
    "q61_decontaminate",   // broadcast holdout digests + per-doc hit count
    "q62_seq_pack",        // sharded prefix-sum window (no global sort)
    "q63_repetition",      // pure projection (duplicate-shingle share)
    "q64_bm25_topk",       // projection tf + broadcast stats + top-k window
    "q65_token_budget",    // per-stratum running-sum window admit filter
    "q66_hard_negatives",  // broadcast anchors + label-inequality residual
    "q69_curation_pipeline", // dedup → quality → decontaminate → budget
    "q72_doc_chunks",      // per-doc chunk tiling (posexplode, no shuffle)
    "q74_quantized_topk",  // broadcast queries + exact int8 dot + rank limit
    "q75_cluster_rep",     // shared CC labels + per-cluster argmax window
    "q81_incremental_dedup", // batch bands probe the persisted corpus index
    "q83_simhash_neardup", // pigeonhole band equi-join + hamming verify
    "q84_bloom_decontaminate", // zero-join bloom probe beside the exact join
    "q85_snapshot_diff",   // two snapshot reads + one full-outer key join
    "q86_bpe_pairs",       // pair count agg + rank over the bounded pair space
    "q88_url_canonical",   // canonical-key projection + one hash-aggregate
    "q89_sketch_overlap",  // three one-pass KMV sketches (no join on the
                           // estimate side; the exact side exists only for
                           // the envelope oracle)
    "q90_pq_encode",       // broadcast codebook cells + per-subspace argmin
    "q91_pq_adc_topk",     // broadcast ADC LUT + per-(query, vector) sum
    "q92_bpe_encode",      // per-word unit-fold projection + per-doc agg
                           // (q94's per-round plan is rendered separately
                           // below — its output frame is driver-local)
    "q93_pq_recall",       // ADC rank vs exact rank, one broadcast pair join
    "q38_ann_ivf",         // trained-quantizer IVF: broadcast centroids,
                           // integer-L2 routing, one list equi-join
    "q95_ivf_recall",      // trained vs sampled-rep router, same nprobe
    "q97_semantic_dedup",  // SemDeDup: cluster-blocked cosine pair join
    "q98_ivf_adc",         // IVFADC: routed lists prune the PQ-code scan
    "q99_paragraph_dedup", // min(struct) winners — digest never a join key
    "q100_dup_shingles",   // distinct → doc-freq → digest equi-join back
    "q101_boilerplate",    // one (source, digest) distinct-count, no join
    "q102_dup_spans",      // digest join back + doc-keyed islands window
    "q103_source_overlap", // per-source sets; digest self-join capped at
                           // |sources|^2 rows per digest
    "q104_bigram_fluency", // train + score from one exploded scan; model
                           // side pre-collapsed per distinct bigram
    "q105_cluster_reps",   // shared CC labels + min(struct) argmax agg
    "q106_token_spectrum", // two chained partial+final aggs, no join
    "q107_lexical_diversity", // (source, token) agg → per-source roll-up
    "q108_incr_paragraph_dedup", // min(struct) winners → one digest anti join
    "q109_lsh_recall",     // sampled truth ⋈ band candidates, product-free
    "q110_ivf_nprobe_curve", // one widest-tier probe fans out via explode
    "q112_curation_v2",    // RefinedWeb-ordered pipeline: budget windows +
                           // broadcast verdict over the memoized v2 meta
    "q113_perplexity_buckets", // score-cutoff buckets from the per-source
                           // histogram window (no corpus rank window)
    "q114_gopher_rules",   // projection signals + doc-keyed top-2gram aggs
    "q115_dsir_weights",   // broadcast bucket model into doc-keyed scoring
    "q116_priority_sample", // (source, shard) rank → per-source rank on ≤ shards·k
    "q118_dsir_select",    // q115 weights driving the q116 sampler per source
    "q119_retrieval_mrr",  // LSH top-k ⋈ exact truth → reciprocal ranks
    "q120_leakage_safe_split", // cluster-root hash split over memoized CC labels
    "q121_cms_freq",       // CMS grid agg + broadcast probe min
    "q122_frame_sample",   // pure-projection byte windows (posexplode, no shuffle)
    "q123_resize_stub",    // truncate + metadata projection, no shuffle
    "q125_quality_pr_curve", // frozen-weight codegen scoring; thresholds ride
                           // a 9-row broadcast, confusion counts hash-agg
                           // (q124's trainer round is rendered separately
                           // below — its output frame is driver-local)
    "q126_epoch_shuffle",  // seeded-hash shard shuffle + shard-keyed rank
                           // window; never a global sort
    "q127_filter_agreement", // gopher signals ⋈ frozen-weight scores on the
                           // doc key; cross-tab is a partial+final agg
    "q128_domain_reweight", // two corpus aggs; 1-row grand total + |sources|
                           // rate frame ride broadcasts
    "q129_knn_graph",      // bucket-keyed self-join + per-id rank window
                           // (hot buckets split on extra sign bits)
    "q131_temperature_mix", // q128's shape with isqrt-scaled targets
    "q132_curriculum",     // per-source ntile + per-(source, stage) rank —
                           // no corpus-global window
    "q133_blocklist",      // literal isin inside the scan + one
                           // |sources|-row agg; no join side at all
                           // (q130's returned frame is a checkpoint scan —
                           // one LPA round is rendered separately below)
    "q134_tokenizer_fertility", // group key rides the explode — one scan,
                           // one language-keyed agg, no join back
    "q135_embedding_outliers", // broadcast trained centroids + 1-row mean;
                           // corpus never shuffles into a join
    "q136_incr_knn_graph", // batch probes the bucket-keyed index: anti
                           // join on the id + two bucket equi-joins;
                           // per-batch cost never scales with index size
    "q137_kmeans_update",  // mini-batch centroid update: batch cells meet
                           // broadcast centroids; history rides a k-row
                           // count frame, the corpus never re-enters
    "q138_norm_dedup_audit", // digests in the scan projection; group
                           // counts as aggregate chains, never Expand
    "q139_license_scan",   // all flag regexes in one scan + one agg
    "q140_cdc_chunks",     // doc-keyed running-sum window + digest-width
                           // sharedness join — never a global sort
    "q141_source_scorecard", // signal joins on the doc key, frozen-weight
                           // codegen scoring, one |sources|-row agg
    "q142_token_drift",    // one (source, bucket) agg over the token
                           // stream; totals window on the bounded frame
    "q143_embedding_drift", // one (label, dim) conditional-sum agg over
                           // exploded cells; no join, no window
    "q144_cluster_spectrum", // two chained aggs over the memoized CC
                           // labels — the q106 spectrum shape
    "q145_pack_efficiency", // shard-keyed agg over the q62 prefix sums;
                           // 16 rows out
    "q146_frame_neardup",  // (frame_idx, digest)-blocked pair join +
                           // pair-count agg — never a product
    "q147_pmi_collocations", // two hash-aggs + vocab-keyed marginal joins;
                           // N rides a broadcast 1-row frame; TakeOrdered
    "q148_jl_curve",       // per-tier broadcast query × corpus rank; the
                           // projections are pure codegen folds
    "q149_cluster_purity", // broadcast centroids + min(struct) majority
    "q150_curation_funnel", // verdict-keyed agg over the memoized q112
                           // frame; cumulative window on the 5-row spine
    "q152_feature_hashing", // one exploded scan + one (doc, dim) hash-agg
                           // (q151's per-round TakeOrdered(1) plan is
                           // driver-iterated — rendered separately below)
    "q153_quality_cutoff", // doc-keyed join → histogram agg → bounded
                           // cumulative window → per-source agg
    "q154_ndcg",           // broadcast-query rank passes + (qid, id)
                           // grade join; DCG is a map-side-combined sum
    "q155_shingle_sweep",  // four joinless projection-aggregate tiers
    "q156_heldout_lm",     // vocab-keyed model joins over pre-collapsed
                           // occurrences; 1-row N rides a broadcast
    "q157_knn_hubness",    // bucket-blocked graph → two chained aggs
    "q158_cooccurrence",   // positional pair tiers (no self-join) → one
                           // hash-agg → TakeOrdered
    "q159_burstiness",     // two chained aggregates + TakeOrdered
    "q160_score_percentile", // histogram window + (source, score) join-back
    "q161_dedup_threshold_sweep", // banded candidate join → three agg tiers
    "q162_zorder_layout",  // bit-interleave projection + one aggregate
    "q163_ccnet_mix",      // q113 buckets + hash-rate admission roll-up
    "q164_cohort_retention", // broadcast anchor + user-keyed cohort join
    "q165_rfm_segments",   // three histogram-percentile passes, one
                           // bounded user frame
    "q166_decode_stats",   // the real mapPartitions decode boundary —
                           // no join, no shuffle
    "q167_event_spikes",   // daily agg → type totals → permille ratio
    "q168_prefix_filter_pairs", // df-ordered prefix equi-join + per-pair
                           // array_intersect verify — exact, no product
    "q169_copurchase_triangles", // degree-oriented wedge join + closing-
                           // edge equi-join; per-node explode agg
    "q170_touch_attribution", // as-of carry window + broadcast-able
                           // first-touch frame; two model aggs
    "q171_shipping_priority", // TPC-H Q3 shape: pushed date filters,
                           // AQE-chosen join strategy, TakeOrdered top-10
    "q172_returned_items", // TPC-H Q10 shape: 3 FK joins, TakeOrdered
    "q173_promo_effect",   // TPC-H Q14 shape: one FK join, global agg
    "q174_bootstrap_ci",   // Poisson-bootstrap explode collapses map-side;
                           // only B partials/partition shuffle; B-row rank
    "q175_calibration",    // one hash-agg reliability diagram over the
                           // literal-weight scored projection
    "q176_bbit_minhash",   // band equi-join candidates + two low-bit
                           // lookup joins on the memoized signatures
    "q177_shard_balance",  // histogram offsets + per-size-class windows —
                           // global ranks with no global sort
    "q178_pareto_front",   // histogram-decomposed 2-D skyline: level agg
                           // + spine running-min + join-back, no O(n²)
    "q179_shard_stability", // mod vs rendezvous relocation audit — pure
                           // projections + one global aggregate
    "q180_quality_auc",    // histogram rank-sum AUC — window only over
                           // the distinct-score spine, corpus never sorts
    "q181_local_supplier_volume", // TPC-H Q5 shape: 6-table join with the
                           // c=s nation co-location predicate
    "q182_large_orders",   // TPC-H Q18 shape: fact agg → HAVING →
                           // dim joins → TakeOrdered top-20
    "q183_oov_curve",      // vocab ranks via histogram offsets + per-
                           // freq-class windows; tier roll-up vocab-sized
    "q184_ordered_funnel", // three chained keyed aggregates, each join
                           // side key-sized after the first
    "q185_rrf_fusion",     // hybrid RRF: corpus work in the retrievers,
                           // fusion windows over ≤ Σk candidate rows
    "q186_waiting_suppliers", // TPC-H Q21 shape: broadcast dim →
                           // semi-join → anti-join → TakeOrdered
    "q187_zipf_fit",       // vocab hash-agg → TakeOrdered top-200 →
                           // bounded OLS fold (no global vocab sort)
    "q188_heaps_curve",    // first-appearance MIN agg + broadcast
                           // checkpoint range join at vocab size
    "q189_dp_release",     // one hash-aggregate; seeded Laplace noise
                           // is a projection on the released cells
    "q190_join_size_est",  // per-key counts built once (exchange reuse),
                           // totals + TakeOrdered HH branches roll up
    "q191_pass_at_k",      // two chained hash-aggregates; the binomial
                           // ratio is an exact-integer projection
    "q192_mad_outliers",   // two key-shuffled percentile aggs with
                           // broadcast group-stat joins back
    "q193_benford_audit",  // one hash-aggregate; digits + χ² are
                           // projections with literal expectations
    "q194_fuzzy_match",    // blocked equi-join + codegen'd JW projection
                           // + per-record argmax window
    "q195_rolling_window", // interval RANGE frame, one customer-key
                           // shuffle, no join
    "q196_lsh_tuning",     // literal-only S-curve integral — no scan,
                           // few-row aggregate
    "q197_loo_source_value", // one corpus agg + 1-row broadcast;
                           // group algebra, no per-source rescan
    "q198_phrase_match",   // HOF projection + filter — zero shuffles
    "q199_audio_vad",      // mapPartitions decode boundary, per-row
                           // integer gate — zero shuffles
    "q200_column_profile", // one melt explode + two partial-aggregable
                           // hash aggregates; modal value is max(struct)
    "q201_merkle_diff",    // per-side bucket XOR digests + a
                           // |buckets|-row reconciliation join
    "q202_deletion_audit", // broadcast deletion list → semi/anti counts
                           // per fact table, no subject-key shuffle
    "q203_k_anonymity",    // class hash-agg → one-row risk fold
    "q204_l_diversity",    // two chained aggregates, all partial
    "q205_span_corruption", // position explode → doc-keyed island window
                           // + span agg → doc-keyed join back
    "q206_late_interaction", // bounded query chunks broadcast into a
                           // dim-keyed join; MaxSim + Σ folds
    "q207_order_priority", // TPC-H Q4 shape: non-equi EXISTS → semi join
                           // over quarter-pruned orders
    "q208_volume_shipping", // TPC-H Q7 shape: broadcast supplier dim,
                           // shuffled customer side, pair filter post-join
    "q209_market_share",   // TPC-H Q8 shape: 2 broadcast dims + shuffled
                           // market side; conditional share in one agg
    "q210_customer_distribution", // TPC-H Q13 shape: outer join kept,
                           // count → histogram double aggregate
    "q211_small_qty_revenue", // TPC-H Q17 shape: de-correlated per-part
                           // stats broadcast back onto the lines
    "q212_disjunctive_join", // TPC-H Q19 shape: extracted equi-key join,
                           // per-side conjuncts pushed, OR post-filter
    "q213_sales_opportunity", // TPC-H Q22 shape: 1-row avg broadcast +
                           // date-pruned anti join
    "q214_fellegi_sunter", // FS linkage: blocked pair join + 1-row u-stat
                           // broadcast; weights are pure projections
    // q215_textrank: checkpoint scan — rendered as a special frame below
    "q216_kneser_ney",     // KN smoothing: three chained model hash-aggs,
                           // vocabulary-keyed LEFT joins, 1-row total
    "q217_rouge_pairs",    // clipped-overlap: (id, gram) equi-joins off
                           // one collapsed gram-count frame
    "q218_mrl_dim_curve",  // prefix-dim recall: one scan, tier explode,
                           // (tier, qid) rank window
    "q219_unimax_alloc",   // water-filling: one corpus agg, then
                           // |languages|-row window + 1-row broadcasts
    "q220_token_entropy",  // two chained hash-aggs, no join/window
    "q221_padding_waste",  // length-histogram agg; explodes/windows on
                           // |distinct lengths| rows only
    "q222_source_jsd",     // one (source, bucket) agg; broadcast spine
    // q223/q224/q225 graph-ANN: checkpoint scans — rendered as a special
    // frame below (one unexecuted beam-search round)
    "q226_filter_agreement", // two rater projections, one doc_id join,
                            // label-marginal aggs + 1-row attaches
    // q227 BT: checkpoint scan — special frame below (one MM round)
    "q228_paired_bootstrap", // replicate explode projection, map-side
                            // combined per-replicate sums, B-row window
    "q229_bpe_fertility_curve", // one scan, tier explode, tier-keyed agg
    "q230_cluster_audit",  // size-gated (blk, shingle) self-join +
                           // cluster-keyed aggs; shortfall arithmetic
    "q231_simhash_calibration", // sampled truth join + fingerprint lookups
    "q232_incr_simhash",   // id anti join + band equi-join vs the index
    "q233_dedup_method_comparison", // three banded/keyed candidate joins
                           // vs one shared truth frame
    "q234_span_remediation", // q102's islands chain + one id join back
                           // onto token arrays; the cut is a projection
    "q235_dedup_yield_curve", // one exact pair frame, tier explode filter,
                           // victim-id join onto token counts
    "q236_semantic_yield_curve", // cluster-blocked pair join, tier explode
    "q237_temperature_sweep", // one corpus agg, alpha explode, |groups| rows
    "q238_scd2_history",   // two window passes on ONE key partitioning
    "q239_scd2_asof",      // interval predicate + one status rollup
    "q240_rank_correlation", // histogram ranks (windows on |values| rows),
                           // value-keyed lookups, centered 1-row sums
    "q241_mixture_concentration", // one corpus agg, |groups|-row windows
    "q242_good_turing",    // two hash-aggs, then broadcast-only lookups
    "q243_burstiness",     // (term,doc) pre-collapse → term agg → TakeOrdered
    "q244_keyness",        // one (source,token) shuffle; marginals post-agg
    "q245_rank_agreement", // broadcast-sized past the shared retrievers
    // q246_hits: checkpoint scan — one phase rendered as a special frame
    // q248_personalized_pagerank: checkpoint scan — per-iteration shape is
    // q87's special frame with the uniform base swapped for a node-keyed
    // base-frame join (same shuffle count)
    "q247_adamic_adar",    // capped wedge centers → anti-join → TakeOrdered
    "q249_rfm_segments",   // nation-grain ntile windows, no range exchange
    "q250_event_acf",      // minute-grain shift joins, 1-row totals broadcast
    "q251_mcv_selectivity", // one histogram agg; MCV set rides a broadcast
    "q252_event_transitions", // user-grain LAG + broadcast from-totals
    "q253_churn_survival", // KM windows on the duration histogram
    "q254_time_to_convert", // user-keyed firsts, MIN aggs, 1-row totals
    "q255_reorder_intervals", // customer-grain LAG, no join side
    "q256_basket_lift",    // pair agg + keyed part totals + TakeOrdered
    "q257_abc_classes",    // brand-grain Pareto windows, broadcast dim
    "q258_ship_delay_sla", // one fact-key join, priority-grain percentiles
    "q259_error_rate_wilson", // one hour-grain agg + closed-form projection
    "q260_length_ks",      // (group,value)-spine ECDF windows + pair join
    "q261_activity_streaks", // user-grain islands window, no join
    "q262_ordered_funnel", // chained user-keyed MIN aggregates
    "q263_dim_profile",    // posexplode + one |dims|-row moment agg
    "q264_dim_correlation", // hash-gated pair join + broadcast marginals
    "q265_frequent_triples", // Apriori semi-join prune + broadcast verify
    "q266_grouping_sets",  // one Expand pass for three grouping sets
    "q267_type_hour_chi2", // one cell agg; margin-sized spine, no SMJ
    "q268_forecast_backtest", // filled-spine shift joins per lag tier
    "q269_top_paths",      // one fused user-grain window + TakeOrdered
    "q270_backlog_curve",  // delta-histogram running sum, facts never sort
    "q271_theil_decomposition", // chained hash-aggs, milli-nat terms
    "q272_order_dispersion", // two chained hash-aggs, one row out
    "q273_calibration",    // frozen-weight scoring + one bin hash-agg
    "q274_brier_decomposition", // rows + bins + one-row combine
    "q275_referential_integrity", // distinct-key anti-joins per FK edge
    "q276_vocab_coverage", // vocab-frame rank windows + broadcast spine
    "q277_partition_skew", // two chained hash-aggs, one summary row
    "q278_nearest_click",  // one key shuffle, two-direction window carry
    "q279_dau_mau",        // (day,user) collapse + two roll-ups, no window
    "q280_rolling_return", // offset-spine semi-join on the (day,user) set
    "q281_change_points",  // filled-frame prefix windows + TakeOrdered
    "q282_simhash64",      // one explode + one 64-bit-sum hash-agg
    "q283_incr_simhash64", // id anti join + 16-bit band equi-joins
    "q284_unigram_train",  // vocab-sized rounds: match grid + walk + prune
    "q285_unigram_fertility", // distinct words segment once, counts re-attach
    "q286_tokenizer_compare", // three bounded fertility aggregates
    "q287_knn_maintain_search", // incr edges → monotone merge → beam walk
    "q288_payload_drift", // span broadcast + key explode + two hash-aggs
    "q289_audience_overlap", // O(k) KMV sketch agg + sketch-sized pair ops
    "q291_seasonal_mase", // event-grain agg -> calendar-sized spine windows
    "q292_hdr_quantiles", // one histogram agg; rank selection histogram-sized
    "q293_seasonal_decompose", // spine windows + broadcast seasonal join
    "q294_dhash_neardup", // HOF fingerprints; band-blocked pair join
    "q295_retrieval_ndcg", // bucket probe vs broadcast graded truth
    "q296_clustering_depth", // metadata-sized zone-map boundary sweep
    "q297_hyperanf", // per-round: adj join + O(k) array-merge sketch agg
    "q298_crypto_shred", // HOF keystream cipher; subject-keyed joins only
    "q299_ab_chi2", // two chained conditional-count aggregates
    "q300_session_paths", // tag+rank windows -> path agg -> TakeOrdered
    "q301_weekday_heatmap", // cell agg + broadcast total + 168-row window
    "q305_tokenizer_compare4", // four bounded fertility aggregates
    "q306_basket_rules",   // basket-list pair explode + broadcast counts + TakeOrdered
    "q307_community_modularity", // LPA labels + degree/label joins + scalar roll-ups
    "q308_item_neighbors", // pair explode + broadcast counts + per-item rank
    "q309_cluster_silhouette", // cell explode vs broadcast centroids + 2-row rank
    "q311_next_order_items", // customer-keyed lead window + guarded item joins + TakeOrdered
    "q312_shot_boundaries", // frame fp scan + id-keyed lag window + one agg
    "q313_range_selectivity", // one percentile agg + broadcast boundaries + conditional scan
    "q314_modularity_refine", // (node, nbr-label) agg + label joins + map-side argmax
    "q316_neyman_allocation", // one moment agg + broadcast totals, no window
    "q318_small_qty_revenue", // decorrelated: TWO per-partkey agg joins (no subquery survives)
    "q319_promo_suppliers", // semi-join chain + left-outer windowed agg (count-bug guard)
    "q310_audio_chroma_neardup", // chroma HOF projection; (window, band)-blocked pair join
    "q320_audio_chroma_incremental", // id anti-join + batch-sized blocked index probe
    "q321_audio_segments", // chroma scan + id-keyed lag window + one agg, no join
    "q327_sole_blame_suppliers", // EXISTS/NOT-EXISTS → keyed semi + anti joins
    "q328_dormant_rich_customers", // merged scalar-agg gates + keyed anti join
    "q329_min_cost_supplier", // correlated MIN → per-part min-agg + equi-join back
    "q331_conformal_sets", // hash-agg spine order statistic + tiny-α broadcast folds
    "q332_supplier_relation_count" // NOT IN → null-aware broadcast anti join + 2-level distinct
    // (q323/q325 return checkpoint scans — their round plans are
    // rendered separately below, the q87/q94 convention; q330's output
    // is a driver-local ≤bins-row frame — its corpus-side scan is
    // q175's single hash-aggregate histogram, already rendered)
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out   = if (args.length > 1) args(1) else "PLANS.md"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // sized past the query suite so repeated passes never recompile
      // generated classes (see Bench.scala)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of the headline queries\n\n")
    sb.append(s"Generated by `graft.Explain` at `$sfDir`. Load-bearing plan\n")
    sb.append("properties are asserted in `PlanAuditSpec`; regenerate after\n")
    sb.append("plan-affecting changes.\n")
    Headline.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.count() // finalize AQE so the plan shows what actually ran
      sb.append(s"\n## $name\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      sb.append("```\n")
    }
    // q87's returned frame is a checkpoint scan with no plan left to read;
    // the load-bearing plan is ONE power iteration over the same graph
    locally {
      val it = graft.ext.Graphs.iterationPlanFrame(
        graft.queries.ExtensionQueries.pagerankEdges(spark, sfDir), "src", "dst")
      it.count()
      sb.append(s"\n## q87_pagerank (one power iteration)\n\n```\n")
      sb.append(it.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      sb.append("```\n")
    }
    // q302's query frame serves from QueryCaches.videoPairsFor (a cache
    // scan); the load-bearing plan is the operator over the same corpus
    locally {
      val vp = graft.ext.Multimodal.videoDhashNearDups(
        graft.queries.ExtensionQueries.videoCorpus(spark, sfDir),
        "doc_id", "text", n = 4, frameBytes = 96, maxHamming = 3, minShared = 3)
      sb.append(s"\n## q302_video_dhash_neardup (operator plan)\n\n```\n")
      sb.append(vp.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      sb.append("```\n")
    }
    // q246's returned frame is a checkpoint scan (the q87 pattern); the
    // load-bearing plan is ONE HITS phase over the same citation graph
    locally {
      val it = graft.ext.Graphs.hitsPhasePlanFrame(
        graft.queries.ExtensionQueries.pagerankEdges(spark, sfDir), "src", "dst")
      it.count()
      sb.append(s"\n## q246_hits (one auth phase + L1 normalize)\n\n```\n")
      sb.append(it.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      sb.append("```\n")
    }
    // q111 runs the same loop over idDictionary-encoded long keys; its
    // load-bearing plan is the dictionary+encode+one-iteration frame
    locally {
      val it = graft.ext.Graphs.iterationPlanFrameEncoded(
        graft.queries.ExtensionQueries.pagerankEdges(spark, sfDir), "src", "dst")
      it.count()
      sb.append(s"\n## q111_pagerank_encoded (dictionary + one power iteration)\n\n```\n")
      sb.append(it.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      sb.append("```\n")
    }
    // q215's returned frame is a checkpoint scan (the q87 pattern); the
    // load-bearing plan is ONE power iteration over the word graph
    locally {
      val it = graft.ext.Graphs.iterationPlanFrame(
        graft.ext.TextStats.wordCoocEdges(
          graft.Tables.documents(spark, sfDir), "text", window = 2),
        "src", "dst")
      it.count()
      sb.append(s"\n## q215_textrank (one power iteration over the word graph)\n\n```\n")
      sb.append(it.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      sb.append("```\n")
    }
    // q223/q224's returned frames are checkpoint scans; the load-bearing
    // plan is ONE beam-search round (entry scoring → beam window →
    // adjacency expand → candidate re-score)
    locally {
      val emb = graft.Tables.embeddings(spark, sfDir)
      val cs = emb.filter(org.apache.spark.sql.functions.col("vec_id") >= 10)
      val it = graft.ext.VectorSearch.graphSearchRoundPlanFrame(
        emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10), cs,
        graft.ext.VectorSearch.knnGraph(cs,
          "vec_id", "embedding", k = 3, bits = 6, maxBucketSize = 64),
        graft.ext.VectorSearch.bucketEntryPoints(cs, "vec_id", "embedding", 6),
        "vec_id", "embedding", "vec_id", "embedding", beam = 8)
      it.count()
      sb.append(s"\n## q223_graph_ann (one beam-search round)\n\n```\n")
      sb.append(it.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      sb.append("```\n")
    }
    // q227's returned frame is a checkpoint scan; the load-bearing plan
    // is ONE Bradley–Terry MM round over the preference pairs
    locally {
      val pairs = graft.ext.TextDedup.lshCandidates(
        graft.queries.QueryCaches.sigFor(spark, sfDir), "doc_id",
        k = 8, rowsPerBand = 2)
        .select(org.apache.spark.sql.functions.col("id_a").as("w"),
          org.apache.spark.sql.functions.col("id_b").as("l"))
      val it = graft.ext.Preference.btRoundPlanFrame(pairs, "w", "l")
      it.count()
      sb.append(s"\n## q227_bt_preferences (one MM round)\n\n```\n")
      sb.append(it.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      sb.append("```\n")
    }
    // q290's returned frame is a checkpoint scan; the load-bearing plan
    // is ONE k-core peel round (survivor joins + degree agg + LeftAnti)
    locally {
      val li = graft.Tables.lineitem(spark, sfDir)
        .select(org.apache.spark.sql.functions.col("l_orderkey").as("o"),
          org.apache.spark.sql.functions.col("l_partkey").as("p")).distinct()
      val ed = li.as("x").join(li.as("y"),
          org.apache.spark.sql.functions.col("x.o") === org.apache.spark.sql.functions.col("y.o") &&
            org.apache.spark.sql.functions.col("x.p") < org.apache.spark.sql.functions.col("y.p"))
        .select(org.apache.spark.sql.functions.col("x.p").as("src"),
          org.apache.spark.sql.functions.col("y.p").as("dst"))
      val it = graft.ext.Graphs.kCoreRoundPlanFrame(ed, "src", "dst", k = 80)
      it.count()
      sb.append(s"\n## q290_kcore (one peel round)\n\n```\n")
      sb.append(it.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      sb.append("```\n")
    }
    // q130's returned frame is a checkpoint scan; the load-bearing plan is
    // ONE synchronous LPA round over the same graph
    locally {
      val it = graft.ext.Graphs.lpRoundPlanFrame(
        graft.queries.ExtensionQueries.pagerankEdges(spark, sfDir), "src", "dst")
      it.count()
      sb.append(s"\n## q130_label_prop (one LPA round)\n\n```\n")
      sb.append(it.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      sb.append("```\n")
    }
    // q117's returned frame is a checkpoint scan (the bounded result is
    // eagerly materialized so the candidate cache can be released); the
    // load-bearing plan is the candidate broadcast + qid-keyed selection
    locally {
      val emb = graft.Tables.embeddings(spark, sfDir)
      val cv = graft.ext.VectorSearch.mmrCandidateVectors(
        emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10),
        emb.filter(org.apache.spark.sql.functions.col("vec_id") >= 10),
        "vec_id", "embedding", "vec_id", "embedding", candK = 10)
      val sel = graft.ext.VectorSearch.mmrSelect(cv, k = 3, lambdaPermille = 700L)
      sel.count()
      sb.append(s"\n## q117_mmr_rerank (candidate attach + greedy selection)\n\n```\n")
      sb.append(sel.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      sb.append("```\n")
    }
    // q151's returned frame is driver-local (k collected rows); the
    // load-bearing plan is one selection round: literal-chosen min-dist
    // fold + TakeOrdered(1)
    locally {
      val rd = graft.ext.VectorSearch.kCenterRoundPlanFrame(
        graft.Tables.embeddings(spark, sfDir), "vec_id", "embedding")
      rd.count()
      sb.append(s"\n## q151_kcenter_select (one selection round)\n\n```\n")
      sb.append(rd.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      sb.append("```\n")
    }
    // q94's returned frame is a driver-local merge table; the load-bearing
    // plan is one trainer round (weighted pair count + TakeOrdered winner)
    locally {
      val rd = graft.ext.TextStats.bpeTrainRoundPlanFrame(
        graft.Tables.documents(spark, sfDir), "text")
      rd.count()
      sb.append(s"\n## q94_bpe_train (one trainer round)\n\n```\n")
      sb.append(rd.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      sb.append("```\n")
    }
    // q304's returned frame is a driver-local merge table (the q94
    // situation); the load-bearing plan is one WordPiece trainer round —
    // weighted pair count + two BROADCAST unit-count joins + the staged
    // likelihood division + TakeOrdered winner
    locally {
      val rd = graft.ext.TextStats.wordpieceTrainRoundPlanFrame(
        graft.Tables.documents(spark, sfDir), "text")
      rd.count()
      sb.append(s"\n## q304_wordpiece_train (one trainer round)\n\n```\n")
      sb.append(rd.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      sb.append("```\n")
    }
    // q317's returned frame is a driver-local credit table; the
    // load-bearing plan is the journey→transition-count build — one
    // user-keyed window pass + one (src, dst) hash-aggregate
    locally {
      val rd = graft.ext.Attribution.transitionCounts(
        graft.Tables.events(spark, sfDir), "user_id", "ts", "event_id",
        "event_type", "purchase")
      rd.count()
      sb.append(s"\n## q317_markov_attribution (transition build)\n\n```\n")
      sb.append(rd.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      sb.append("```\n")
    }
    // q323/q325 return eager localCheckpoint frames (a bare ExistingRDD
    // scan renders nothing); the load-bearing plans are their exposed
    // one-round frames
    locally {
      val ed = graft.Tables.lineitem(spark, sfDir)
        .select(org.apache.spark.sql.functions.col("l_orderkey").as("src"),
          org.apache.spark.sql.functions.col("l_partkey").as("dst"))
      val h = graft.ext.Graphs.harmonicRoundPlanFrame(ed, "src", "dst", k = 32)
      sb.append(s"\n## q323_harmonic_centrality (one sketch-merge round)\n\n```\n")
      sb.append(h.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      sb.append("```\n")
      val bw = graft.ext.Graphs.betweennessRoundPlanFrame(ed, "src", "dst", pivots = 6)
      sb.append(s"\n## q325_betweenness (one BFS level)\n\n```\n")
      sb.append(bw.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      sb.append("```\n")
    }
    // q124's returned frame is a driver-local weight table; the
    // load-bearing plan is one gradient round — a single partial+final
    // 6-column hash aggregate over the codegen'd sigmoid projection
    locally {
      val corpus = graft.ext.Classifier.weakLabelCorpus(
        graft.Tables.documents(spark, sfDir), "doc_id", "text")
      val feats = graft.ext.Classifier.lrFeatures(
        corpus, "doc_id", "text",
        org.apache.spark.sql.functions.col("y") === 1L)
      val g = graft.ext.Classifier.lrGradientFrame(
        feats, Seq.fill(graft.ext.Classifier.numFeatures)(0L))
      g.count()
      sb.append(s"\n## q124_quality_lr_train (one gradient round)\n\n```\n")
      sb.append(g.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      sb.append("```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    graft.queries.QueryCaches.clear(spark)
    spark.stop()
  }
}
