package graft.queries

import graft.{SparkFunSuite, SparkEntry}

/** Physical-plan audits (SURVEY.md §4): the properties that make these
  * plans survive a 100× scale-up are asserted here, so a regression in
  * pushdown / broadcast / top-k fusion fails the build, not just the bench.
  */
class PlanAuditSpec extends SparkFunSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q02: filter and projection reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag), IsNotNull(l_shipdate), EqualTo(l_returnflag,R)"),
      s"filters not pushed:\n$p")
    // column pruning: scan reads only the 5 needed source columns
    // (4 projected + the filter column); the other 11 are pruned
    assert(p.contains("FileScan parquet [l_orderkey#"), s"unexpected scan shape:\n$p")
    assert(!p.contains("l_quantity") && !p.contains("l_tax") && !p.contains("l_suppkey"),
      s"columns not pruned:\n$p")
  }

  test("q09/q11: dimension joins are broadcast, not shuffled") {
    assert(plan("q09_trending").contains("BroadcastHashJoin"))
    val p11 = plan("q11_region_revenue")
    assert(p11.split("BroadcastHashJoin").length >= 4, // 3 dim joins
      s"expected 3 broadcast joins:\n$p11")
    assert(!p11.contains("SortMergeJoin"))
  }

  test("q17: ORDER BY + LIMIT fuses into TakeOrderedAndProject") {
    assert(plan("q17_topk_orders").contains("TakeOrderedAndProject"))
  }

  test("q01: aggregation is partial+final hash aggregate (map-side combine)") {
    val p = plan("q01_pricing_summary")
    assert(p.split("HashAggregate").length >= 3, s"expected partial+final:\n$p")
  }

  test("q06: latest-row window keeps a single exchange on the key") {
    val p = plan("q06_latest_event")
    assert(p.split("Exchange").length - 1 == 1, s"expected exactly 1 shuffle:\n$p")
  }

  test("q13: as-of join is one shuffle on the key (no cross/theta join)") {
    val p = plan("q13_asof_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"as-of join must not fall back to a product join:\n$p")
  }

  test("q24: shingle pair join is an equi-join with partial+final pair count") {
    val p = plan("q24_ngram_jaccard")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pair enumeration must stay an equi-join:\n$p")
    assert(p.split("HashAggregate").length >= 3, s"pair count must map-side combine:\n$p")
  }

  test("q26: native graft_dot expression is in the plan") {
    assert(plan("q26_cosine_topk").contains("graft_dot"))
  }

  test("q45: tf aggregate is partial+final; df comes from a token window, not a self-join") {
    val p = plan("q45_tfidf_top")
    assert(p.split("HashAggregate").length >= 3, s"expected partial+final aggs:\n$p")
    assert(p.contains("Window"), s"df_docs must come from the token window:\n$p")
    // the only join is the intentional 1-row corpus-size broadcast; a
    // SortMergeJoin would mean the tf⋈df self-join crept back in
    assert(!p.contains("SortMergeJoin"), s"tf frame must not be recomputed via a self-join:\n$p")
  }

  test("q59: raw-timestamp predicate prunes day partitions via the hidden-partitioning rewrite") {
    val p = plan("q59_layout_pruning")
    // the rewrite must surface ts_day bounds as PartitionFilters on the scan
    assert(p.contains("PartitionFilters") && p.contains("ts_day"),
      s"expected derived ts_day partition filters:\n$p")
    assert(p.contains("(ts_day") && p.contains(">= 2024-01-03") && p.contains("<= 2024-01-04"),
      s"expected day-grain bounds from the timestamp literals:\n$p")
  }

  test("q28: LSH bucket guard is a broadcast count join, not a corpus-wide window") {
    val p = plan("q28_ann_lsh")
    // the withdrawn (regression) form computed bucket sizes as
    // count(*) OVER (PARTITION BY __bkt) — a full corpus exchange+sort.
    // The guard must never reintroduce a window keyed on the bucket:
    assert(!p.contains("windowspecdefinition(__bkt"),
      s"bucket guard reverted to a corpus-wide window:\n$p")
    // exactly two row exchanges: the ≤2^bits pre-aggregated bucket counts
    // (narrow rows, map-side partial first) and the final per-query top-k
    // window on qid; the corpus branch itself is never repartitioned
    val exchanges = p.split("Exchange hashpartitioning\\(").toSeq.drop(1).map(_.take(6))
    assert(exchanges.length == 2 && exchanges.exists(_.startsWith("qid")) &&
      exchanges.exists(_.startsWith("__bkt")),
      s"expected exactly {bucket-count, qid-window} exchanges, got $exchanges:\n$p")
    assert(p.contains("partial_count"), s"bucket counts must map-side combine:\n$p")
    // the count frame reaches the corpus as a broadcast, and the sub-bucket
    // predicate rides the equi-join as a residual (cnt<=cap OR csub=qsub)
    assert(p.contains("BroadcastExchange") && p.contains("__cnt") && p.contains("__csub"),
      s"guard must broadcast counts and keep the residual sub-bucket predicate:\n$p")
    // per-partition top-k prune before the qid exchange: only ~k rows per
    // (query, partition) are shuffled, not every candidate pair
    assert(p.contains("WindowGroupLimit"), s"top-k must prune before the shuffle:\n$p")
  }

  test("q27: near-dup bucket guard broadcasts counts; pair join needs no corpus exchange") {
    val p = plan("q27_embedding_neardup")
    assert(!p.contains("windowspecdefinition"),
      s"bucket guard reverted to a corpus-wide window:\n$p")
    // the only row exchanges are the narrow bucket-count aggregates on __b
    // (one per self-join side); the full-width corpus rows flow from scan
    // to the pair join without repartitioning
    val exchanges = p.split("Exchange hashpartitioning\\(").toSeq.drop(1).map(_.take(3))
    assert(exchanges.nonEmpty && exchanges.forall(_.startsWith("__b")),
      s"expected only __b bucket-count exchanges, got $exchanges:\n$p")
    assert(p.contains("partial_count") && p.contains("BroadcastExchange"),
      s"bucket counts must map-side combine and broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pair enumeration must stay an equi-join:\n$p")
  }

  test("q50: centroid cells join is broadcast; assignment is hash-agg + single argmin window") {
    val p = plan("q50_centroid_assign")
    assert(p.contains("BroadcastHashJoin"), s"centroid join must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"assignment must not fall back to a product join:\n$p")
  }

  test("q61: holdout digests and hit counts broadcast; train side never re-partitions") {
    val p = plan("q61_decontaminate")
    // two broadcasts: the distinct holdout digest set into the hit join,
    // and the per-doc hit counts back onto the train frame
    assert(p.split("BroadcastHashJoin").length >= 3, s"expected 2 broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"train side must not shuffle for the joins:\n$p")
  }

  test("q62: sequence packing is one shard exchange + in-partition sort, never a global sort") {
    val p = plan("q62_seq_pack")
    assert(p.contains("Window"), s"expected a window plan:\n$p")
    // hash partitioning on shard, not rangepartitioning (a global sort)
    assert(p.contains("Exchange hashpartitioning(shard"),
      s"packing must hash-partition by shard:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"packing must not globally sort:\n$p")
  }

  test("q64: BM25 stats broadcast and top-k is rank-limited before the final window") {
    val p = plan("q64_bm25_topk")
    assert(p.contains("BroadcastExchange"), s"df/corpus stats must broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"), s"top-k must group-limit, not full-sort:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffled join belongs in this plan:\n$p")
  }

  test("q67: sign projection is a pure projection (no exchange at all)") {
    val p = plan("q67_sign_projection")
    assert(!p.contains("Exchange"), s"projection must not shuffle:\n$p")
  }

  test("q72/q73: chunking and quantization are per-row projections (no exchange)") {
    val p72 = plan("q72_doc_chunks")
    // docsSpread's deliberate wiring-level repartition is the ONLY exchange;
    // the operator itself adds none
    assert(p72.split("Exchange").length - 1 == 1, s"chunking must not shuffle:\n$p72")
    assert(!plan("q73_quantize_int8").contains("Exchange"),
      s"quantization must not shuffle:\n${plan("q73_quantize_int8")}")
  }

  test("q74: quantized retrieval broadcasts queries; corpus shuffles only for the rank") {
    val p = plan("q74_quantized_topk")
    assert(p.contains("BroadcastExchange") && !p.contains("SortMergeJoin"),
      s"query side must broadcast:\n$p")
    // the one shuffle is the per-query rank partition, not a corpus re-partition
    assert(p.split("ShuffleExchange").length - 1 <= 1, s"corpus must not re-partition:\n$p")
    assert(p.contains("WindowGroupLimit"), s"top-k must group-limit, not full-sort:\n$p")
  }

  test("q77: contrastive pairs use a lead window, never a chunk self-join") {
    val p = plan("q77_contrastive_pairs")
    assert(!p.contains("Join"), s"adjacent pairing must not self-join:\n$p")
    // docsSpread's wiring repartition + the per-doc window shuffle
    assert(p.split("Exchange").length - 1 <= 2, s"expected at most 2 exchanges:\n$p")
  }

  test("q76: mixture sampling is a pure filter (no exchange, no join)") {
    val p = plan("q76_mixture_sample")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"rate table must fold into the filter:\n$p")
  }

  test("q83: simhash banding is an equi-join on (band, band_val), never a product") {
    val p = plan("q83_simhash_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pigeonhole candidates must come from an equi-join:\n$p")
    // the simhash bit sums must map-side combine before the per-doc agg
    assert(p.split("HashAggregate").length >= 3, s"bit sums must partially aggregate:\n$p")
  }

  test("q84: bloom probe side has no join and no shuffle beyond the per-doc projection") {
    // audit the OPERATOR (the sketch-side scale path), not the composed
    // query (whose exact-overlap branch legitimately joins for the oracle)
    val docs  = graft.Tables.documents(spark, sf)
    val bloom = graft.ext.Decontaminate.holdoutBloom(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0),
      "doc_id", "text", shingleN = 3, numBits = 1 << 15, numHashes = 5)
    val p = graft.ext.Decontaminate
      .bloomContamination(docs, bloom, "doc_id", "text", shingleN = 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join") && !p.contains("Exchange"),
      s"bloom contamination must be a zero-shuffle projection:\n$p")
  }

  test("q85: snapshot diff is one full-outer key join over the two snapshot reads") {
    val p = plan("q85_snapshot_diff")
    assert(p.contains("FullOuter"), s"diff must full-outer join the snapshots:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"diff must stay a key equi-join:\n$p")
  }

  test("q86: BPE pair ranking sorts only the bounded pair aggregate") {
    val p = plan("q86_bpe_pairs")
    // partial+final count on the pair key, then a single-partition rank over
    // the alphabet²-bounded aggregate — the corpus itself is never sorted
    assert(p.split("HashAggregate").length >= 3, s"pair counts must map-side combine:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"ranking must not globally sort the corpus:\n$p")
  }

  test("q65: token budget windows the corpus per (stratum, shard), never per stratum alone") {
    val p = plan("q65_token_budget")
    // the corpus-scale exchange is keyed on (source, __shard) — a hot
    // stratum spreads over 16 tasks instead of sorting in one
    assert("hashpartitioning\\(source#\\d+, __shard#".r.findFirstIn(p).isDefined,
      s"corpus window must hash-partition by (source, __shard):\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"budget admission must never globally sort:\n$p")
    // the per-source exact-cum window sits ABOVE the in-shard budget cap,
    // so it only ever sorts the bounded candidate set (≤ ~16 budgets/stratum)
    val iSrcOnly  = "hashpartitioning\\(source#\\d+, \\d+\\)".r
      .findFirstMatchIn(p).map(_.start).getOrElse(-1)
    val iCap      = p.indexOf("__cum_shard")
    val iSharded  = "hashpartitioning\\(source#\\d+, __shard#".r
      .findFirstMatchIn(p).map(_.start).getOrElse(-1)
    assert(iSrcOnly >= 0 && iCap >= 0 && iSrcOnly < iCap && iCap < iSharded,
      s"per-source window must consume the in-shard-capped frame:\n$p")
  }

  test("q69: budget verdict broadcasts the bounded admitted set onto the corpus") {
    val p = plan("q69_curation_pipeline")
    assert("hashpartitioning\\(source#\\d+, __shard#".r.findFirstIn(p).isDefined,
      s"budget stage must hash-partition by (source, __shard):\n$p")
    // the admitted ids come back via broadcast — the corpus side never
    // shuffles for the verdict join
    assert(p.contains("BroadcastHashJoin"),
      s"admitted-set join must broadcast:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"no global sort belongs in the curation plan:\n$p")
  }

  test("q112: v2 curation keeps the q69 shape with the semantic stage memoized") {
    val p = plan("q112_curation_v2")
    // the verdict plan reads the persisted v2 meta frame (the heavy
    // paragraph/semantic chain ran once inside the cache builder), then
    // runs the shard-decomposed budget windows + a broadcast verdict join
    assert("hashpartitioning\\(source#\\d+, __shard#".r.findFirstIn(p).isDefined,
      s"budget stage must hash-partition by (source, __shard):\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"admitted-set join must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no product join belongs in the curation plan:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"no global sort belongs in the curation plan:\n$p")
  }

  test("q113: perplexity buckets window the histogram, never the corpus") {
    val p = plan("q113_perplexity_buckets")
    // the cumulative window partitions by source over the ≤1001-row
    // per-source score histogram (post-aggregate), and the cutoff frame
    // joins back broadcast — no rank/ntile window over document rows
    assert(!p.contains("Exchange rangepartitioning"),
      s"no global sort belongs in the bucket plan:\n$p")
    assert(!p.toLowerCase.contains("ntile"),
      s"rank-based ntile would sort each source in one task:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"score-cutoff frame must broadcast back onto the scored corpus:\n$p")
  }

  test("q114: gopher signals are projections plus doc-keyed aggregates only") {
    val p = plan("q114_gopher_rules")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no product join belongs in the signal plan:\n$p")
    assert(!p.contains("Exchange rangepartitioning") && !p.contains("Window"),
      s"signals must not sort or window the corpus:\n$p")
  }

  test("q115: DSIR model broadcasts into scoring; no windows, no corpus-sized join") {
    val p = plan("q115_dsir_weights")
    // the ≤buckets-row likelihood-ratio model joins broadcast; scoring is
    // (doc, bucket) + doc-keyed hash aggregates, map-side combinable
    assert(p.contains("BroadcastHashJoin"),
      s"the bucket model must broadcast into the scoring join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no corpus-sized shuffle join belongs in the scoring plan:\n$p")
    assert(!p.contains("Window") && !p.contains("Exchange rangepartitioning"),
      s"no window/global sort belongs in the scoring plan:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"scoring aggregates must map-side combine:\n$p")
  }

  test("q116: priority sample ranks per (source, shard) before per source") {
    val p = plan("q116_priority_sample")
    // stage 1 hash-partitions by (source, __shard); stage 2's per-source
    // rank only ever sees ≤ shards·k survivors
    assert("hashpartitioning\\(source#\\d+, __shard#".r.findFirstIn(p).isDefined,
      s"first rank must hash-partition by (source, __shard):\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"no global sort belongs in the sampling plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no product join belongs in the sampling plan:\n$p")
  }

  test("q118: DSIR selection keeps both stages' shapes — broadcast model, sharded rank") {
    val p = plan("q118_dsir_select")
    assert(p.contains("BroadcastHashJoin"),
      s"the bucket model must broadcast into the scoring join:\n$p")
    assert("hashpartitioning\\(source#\\d+, __shard#".r.findFirstIn(p).isDefined,
      s"the sampler's first rank must hash-partition by (source, __shard):\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"no global sort belongs in the selection plan:\n$p")
    // the only nested-loop join allowed is the 1-row totals broadcast
    // into the bounded model build (counts × totals)
    assert(!p.contains("CartesianProduct"),
      s"no cartesian product belongs in the selection plan:\n$p")
  }

  test("q121: CMS grid is partial+final aggregate; probes broadcast against it") {
    val p = plan("q121_cms_freq")
    assert(p.split("HashAggregate").length >= 3,
      s"the counter grid must map-side combine:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the probe list must broadcast against the grid:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no product join belongs in the sketch plan:\n$p")
    // the top-20 probe list is localized once (bounded collect) so the
    // corpus spectrum isn't recomputed per reference — the serving plan
    // reads it as a local table
    assert(p.contains("LocalTableScan"),
      s"the probe list must be a localized bounded frame:\n$p")
  }

  test("q38: trained IVF broadcasts centroids and routed queries; no product join") {
    val p = plan("q38_ann_ivf")
    // centroid cells broadcast into assignment + routing, and the routed
    // (qid, list) frame broadcasts into the in-list scan
    assert(p.split("BroadcastHashJoin").length >= 3,
      s"centroids and routed queries must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"IVF must stay equi-joins end to end:\n$p")
  }

  test("q97: semantic dedup pairs come from a cluster equi-join, never a product") {
    val p = plan("q97_semantic_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"within-cluster pairs must stay a cluster-keyed equi-join:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"centroid cells must broadcast into the assignment:\n$p")
  }

  test("q98: IVFADC routes, prunes, and scores through broadcast equi-joins only") {
    val p = plan("q98_ivf_adc")
    // routed lists, ADC LUT, and centroids all broadcast; the corpus-code
    // side joins on (list) then (subspace, code) and never re-sorts
    assert(p.split("BroadcastHashJoin").length >= 4,
      s"routing + LUT + list joins must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"IVFADC must stay equi-joins end to end:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"no global sort belongs in the scan path:\n$p")
  }

  test("q110: nprobe curve scores candidates once; routing broadcasts; only product is the 1-row total") {
    val p = plan("q110_ivf_nprobe_curve")
    // same shape as q38: centroid cells broadcast into assignment AND
    // routing, routed (qid, rrnk, list) broadcasts into the in-list scan
    assert(p.split("BroadcastHashJoin").length >= 3,
      s"centroids and routed queries must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the curve must stay equi-joins:\n$p")
    // nested-loop joins: the exact-cosine TRUTH is brute force by design
    // (broadcast queries × corpus, evaluated for hits and for the
    // denominator) plus the 1-row n_exact frame — the IVF path itself
    // contributes none
    assert(p.split("BroadcastNestedLoopJoin").length - 1 <= 3,
      s"only the brute-force truth + 1-row denominator may cross-join:\n$p")
    // ONE corpus probe serves all four tiers: the tier fan-out is a
    // generator projection, not four scans
    assert(p.contains("Generate explode"),
      s"probe tiers must fan out via explode, not re-scan:\n$p")
  }

  test("q90/q91: PQ codebooks broadcast; ADC LUT join is broadcast, never a product") {
    val p90 = plan("q90_pq_encode")
    assert(p90.contains("BroadcastHashJoin"),
      s"codebook cells must broadcast into the encode join:\n$p90")
    assert(!p90.contains("CartesianProduct") && !p90.contains("BroadcastNestedLoopJoin"),
      s"PQ encode must stay an equi-join:\n$p90")
    val p91 = plan("q91_pq_adc_topk")
    assert(p91.contains("BroadcastHashJoin"),
      s"the queries × subspaces × codewords LUT must broadcast:\n$p91")
    assert(!p91.contains("CartesianProduct") && !p91.contains("BroadcastNestedLoopJoin"),
      s"ADC must stay an equi-join on (subspace, code):\n$p91")
  }

  test("q99: paragraph dedup never joins on the paragraph digest") {
    val p = plan("q99_paragraph_dedup")
    // winners come from a partial+final min(struct) aggregate — the
    // hot-paragraph-safe shape; the ONLY join is the doc-keyed totals⋈kept
    // left join, so a corpus-wide boilerplate paragraph can never flood a
    // join reducer
    assert(p.contains("partial_min(struct(doc_id"),
      s"first-occurrence winners must be a map-side-combined min(struct):\n$p")
    val joinKeys = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[([a-z_]+)#".r
    val keys = joinKeys.findAllMatchIn(p).map(_.group(2)).toSet
    assert(keys == Set("doc_id"), s"only doc-keyed joins belong in this plan, saw $keys:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q100: shingle doc-frequency is partial+final and joins back as an equi-join") {
    val p = plan("q100_dup_shingles")
    assert(p.split("HashAggregate").length >= 5,
      s"distinct + doc-frequency aggregates must map-side combine:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the digest join-back must stay an equi-join:\n$p")
  }

  test("q101: boilerplate detection is one aggregation tree — no joins at all") {
    val p = plan("q101_boilerplate")
    assert(!p.contains("Join"), s"per-source recurrence needs no join:\n$p")
    assert(p.contains("partial_count(distinct doc_id"),
      s"distinct-doc count must be the two-phase expansion:\n$p")
  }

  test("q102: dup-span islands window is doc-keyed; joins are digest/doc equi-joins") {
    val p = plan("q102_dup_spans")
    // the gaps-and-islands row_number partitions by doc_id — its task size
    // is bounded by one document's length, never by corpus duplication
    assert(p.contains("row_number()") && p.contains("windowspecdefinition(doc_id"),
      s"islands window must partition by doc_id:\n$p")
    val joinKeys = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[([a-z_]+)#".r
    val keys = joinKeys.findAllMatchIn(p).map(_.group(2)).toSet
    assert(keys.subsetOf(Set("__h", "doc_id")),
      s"only digest/doc equi-joins belong here, saw $keys:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q103: source overlap joins per-source SETS on the digest; totals broadcast") {
    val p = plan("q103_source_overlap")
    // per-source distinct sets self-join on __h (≤ |sources|² rows per
    // digest); the two totals joins broadcast source-cardinality frames
    assert(p.split("BroadcastHashJoin").length >= 3,
      s"totals must broadcast into the pair frame:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the digest self-join must stay an equi-join:\n$p")
  }

  test("q104: bigram model is pre-collapsed aggregates; scoring stays an equi-join") {
    val p = plan("q104_bigram_fluency")
    // train side: bigram counts + prefix counts, both partial+final
    assert(p.split("HashAggregate").length >= 5,
      s"model aggregates must map-side combine:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"scoring must join on the bigram key only:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"no global sort belongs in a scoring pipeline:\n$p")
  }

  test("q106/q107: corpus audits are pure aggregation trees — no joins, no windows") {
    val p106 = plan("q106_token_spectrum")
    assert(!p106.contains("Join") && !p106.contains("windowspecdefinition"),
      s"count-of-counts is two chained aggregates:\n$p106")
    assert(p106.split("HashAggregate").length >= 5,
      s"both aggregates must map-side combine:\n$p106")
    val p107 = plan("q107_lexical_diversity")
    assert(!p107.contains("Join") && !p107.contains("windowspecdefinition"),
      s"per-source diversity is two chained aggregates:\n$p107")
    assert(p107.split("HashAggregate").length >= 5,
      s"both aggregates must map-side combine:\n$p107")
  }

  test("q108: incremental paragraph dedup probes the index with ONE anti join") {
    val p = plan("q108_incr_paragraph_dedup")
    assert(p.contains("partial_min(struct(doc_id"),
      s"in-batch winners must stay a map-side-combined min(struct):\n$p")
    assert("LeftAnti".r.findAllIn(p).length == 1,
      s"exactly one digest anti join against the index:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q109: LSH calibration stays product-free with map-side-combined aggregates") {
    val p = plan("q109_lsh_recall")
    // the truth side is a shingle equi-join, the candidate side a band
    // equi-join, the curve a partial+final roll-up — a cartesian anywhere
    // would mean the eval degenerated into all-pairs enumeration
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.split("HashAggregate").length >= 3,
      s"decile roll-up must map-side combine:\n$p")
  }

  test("q124: a gradient round is ONE partial+final aggregate — no joins, no windows") {
    // training cost per iteration must be a single map-side-combinable
    // aggregate over the corpus; a join or window here would multiply by
    // the iteration count at 100 TB
    val corpus = graft.ext.Classifier.weakLabelCorpus(
      graft.Tables.documents(spark, sf), "doc_id", "text")
    val feats = graft.ext.Classifier.lrFeatures(
      corpus, "doc_id", "text", org.apache.spark.sql.functions.col("y") === 1L)
    val p = graft.ext.Classifier.lrGradientFrame(
      feats, Seq.fill(graft.ext.Classifier.numFeatures)(0L))
      .queryExecution.executedPlan.toString
    assert(p.split("HashAggregate").length >= 3, s"expected partial+final:\n$p")
    assert(!p.contains("Join") && !p.contains("windowspecdefinition"), p)
  }

  test("q125: scoring is codegen projection; only the 9-row threshold frame broadcasts") {
    val p = plan("q125_quality_pr_curve")
    // frozen weights are literals (no model join); the threshold fan-out
    // is a broadcast of a 9-row local frame; confusion counts map-side
    // combine on the threshold key
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), s"nothing here may shuffle-join:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"confusion counts must map-side combine:\n$p")
  }

  test("q126: epoch shuffle ranks inside hash shards — never a global sort") {
    val p = plan("q126_epoch_shuffle")
    assert(!p.contains("rangepartitioning"),
      s"a global sort would single-task the corpus:\n$p")
    assert(p.contains("hashpartitioning"),
      s"expected the shard-keyed exchange:\n$p")
  }

  test("q127: agreement cross-tab is doc-keyed equi-joins + one partial+final agg") {
    val p = plan("q127_filter_agreement")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"signal joins must stay doc-keyed equi-joins:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"the cross-tab must map-side combine:\n$p")
  }

  test("q128: domain reweighting broadcasts the rate frame; corpus never joins wide") {
    val p = plan("q128_domain_reweight")
    // the grand total is a 1-row broadcast (the suite's aggregate-frame
    // convention) and the per-source rates broadcast back onto the corpus
    // scan — a shuffled corpus-side join here would defeat the point
    assert(p.contains("BroadcastHashJoin"),
      s"rates must broadcast onto the corpus side:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q129: kNN graph blocks on the bucket key — candidate pairs never go product") {
    val p = plan("q129_knn_graph")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the self-join's equi-key IS the blocking key:\n$p")
    // the per-bucket-size guard rides a broadcast (≤ 2^bits rows), never a
    // corpus-wide count window
    assert(p.contains("BroadcastHashJoin"),
      s"bucket counts must broadcast onto the corpus:\n$p")
  }

  test("q131: temperature mix broadcasts rates like q128; corpus never joins wide") {
    val p = plan("q131_temperature_mix")
    assert(p.contains("BroadcastHashJoin"),
      s"rates must broadcast onto the corpus side:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.split("HashAggregate").length >= 3,
      s"before/after stats must map-side combine:\n$p")
  }

  test("q132: curriculum windows are per-source — never a corpus-global sort") {
    val p = plan("q132_curriculum")
    assert(!p.contains("rangepartitioning"),
      s"a global sort would single-task the corpus:\n$p")
    assert(p.contains("hashpartitioning"),
      s"expected source-keyed exchanges for the stage/pos windows:\n$p")
  }

  test("q133: blocklist audit is one scan + one agg — no join side at all") {
    val p = plan("q133_blocklist")
    assert(!p.contains("Join"), s"the literal wordlist must ride in the row expression:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"per-source counts must map-side combine:\n$p")
  }

  test("q134: fertility is one scan + one group-keyed agg — the key rides the explode") {
    val p = plan("q134_tokenizer_fertility")
    assert(!p.contains("Join"),
      s"the per-doc grain would need a join back; the group grain must not:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"per-language sums must map-side combine:\n$p")
  }

  test("q135: outlier audit broadcasts centroids and the 1-row mean — never the corpus") {
    val p = plan("q135_embedding_outliers")
    assert(p.contains("BroadcastHashJoin"),
      s"centroid cells must broadcast onto the corpus side:\n$p")
    assert(!p.contains("CartesianProduct") ||
      p.split("CartesianProduct").length <= 2, // 1-row mean frame may cross-join
      s"only the 1-row mean may cross the corpus:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no corpus-sized shuffle join belongs here:\n$p")
  }

  test("q136: incremental kNN probes by bucket equi-join — never a product join") {
    val p = plan("q136_incr_knn_graph")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the batch must meet the index on the bucket key:\n$p")
  }

  test("q137: centroid update joins only broadcasts and the k×dims frame") {
    val p = plan("q137_kmeans_update")
    assert(p.contains("BroadcastHashJoin"),
      s"centroids/counts must broadcast onto the batch side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q138: dup audit ships 16-byte digests; group counts are aggregate chains") {
    val p = plan("q138_norm_dedup_audit")
    assert(!p.contains("Expand"),
      s"two countDistincts via Expand would triple the scan rows; use agg chains:\n$p")
    assert(p.split("HashAggregate").length >= 3, s"must map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q139: regex flags are one scan + one agg — no join side") {
    val p = plan("q139_license_scan")
    assert(!p.contains("Join"), s"flag patterns must ride the row expression:\n$p")
    assert(p.split("HashAggregate").length >= 3, s"must map-side combine:\n$p")
  }

  test("q140: CDC chunk windows are doc-keyed; sharedness joins on the digest only") {
    val p = plan("q140_cdc_chunks")
    assert(!p.contains("rangepartitioning"),
      s"the running-sum window must stay doc-keyed, never a global sort:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q141: scorecard joins signals on the doc key; the roll-up map-side combines") {
    val p = plan("q141_source_scorecard")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"signal joins must stay doc-keyed equi-joins:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"the per-source roll-up must map-side combine:\n$p")
  }

  test("q142: drift monitor is one token-stream agg; no corpus-sized join or window") {
    val p = plan("q142_token_drift")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.split("HashAggregate").length >= 3,
      s"the (source, bucket) agg must map-side combine:\n$p")
    // the totals window runs over the bounded (source, bucket) frame,
    // AFTER the corpus-collapsing aggregate — assert the aggregate comes
    // first in execution order (appears deeper in the plan tree)
    assert(p.indexOf("Window") < p.lastIndexOf("HashAggregate"),
      s"the window must sit above the bucket aggregate, not the token stream:\n$p")
  }

  test("q143: embedding drift is one corpus scan — no join, no window") {
    val p = plan("q143_embedding_drift")
    assert(!p.contains("Join"),
      s"cohort membership must ride the cell projection, not a join:\n$p")
    assert(!p.contains("Window"), p)
    assert(p.split("HashAggregate").length >= 3,
      s"the (label, dim) agg must map-side combine:\n$p")
  }

  test("q144: cluster spectrum is two chained aggregates over the label cache") {
    // the label cache's BUILD plan (under InMemoryTableScan) legitimately
    // joins; the spectrum itself — everything above the cache scan — must
    // be pure aggregation
    val p = plan("q144_cluster_spectrum").split("InMemoryTableScan").head
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(p.split("HashAggregate").length >= 3,
      s"both levels must map-side combine:\n$p")
  }

  test("q145: pack efficiency is a shard-keyed aggregate over the packing window") {
    val p = plan("q145_pack_efficiency")
    assert(!p.contains("Join"), s"no join belongs in the packing roll-up:\n$p")
    assert(!p.contains("rangepartitioning"),
      s"the prefix-sum window must stay shard-keyed, never a global sort:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"the shard roll-up must map-side combine:\n$p")
  }

  test("q146: frame voting is a (frame_idx, digest)-blocked equi-join") {
    val p = plan("q146_frame_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the pair join must stay blocked on (frame_idx, digest):\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"the pair vote count must map-side combine:\n$p")
  }

  test("q147: PMI marginals join vocab-sized frames; top-k fuses to TakeOrdered") {
    val p = plan("q147_pmi_collocations")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-k must fuse, never a global sort:\n$p")
    // the 1-row token total must broadcast, and the nested-loop join it
    // rides is exactly that broadcast (both join inputs are aggregates,
    // vocab-sized or 1-row — the corpus never enters a join)
    assert(p.contains("BroadcastNestedLoopJoin BuildRight, Cross") ||
      p.contains("BroadcastExchange"),
      s"the token total must ride a broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q148: every JL tier broadcasts queries and group-limits its rank") {
    val p = plan("q148_jl_curve")
    assert(p.contains("BroadcastExchange"), s"query sides must broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"), s"top-k must group-limit, not full-sort:\n$p")
    // the only sort-merge joins allowed are on the bounded qid spine
    // (AQE demotes them to broadcast at runtime); the distance passes
    // themselves must stay keyless broadcast products, never keyed SMJs
    val smjKeys = "SortMergeJoin \\[([a-z_]+)#".r.findAllMatchIn(p).map(_.group(1)).toSet
    assert(smjKeys.subsetOf(Set("qid")), s"unexpected SMJ keys $smjKeys:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q149: purity argmax is a min(struct) aggregate over broadcast centroids") {
    val p = plan("q149_cluster_purity")
    assert(p.contains("partial_min(struct("),
      s"majority label must be a map-side-combined min(struct):\n$p")
    assert(p.contains("BroadcastExchange"), s"centroids must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q150: funnel windows run over the 5-row stage spine, not the corpus") {
    val p = plan("q150_curation_funnel")
    // the cumulative window must sit above the verdict-keyed aggregate
    // (bounded input), and corpus totals must ride broadcasts
    assert(p.indexOf("Window") < p.lastIndexOf("HashAggregate"),
      s"the window must consume the aggregated stage frame:\n$p")
    assert(p.contains("BroadcastExchange"), s"totals must broadcast:\n$p")
  }

  test("q151: a k-center round is one scan + TakeOrdered(1); the chosen set is literal") {
    val p = graft.ext.VectorSearch.kCenterRoundPlanFrame(
        graft.Tables.embeddings(spark, sf), "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"the round winner must be a TakeOrdered, never a global sort:\n$p")
    assert(!p.contains("Join") && !p.contains("Exchange"),
      s"the chosen set must ride as literals — no join, no shuffle:\n$p")
  }

  test("q152: feature hashing is one exploded scan into one hash-agg") {
    val p = plan("q152_feature_hashing")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"no vocabulary join or window belongs here:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"the (doc, dim) agg must map-side combine:\n$p")
  }

  test("q153: cutoff windows run over the score histogram, never the corpus") {
    val p = plan("q153_quality_cutoff")
    // execution order: doc-keyed join → histogram aggregate → cumulative
    // window → per-source aggregate; the window must sit above the first
    // (corpus-collapsing) aggregate
    assert(p.indexOf("Window") < p.lastIndexOf("HashAggregate"),
      s"the cumulative window must consume the histogram:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q154: nDCG passes broadcast queries; grades attach by a (qid, id) equi-join") {
    val p = plan("q154_ndcg")
    assert(p.contains("BroadcastExchange"), s"query sides must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.split("HashAggregate").length >= 3,
      s"the per-query DCG sum must map-side combine:\n$p")
  }

  test("q155: shingle sweep is four joinless projection-aggregate tiers") {
    val p = plan("q155_shingle_sweep")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"each tier is a pure projection + aggregate:\n$p")
  }

  test("q156: held-out LM joins are vocabulary-keyed; no product, no window") {
    val p = plan("q156_heldout_lm")
    assert(!p.contains("CartesianProduct"),
      s"model attachment must stay a vocab equi-join (the 1-row N total rides a broadcast):\n$p")
    assert(!p.contains("windowspecdefinition"), p)
    assert(p.split("HashAggregate").length >= 3,
      s"occurrence pre-collapse and the doc mean must map-side combine:\n$p")
  }

  test("q157: hubness is two chained aggregates over the kNN graph") {
    val p = plan("q157_knn_hubness")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the graph build must stay bucket-blocked:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"in-degree and histogram must map-side combine:\n$p")
  }

  test("q158: co-occurrence pairs come off the token array — no self-join") {
    val p = plan("q158_cooccurrence")
    assert(!p.contains("Join"), s"positional pair extraction must not self-join:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must fuse:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"the pair agg must map-side combine:\n$p")
  }

  test("q159: burstiness is two chained aggregates + TakeOrdered") {
    val p = plan("q159_burstiness")
    assert(!p.contains("Join") && !p.contains("windowspecdefinition"), p)
    assert(p.contains("TakeOrderedAndProject"), s"top-k must fuse:\n$p")
  }

  test("q160: percentile windows run over the histogram; permille joins back by (source, score)") {
    val p = plan("q160_score_percentile")
    assert(p.indexOf("Window") < p.lastIndexOf("HashAggregate"),
      s"the cumulative window must consume the histogram aggregate:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q161: threshold sweep reuses the banded candidate join; no product") {
    val p = plan("q161_dedup_threshold_sweep")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidate enumeration must stay a band equi-join:\n$p")
    assert(p.contains("Union"), s"the three tiers union over one pair frame:\n$p")
  }

  test("q162: z-order layout is pure bit projection + one aggregate") {
    val p = plan("q162_zorder_layout")
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(p.split("HashAggregate").length >= 3,
      s"the bucket stats must map-side combine:\n$p")
  }

  test("q163: bucket mixture inherits the histogram-window discipline") {
    val p = plan("q163_ccnet_mix")
    assert(p.indexOf("Window") < p.lastIndexOf("HashAggregate"),
      s"bucket cuts must come from the histogram window:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q164: cohort retention is hash-aggs + a user-keyed join; anchor broadcasts") {
    val p = plan("q164_cohort_retention")
    assert(p.contains("BroadcastNestedLoopJoin BuildRight, Cross") ||
      p.contains("BroadcastExchange"),
      s"the 1-row anchor must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.split("HashAggregate").length >= 3,
      s"cohort and retention aggs must map-side combine:\n$p")
  }

  test("q165: RFM percentile windows run over histograms, never the user frame") {
    val p = plan("q165_rfm_segments")
    assert(p.indexOf("Window") < p.lastIndexOf("HashAggregate"),
      s"percentile windows must consume histogram aggregates:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q166: decode stats run through the real mapPartitions boundary, no shuffle") {
    val p = plan("q166_decode_stats")
    assert(p.contains("MapPartitions"),
      s"the decode must be the batched per-partition path:\n$p")
    assert(!p.contains("Join") && !p.contains("Exchange"),
      s"decode is embarrassingly parallel — no join, no shuffle:\n$p")
  }

  test("q167: spike detection is two hash-aggs + a type-keyed join") {
    val p = plan("q167_event_spikes")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.split("HashAggregate").length >= 3,
      s"the daily agg must map-side combine:\n$p")
  }

  test("q168: prefix-filter join stays an equi-join; verification is per-pair array_intersect") {
    val p = plan("q168_prefix_filter_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the candidate stage must be an equi-join on the prefix token:\n$p")
    assert(p.contains("array_intersect"),
      s"verification must be per-pair set intersection, not a third shuffle join:\n$p")
  }

  test("q169: triangle enumeration is wedge + closing-edge equi-joins, never a product") {
    val p = plan("q169_copurchase_triangles")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"wedge/closing joins must stay equi-joins:\n$p")
    assert(!p.contains("windowspecdefinition"),
      s"no rank window belongs in triangle counting:\n$p")
  }

  test("q170: last-touch is the as-of carry window; aggs map-side combine") {
    val p = plan("q170_touch_attribution")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("last("), s"as-of must be the carry-forward window:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"attribution aggs must map-side combine:\n$p")
  }

  test("q171/q172: top-k fuses into TakeOrderedAndProject (no global sort)") {
    val p1 = plan("q171_shipping_priority")
    assert(p1.contains("TakeOrderedAndProject"), s"top-10 must not global-sort:\n$p1")
    assert(p1.contains("PushedFilters") && p1.contains("GreaterThan(l_shipdate"),
      s"the ship-date filter must reach the lineitem scan:\n$p1")
    val p2 = plan("q172_returned_items")
    assert(p2.contains("TakeOrderedAndProject"), s"top-20 must not global-sort:\n$p2")
    assert(p2.contains("EqualTo(l_returnflag,R)"),
      s"the returnflag filter must reach the lineitem scan:\n$p2")
  }

  test("q173: promo share is one partial+final agg over the FK join") {
    val p = plan("q173_promo_effect")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.split("HashAggregate").length >= 3,
      s"the conditional sums must map-side combine:\n$p")
  }

  test("q174: bootstrap explode collapses map-side; no resample is materialized") {
    val p = plan("q174_bootstrap_ci")
    assert(p.contains("Generate explode"),
      s"replicates must come from an explode projection, not a join:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"replicate means must partial-aggregate before shuffling:\n$p")
    // the only join in the plan is the final 1-row × 1-row CI attach —
    // a nested-loop there is fine; what must NOT appear is a join with
    // the exploded corpus on either side
    assert(!p.contains("SortMergeJoin"),
      s"no corpus-sized join belongs in the bootstrap:\n$p")
  }

  test("q175: reliability diagram is one partial+final agg over a literal-weight projection") {
    val p = plan("q175_calibration")
    assert(p.split("HashAggregate").length >= 3,
      s"bin aggregate must map-side combine:\n$p")
    assert(!p.contains("windowspecdefinition"),
      s"no window belongs in the binning:\n$p")
  }

  test("q176: b-bit estimates stay on equi-joins over the signature frame") {
    val p = plan("q176_bbit_minhash")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidate and lookup joins must be equi-joins:\n$p")
    assert(!p.contains("windowspecdefinition"),
      s"no window belongs in the estimator:\n$p")
  }

  test("q177: global ranks come from histogram offsets, never a global single-partition sort") {
    val p = plan("q177_shard_balance")
    // two windows appear: the |distinct sizes|-row cumulative spine and the
    // per-size-class rank — but the corpus-sized one must be PARTITIONED
    assert(p.contains("windowspecdefinition(n_tokens#"),
      s"the corpus rank window must partition by the size class:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"the size histogram must map-side combine:\n$p")
  }

  test("q178: skyline is histogram + spine window + join-back, never a dominance product") {
    val p = plan("q178_pareto_front")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no quadratic dominance join belongs in the skyline:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"the level histogram must map-side combine:\n$p")
  }

  test("q179: shard-stability audit is projections + one aggregate, no join, no window") {
    val p = plan("q179_shard_stability")
    assert(!p.contains("windowspecdefinition"), s"no window belongs here:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"per-key shard math is a projection, not a join:\n$p")
  }

  test("q180: AUC histogram rank-sum — aggregates combine map-side, corpus never product-joins") {
    val p = plan("q180_quality_auc")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.split("HashAggregate").length >= 3,
      s"the score histogram must map-side combine:\n$p")
  }

  test("q181: the 6-table volume join never falls back to a product join") {
    val p = plan("q181_local_supplier_volume")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all joins are equi-joins (the nation co-location predicate rides the supplier join):\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"small dims should broadcast at this scale:\n$p")
  }

  test("q182: large-order filter aggregates the fact first; top-20 fuses to TakeOrdered") {
    val p = plan("q182_large_orders")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 must not global-sort:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"the per-order quantity agg must map-side combine:\n$p")
  }

  test("q183: vocab ranking windows are partitioned by frequency class") {
    val p = plan("q183_oov_curve")
    assert(p.contains("windowspecdefinition(f#"),
      s"the vocabulary rank window must partition by the frequency class:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the tier attach must be a broadcast, not a product:\n$p")
  }

  test("q184: ordered funnel is chained keyed aggregates, no window, no product") {
    val p = plan("q184_ordered_funnel")
    assert(!p.contains("windowspecdefinition"), s"no window belongs here:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.split("HashAggregate").length >= 5,
      s"each funnel step must be its own map-side-combined aggregate:\n$p")
  }

  test("q185: RRF fusion keeps corpus stats broadcast and no product joins") {
    val p = plan("q185_rrf_fusion")
    // the BM25 per-term document frequencies and the 1-row corpus stats
    // attach by broadcast — the corpus-sized side never shuffles for them
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"corpus stats must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no shuffled product belongs here:\n$p")
    // the fused global rank runs over the bounded candidate union — a
    // single window, not a corpus-wide sort
    assert(!p.contains("Sort [bm25_micro"), p)
  }

  test("q186: Q21 shape runs as semi+anti joins with a broadcast dim and TakeOrdered") {
    val p = plan("q186_waiting_suppliers")
    assert(p.contains("LeftSemi"), s"EXISTS must plan as a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS must plan as an anti join:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the nation-filtered supplier dim must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must not global-sort:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q187: Zipf fit cuts the vocabulary with TakeOrdered, never a global sort") {
    val p = plan("q187_zipf_fit")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-200 vocabulary cut must be a TakeOrdered:\n$p")
    // the only window (rank 1..200) runs over the bounded cut, after the
    // TakeOrdered — the corpus-wide vocabulary is aggregated, not sorted
    assert(p.split("HashAggregate").length >= 3,
      s"vocabulary + OLS folds must map-side combine:\n$p")
  }

  test("q188: Heaps curve is aggregates + broadcast checkpoint join, no window") {
    val p = plan("q188_heaps_curve")
    assert(!p.contains("windowspecdefinition"), s"no window belongs here:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"checkpoint range join must broadcast:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the < range join rides the broadcast checkpoint spine:\n$p")
  }

  test("q189: DP release is one aggregate with noise as a projection") {
    val p = plan("q189_dp_release")
    assert(!p.contains("windowspecdefinition") && !p.contains("Join"),
      s"noise must attach as a projection on the aggregated cells:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"the count must map-side combine:\n$p")
  }

  test("q190: both estimator branches reuse the one per-key aggregate exchange") {
    // exchange reuse is an AQE runtime decision — execute, then read the
    // final adaptive plan (the static plan still shows two subtrees)
    val df = SparkEntry.queries("q190_join_size_est")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"),
      s"the totals and heavy-hitter branches must share the per-key count exchange:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-H cut must be a TakeOrdered:\n$p")
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("q191: pass@k is chained aggregates with a projection-only estimator") {
    val p = plan("q191_pass_at_k")
    assert(!p.contains("windowspecdefinition") && !p.contains("Join"),
      s"no window or join belongs here:\n$p")
    assert(p.split("HashAggregate").length >= 5,
      s"both aggregates must map-side combine:\n$p")
  }

  test("q192: MAD audit joins group stats back by broadcast, no window") {
    val p = plan("q192_mad_outliers")
    assert(p.contains("BroadcastHashJoin"),
      s"group-cardinality median/MAD frames must broadcast:\n$p")
    assert(!p.contains("windowspecdefinition") && !p.contains("SortMergeJoin"),
      s"no window or corpus-side sort-merge belongs here:\n$p")
  }

  test("q193: Benford audit is one aggregate with projection-only χ²") {
    val p = plan("q193_benford_audit")
    assert(!p.contains("windowspecdefinition") && !p.contains("Join"), p)
    assert(p.split("HashAggregate").length >= 3,
      s"the digit counts must map-side combine:\n$p")
  }

  test("q194: fuzzy match is a blocked equi-join with a codegen'd JW projection") {
    val p = plan("q194_fuzzy_match")
    // the blocking key is an equi-join condition — never a cartesian
    // product with a similarity filter
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"blocking must plan as an equi-join:\n$p")
    assert(p.contains("graft_jaro_winkler"),
      s"the native JW expression must appear in the projection:\n$p")
    assert(p.contains("windowspecdefinition(d_id"),
      s"the argmax window must partition by the dirty record:\n$p")
  }

  test("q195: rolling spend uses an interval RANGE frame on one key shuffle") {
    val p = plan("q195_rolling_window")
    assert(p.contains("specifiedwindowframe(RangeFrame"),
      s"the trailing-30-day frame must be a RANGE frame:\n$p")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    assert(p.split("Exchange hashpartitioning").length == 2,
      s"exactly one customer-key shuffle:\n$p")
  }

  test("q196: LSH tuner never scans a table") {
    val p = plan("q196_lsh_tuning")
    assert(!p.contains("FileScan"), s"the analytic sweep must be scan-free:\n$p")
  }

  test("q197: LOO valuation broadcasts totals and reuses the per-source aggregate") {
    // like q190: exchange reuse is an AQE runtime decision — execute first
    val df = SparkEntry.queries("q197_loo_source_value")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"corpus totals must attach by broadcast:\n$p")
    assert(!p.contains("windowspecdefinition"), p)
    assert(p.contains("ReusedExchange"),
      s"the totals branch must reuse the per-source aggregate exchange:\n$p")
  }

  test("q198: phrase match is a shuffle-free projection") {
    val p = plan("q198_phrase_match")
    assert(!p.contains("Exchange hashpartitioning") && !p.contains("Join"),
      s"phrase counting must stay a per-row projection:\n$p")
    assert(!p.contains("Generate"), s"no explode belongs here:\n$p")
  }

  test("q199: VAD runs at the mapPartitions decode boundary with no shuffle") {
    val p = plan("q199_audio_vad")
    assert(p.contains("MapPartitions"),
      s"the decode boundary must be a per-partition iterator:\n$p")
    assert(!p.contains("Exchange hashpartitioning") && !p.contains("Join"),
      s"per-payload gating must not shuffle:\n$p")
  }

  test("q200: column profile is melt + two map-side aggregates, argmax not a window") {
    val p = plan("q200_column_profile")
    assert(!p.contains("windowspecdefinition"),
      s"the modal value must be a max(struct) argmax, not a rank window:\n$p")
    assert(p.contains("partial_max(CASE WHEN") || p.contains("partial_max(casewhen"),
      s"the argmax must map-side combine:\n$p")
    // the struct-argmax stage plans as a partial+final SortAggregate (struct
    // max is not hash-aggregable) — still map-side combined, and the sort
    // runs over the value-cardinality frame, never the source rows
    assert(p.split("Aggregate").length >= 5,
      s"both aggregates must be partial+final:\n$p")
  }

  test("q201: merkle diff folds each side to bucket digests before the join") {
    val p = plan("q201_merkle_diff")
    assert(!p.contains("SortMergeJoin") || p.contains("FullOuter"),
      s"only the |buckets|-row reconciliation may sort-merge:\n$p")
    assert(p.contains("bit_xor"), s"the digest must be the XOR fold:\n$p")
    assert(p.split("HashAggregate").length >= 5,
      s"per-side digests must map-side combine:\n$p")
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("q202: deletion audit is broadcast semi/anti joins, no subject-key shuffle") {
    val p = plan("q202_deletion_audit")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"),
      s"referenced/surviving must be semi/anti joins:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the deletion list must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"fact tables must not shuffle on the subject key:\n$p")
  }

  test("q203/q204: anonymity audits are chained map-side aggregates only") {
    for (q <- Seq("q203_k_anonymity", "q204_l_diversity")) {
      val p = plan(q)
      assert(!p.contains("Join") && !p.contains("windowspecdefinition"),
        s"$q must be pure aggregation:\n$p")
      assert(p.split("HashAggregate").length >= 5,
        s"$q aggregates must map-side combine:\n$p")
    }
  }

  test("q205: span corruption windows and joins stay doc-keyed") {
    val p = plan("q205_span_corruption")
    assert(p.contains("windowspecdefinition(doc_id"),
      s"the island window must partition by document:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the join back must stay a doc-keyed equi-join:\n$p")
  }

  test("q206: late interaction broadcasts the query side; corpus never self-joins") {
    val p = plan("q206_late_interaction")
    assert(p.contains("BroadcastHashJoin"),
      s"the bounded query chunks must broadcast into the dim join:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no product join belongs here:\n$p")
    assert(p.split("HashAggregate").length >= 5,
      s"dot/MaxSim/score folds must map-side combine:\n$p")
  }

  test("q207: Q4 EXISTS plans as a semi join with the quarter filter pushed") {
    val p = plan("q207_order_priority")
    assert(p.contains("LeftSemi"), s"EXISTS must plan as a semi join:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate") || p.contains("PushedFilters"),
      s"the quarter filter must reach the orders scan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q208/q209: Q7/Q8 broadcast the dims; the date filter reaches the scan") {
    val p8 = plan("q208_volume_shipping")
    assert(p8.contains("BroadcastHashJoin"),
      s"the nation-filtered supplier dim must broadcast:\n$p8")
    assert(p8.contains("GreaterThanOrEqual(l_shipdate"),
      s"the ship-date window must reach the lineitem scan:\n$p8")
    assert(!p8.contains("CartesianProduct") && !p8.contains("BroadcastNestedLoopJoin"), p8)
    val p9 = plan("q209_market_share")
    assert(p9.split("BroadcastHashJoin").length >= 3,
      s"part and supplier⋈nation must both broadcast:\n$p9")
    assert(p9.split("HashAggregate").length >= 3,
      s"the two conditional sums must map-side combine:\n$p9")
    assert(!p9.contains("CartesianProduct") && !p9.contains("BroadcastNestedLoopJoin"), p9)
  }

  test("q210: Q13 keeps the outer join and double-aggregates with map-side combine") {
    val p = plan("q210_customer_distribution")
    assert(p.contains("LeftOuter") || p.contains("RightOuter"),
      s"zero-order customers must survive via an outer join:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"the count histogram must map-side combine:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q211: Q17 de-correlates into a broadcast stats join, no window") {
    val p = plan("q211_small_qty_revenue")
    assert(p.split("BroadcastHashJoin").length >= 3,
      s"the part list and the per-part stats must both broadcast:\n$p")
    assert(!p.contains("windowspecdefinition"),
      s"the per-part average must be an aggregate, not a window:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q212: Q19 extracts the equi-key; the disjunction filters both scans") {
    val p = plan("q212_disjunctive_join")
    assert(p.contains("BroadcastHashJoin"),
      s"the part side must broadcast on the extracted equi-key:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the OR must not degrade the join to a product:\n$p")
    // each branch's per-side conjuncts prune the scans: quantity bounds
    // reach lineitem, brand/size bounds reach part
    assert(p.contains("l_quantity") && p.contains("p_brand"),
      s"per-side conjuncts must survive extraction:\n$p")
  }

  test("q213: Q22 anti-joins a date-pruned build side; the avg rides broadcast") {
    val p = plan("q213_sales_opportunity")
    assert(p.contains("LeftAnti"), s"NOT EXISTS must plan as an anti join:\n$p")
    // the only nested-loop is the 1-row global-average attach (the q174
    // pattern); the anti join itself must stay a hash/merge equi-join
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"the recency predicate must prune the anti-join build scan:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q214: FS scoring is a blocked pair join + 1-row broadcast; weights are projections") {
    val p = plan("q214_fellegi_sunter")
    // the only nested-loop is the 1-row u-statistics attach; the pair
    // candidates themselves must come from the blocking equi-join
    assert(!p.contains("CartesianProduct"),
      s"candidate pairs must come from the blocking join:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"u-statistics must map-side combine:\n$p")
    // the only window is the per-nation block cap — partitioned, never
    // a global sort; the scoring itself is pure projection
    assert(p.contains("windowspecdefinition(s_nationkey"),
      s"the block cap must partition by nation:\n$p")
    assert(!p.contains("windowspecdefinition(score"),
      s"scoring is pure projection — no score window belongs here:\n$p")
  }

  test("q215: TextRank pairs are positional tiers; top-k is a TakeOrdered") {
    // the returned frame is a checkpoint scan (the q87 pattern), so the
    // edge construction is pinned on the exposed word-graph frame
    val pe = graft.ext.TextStats.wordCoocEdges(
      graft.Tables.documents(spark, sf), "text", window = 2)
      .queryExecution.executedPlan.toString
    assert(pe.contains("Generate explode"),
      s"co-occurrence pairs must come off the token array positionally:\n$pe")
    assert(!pe.contains("Join"),
      s"the word graph must never token-self-join:\n$pe")
    val p = plan("q215_textrank")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 keywords must not global-sort the vocabulary:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q216: KN model joins stay vocabulary-keyed; occurrences pre-collapse") {
    val p = plan("q216_kneser_ney")
    // the only nested-loop is the 1-row bigram-type-total attach
    assert(!p.contains("CartesianProduct"),
      s"model joins must stay vocabulary-keyed equi-joins:\n$p")
    assert(p.split("HashAggregate").length >= 5,
      s"model statistics and doc means must map-side combine:\n$p")
    assert(!p.contains("windowspecdefinition"),
      s"no window belongs in KN scoring:\n$p")
  }

  test("q105: cluster representative is a min(struct) argmax, not a rank window") {
    val p = plan("q105_cluster_reps")
    // the argmax must be partial-aggregable so a degenerate half-corpus
    // cluster collapses map-side; a window formulation would sort that
    // cluster in one task
    assert(p.contains("partial_min(struct("),
      s"argmax must be a map-side-combined min(struct):\n$p")
    assert(!p.contains("windowspecdefinition"),
      s"no per-cluster rank window belongs here:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q217: ROUGE overlap stays gram-keyed equi-joins; pair sums map-side combine") {
    val p = plan("q217_rouge_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"overlap must be (id, gram)-keyed equi-joins, never a product:\n$p")
    // gram counts, totals, overlap sum: all partial+final hash aggregates
    assert(p.split("HashAggregate").length >= 5,
      s"gram counts and pair sums must map-side combine:\n$p")
  }

  test("q218: MRL curve scans the corpus ONCE for all tiers; tier fan-out is a generator") {
    val p = plan("q218_mrl_dim_curve")
    // tier fan-out must be an explode projection over one scan, never a
    // per-tier re-scan or a tier join against the corpus
    assert(p.contains("Generate explode"),
      s"dim tiers must fan out via explode:\n$p")
    // nested-loop joins: broadcast queries x corpus for the tiered scan,
    // the exact truth (whose subplan appears twice: once under the hits
    // join and once under the 1-row n_exact denominator), plus that
    // denominator's broadcast attach -- nothing else
    assert(p.split("BroadcastNestedLoopJoin").length - 1 <= 4,
      s"only the bounded-query scans + 1-row denominator may cross:\n$p")
    assert(!p.contains("CartesianProduct"), s"no unbroadcast product:\n$p")
  }

  test("q219: UniMax corpus work is ONE aggregate; windows run on group-cardinality rows") {
    val p = plan("q219_unimax_alloc")
    // the token count is the only corpus-sized operator: partial+final agg
    assert(p.split("HashAggregate").length >= 3,
      s"token totals must map-side combine:\n$p")
    // the prefix-sum window exists but runs AFTER the per-group collapse --
    // its input is |languages| rows; the two 1-row stat frames broadcast
    assert(p.contains("Window"), s"prefix-sum window missing:\n$p")
    // the two 1-row stat attaches (k-count and capped-prefix totals); the
    // flagged frame's own attach re-evaluates inside the broadcast tStats
    // side, so the pattern appears three times -- all on |languages|-row
    // or 1-row inputs
    assert(p.split("BroadcastNestedLoopJoin").length - 1 <= 3,
      s"only the 1-row stat attaches may cross-join:\n$p")
    assert(!p.contains("CartesianProduct"), s"no unbroadcast product:\n$p")
  }

  test("q220: token entropy is two chained hash-aggs — no join, no window") {
    val p = plan("q220_token_entropy")
    assert(p.split("HashAggregate").length >= 5,
      s"(doc, token) and doc-keyed aggs must both map-side combine:\n$p")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"entropy needs no join side and no window:\n$p")
  }

  test("q221: padding-waste corpus work is ONE histogram agg; spans explode on histogram rows") {
    val p = plan("q221_padding_waste")
    // the (len -> count) histogram is the only corpus-sized operator
    assert(p.split("HashAggregate").length >= 3,
      s"length histogram must map-side combine:\n$p")
    // tier and bucket-span fan-outs are generators over histogram rows
    assert(p.split("Generate explode").length - 1 >= 2,
      s"tier + bucket-span fan-out must be explodes:\n$p")
    // one 1-row totals attach; prefix-sum window runs post-collapse
    assert(p.split("BroadcastNestedLoopJoin").length - 1 <= 1,
      s"only the 1-row totals frame may cross-join:\n$p")
    assert(!p.contains("CartesianProduct"), s"no unbroadcast product:\n$p")
  }

  test("q223/q224: a beam-search round is windows + id-keyed equi-joins; seeding is the only product") {
    // the returned frames are checkpoint scans (the q87 pattern), so the
    // walk's shape is pinned on the exposed one-round plan frame
    val emb = graft.Tables.embeddings(spark, sf)
    val qs = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10)
    val cs = emb.filter(org.apache.spark.sql.functions.col("vec_id") >= 10)
    val p = graft.ext.VectorSearch.graphSearchRoundPlanFrame(
      qs, cs,
      graft.ext.VectorSearch.knnGraph(cs, "vec_id", "embedding",
        k = 3, bits = 6, maxBucketSize = 64),
      graft.ext.VectorSearch.bucketEntryPoints(cs, "vec_id", "embedding", 6),
      "vec_id", "embedding", "vec_id", "embedding", beam = 8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"no unbroadcast product:\n$p")
    // the only nested loops: bounded-query × entry seeding and the
    // broadcast query attach inside each scoring pass (2 passes here)
    assert(p.split("BroadcastNestedLoopJoin").length - 1 <= 3,
      s"only the bounded seeding/query attaches may cross:\n$p")
    // frontier selection is a per-query rank window, adjacency expand and
    // corpus re-score are id-keyed joins
    assert(p.contains("Window"), s"beam window missing:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"the beam filter must push into a group-limit:\n$p")
  }

  test("q226: kappa is aggregates + 1-row attaches — no window, no wide join") {
    val p = plan("q226_filter_agreement")
    assert(p.split("HashAggregate").length >= 5,
      s"corpus totals and label marginals must map-side combine:\n$p")
    assert(!p.contains("Window"), s"kappa needs no window:\n$p")
    assert(!p.contains("CartesianProduct"), s"no unbroadcast product:\n$p")
    // the only per-doc join is the two-rater equi-join on doc_id; the
    // 1-row totals frames broadcast
    assert(p.split("BroadcastNestedLoopJoin").length - 1 <= 3,
      s"only 1-row stat frames may cross:\n$p")
  }

  test("q227: a BT MM round is two id-keyed equi-joins + one item hash-agg") {
    // btStrengths returns a checkpoint scan; pin the exposed round frame
    val pairs = graft.ext.TextDedup.lshCandidates(
      graft.queries.QueryCaches.sigFor(spark, sf), "doc_id", k = 8, rowsPerBand = 2)
      .select(org.apache.spark.sql.functions.col("id_a").as("w"),
        org.apache.spark.sql.functions.col("id_b").as("l"))
    val p = graft.ext.Preference.btRoundPlanFrame(pairs, "w", "l")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"BT rounds are id-keyed equi-joins only:\n$p")
    assert(!p.contains("Window"), s"no window belongs in an MM round:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"pair collapse and denominators must map-side combine:\n$p")
  }

  test("q228: bootstrap replicates are an explode projection; sums map-side combine") {
    val p = plan("q228_paired_bootstrap")
    // the B-replicate fan-out must be a generator over the delta frame,
    // never a materialized resample join
    assert(p.contains("Generate explode"),
      s"replicates must fan out via explode:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"per-replicate weighted sums must map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"), s"no unbroadcast product:\n$p")
    // the rank window runs on B rows (replicate means), a driver-scale
    // frame by construction
    assert(p.contains("Window"), s"rank-CI window missing:\n$p")
  }

  test("q229: fertility tiers ride ONE scan as an explode; rollup is a tier-keyed agg") {
    val p = plan("q229_bpe_fertility_curve")
    assert(p.split("Generate explode").length - 1 >= 2,
      s"word and tier fan-outs must both be generators over one scan:\n$p")
    assert(!p.contains("Join"), s"the curve needs no join side at all:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"the tier rollup must map-side combine:\n$p")
  }

  test("q230: cluster audit pairs stay (cluster, shingle)-keyed equi-joins behind the size gate") {
    val p = plan("q230_cluster_audit")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"intra-cluster pairs must come from the keyed shingle self-join:\n$p")
    assert(p.split("HashAggregate").length >= 5,
      s"sizes, pair counts and cluster rollups must map-side combine:\n$p")
  }

  test("q231: simhash calibration joins stay id/shingle-keyed; fingerprints aggregate map-side") {
    val p = plan("q231_simhash_calibration")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"truth pairs and fingerprint lookups must be keyed equi-joins:\n$p")
    assert(p.split("HashAggregate").length >= 5,
      s"bit sums, pair counts and decile rollup must map-side combine:\n$p")
  }

  test("q232: incremental simhash is an id anti join + band equi-joins, never a product") {
    val p = plan("q232_incr_simhash")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the index probe must stay band-keyed:\n$p")
    assert(p.contains("LeftAnti"),
      s"redelivery must drop via one anti join on the id:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"fingerprint bit sums must map-side combine:\n$p")
  }

  test("q233: every method's candidates come from keyed joins; truth attaches once") {
    val p = plan("q233_dedup_method_comparison")
    assert(!p.contains("CartesianProduct"),
      s"no unbroadcast product anywhere in the comparison:\n$p")
    // the only nested-loop is the 1-row n_truth attach
    assert(p.split("BroadcastNestedLoopJoin").length - 1 <= 1,
      s"only the 1-row truth-count frame may cross:\n$p")
  }

  test("q234: the remediation cut is a projection behind one id-keyed stats join") {
    val p = plan("q234_span_remediation")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"span stats must join back on the id, never a product:\n$p")
    // islands run detection: doc-keyed window only
    assert(p.contains("Window"), s"the islands window is load-bearing:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"doc-frequency and run aggregates must map-side combine:\n$p")
  }

  test("q235: every yield tier filters ONE shared pair frame; victims join ids only") {
    val p = plan("q235_dedup_yield_curve")
    assert(p.contains("Generate explode"),
      s"tiers must fan out via explode over the shared pair frame:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no unbroadcast product:\n$p")
    // the 1-row totals attach is the only nested loop
    assert(p.split("BroadcastNestedLoopJoin").length - 1 <= 1,
      s"only the 1-row totals frame may cross:\n$p")
  }

  test("q236: semantic yield pairs stay cluster-blocked; tiers are an explode filter") {
    val p = plan("q236_semantic_yield_curve")
    assert(!p.contains("CartesianProduct"),
      s"pairs must stay cluster-keyed, never a product:\n$p")
    assert(p.contains("Generate explode"),
      s"tiers must fan out via explode over the shared pair frame:\n$p")
    // 1-row totals attach is the only nested loop
    assert(p.split("BroadcastNestedLoopJoin").length - 1 <= 1,
      s"only the 1-row totals frame may cross:\n$p")
  }

  test("q237: temperature sweep's corpus work is ONE agg; alpha spine is an explode") {
    val p = plan("q237_temperature_sweep")
    assert(p.split("HashAggregate").length >= 3,
      s"per-language token totals must map-side combine:\n$p")
    assert(p.contains("Generate explode"),
      s"the alpha spine must be a per-row explode:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"nothing corpus-sized may reach a join:\n$p")
  }

  test("q238: SCD2 history is two window passes on one key partitioning — no join") {
    val p = plan("q238_scd2_history")
    assert(!p.contains("Join"), s"version intervals need no join side:\n$p")
    // the collapse lag and the interval lead share the key partitioning:
    // exactly one exchange
    assert(p.split("Exchange").length - 1 <= 2,
      s"both windows must reuse one hash partitioning:\n$p")
    assert(p.contains("Window"), s"the interval windows are load-bearing:\n$p")
  }

  test("q240: rank correlation never global-sorts the corpus; ranks ride value lookups") {
    val p = plan("q240_rank_correlation")
    assert(!p.contains("CartesianProduct"),
      s"only the 1-row count frame may cross:\n$p")
    // the rank windows run on the VALUE histograms (|distinct values|
    // rows); the corpus itself is never windowed or sorted globally
    assert(p.contains("Window"), s"histogram prefix windows missing:\n$p")
    assert(p.split("HashAggregate").length >= 5,
      s"histograms and final sums must map-side combine:\n$p")
  }

  test("q241: concentration report's corpus work is ONE agg; sorts touch |groups| rows") {
    val p = plan("q241_mixture_concentration")
    assert(p.split("HashAggregate").length >= 3,
      s"per-group token totals must map-side combine:\n$p")
    assert(p.contains("Window"), s"the |groups|-row rank windows are load-bearing:\n$p")
    assert(!p.contains("Join"), s"the report needs no join side at all:\n$p")
  }

  test("q242: Good-Turing corpus work is two hash-aggs; spectrum lookups broadcast") {
    val p = plan("q242_good_turing")
    assert(p.split("HashAggregate").length >= 5,
      s"term counts and the spectrum must map-side combine:\n$p")
    // the r+1 lookup and the 1-row totals attach on the O(sqrt N)-row
    // spectrum — never a corpus-sized shuffle join
    assert(p.contains("BroadcastHashJoin"),
      s"the r+1 spectrum lookup must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"nothing corpus-sized may reach a join (1-row totals broadcast):\n$p")
    assert(!p.contains("Window") && !p.contains("Sort "),
      s"no window or global sort anywhere:\n$p")
  }

  test("q243: burstiness pre-collapses (token, doc) and cuts via TakeOrdered") {
    val p = plan("q243_burstiness")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-k cut must be a TakeOrdered, not a global sort:\n$p")
    assert(p.split("HashAggregate").length >= 5,
      s"(token, doc) pre-collapse and the token agg must map-side combine:\n$p")
    assert(!p.contains("Join"), s"the audit needs no join side:\n$p")
  }

  test("q244: keyness touches the corpus once; marginals attach post-agg") {
    val p = plan("q244_keyness")
    assert(p.split("HashAggregate").length >= 3,
      s"(source, token) counts must map-side combine:\n$p")
    // source totals and the 1-row N broadcast; only the vocab-keyed token
    // marginal may shuffle — and it is post-aggregation-sized
    assert(p.contains("BroadcastHashJoin"),
      s"source totals must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"only the 1-row total may cross:\n$p")
    // the top-k window partitions by source on the post-agg frame
    assert(p.contains("Window"), s"the per-source rank window is load-bearing:\n$p")
  }

  test("q245: rank agreement is broadcast-sized past the retrievers") {
    val p = plan("q245_rank_agreement")
    // the ≤20-row ranked lists meet the depth spine via broadcast joins;
    // nothing list-sized may sort-merge
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the depth spine must broadcast onto the joined lists:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no unbroadcast product:\n$p")
  }

  test("q247: Adamic-Adar caps wedge centers, anti-joins edges, cuts via TakeOrdered") {
    val p = plan("q247_adamic_adar")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-k cut must be a TakeOrdered, not a global sort:\n$p")
    assert(p.contains("LeftAnti"),
      s"existing edges must leave by anti-join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the pair join must stay an equi-join on the wedge center:\n$p")
    assert(!p.contains("Window"),
      s"no window anywhere — scores are one hash-agg:\n$p")
  }

  test("q249: RFM quintile windows stay at the nation grain — no range partitioning") {
    val p = plan("q249_rfm_segments")
    assert(!p.contains("rangepartitioning"),
      s"per-nation ntile must hash-partition, never globally range-sort:\n$p")
    assert(p.contains("Window"), s"the quintile windows are load-bearing:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"the per-customer roll-up must map-side combine:\n$p")
  }

  test("q250: ACF touches events once; shifts are equi-joins on the minute grain") {
    val p = plan("q250_event_acf")
    assert(p.split("HashAggregate").length >= 3,
      s"the per-minute count must map-side combine:\n$p")
    assert(!p.contains("Window") && !p.contains("rangepartitioning"),
      s"no window, no global sort — shifts are joins:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"only broadcast 1-row totals and the lag spine may cross:\n$p")
  }

  test("q251: MCV audit scans once; MCV set and totals ride back as broadcasts") {
    val p = plan("q251_mcv_selectivity")
    assert(p.split("HashAggregate").length >= 3,
      s"the value histogram must map-side combine:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the MCV flag join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"),
      s"past the histogram nothing is input-sized:\n$p")
  }

  test("q252: transition matrix lags at the user grain; denominator broadcasts") {
    val p = plan("q252_event_transitions")
    assert(!p.contains("rangepartitioning"),
      s"the LAG window must hash-partition by user, never globally sort:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the |types|-row from-totals must broadcast:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"transition counts must map-side combine:\n$p")
  }

  test("q253: KM curve windows run on the duration histogram, not the user frame") {
    val p = plan("q253_churn_survival")
    assert(p.split("HashAggregate").length >= 3,
      s"the per-user lifetime agg must map-side combine:\n$p")
    assert(p.contains("Window"),
      s"the suffix/prefix histogram windows are load-bearing:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"only the broadcast corpus-max may join:\n$p")
  }

  test("q254: time-to-convert joins once on the user key; totals broadcast") {
    val p = plan("q254_time_to_convert")
    assert(p.split("HashAggregate").length >= 3,
      s"first-signup and first-purchase must map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"only the 1-row signup total may cross:\n$p")
    assert(!p.contains("Window"),
      s"firsts are MIN aggregates, not rank windows:\n$p")
  }

  test("q255: reorder LAG stays at the customer grain") {
    val p = plan("q255_reorder_intervals")
    assert(!p.contains("rangepartitioning"),
      s"the LAG window must hash-partition by customer:\n$p")
    assert(!p.contains("Join"), s"intervals need no join side:\n$p")
  }

  test("q256: basket lift counts pairs once; totals attach by key and broadcast") {
    val p = plan("q256_basket_lift")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-20 cut must be a TakeOrdered:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"only the 1-row basket total may cross:\n$p")
    assert(p.split("HashAggregate").length >= 5,
      s"pair counts and part totals must map-side combine:\n$p")
  }

  test("q257: ABC running shares stay at the brand grain") {
    val p = plan("q257_abc_classes")
    assert(!p.contains("rangepartitioning"),
      s"the Pareto windows must hash-partition by brand, never global-sort:\n$p")
    assert(p.contains("Window"), s"the running-share windows are load-bearing:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the part dimension must broadcast onto the revenue agg:\n$p")
  }

  test("q258: ship-delay SLA joins the facts once on the order key") {
    val p = plan("q258_ship_delay_sla")
    assert(!p.contains("CartesianProduct") && !p.contains("Window"),
      s"percentiles are aggregates at the priority grain, no products:\n$p")
    // the scan must prune to the 2+3 needed columns
    assert(!p.contains("l_extendedprice") && !p.contains("o_totalprice"),
      s"columns not pruned:\n$p")
  }

  test("q259: Wilson intervals are one hash-agg and a projection — no join, no window") {
    val p = plan("q259_error_rate_wilson")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"closed-form CI needs no join or window:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"hour counts must map-side combine:\n$p")
  }

  test("q260: KS ECDFs run on the (group, value) spine, never the corpus") {
    val p = plan("q260_length_ks")
    assert(p.split("HashAggregate").length >= 3,
      s"the (source, length) histogram must map-side combine:\n$p")
    assert(p.contains("Window"),
      s"the per-group cum-sum windows are load-bearing:\n$p")
    assert(!p.contains("SortMergeJoin") || !p.contains("rangepartitioning"),
      s"the pair join is value-keyed on the post-agg spine:\n$p")
  }

  test("q261: streak islands window stays at the user grain") {
    val p = plan("q261_activity_streaks")
    assert(!p.contains("rangepartitioning"),
      s"the ROW_NUMBER must hash-partition by user:\n$p")
    assert(!p.contains("Join"), s"islands need no join side:\n$p")
    assert(p.split("HashAggregate").length >= 5,
      s"distinct days, runs, bests and the histogram must map-side combine:\n$p")
  }

  test("q262: ordered funnel is min-ts chaining on the user key — no window") {
    val p = plan("q262_ordered_funnel")
    assert(!p.contains("Window"),
      s"stage firsts are MIN aggregates:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the user-keyed stage joins stay hash/broadcast at this shape:\n$p")
  }

  test("q263: dimension profile is one posexplode + one |dims|-row agg") {
    val p = plan("q263_dim_profile")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"moment sums need no join or window:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"per-dimension moments must map-side combine:\n$p")
  }

  test("q264: dim correlation gates the corpus, broadcasts marginals, TakeOrdereds") {
    val p = plan("q264_dim_correlation")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-20 cut must be a TakeOrdered:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the 64-row marginals must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the pair join is vec_id-keyed, never a product:\n$p")
  }

  test("q265: Apriori prune is a semi-join; candidates broadcast into the verify") {
    val p = plan("q265_frequent_triples")
    assert(p.contains("LeftSemi"),
      s"the subset prune and the basket verify must be semi-joins:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the candidate set must broadcast into the basket scan:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"candidate generation is head-keyed, never a product:\n$p")
  }

  test("q266: grouping sets run as ONE Expand pass over the joined facts") {
    val p = plan("q266_grouping_sets")
    assert(p.contains("Expand"),
      s"the three sets must share one Expand, not three scans:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the customer dim must broadcast:\n$p")
    assert(p.split("FileScan").length - 1 <= 2,
      s"each table is scanned exactly once:\n$p")
  }

  test("q267: chi-square cells aggregate once; the spine is margin-sized") {
    val p = plan("q267_type_hour_chi2")
    assert(p.split("HashAggregate").length >= 3,
      s"(type, hour) cells must map-side combine:\n$p")
    assert(!p.contains("Window") && !p.contains("SortMergeJoin"),
      s"margins join back on their keys — no window, no SMJ:\n$p")
  }

  test("q268: backtest shifts are minute-keyed equi-joins on the filled spine") {
    val p = plan("q268_forecast_backtest")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      s"shifts are joins; only the 1-row span and lag spine may cross:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"the per-minute count must map-side combine:\n$p")
  }

  test("q269: path mining is one user-grain window pass and a TakeOrdered") {
    val p = plan("q269_top_paths")
    assert(!p.contains("rangepartitioning"),
      s"both LAGs share the user partitioning:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-20 cut must be a TakeOrdered:\n$p")
    // one corpus scan: the share total is a window over the post-agg
    // frame, not a second reference to the trigram subtree
    assert(p.split("FileScan").length - 1 <= 1,
      s"the events scan must run exactly once:\n$p")
  }

  test("q270: backlog running sum runs on the delta histogram, not the facts") {
    val p = plan("q270_backlog_curve")
    assert(p.split("HashAggregate").length >= 5,
      s"closes, deltas and the monthly peak must map-side combine:\n$p")
    assert(p.contains("Window"),
      s"the |days|-row running sum is load-bearing:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the close lookup is an orderkey equi-join:\n$p")
  }

  test("q271: Theil terms are two chained hash-aggs; no window, no product") {
    val p = plan("q271_theil_decomposition")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      s"the decomposition is pure aggregation:\n$p")
    assert(p.split("HashAggregate").length >= 5,
      s"customer, group and corpus terms must map-side combine:\n$p")
  }

  test("q272: dispersion is two chained hash-aggs, nothing else") {
    val p = plan("q272_order_dispersion")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"moment sums need no join or window:\n$p")
    assert(p.split("HashAggregate").length >= 5,
      s"per-customer counts and the moment roll-up must map-side combine:\n$p")
  }

  test("q273: calibration is one hash-agg over the scored projection") {
    val p = plan("q273_calibration")
    assert(!p.contains("Window"),
      s"bins are a projection, never a rank window:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"bin stats must map-side combine:\n$p")
  }

  test("q274: Brier terms are chained hash-aggs over the scored projection") {
    val p = plan("q274_brier_decomposition")
    assert(!p.contains("Window"),
      s"the decomposition needs no window:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the one-row combine must broadcast:\n$p")
  }

  test("q275: FK audit anti-joins distinct key sets, never raw facts") {
    val p = plan("q275_referential_integrity")
    assert(p.contains("LeftAnti"),
      s"orphans and unreferenced parents are anti-joins:\n$p")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      s"only 1-row edge counts may cross (broadcast):\n$p")
  }

  test("q276: coverage-curve windows run on the vocabulary frame") {
    val p = plan("q276_vocab_coverage")
    assert(p.split("HashAggregate").length >= 3,
      s"the token counts must map-side combine:\n$p")
    assert(p.contains("Window"),
      s"the rank/cumulative windows are load-bearing:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the cutoff spine must broadcast:\n$p")
  }

  test("q277: partition-skew audit is two chained hash-aggs") {
    val p = plan("q277_partition_skew")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"the audit is pure aggregation:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"per-partition counts must map-side combine:\n$p")
  }

  test("q278: nearest join is ONE key shuffle; both directions share the sort") {
    val p = plan("q278_nearest_click")
    assert(p.split("Window").length - 1 >= 1,
      s"the two-direction carry is a window pass:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"the union-tag formulation joins nothing:\n$p")
    // both carries run on ONE (key, time) exchange
    assert(p.split("Exchange").length - 1 <= 3,
      s"backward and forward candidates must share the key partitioning:\n$p")
  }

  test("q279: stickiness collapses to (day, user) first; no window anywhere") {
    val p = plan("q279_dau_mau")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      s"both actives counts are aggregates:\n$p")
    assert(p.split("HashAggregate").length >= 5,
      s"distinct collapse and both roll-ups must map-side combine:\n$p")
  }

  test("q280: rolling return runs on the (day, user) set; returns are semi-joins") {
    val p = plan("q280_rolling_return")
    assert(p.contains("LeftSemi"),
      s"the returned test is a semi-join against the shifted set:\n$p")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      s"only the 7-row offset spine may cross (broadcast):\n$p")
  }

  test("q281: Page-Hinkley windows run on the filled minute frame") {
    val p = plan("q281_change_points")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-k cut must be a TakeOrdered:\n$p")
    assert(p.contains("Window"),
      s"the prefix/high-water windows are load-bearing:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"only the broadcast span may cross; the gap fill joins on the key:\n$p")
  }

  test("q282: simhash64 is one explode + one map-side-combinable 64-bit-sum agg") {
    val p = plan("q282_simhash64")
    assert(!p.contains("CartesianProduct") && !p.contains("Join"),
      s"fingerprinting never joins:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"the 64 bit sums must map-side combine before the shuffle:\n$p")
  }

  test("q283: incremental simhash64 is an id anti join + 16-bit band equi-joins, never a product") {
    val p = plan("q283_incr_simhash64")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the index probe must stay band-keyed:\n$p")
    assert(p.contains("LeftAnti"),
      s"redelivery must drop via one anti join on the id:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"fingerprint bit sums must map-side combine:\n$p")
  }

  test("q233: the truth corpus is a fixed-size TakeOrdered hash-cut, not a proportional sample") {
    val p = plan("q233_dedup_method_comparison")
    assert(p.contains("TakeOrderedAndProject"),
      s"the 400-doc hash-cut must compile to a TakeOrdered (map-side top-k):\n$p")
  }

  test("q284: unigram trainer rounds are vocab-sized — match grid joins broadcast, corpus aggregates once") {
    val p = plan("q284_unigram_train")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"vocab lookups must be piece-keyed equi-joins:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the bounded vocab must broadcast into the match grid:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"nothing in the trainer is big enough to sort-merge:\n$p")
  }

  test("q286: tokenizer comparison is three bounded aggregates, no corpus-sized join") {
    val p = plan("q286_tokenizer_compare")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the three fertility frames union; nothing crosses:\n$p")
  }

  test("q305: four-way tokenizer comparison stays vocab-bounded — no corpus-sized join, no product") {
    val p = plan("q305_tokenizer_compare4")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the four fertility frames union; nothing crosses:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"vocab lookups (unigram + wordpiece munch) must broadcast:\n$p")
  }

  test("q306: basket rules — pair explode from basket lists, broadcast item counts, TakeOrdered") {
    val p = plan("q306_basket_rules")
    assert(p.contains("Generate"),
      s"in-basket pairs must explode from the sorted item list, not self-join:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-30 rule cut must fuse to a TakeOrdered:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"item-count denominators join broadcast; only the 1-row total crosses:\n$p")
  }

  test("q307: modularity is joins + scalar roll-ups — no window, no product") {
    val p = plan("q307_community_modularity")
    assert(!p.contains("Window"),
      s"degrees, totals and intra counts are pure aggregates:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"only the broadcast 1-row roll-ups cross:\n$p")
  }

  test("q308: item neighbors — pair explode, broadcast counts, per-item rank only") {
    val p = plan("q308_item_neighbors")
    assert(p.contains("Generate") && p.contains("Window"),
      s"pairs explode from basket lists; the top-k is a per-item rank:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"per-item counts join broadcast:\n$p")
  }

  test("q309: silhouette — cell explode vs broadcast centroids, bounded rank, no product") {
    val p = plan("q309_cluster_silhouette")
    assert(p.contains("BroadcastHashJoin"),
      s"the kxdims centroid frame must broadcast into the cell explode:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"nothing in the audit is big enough to sort-merge:\n$p")
  }

  test("q311: next-order transitions — customer-keyed lead window, guarded joins, TakeOrdered") {
    val p = plan("q311_next_order_items")
    assert(p.contains("Window"),
      s"consecutive orders pair by a customer-keyed lead window:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-30 transition cut must fuse to a TakeOrdered:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"items attach by orderkey equi-joins only:\n$p")
  }

  test("q312: shot boundaries — frame explode + container-keyed lag window, no join at all") {
    val p = plan("q312_shot_boundaries")
    assert(p.contains("Generate") && p.contains("Window"),
      s"frames explode once; transitions come from an id-keyed lag:\n$p")
    assert(!p.contains("Join"),
      s"the whole detector is scan + window + aggregate:\n$p")
  }

  test("q313: range selectivity — percentile aggregate broadcast back, no corpus-sized join") {
    val p = plan("q313_range_selectivity")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"boundaries and the range spine are broadcast-sized:\n$p")
    assert(!p.contains("Window"),
      s"bucket assignment is pure integer comparison, never a rank:\n$p")
  }

  test("q314: modularity refinement — hash-aggregates + label joins, argmax never a rank window") {
    val p = plan("q314_modularity_refine")
    assert(!p.contains("Window"),
      s"the per-node argmax must be min(struct(-G, label)), map-side combinable:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"only broadcast 1-row roll-ups cross:\n$p")
  }

  test("q316: Neyman allocation — one stratum moment aggregate + broadcast totals, no window") {
    val p = plan("q316_neyman_allocation")
    assert(!p.contains("Window") && !p.contains("SortMergeJoin") &&
      !p.contains("CartesianProduct"),
      s"per-stratum moments hash-aggregate; totals broadcast back:\n$p")
  }

  test("q288: drift audit is broadcast span + key explode + two aggregates joined on the group key") {
    val p = plan("q288_payload_drift")
    assert(p.contains("Generate"),
      s"top-level key extraction is a bounded explode:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"only the 1-row span may cross; denominators join broadcast on the group key:\n$p")
    assert(!p.contains("Window"), s"presence rates are pure aggregates:\n$p")
  }

  test("q291: one event-grain aggregate, then calendar-sized spine windows; no product") {
    val p = plan("q291_seasonal_mase")
    assert(p.contains("Window"), s"the lag frames are load-bearing:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the spine joins on (key, day):\n$p")
    assert(p.contains("Generate"), s"the day spine is a bounded explode:\n$p")
  }

  test("q301: one cell aggregate + broadcast total + a 168-row peak window") {
    val p = plan("q301_weekday_heatmap")
    assert(p.contains("HashAggregate"), s"cells must partial-aggregate:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"only the 1-row total may cross:\n$p")
  }

  test("q300: session tag + rank windows, path agg, broadcast total, TakeOrdered cut") {
    val p = plan("q300_session_paths")
    assert(p.contains("Window"), s"the session/rank windows are load-bearing:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-15 cut must never be a global sort:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"only the 1-row session total may cross:\n$p")
  }

  test("q299: one conditional-count aggregate over the subject frame, nothing else") {
    val p = plan("q299_ab_chi2")
    assert(!p.contains("Join") && !p.contains("Window") && !p.contains("Generate"),
      s"the gate is two chained aggregates only:\n$p")
    assert(p.contains("HashAggregate"), s"cells must partial-aggregate:\n$p")
  }

  test("q298: the payload path is pure HOF projection - key equi-joins only, no explode, no window") {
    val p = plan("q298_crypto_shred")
    assert(!p.contains("Generate"),
      s"encrypt/decrypt must stay inside per-row transform():\n$p")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      s"only subject-keyed joins and one aggregate:\n$p")
  }

  test("q296: the sweep is metadata-sized - two zone aggregates, boundary windows, no product") {
    val p = plan("q296_clustering_depth")
    assert(!p.contains("CartesianProduct"),
      s"only the 1-row span may cross:\n$p")
    assert(p.contains("Window"), s"the boundary sweep windows are load-bearing:\n$p")
  }

  test("q295: probe side joins on the LSH bucket; only the broadcast truth side may cross") {
    val p = plan("q295_retrieval_ndcg")
    assert(!p.contains("CartesianProduct"),
      s"the exact side must ride the 10-row query broadcast:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the graded-truth cross is expected to be a broadcast NLJ:\n$p")
    assert(p.contains("hashpartitioning(bkt") || p.contains("[bkt"),
      s"the probe join must be bucket-keyed:\n$p")
  }

  test("q294: fingerprints are HOF projections (one band explode); pair join band-blocked") {
    val p = plan("q294_dhash_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidates must meet only inside a (band_idx, band_val) block:\n$p")
    // one Generate for the 4-band explode; the cell/bit extraction must
    // not add corpus explodes of its own
    assert("Generate".r.findAllIn(p).size <= 2, s"unexpected extra explodes:\n$p")
  }

  test("q302: frame fingerprints HOF-projected; pair join blocked on (frame, band), never all-pairs") {
    // q302's query frame serves from QueryCaches.videoPairsFor (a cache
    // scan); the load-bearing plan is the operator over the same corpus
    val p = graft.ext.Multimodal.videoDhashNearDups(
        ExtensionQueries.videoCorpus(spark, sf), "doc_id", "text",
        n = 4, frameBytes = 96, maxHamming = 3, minShared = 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidates must meet only inside a (frame_idx, band_idx, band_val) block:\n$p")
    // generators: one frame posexplode per side's lineage + one band
    // explode per side — the dHash cell/bit extraction itself must stay
    // a projection (no corpus-sized explode)
    assert("Generate".r.findAllIn(p).size <= 4, s"unexpected extra explodes:\n$p")
    // container verdicts aggregate distinct frame votes — a hash agg, no
    // global sort anywhere
    assert(p.contains("HashAggregate"), s"frame voting must hash-aggregate:\n$p")
  }

  test("q310: chroma fingerprints HOF-projected; pair join blocked on (window, band), never all-pairs") {
    // q310's query frame serves from QueryCaches.audioPairsFor (a cache
    // scan); the load-bearing plan is the operator over the same corpus
    val p = graft.ext.Multimodal.audioChromaNearDups(
        ExtensionQueries.audioCorpus(spark, sf), "doc_id", "text",
        n = 6, windowChars = 128, maxHamming = 3, minShared = 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidates must meet only inside a (window_idx, band_idx, band_val) block:\n$p")
    // generators: one window explode per side's lineage + one band explode
    // per side — the 33-energy/32-bit extraction itself must stay a
    // projection (no corpus-sized explode)
    assert("Generate".r.findAllIn(p).size <= 4, s"unexpected extra explodes:\n$p")
    // container verdicts aggregate distinct window votes — a hash agg
    assert(p.contains("HashAggregate"), s"window voting must hash-aggregate:\n$p")
  }

  test("q321: audio segments — chroma scan + container-keyed lag window, no join at all") {
    val p = plan("q321_audio_segments")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"novelty segmentation is scan + window + agg — no join belongs here:\n$p")
    assert(p.contains("Window"), s"the lag must run on a container-keyed window:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"the per-container roll-up must map-side combine:\n$p")
  }

  test("q320: incremental chroma probe — anti join on container id, every join block/id-keyed") {
    val p = plan("q320_audio_chroma_incremental")
    assert(p.contains("LeftAnti"),
      s"redelivered container ids must drop via the anti join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the index probe must stay (window_idx, band) blocked:\n$p")
    assert(p.contains("HashAggregate"), s"window voting must hash-aggregate:\n$p")
  }

  test("q293: decomposition runs on the calendar spine — bounded windows, broadcast seasonal join") {
    val p = plan("q293_seasonal_decompose")
    assert(p.contains("Window"), s"the centered trend window is load-bearing:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"the seasonal/spread frames join broadcast on the key:\n$p")
    assert(p.contains("Generate"), s"the day spine is a bounded explode:\n$p")
  }

  test("q292: the sketch side is one histogram aggregate; rank selection runs histogram-sized") {
    val p = plan("q292_hdr_quantiles")
    assert(p.contains("HashAggregate"),
      s"the bucket histogram must be a partial+final hash aggregate:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"rank selection joins on the key over histogram-sized frames:\n$p")
    // exactly the audit's per-key sort (exact side) may appear; the
    // sketch path must not add a second corpus-wide sort
    assert("Sort ".r.findAllIn(p).size <= 4, s"unexpected extra sorts:\n$p")
  }

  test("q289: the corpus pays one O(k)-state sketch aggregate; pair ops run sketch-sized") {
    val p = plan("q289_audience_overlap")
    assert(p.contains("ObjectHashAggregate"),
      s"the KMV value sketch must fold as a TypedImperativeAggregate " +
        s"(map-side combine, O(k) partials):\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the only non-equi pairing is the broadcast |types|-row sketch frame:\n$p")
    assert(!p.contains("Window"),
      s"no rank window — the k-min cut happens inside the aggregate buffer:\n$p")
  }

  test("q287: the maintenance → merge stage is anti join + bucket probes + a k-bounded rank, no product") {
    // the composed query's walk materializes per round (the q223 checkpoint
    // pattern pins that shape); here the NEW surface — incremental edges
    // folding into the adjacency — is pinned on the unexecuted merge frame
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.embeddings(spark, sf)
    val base = emb.filter(col("vec_id") >= 10 &&
      !(col("vec_id") >= 450 && col("vec_id") < 500))
    val index0 = graft.ext.VectorSearch.knnGraphIndex(base, "vec_id", "embedding", 6)
    val adj0 = graft.ext.VectorSearch.knnGraphIncrementalFromFresh(
        index0, index0.limit(0), "vec_id", k = 3)
      .select(col("id"), col("nbr_id"), col("sim_bp"))
    val edges = graft.ext.VectorSearch.knnGraphIncremental(
        emb.filter(col("vec_id") >= 440 && col("vec_id") < 500),
        index0, "vec_id", "embedding", 3, 6)
      .select(col("id"), col("nbr_id"), col("sim_bp"))
    val p = graft.ext.VectorSearch.mergeAdjacency(adj0, edges, k = 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"index probe and merge must stay bucket/id-keyed:\n$p")
    assert(p.contains("LeftAnti"),
      s"redelivered batch ids must drop via the anti join:\n$p")
    assert(p.contains("Window"), s"the per-id top-k rank is load-bearing:\n$p")
  }

  test("q318: correlated scalar subqueries decorrelate into one per-part aggregate join") {
    val p = plan("q318_small_qty_revenue")
    // RewriteCorrelatedScalarSubquery must have rewritten BOTH correlated
    // aggregates (count, sum per l_partkey) into a join against a grouped
    // frame — a surviving per-row subquery would re-scan lineitem per row
    assert(!p.toLowerCase.contains("scalar-subquery"),
      s"correlated scalar subquery survived to the physical plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"decorrelation must produce an equi-join:\n$p")
    // each correlated aggregate decorrelates into a per-partkey aggregate
    // join (two subtrees — MergeScalarSubqueries does not fold
    // decorrelated correlated aggregates; the hand-fused single-aggregate
    // form is q207-q213's tier); partial+final on l_partkey must appear
    assert(p.split("keys=\\[l_partkey").length - 1 >= 2,
      s"expected per-partkey aggregate joins (partial+final):\n$p")
  }

  test("q319: IN + correlated window-sum decorrelates — semi joins + one left outer agg join") {
    val p = plan("q319_promo_suppliers")
    assert(!p.toLowerCase.contains("scalar-subquery"),
      s"correlated scalar subquery survived to the physical plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"every join must stay keyed:\n$p")
    // the IN-subqueries become semi joins; the correlated window sum must
    // join LEFT OUTER so zero-shipment pairs keep their COALESCE(…, 0)
    // row (the count-bug guard) rather than vanishing through an inner join
    assert(p.contains("LeftSemi"), s"IN predicates must plan as semi joins:\n$p")
    assert(p.contains("LeftOuter"),
      s"the correlated sum must decorrelate as a left outer join (count-bug guard):\n$p")
  }

  test("q327: EXISTS/NOT-EXISTS pair decorrelates into keyed semi + anti joins") {
    val p = plan("q327_sole_blame_suppliers")
    // the two correlated existential subqueries against lineitem must
    // plan as ONE left-semi and ONE left-anti join keyed on l_orderkey
    // (the supplier inequality rides as the join residual) — a surviving
    // per-row subquery would re-scan lineitem once per outer row
    assert(!p.toLowerCase.contains("scalar-subquery"),
      s"correlated subquery survived to the physical plan:\n$p")
    assert(p.contains("LeftSemi"), s"EXISTS must plan as a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS must plan as an anti join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"both existential joins must stay keyed on l_orderkey:\n$p")
    // the status/returnflag predicates must reach the scans
    assert(p.contains("EqualTo(o_orderstatus,F)") && p.contains("EqualTo(l_returnflag,R)"),
      s"filters not pushed to parquet:\n$p")
  }

  test("q328: scalar-average gates fuse into one shared aggregate + keyed anti join") {
    val p = plan("q328_dormant_rich_customers")
    // the count and sum scalar subqueries share one base frame;
    // MergeScalarSubqueries must fuse them into a single aggregate
    // subtree (the mergedValue struct) executed ONCE — not once per gate
    assert(p.contains("mergedValue"),
      s"scalar aggregates did not merge into one shared subtree:\n$p")
    assert(p.contains("LeftAnti"),
      s"NOT EXISTS must plan as an anti join on o_custkey:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"every join must stay keyed:\n$p")
    assert(p.contains("In(c_nationkey, [0,1,2,3,4,5,6])"),
      s"the nation-band filter must reach the customer scan:\n$p")
  }

  test("q329: correlated MIN over a join chain decorrelates into a per-part min-agg join") {
    val p = plan("q329_min_cost_supplier")
    // the scalar MIN correlated on the outer part key — whose inner query
    // is itself a 4-table join — must rewrite into ONE per-partkey min
    // aggregate over the joined frame plus an equi-join back on
    // (partkey, min); a surviving subquery would re-run the join chain
    // once per candidate row
    assert(!p.toLowerCase.contains("scalar-subquery"),
      s"correlated scalar subquery survived to the physical plan:\n$p")
    assert(p.contains("partial_min(unit_cents"),
      s"the decorrelated min must combine map-side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the min-agg join-back must stay keyed:\n$p")
    // the region constant reaches BOTH region scans (outer + decorrelated)
    assert(p.split("EqualTo\\(r_name,EUROPE\\)").length - 1 >= 2,
      s"region filter not pushed to both scans:\n$p")
  }

  test("q331: conformal quantile — spine order statistic, corpus never globally sorts") {
    val p = plan("q331_conformal_sets")
    // the corpus side is hash-aggregates only; the single Sort feeds the
    // cumulative-count window over the POST-AGGREGATION distinct-score
    // spine (ppm-domain-bounded), never the scored rows
    assert(p.split("Sort \\[").length - 1 == 1,
      s"exactly one sort (the spine window's) is allowed:\n$p")
    assert(p.contains("Window"), s"the spine cumulative count is load-bearing:\n$p")
    // the per-α quantile folds through a keyed min aggregate with a
    // map-side partial — not a per-row subquery
    assert(p.contains("partial_min(__s"),
      s"the order statistic must combine map-side:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"only α-bounded broadcast loops may appear:\n$p")
    // eval folds in one partial+final conditional aggregate
    assert(p.split("partial_count").length - 1 >= 2,
      s"eval and n_cal counts must combine map-side:\n$p")
  }

  test("q332: NOT IN plans as a single-column NULL-AWARE anti join, count-distinct expands") {
    val p = plan("q332_supplier_relation_count")
    // NOT IN is not a plain anti join (three-valued NULL semantics):
    // Catalyst must emit the null-aware broadcast variant — the trailing
    // `true` on the LeftAnti BroadcastHashJoin is the NAAJ flag — never
    // a nested-loop fallback
    assert(p.contains("LeftAnti, BuildRight, true"),
      s"NOT IN must plan as a null-aware broadcast anti join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the NAAJ must not fall back to a nested loop:\n$p")
    // count(DISTINCT suppkey) expands into the two-level distinct
    // aggregate with map-side partials
    assert(p.contains("partial_count(distinct"),
      s"count-distinct must combine map-side:\n$p")
    // (the pushed IN-list prints its values in string order)
    assert(p.contains("In(p_size"),
      s"the size filter must reach the part scan:\n$p")
  }

  test("q323: harmonic centrality — O(k) sketch-merge round, per-node carry, no explode") {
    // the returned frame is a checkpoint scan (the q87 pattern), so the
    // round's shape is pinned on the exposed one-round plan frame
    val ed = graft.Tables.lineitem(spark, sf)
      .select(org.apache.spark.sql.functions.col("l_orderkey").as("src"),
        org.apache.spark.sql.functions.col("l_partkey").as("dst"))
    val p = graft.ext.Graphs.harmonicRoundPlanFrame(ed, "src", "dst", k = 32)
      .queryExecution.executedPlan.toString
    assert(p.contains("graft_kmv_merge_arrays"),
      s"ball sketches must merge via the O(k)-state array aggregate:\n$p")
    assert(p.contains("partial_graft_kmv_merge_arrays"),
      s"the sketch merge must combine map-side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"every round must stay a node-keyed equi-join:\n$p")
    assert(!p.contains("Generate"),
      s"sketch arrays must never explode to element rows:\n$p")
  }

  test("q325: a betweenness BFS level is adj equi-join + σ hash-agg + visited anti-join") {
    // the returned frame is a checkpoint scan (the q87 pattern), so the
    // level's shape is pinned on the exposed one-level plan frame
    val ed = graft.Tables.lineitem(spark, sf)
      .select(org.apache.spark.sql.functions.col("l_orderkey").as("src"),
        org.apache.spark.sql.functions.col("l_partkey").as("dst"))
    val p = graft.ext.Graphs.betweennessRoundPlanFrame(ed, "src", "dst", pivots = 6)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"every level must stay a keyed equi-join:\n$p")
    assert(p.contains("LeftAnti"),
      s"already-visited (pivot, node) pairs must drop via the anti join:\n$p")
    assert(p.split("keys=\\[pivot").length - 1 >= 2,
      s"the σ sum must partial+final on (pivot, node):\n$p")
  }

  test("q222: JSD corpus work is ONE (source, bucket) agg; pair spine broadcasts") {
    val p = plan("q222_source_jsd")
    assert(p.split("HashAggregate").length >= 3,
      s"(source, bucket) counts must map-side combine:\n$p")
    // the ppm lookups are broadcast equi-joins keyed (source, bucket)
    assert(p.contains("BroadcastHashJoin"),
      s"ppm lookups must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"nothing corpus-sized may reach a join:\n$p")
  }

}
