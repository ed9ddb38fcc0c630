package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-splitting operators (extension tier,
  * SURVEY.md §7.4). Training pipelines need splits that are (a) stable
  * across reruns and engines, (b) driven by a key, not row position, so
  * resharding or re-ingesting the corpus never moves a document across the
  * train/eval boundary. Both come from hashing the key, never from `rand()`.
  *
  * Everything is a pure projection (codegen'd md5 + arithmetic) — no
  * shuffle, no state; the split column composes with any downstream
  * partitioning (`partitionBy("split")` writes the datasets out directly).
  */
object Sampling {

  /** 16-bit uniform hash bucket of a key: the first 4 hex chars of
    * md5(key-as-string), as a value in [0, 65536). String form of the key
    * keeps the digest engine-portable (DuckDB md5 hashes the same bytes).
    */
  def hashBucket16(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 4), 16, 10).cast("long")

  /** Deterministic train/validation split label: "train" for keys whose
    * 16-bit hash bucket falls below `trainBp`/10000 of the space, else
    * "val". `trainBp` is in basis points (9000 = 90% train).
    */
  def splitLabel(key: Column, trainBp: Int): Column = {
    require(trainBp >= 0 && trainBp <= 10000, "trainBp must be in [0, 10000]")
    // 65536 * trainBp / 10000 computed exactly in Long
    val threshold = (65536L * trainBp) / 10000L
    when(hashBucket16(key) < threshold, "train").otherwise("val")
  }

  /** Deterministic Bernoulli sample: keep rows whose hash bucket falls in
    * the first `keepBp`/10000 of the space. Unlike `df.sample`, stable
    * across engines, partitionings, and reruns.
    */
  def deterministicSample(df: DataFrame, keyCol: String, keepBp: Int): DataFrame =
    df.filter(hashBucket16(col(keyCol)) < (65536L * keepBp) / 10000L)

  /** Deterministic stratified sample: the `n` rows of each stratum whose
    * keys hash lowest (key as final tiebreak). Equal representation per
    * stratum regardless of stratum skew — the eval-set construction
    * pattern. One shuffle on the stratum column; rank state is one counter
    * per stratum.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(hashBucket16(col(keyCol)), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Token-budget subsample: per stratum (source/domain), admit documents
    * in deterministic hash order until the stratum's token budget is
    * reached — the "N tokens per domain" step that turns mixture WEIGHTS
    * into an actual training set. A document is admitted iff the budget
    * was not yet exhausted when its turn came (its cumulative predecessor
    * total < budget), so the final admitted doc may overshoot — the
    * standard greedy semantics, and the only prefix-local rule (admit
    * decisions depend on a running sum, never on later rows).
    *
    * SHARD-DECOMPOSED so a hot mega-stratum never sorts in one task. The
    * admission order is (hash16(key), key), and the 16 shards
    * `hash16 div 4096` are RANGE-CONTIGUOUS in that order — every row of
    * shard s precedes every row of shard s+1. So the global running sum
    * splits exactly: (1) a per-(stratum, shard) window computes the
    * in-shard running sum over corpus-sized data with the stratum's rows
    * spread across 16 tasks; (2) rows already past the budget INSIDE their
    * own shard are pruned — a cross-shard offset is ≥ 0, so they can never
    * be admitted, and (proof in the filter comment) no admitted row has a
    * pruned predecessor; (3) a final per-stratum window over the pruned
    * frame — now bounded by ~16 budgets' worth of rows per stratum,
    * CORPUS-SIZE-INDEPENDENT — reproduces the exact global `cum_tokens`.
    * One scan, two shuffles; the second moves only the bounded candidates.
    *
    * Output: the admitted rows plus `n_tokens` and `cum_tokens` (the
    * stratum's running total INCLUDING this row, in admission order) —
    * value-identical to the single-window formulation.
    */
  def tokenBudgetSample(
      df: DataFrame, strataCol: String, keyCol: String, tokenCountCol: String,
      budget: Long
  ): DataFrame = {
    require(budget > 0, "budget must be positive")
    val W = org.apache.spark.sql.expressions.Window
    val order = Seq(hashBucket16(col(keyCol)), col(keyCol))
    val wShard = W.partitionBy(col(strataCol), col("__shard"))
      .orderBy(order: _*)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val wStratum = W.partitionBy(col(strataCol))
      .orderBy(order: _*)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    df.withColumn("__shard", (hashBucket16(col(keyCol)) / 4096L).cast("long"))
      .withColumn("__cum_shard", sum(col(tokenCountCol)).over(wShard))
      // Prune rows that exhausted the budget within their own shard. Safe:
      // if a pruned row p (shard s) preceded some admitted row r, then r in
      // shard s after p has in-shard cum ≥ p's ≥ budget (pruned too), and r
      // in a later shard has offset ≥ shard s's total ≥ budget (never
      // admitted) — so admitted rows and their whole prefixes survive, and
      // the per-stratum window below sees exactly the original prefix.
      .filter(col("__cum_shard") - col(tokenCountCol) < budget)
      .withColumn("cum_tokens", sum(col(tokenCountCol)).over(wStratum))
      .filter(col("cum_tokens") - col(tokenCountCol) < budget)
      .drop("__shard", "__cum_shard")
  }

  /** Quality-cutoff planner: for each stratum, the score threshold whose
    * best-first survivors fit a token budget — the PLANNING twin of
    * [[tokenBudgetSample]] (which admits in hash order regardless of
    * quality): "if we keep only the highest-quality documents, where must
    * the cutoff sit to hit B tokens?" — the number a curation dashboard
    * publishes before anyone commits to a filter setting.
    *
    * Whole SCORE LEVELS are admitted best-first (every doc at a score
    * shares its fate — the value-cutoff approximation CCNet's bucket
    * variant makes, q113's discipline): the per-(stratum, score)
    * histogram is aggregated first, the cumulative window runs over that
    * bounded frame (≤ score-cardinality rows per stratum), and the
    * per-stratum answer is one more aggregate. The corpus never enters a
    * window.
    *
    * Output per stratum: (stratum, cutoff, n_docs_admitted,
    * tokens_admitted) — `cutoff` is the LOWEST admitted score;  strata
    * whose best score level alone overflows the budget admit nothing and
    * report cutoff = scoreSentinel (one above any real score).
    */
  def qualityCutoff(
      df: DataFrame, strataCol: String, scoreCol: String, tokenCountCol: String,
      budget: Long, scoreSentinel: Long
  ): DataFrame = {
    require(budget > 0, "budget must be positive")
    val W = org.apache.spark.sql.expressions.Window
    val wCum = W.partitionBy(col(strataCol)).orderBy(col(scoreCol).desc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    df.groupBy(col(strataCol), col(scoreCol))
      .agg(count(lit(1)).as("__docs"), sum(col(tokenCountCol)).as("__toks"))
      .withColumn("__cum", sum(col("__toks")).over(wCum))
      .groupBy(col(strataCol))
      .agg(
        min(when(col("__cum") <= budget, col(scoreCol))).as("__cut"),
        coalesce(sum(when(col("__cum") <= budget, col("__docs"))), lit(0L))
          .as("n_docs_admitted"),
        coalesce(sum(when(col("__cum") <= budget, col("__toks"))), lit(0L))
          .as("tokens_admitted"))
      .select(col(strataCol),
        coalesce(col("__cut"), lit(scoreSentinel)).as("cutoff"),
        col("n_docs_admitted"), col("tokens_admitted"))
  }

  /** Per-stratum percentile normalization: each row's score mapped to its
    * stratum-relative rank position, `pct_permille = (rows strictly
    * below)·1000 div stratum size` — the cross-source calibration step
    * before one global threshold is applied to heterogeneous sources
    * (CCNet cuts per-language percentiles, not absolute scores, for
    * exactly this reason; a TTR of 6000 is elite in one crawl dump and
    * median in another).
    *
    * Histogram-first (the [[qualityCutoff]] / q113 discipline): the
    * cumulative window runs over the bounded per-(stratum, score)
    * histogram, and the permille attaches back by a (stratum, score)
    * equi-join — score-cardinality rows, never a corpus-sized window.
    * Rows sharing a score share a percentile (the value-cutoff tie rule).
    *
    * Output: the input columns + pct_permille.
    */
  def scorePercentile(df: DataFrame, strataCol: String, scoreCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val wCum = W.partitionBy(col(strataCol)).orderBy(col(scoreCol))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val wTot = W.partitionBy(col(strataCol))
    val pct = df.groupBy(col(strataCol), col(scoreCol))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__tot", sum(col("__c")).over(wTot))
      .select(col(strataCol), col(scoreCol),
        expr("((__cum - __c) * 1000L) div __tot").as("pct_permille"))
    df.join(pct, Seq(strataCol, scoreCol))
  }

  /** Dataset-mixture reweighting: keep each row with a per-group Bernoulli
    * rate (basis points), `defaultBp` for groups not in the map — the
    * "upsample curated sources, downsample the crawl" step that applies
    * mixture WEIGHTS as admission rates (vs [[tokenBudgetSample]], which
    * applies absolute token CAPS). Hash-driven like every sampler here, so
    * a document's fate is a pure function of its key and never changes
    * across reruns or repartitioning; the keep test is the exact integer
    * cross-comparison `bucket·10000 < rate·65536` — no division anywhere,
    * so there is no floor-semantics edge to keep aligned across engines.
    * Pure codegen projection+filter, no shuffle; the rate map is a CASE
    * chain (mixtures have tens of sources, not millions — a map-scale
    * rate table would broadcast-join instead).
    */
  def mixtureSample(
      df: DataFrame, groupCol: String, keyCol: String,
      ratesBp: Map[String, Int], defaultBp: Int
  ): DataFrame = {
    require((defaultBp +: ratesBp.values.toSeq).forall(r => r >= 0 && r <= 10000),
      "rates must be in [0, 10000] basis points")
    val rate = ratesBp.toSeq.sortBy(_._1).foldLeft(lit(defaultBp.toLong)) {
      case (acc, (g, r)) => when(col(groupCol) === g, lit(r.toLong)).otherwise(acc)
    }
    df.filter(hashBucket16(col(keyCol)) * 10000L < rate * 65536L)
  }

  /** Target-matched domain reweighting (the mixture-construction step of
    * pretraining pipelines — The Pile's per-set weights, DoReMi's domain
    * reweighting, Llama's upsampling tables — reduced to the closed-form
    * case of a UNIFORM token target): for each source, the sampling rate
    * that equalizes post-sampling token mass across sources, capped at
    * keep-everything (a filter cannot oversample; under-represented
    * sources keep rate 10000 and the written plan upsamples them by
    * repetition downstream). Rates are exact basis points —
    * `rate_bp = min(10000, total_tokens·10000 div (|sources|·tokens_s))` —
    * and admission reuses [[mixtureSample]]'s deterministic hash rule, so
    * the same documents are kept on every engine and every rerun.
    *
    * Output: one row per source with the before/after audit —
    * (source, n_docs_before, tokens_before, rate_bp, n_docs_after,
    * tokens_after).
    *
    * Scale shape: two corpus-scan hash-aggregates (before-stats and
    * admitted-stats), a 1-row grand-total frame and a |sources|-row rate
    * frame riding broadcasts — no corpus-sized join side, no window, no
    * driver collect.
    */
  def domainReweight(df: DataFrame, sourceCol: String, keyCol: String,
                     nTokensCol: String): DataFrame = {
    val tot = df.groupBy(col(sourceCol)).agg(
      count(lit(1)).as("n_docs_before"),
      sum(col(nTokensCol)).as("tokens_before"))
    val grand = tot.agg(
      sum(col("tokens_before")).as("__tt"), count(lit(1)).as("__ns"))
    val rates = tot.crossJoin(broadcast(grand))
      .withColumn("rate_bp",
        when(col("tokens_before") > 0,
          least(lit(10000L), expr("(__tt * 10000) div (__ns * tokens_before)")))
          .otherwise(10000L))
      .select(col(sourceCol), col("n_docs_before"), col("tokens_before"), col("rate_bp"))
    val admitted = df
      .join(broadcast(rates.select(col(sourceCol), col("rate_bp"))), sourceCol)
      .filter(hashBucket16(col(keyCol)) * 10000L < col("rate_bp") * 65536L)
      .groupBy(col(sourceCol)).agg(
        count(lit(1)).as("n_docs_after"),
        sum(col(nTokensCol)).as("tokens_after"))
    rates.join(admitted, Seq(sourceCol), "left")
      .select(col(sourceCol), col("n_docs_before"), col("tokens_before"),
        col("rate_bp"),
        coalesce(col("n_docs_after"), lit(0L)).as("n_docs_after"),
        coalesce(col("tokens_after"), lit(0L)).as("tokens_after"))
  }

  /** Temperature-scaled mixture reweighting — the multilingual-corpus
    * sampling rule (Devlin et al. 2019 BERT appendix; Conneau & Lample
    * 2019 XLM; public): sample domain i proportional to p_i^α with
    * α = 1/2, so low-resource domains are up-weighted relative to their
    * raw share without letting any one domain dominate. [[domainReweight]]
    * is the α → 0 limit (uniform targets); raw sampling is α = 1; this is
    * the standard middle ground actual pretraining mixtures use.
    *
    * Exact-integer semantics (engine-portable): with n_i = domain token
    * counts, s_i = isqrt(n_i) = floor(sqrt(n_i)) and S = Σ s_j, domain
    * i's token target is `total · s_i / S`, so its admission rate is
    * `rate_bp_i = min(10000, ((total · 10000 div S) · s_i) div n_i)` —
    * the division by S happens BEFORE the multiply by s_i (pinned order,
    * replayed verbatim by the oracle) so the widest intermediate is
    * `total · 10000`, which holds in a BIGINT for corpora to ~10^14
    * tokens (~petabytes of text); the naive `total·s_i·10000` would
    * overflow three orders of magnitude earlier. After the isqrt every
    * step is BIGINT floor arithmetic. isqrt itself
    * is exact here: `floor(sqrt(double(n)))` is bit-stable across engines
    * for n < 2^52 (IEEE sqrt is correctly rounded; token counts beyond
    * 2^52 are not a thing). Admission reuses the [[hashBucket16]]
    * keep-test, so WHICH documents survive is part of the contract, not
    * just the rates.
    *
    * Output: (source, n_docs_before, tokens_before, sqrt_tokens, rate_bp,
    * n_docs_after, tokens_after).
    *
    * Scale shape: identical to [[domainReweight]] — two corpus-scan
    * hash-aggregates, a broadcast 1-row grand total and a broadcast
    * |sources|-row rate frame; no window, no collect.
    */
  def temperatureReweight(df: DataFrame, sourceCol: String, keyCol: String,
                          nTokensCol: String): DataFrame = {
    val tot = df.groupBy(col(sourceCol)).agg(
      count(lit(1)).as("n_docs_before"),
      sum(col(nTokensCol)).as("tokens_before"))
      .withColumn("sqrt_tokens", floor(sqrt(col("tokens_before").cast("double"))).cast("long"))
    val grand = tot.agg(
      sum(col("tokens_before")).as("__tt"), sum(col("sqrt_tokens")).as("__ss"))
    val rates = tot.crossJoin(broadcast(grand))
      .withColumn("rate_bp",
        when(col("tokens_before") > 0 && col("__ss") > 0,
          least(lit(10000L),
            expr("(((__tt * 10000) div __ss) * sqrt_tokens) div tokens_before")))
          .otherwise(10000L))
      .select(col(sourceCol), col("n_docs_before"), col("tokens_before"),
        col("sqrt_tokens"), col("rate_bp"))
    val admitted = df
      .join(broadcast(rates.select(col(sourceCol), col("rate_bp"))), sourceCol)
      .filter(hashBucket16(col(keyCol)) * 10000L < col("rate_bp") * 65536L)
      .groupBy(col(sourceCol)).agg(
        count(lit(1)).as("n_docs_after"),
        sum(col(nTokensCol)).as("tokens_after"))
    rates.join(admitted, Seq(sourceCol), "left")
      .select(col(sourceCol), col("n_docs_before"), col("tokens_before"),
        col("sqrt_tokens"), col("rate_bp"),
        coalesce(col("n_docs_after"), lit(0L)).as("n_docs_after"),
        coalesce(col("tokens_after"), lit(0L)).as("tokens_after"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score each raw document
    * by how target-like its hashed-token distribution is. DSIR's weight is
    * the likelihood ratio Π p_target(f)/p_raw(f) over hashed n-gram
    * features; the engine-portable exact-integer surrogate here is the
    * per-token MEAN likelihood ratio in permille —
    * `dsir_permille = Σ_b c_doc(b)·lr(b) div Σ_b c_doc(b)` with
    * `lr(b) = pt_ppm(b)·1000 div max(pr_ppm(b), 1)` and Laplace-smoothed
    * parts-per-million bucket probabilities
    * `p*_ppm(b) = (count(b)+1)·1e6 div (N+buckets)` — an arithmetic (not
    * geometric) mean, so no floats, no logs, and a DuckDB oracle
    * reproduces it bit-for-bit. Ranking by it preserves DSIR's intent:
    * documents whose tokens concentrate in target-heavy buckets score
    * high.
    *
    * Rows with `isTargetCol` = true define the target distribution and are
    * scored-against, not scored; output is one row per raw document that
    * has ≥ 1 token: (idCol, n_tokens, dsir_permille).
    *
    * Scale shape: the model is exactly `buckets` rows (built by one
    * hash-aggregate over the exploded token stream + a broadcast 1-row
    * totals frame) and broadcasts into the scoring join; scoring is a
    * per-(doc, bucket) hash-aggregate (map-side combinable, ≤ `buckets`
    * rows per doc) followed by a doc-keyed roll-up. Two corpus scans
    * total, no windows, no corpus-sized join sides.
    */
  /** The hashed-feature bucket shared by every DSIR surface (model
    * training, batch scoring, the streaming scorer): bucket identity is
    * DEFINED by this expression — all call sites must agree or scores
    * silently diverge from the model.
    */
  def tokenBucket(tok: Column, buckets: Int): Column =
    pmod(hashBucket16(tok), lit(buckets.toLong))

  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
                        isTargetCol: String, buckets: Int = 128): DataFrame = {
    require(buckets > 0 && buckets <= 65536, "buckets must be in [1, 65536]")
    val feat = df.select(col(idCol), col(isTargetCol).as("__t"),
        explode(TextDedup.tokens(col(textCol))).as("__tok"))
      .withColumn("__b", tokenBucket(col("__tok"), buckets))
      .drop("__tok")
    val docFeat = feat.filter(!col("__t"))
      .groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__c"))
    docFeat.join(broadcast(importanceModel(df, textCol, isTargetCol, buckets)), "__b")
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_tokens"),
        sum(col("__c") * col("__lr")).as("__score"))
      .select(col(idCol), col("n_tokens"),
        expr("__score div n_tokens").as("dsir_permille"))
  }

  /** The frozen DSIR bucket model on its own: `(__b, __lr)` — one row per
    * hashed-token bucket with the Laplace-smoothed likelihood ratio in
    * permille (see [[importanceWeights]] for the arithmetic). Train once
    * on a static corpus, then broadcast into batch scoring or a
    * stream-static join ([[graft.streaming.StreamPipelines.dsirScoreStream]]).
    */
  def importanceModel(df: DataFrame, textCol: String, isTargetCol: String,
                      buckets: Int = 128): DataFrame = {
    require(buckets > 0 && buckets <= 65536, "buckets must be in [1, 65536]")
    val counts = df.select(col(isTargetCol).as("__t"),
        explode(TextDedup.tokens(col(textCol))).as("__tok"))
      .withColumn("__b", tokenBucket(col("__tok"), buckets))
      .groupBy(col("__b")).agg(
        sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"),
        sum(when(col("__t"), 0L).otherwise(1L)).as("__cr"))
    val totals = counts.agg(
      coalesce(sum(col("__ct")), lit(0L)).as("__nt"),
      coalesce(sum(col("__cr")), lit(0L)).as("__nr"))
    counts.crossJoin(broadcast(totals))
      .withColumn("__pt", expr(s"((__ct + 1L) * 1000000L) div (__nt + ${buckets}L)"))
      .withColumn("__pr", expr(s"((__cr + 1L) * 1000000L) div (__nr + ${buckets}L)"))
      .select(col("__b"),
        expr("(__pt * 1000L) div greatest(__pr, 1L)").as("__lr"))
  }

  /** Priority sampling (Duffield, Lund & Thorup 2007, "Priority
    * sampling for estimation of arbitrary subset sums"): per stratum, the
    * `k` rows with the largest priority `q_i = w_i / u_i`, with the
    * uniform `u_i` derived deterministically from the key hash —
    * `u_i = (h_i + 1) / 65536, h_i =` [[hashBucket16]] — so the sample is
    * an exact-integer, rerun-stable weighted sample without replacement:
    * `priority = (w · 65536) div (h + 1)`. Heavier rows draw larger
    * priorities, every row keeps a nonzero chance, and (unlike top-k by
    * raw weight) the sample is unbiased-estimable — the DLT estimator
    * needs exactly this priority, which is why the column is emitted.
    *
    * Scale shape: the same shard decomposition as [[tokenBudgetSample]] —
    * a per-(stratum, hash-shard) rank keeps ≤ `k` rows per shard (each
    * shard sorts 1/`shards` of a stratum, all shards in parallel), then
    * the per-stratum rank runs over ≤ `shards`·`k` survivors. A hot
    * stratum holding half the corpus never sorts in one task.
    *
    * Weights must be positive; ties break on priority then key. Output:
    * the input columns plus `priority`.
    */
  /** 2-D Pareto front (skyline): the rows not dominated under (maximize
    * `maximizeCol`, minimize `minimizeCol`) — the curation frontier
    * "best quality at every cost level" selection. A row is dominated iff
    * some other row is ≥ in the maximized dimension, ≤ in the minimized
    * one, and strictly better in at least one.
    *
    * Never the naive quadratic dominance join: one histogram aggregate
    * per maximize-level (min of the minimized column), a running min over
    * the |distinct levels|-row spine (strictly-higher levels only), and a
    * join-back. A row survives iff it achieves its level's min AND beats
    * every strictly better level's best — the exact 2-D skyline, with
    * ties kept (equal (q, t) rows don't dominate each other).
    */
  def paretoFront(df: DataFrame, idCol: String,
                  maximizeCol: String, minimizeCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val hist = df.groupBy(col(maximizeCol)).agg(min(col(minimizeCol)).as("__mt"))
    val wAbove = W.orderBy(col(maximizeCol).desc)
      .rowsBetween(W.unboundedPreceding, -1)
    val spine = hist.withColumn("__above", min(col("__mt")).over(wAbove))
    df.join(spine, Seq(maximizeCol))
      .filter(col(minimizeCol) === col("__mt") &&
        (col("__above").isNull || col(minimizeCol) < col("__above")))
      .select(col(idCol), col(maximizeCol), col(minimizeCol))
  }

  /** Rendezvous (highest-random-weight) shard for a key: argmax over
    * shard candidates j < k of the 16-bit hash of `key|j`, ties to the
    * smallest j (a deterministic CASE-order rule both engines share).
    * Unlike `hash % k`, growing k to k+1 relocates only the keys the NEW
    * shard wins — ~1/(k+1) of them — instead of ~k/(k+1); this is the
    * sharding that lets a 100 TB keyed layout add capacity without
    * rewriting everything (Thaler-Ravishankar HRW).
    */
  def rendezvousShard(key: Column, k: Int): Column = {
    require(k > 1, "k must be > 1")
    val hs = (0 until k).map(j =>
      hashBucket16(concat(key.cast("string"), lit(s"|$j"))))
    val mx = greatest(hs: _*)
    hs.zipWithIndex.tail
      .foldLeft(when(hs.head === mx, 0L)) { case (acc, (h, j)) =>
        acc.when(h === mx, j.toLong)
      }
      .otherwise(lit((k - 1).toLong))
  }

  /** Integer Poisson(1) thresholds in the 16-bit hash space: cumulative
    * ⌊65536·P(W ≤ k)⌋ for k = 0..6 — shared by the Spark expression and
    * (verbatim) the DuckDB oracle, so the weight draw is engine-exact.
    */
  private[graft] val Pois1Cdf16: Seq[Long] =
    Seq(24109L, 48218L, 60273L, 64291L, 65296L, 65497L, 65530L)

  /** Deterministic Poisson(1) weight for one (replicate, key) pair, by
    * inverse-CDF lookup on the 16-bit key hash. Mass above the last
    * threshold (≈ 9e-5) truncates to 7 — identically in both engines.
    */
  private[graft] def poissonWeight(h: Column): Column =
    Pois1Cdf16.zipWithIndex.foldRight(lit(7L): Column) {
      case ((t, k), rest) => when(h < t, lit(k.toLong)).otherwise(rest)
    }

  /** Poisson-bootstrap confidence interval for a mean — the resampling
    * scheme that actually runs at corpus scale (Chamandy et al., "Estimating
    * Uncertainty for Massive Data Streams", Google 2012): instead of B
    * materialized with-replacement resamples (B·n rows shuffled), every row
    * draws an independent Poisson(1) multiplicity per replicate from its own
    * key hash, and each replicate's mean is Σw·x / Σw. The explode is a
    * pure projection; partial aggregation collapses it map-side, so only
    * B partial rows per input partition ever shuffle — no resample is
    * materialized, no row leaves its partition.
    *
    * Everything is exact-integer: the weight comes from an integer
    * inverse-CDF on the 16-bit hash, replicate means are computed in
    * permille with floor division, and the CI bounds are rank statistics
    * (rank ⌈α·B⌉ and ⌈(1−α)·B⌉ over (mean, replicate) — a total order).
    *
    * Output: one row (n_reps, point_permille, lo_permille, hi_permille).
    */
  def poissonBootstrapCI(df: DataFrame, keyCol: String, valueCol: String,
                         reps: Int, alphaBp: Int = 250): DataFrame = {
    require(reps > 1, "reps must be > 1")
    require(alphaBp > 0 && alphaBp < 5000, "alphaBp in (0, 5000)")
    val loRank = (alphaBp * reps + 9999) / 10000          // ⌈α·B⌉
    val hiRank = ((10000 - alphaBp) * reps + 9999) / 10000 // ⌈(1−α)·B⌉
    val W = org.apache.spark.sql.expressions.Window
      .orderBy(col("mean_permille"), col("__b"))
    val rep = df
      .select(col(keyCol).cast("string").as("__k"), col(valueCol).cast("long").as("__x"))
      .withColumn("__b", explode(sequence(lit(0), lit(reps - 1))))
      .withColumn("__w", poissonWeight(
        hashBucket16(concat(col("__b").cast("string"), lit("|"), col("__k")))))
    val means = rep.groupBy(col("__b"))
      .agg(sum(col("__w") * col("__x")).as("__wx"), sum(col("__w")).as("__ws"))
      .withColumn("mean_permille", expr("(__wx * 1000L) div __ws"))
    // B rows total — the global rank window is driver-scale by construction
    val ranked = means
      .withColumn("__rnk", row_number().over(W))
      .filter(col("__rnk") === loRank || col("__rnk") === hiRank)
      .agg(min(col("mean_permille")).as("lo_permille"),
        max(col("mean_permille")).as("hi_permille"))
    val point = df.agg(
      expr(s"(sum(CAST($valueCol AS BIGINT)) * 1000L) div count(1)").as("point_permille"))
    point.crossJoin(ranked).select(
      lit(reps.toLong).as("n_reps"), col("point_permille"),
      col("lo_permille"), col("hi_permille"))
  }

  def prioritySample(df: DataFrame, strataCol: String, keyCol: String,
                     weightCol: String, k: Int, shards: Int = 16): DataFrame = {
    require(k > 0, "k must be positive")
    require(shards > 0 && 65536 % shards == 0, "shards must divide 65536")
    val W = org.apache.spark.sql.expressions.Window
    val width = 65536L / shards
    val staged = df
      .withColumn("__h", hashBucket16(col(keyCol)))
      .withColumn("__prio", expr(s"($weightCol * 65536L) div (__h + 1L)"))
      .withColumn("__shard", expr(s"__h div ${width}L"))
    val wShard = W.partitionBy(col(strataCol), col("__shard"))
      .orderBy(col("__prio").desc, col(keyCol))
    val wStratum = W.partitionBy(col(strataCol))
      .orderBy(col("__prio").desc, col(keyCol))
    staged
      .withColumn("__rs", row_number().over(wShard))
      .filter(col("__rs") <= k) // ≤ shards·k rows per stratum survive
      .withColumn("__rn", row_number().over(wStratum))
      .filter(col("__rn") <= k)
      .drop("__h", "__shard", "__rs", "__rn")
      .withColumnRenamed("__prio", "priority")
  }

  /** Mixture-concentration report — one row of corpus-composition health:
    * how concentrated is the token mass across groups (sources /
    * languages / domains)? Emits the Shannon entropy of the group shares
    * (quantized milli-nats, the zipfFit log convention), the EFFECTIVE
    * group count exp(H) (Hill number of order 1 — "this 40-source corpus
    * behaves like 7 sources"), the exact Gini coefficient over the
    * sorted group masses, and the top-1/top-5 mass shares. The table a
    * mixture review reads before debating per-source budgets.
    *
    * Scale shape: the corpus enters ONE map-side-combinable token-count
    * aggregate; the sort behind Gini/top-k is a window over |groups|
    * rows (a catalog-scale cardinality), and the totals ride 1-row
    * broadcasts.
    *
    * Output: (n_groups, n_tokens, entropy_milli, effective_groups_milli,
    * gini_milli, top1_share_bp, top5_share_bp).
    */
  def mixtureConcentration(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val lnMilli = (c: Column) => round(log(c.cast("double")) * 1000).cast("long")
    val tok = df
      .select(col(groupCol).as("__grp"),
        size(graft.ext.TextDedup.tokens(col(textCol))).cast("long").as("__n"))
      .groupBy(col("__grp")).agg(sum(col("__n")).as("__c"))
      .filter(col("__c") > 0L)
    val w = W.orderBy(col("__c"), col("__grp"))
    val wd = W.orderBy(col("__c").desc, col("__grp"))
    val ranked = tok
      .withColumn("__i", row_number().over(w).cast("long"))
      .withColumn("__rd", row_number().over(wd).cast("long"))
    ranked.agg(
        count(lit(1)).as("n_groups"),
        sum(col("__c")).as("n_tokens"),
        sum(col("__c") * lnMilli(col("__c"))).as("__clc"),
        sum(col("__i") * col("__c")).as("__iwx"),
        sum(when(col("__rd") === 1L, col("__c")).otherwise(0L)).as("__t1"),
        sum(when(col("__rd") <= 5L, col("__c")).otherwise(0L)).as("__t5"))
      .withColumn("entropy_milli",
        greatest(lit(0L), lnMilli(col("n_tokens")) - expr("__clc div n_tokens")))
      .withColumn("effective_groups_milli",
        round(exp(col("entropy_milli").cast("double") / 1000.0) * 1000).cast("long"))
      .withColumn("gini_milli",
        expr("""(2L * __iwx - (n_groups + 1L) * n_tokens) * 1000L
               div (n_groups * n_tokens)"""))
      .withColumn("top1_share_bp", expr("(__t1 * 10000L) div n_tokens"))
      .withColumn("top5_share_bp", expr("(__t5 * 10000L) div n_tokens"))
      .select(col("n_groups"), col("n_tokens"), col("entropy_milli"),
        col("effective_groups_milli"), col("gini_milli"),
        col("top1_share_bp"), col("top5_share_bp"))
  }

  /** Temperature-sampling α-sweep table: for every α tier, each group's
    * sampling share under rate ∝ tokens^α — the mixing knob multilingual
    * pretraining sweeps (α = 1 is proportional, α → 0 uniform; mT5 (Xue
    * et al. 2021) and XLM-R tune α against exactly this share table, and
    * [[temperatureReweight]] applies the α = 1/2 point). Weights quantize
    * to integer milli via the [[graft.ext.TextStats.zipfFit]] log
    * convention — w_milli = round(1000·exp(α·ln n)) — so shares are
    * exact-integer after the one float step and the oracle replays them.
    *
    * Scale shape: the corpus enters ONE map-side-combinable token-count
    * aggregate; the α spine is a literal explode over |groups| rows, and
    * the per-α normalizer is a |groups|-row aggregate joined back — no
    * corpus-sized operator after the first.
    *
    * Output per (alpha_milli, groupCol): (n_tokens, weight_milli,
    * share_bp).
    */
  def temperatureSweep(df: DataFrame, groupCol: String, textCol: String,
                       alphasMilli: Seq[Int]): DataFrame = {
    require(alphasMilli.nonEmpty && alphasMilli.forall(a => a >= 0 && a <= 2000),
      "alphas are milli-exponents in [0, 2000]")
    val ts = alphasMilli.distinct.sorted
    val tok = df
      .select(col(groupCol).as("__grp"),
        size(graft.ext.TextDedup.tokens(col(textCol))).cast("long").as("__n"))
      .groupBy(col("__grp")).agg(sum(col("__n")).as("n_tokens"))
      .filter(col("n_tokens") > 0L)
    val alphaArr = array(ts.map(a => lit(a.toLong)): _*)
    val weighted = tok
      .select(col("__grp"), col("n_tokens"), explode(alphaArr).as("alpha_milli"))
      .withColumn("weight_milli",
        round(exp(log(col("n_tokens").cast("double"))
          * (col("alpha_milli").cast("double") / 1000.0)) * 1000).cast("long"))
    val norms = weighted.groupBy(col("alpha_milli"))
      .agg(sum(col("weight_milli")).as("__tot"))
    weighted.join(norms, "alpha_milli")
      .withColumn("share_bp", expr("(weight_milli * 10000L) div __tot"))
      .select(col("alpha_milli"), col("__grp").as(groupCol),
        col("n_tokens"), col("weight_milli"), col("share_bp"))
  }

  /** UniMax language-budget allocation (Chung et al. 2023, "UniMax: Fairer
    * and More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): distribute a total token budget across groups
    * (languages) as uniformly as possible, subject to a per-group cap of
    * `maxEpochs` passes over its data — the allocation that avoids both
    * proportional sampling's head-language dominance and temperature
    * sampling's unbounded tail-language repetition. Greedy water-filling:
    * groups ascending by cap; each takes min(cap, remaining ÷ remaining
    * groups). With ascending caps the capped set is a prefix, so the
    * whole allocation is a closed form over prefix sums: group i is
    * capped iff cap_i · (k−i+1) ≤ B − Σ_{j<i} cap_j, and every uncapped
    * group gets (B − Σ_capped) div |uncapped| — exact integers, replayed
    * branch-for-branch by a SQL oracle.
    *
    * Scale shape: the corpus enters ONE map-side-combinable token-count
    * aggregate; everything after runs on |groups| rows (languages — a
    * bounded, human-scale cardinality), so the global prefix-sum window
    * and the two 1-row broadcast joins never see corpus-sized data.
    *
    * Output: one row per group — (groupCol, n_tokens, cap_tokens,
    * capped, alloc_tokens, epochs_milli) with epochs_milli =
    * alloc·1000 div n_tokens (the per-group repetition factor the
    * sampler downstream turns into weights).
    */
  def unimaxBudget(df: DataFrame, groupCol: String, textCol: String,
                   budgetTokens: Long, maxEpochs: Int): DataFrame = {
    require(budgetTokens > 0L, "budget must be positive")
    require(maxEpochs >= 1, "epoch cap must be >= 1")
    val W = org.apache.spark.sql.expressions.Window
    val tok = df
      .select(col(groupCol).as("__grp"),
        size(graft.ext.TextDedup.tokens(col(textCol))).cast("long").as("__n"))
      .groupBy(col("__grp")).agg(sum(col("__n")).as("n_tokens"))
      .withColumn("cap_tokens", col("n_tokens") * maxEpochs)
    val w = W.orderBy(col("cap_tokens"), col("__grp"))
    val ranked = tok
      .withColumn("__i", row_number().over(w).cast("long"))
      .withColumn("__s_prev", coalesce(
        sum(col("cap_tokens")).over(w.rowsBetween(W.unboundedPreceding, -1)),
        lit(0L)))
    val kTot = ranked.agg(count(lit(1)).as("__k"))
    val flagged = ranked.crossJoin(broadcast(kTot))
      .withColumn("capped",
        col("cap_tokens") * (col("__k") - col("__i") + 1L) <=
          lit(budgetTokens) - col("__s_prev"))
    val tStats = flagged.agg(
      coalesce(max(when(col("capped"), col("__i"))), lit(0L)).as("__t"),
      coalesce(sum(when(col("capped"), col("cap_tokens"))), lit(0L)).as("__st"),
      max(col("__k")).as("__kk"))
    flagged.crossJoin(broadcast(tStats))
      .withColumn("alloc_tokens",
        when(col("capped"), col("cap_tokens"))
          .otherwise(expr(s"(${budgetTokens}L - __st) div (__kk - __t)")))
      .withColumn("epochs_milli", expr("(alloc_tokens * 1000L) div n_tokens"))
      .select(col("__grp").as(groupCol), col("n_tokens"), col("cap_tokens"),
        col("capped"), col("alloc_tokens"), col("epochs_milli"))
  }

  /** Group-DRO multiplicative-weights domain reweighting — the mixture
    * OPTIMIZATION loop beside [[domainReweight]]'s closed form (DoReMi:
    * Xie et al. 2023 §3 optimizes domain weights by exponentiated
    * gradient on per-domain excess loss; this runs the polynomial-weights
    * variant of the same multiplicative-weights method — Arora, Hazan &
    * Kale's 2012 survey — so the WHOLE loop is exact integer arithmetic
    * with no transcendental cross-engine parity risk): each round,
    * domains whose mean loss exceeds the current weighted average
    * multiply their weight by (1 + η·excess), and the reported weight is
    * the ROUND AVERAGE of the iterates (DoReMi's iterate averaging).
    * Per-document losses come from upstream (a quality score, a proxy-LM
    * fluency — anything integer and non-negative).
    *
    * Contracts: `lossCol` must be NON-NEGATIVE integers (floor divisions
    * diverge between engines below zero — the [[neymanAllocation]]
    * convention), and `domainCol`'s vocabulary must be bounded (the
    * attribution vocabulary discipline): the per-domain frame localizes
    * to the driver for the R-round loop, ≤ |domains| rows — enforced
    * MECHANICALLY, not by documentation: the collect is limit-capped at
    * `maxDomains`+1 and fails loudly past `maxDomains` (default 10⁵), so
    * a runaway domain column can never materialize unbounded driver
    * state. An empty / fully-filtered moments frame returns an empty
    * result (no division by a zero weight sum). Weight
    * headroom: w grows by at most (1 + η·maxLoss/10⁶)ᴿ from 1000 milli —
    * callers keep η·maxLoss·R far below the 9.2·10¹⁸ BIGINT ceiling
    * (q324: 400·10⁴ per round over 8 rounds → w ≤ 2.6·10⁵).
    *
    * Output: one row per domain — (domain, n_docs, mean_loss_milli,
    * weight_milli, share_bp), shares by floor division of the averaged
    * weights.
    */
  def mwDomainWeights(df: DataFrame, domainCol: String, lossCol: String,
                      rounds: Int, etaMilli: Long): DataFrame =
    mwDomainWeightsFromMoments(
      df.select(col(domainCol).cast("string").as("domain"),
          col(lossCol).cast("long").as("__l"))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"), sum(col("__l")).as("loss_sum")),
      rounds, etaMilli)

  /** [[mwDomainWeights]] from pre-aggregated per-domain moments
    * (domain, n_docs, loss_sum) — the fold-friendly entry the streaming
    * mixture-refresh sink feeds: moments sum across window closes, so
    * the live weights equal the batch operator's over the union exactly.
    */
  def mwDomainWeightsFromMoments(moments: DataFrame, rounds: Int,
                                 etaMilli: Long,
                                 maxDomains: Int = 100000): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    require(etaMilli > 0, "etaMilli must be positive")
    require(maxDomains >= 1, "maxDomains must be >= 1")
    val spark = moments.sparkSession
    import spark.implicits._
    // Bounded-vocabulary contract made MECHANICAL (the Attribution
    // by-construction discipline): the collect fetches at most
    // maxDomains+1 rows — a runaway domain column fails loudly on the
    // sentinel row instead of materializing an unbounded frame on the
    // driver.
    val per = moments
      .select(col("domain").cast("string").as("domain"),
        col("n_docs").cast("long").as("n_docs"),
        col("loss_sum").cast("long").as("loss_sum"))
      .filter(col("n_docs") > 0)
      .select(col("domain"), col("n_docs"),
        expr("loss_sum div n_docs").as("mean_loss_milli"))
      .limit(maxDomains + 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(per.length <= maxDomains,
      s"mwDomainWeightsFromMoments: domain vocabulary exceeds maxDomains=$maxDomains — " +
        "bucket or filter the domain column before optimizing its mixture")
    if (per.isEmpty)
      return Seq.empty[(String, Long, Long, Long, Long)]
        .toDF("domain", "n_docs", "mean_loss_milli", "weight_milli", "share_bp")
    var w = per.map(_ => 1000L)
    val acc = Array.fill(per.length)(0L)
    for (_ <- 1 to rounds) {
      val wSum = w.sum
      val avg = w.zip(per).map { case (wi, (_, _, l)) => wi * l }.sum / wSum
      w = w.zip(per).map { case (wi, (_, _, l)) =>
        val excess = math.max(0L, l - avg)
        wi * (1000L + etaMilli * excess / 1000L) / 1000L
      }
      var i = 0
      while (i < w.length) { acc(i) += w(i); i += 1 }
    }
    val avgW = acc.map(_ / rounds)
    val tot = avgW.sum
    val rows = per.zip(avgW).map { case ((d, n, l), wm) =>
      (d, n, l, wm, if (tot > 0) wm * 10000L / tot else 0L)
    }
    rows.toSeq.toDF("domain", "n_docs", "mean_loss_milli",
      "weight_milli", "share_bp")
  }

  /** Neyman optimal stratified allocation (Neyman 1934; Cochran's
    * "Sampling Techniques" ch. 5) — the survey-sampling answer to "how
    * should a fixed labeling/eval budget split across strata": sample
    * stratum h in proportion to `N_h · S_h` (size × standard deviation),
    * which minimizes the variance of the stratified mean at fixed total
    * n. Reported beside PROPORTIONAL allocation (∝ N_h) so the table
    * shows exactly where variance-aware budgeting moves samples.
    *
    * Determinism: per-stratum moments (N, Σy, Σy²) are exact integers
    * from one hash-aggregate; each stratum's sample variance is ONE
    * fixed-association double expression whose weight `N_h·S_h` rounds
    * ONCE to an exact BIGINT — so the cross-stratum total is an integer
    * sum (order-independent) and allocations are floor divisions.
    * Zero-variance or singleton strata weigh 0 (they need one row, not
    * a share — the textbook degenerate case, left to the caller).
    *
    * Overflow regime (the chi-square DECIMAL(38,0) staging convention —
    * the r10 RobustStats fix): per-row y² wraps signed 64-bit at
    * |y| > 3.03·10⁹ and Σy² long before that at realistic row counts,
    * so BOTH moments stage exactly in DECIMAL(38,0) (y² casts BEFORE the
    * multiply). Exact to Σ ≤ 10³⁸ — i.e. 10¹⁹ rows of the largest
    * guarded square — beyond which Spark's decimal sum yields null
    * rather than a silently wrapped weight. A DuckDB mirror errors on
    * its HUGEINT→BIGINT cast in the same regime instead of wrapping.
    *
    * Value contract: `mean_val` floors via integer division, which
    * truncates toward zero in Spark but floors in DuckDB — identical
    * only for NON-NEGATIVE value sums. Feed non-negative `valCol`
    * units (dollars, counts, token counts); a signed measure needs the
    * non-negative-shift convention (see modularity_bp) first.
    *
    * Output: one row per stratum — (stratum, n_rows, mean_val,
    * sd_val, weight, alloc_neyman, alloc_prop).
    */
  def neymanAllocation(df: DataFrame, strataCol: String, valCol: String,
                       budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val st = df
      .select(col(strataCol).as("stratum"), col(valCol).cast("long").as("__y"))
      .filter(col("__y").isNotNull)
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__y").cast("decimal(38,0)")).as("__sy"),
        sum(col("__y").cast("decimal(19,0)") * col("__y").cast("decimal(19,0)"))
          .as("__syy"))
      .withColumn("weight", expr(
        """CASE WHEN n_rows < 2 THEN 0L
          | ELSE CAST(round(n_rows * sqrt(greatest(0.0,
          |   (CAST(__syy AS DOUBLE) - CAST(__sy AS DOUBLE) * __sy / n_rows)
          |     / (n_rows - 1)))) AS BIGINT) END""".stripMargin))
    val tot = st.agg(sum(col("weight")).as("__wtot"), sum(col("n_rows")).as("__ntot"))
    st.crossJoin(broadcast(tot))
      .select(col("stratum"), col("n_rows"),
        expr("__sy div n_rows").as("mean_val"),
        expr("""CASE WHEN n_rows < 2 THEN 0L
          | ELSE CAST(round(sqrt(greatest(0.0,
          |   (CAST(__syy AS DOUBLE) - CAST(__sy AS DOUBLE) * __sy / n_rows)
          |     / (n_rows - 1)))) AS BIGINT) END""".stripMargin).as("sd_val"),
        col("weight"),
        expr(s"CASE WHEN __wtot > 0 THEN $budget * weight div __wtot ELSE 0L END")
          .as("alloc_neyman"),
        expr(s"$budget * n_rows div __ntot").as("alloc_prop"))
  }
}
