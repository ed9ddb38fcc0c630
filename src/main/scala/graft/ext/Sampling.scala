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
}
