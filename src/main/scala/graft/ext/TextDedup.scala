package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document-deduplication operators for large-scale training-data pipelines
  * (extension tier, SURVEY.md §7.4 — beyond the reference's own surface).
  *
  * Everything here is expressed with codegen-friendly built-in functions
  * (split / transform / md5 / min-agg) — no UDFs, no driver-side state — so
  * each operator is a single shuffle (or none) and scales linearly:
  *
  *   - exact dedup: one hash-aggregate on md5(text). At 100 TB the digest
  *     (16 bytes) shuffles instead of the document body.
  *   - MinHash: K independent permutations are emulated with K seeded
  *     digests; `min` is partial-aggregable, so signatures are computed with
  *     map-side combine and only (id, K×32B) rows ever shuffle.
  *   - LSH banding: candidate generation is an equi-join on (band, band_key)
  *     — a plain shuffle join on a short key, never an O(n²) cross join.
  *   - SimHash: 32 conditional sums, also partial-aggregable.
  *   - exact n-gram Jaccard is intentionally restricted to candidate pairs /
  *     a blocking column: the all-pairs form does not exist at scale.
  */
object TextDedup {

  /** Whitespace tokens, empty-token free. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** Word n-gram shingles ("a b", "b c", ...) from a token array.
    *
    * Built from `n` shifted `slice`s combined with `zip_with`, NOT from a
    * `transform(sequence, i => element_at(toks, i))` lambda: a lambda body
    * that references `toks` re-evaluates the whole upstream tokenization
    * expression PER ELEMENT (measured ~100 regex splits per document),
    * whereas slices are HOF arguments evaluated once per row.
    */
  def wordShingles(toks: Column, n: Int): Column = {
    val m      = greatest(size(toks) - lit(n - 1), lit(0)) // shingle count
    val shifts = (1 to n).map(j => slice(toks, lit(j), m))
    shifts.reduce((acc, next) => zip_with(acc, next, (a, b) => concat(a, lit(" "), b)))
  }

  /** Seeded shingle digest: one "hash permutation" per seed. Lexicographic
    * order on fixed-width hex == numeric order, so `min(hex)` is a valid
    * minhash and stays engine-portable (DuckDB md5 produces identical hex).
    */
  def seededDigest(seed: Int, s: Column): Column =
    md5(concat(lit(s"$seed|"), s).cast("binary"))

  /** MinHash signatures: one row per id with columns sig0..sig{k-1}.
    * Computed as `array_min(transform(shingles, digest))` — a pure
    * projection, NO explode and NO shuffle (min over the same shingle set
    * as the explode+groupBy formulation, so results are identical, but the
    * per-document work never leaves its input partition — the shape that
    * matters at 100 TB). Ids with fewer than `shingleN` tokens have no
    * shingles and are absent from the output.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String, k: Int, shingleN: Int): DataFrame =
    df.select(col(idCol), wordShingles(tokens(col(textCol)), shingleN).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .select(
        col(idCol) +:
          (0 until k).map(i =>
            array_min(transform(col("__sh"), s => seededDigest(i, s))).as(s"sig$i")): _*
      )

  /** LSH banding over a minhash-signature frame: one row per (id, band)
    * with the band's bucket key (digest of the band's signature slice).
    * All band keys are computed in ONE projection and exploded — a 4-way
    * union of selects would re-evaluate the signature subtree per band.
    */
  def lshBands(sigs: DataFrame, idCol: String, k: Int, rowsPerBand: Int): DataFrame = {
    require(k % rowsPerBand == 0, "k must be divisible by rowsPerBand")
    val nBands = k / rowsPerBand
    val keys = (0 until nBands).map { b =>
      val slice = (0 until rowsPerBand).map(r => col(s"sig${b * rowsPerBand + r}"))
      md5(concat_ws("|", slice: _*).cast("binary"))
    }
    sigs
      .select(col(idCol), posexplode(array(keys: _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")
  }

  /** Near-duplicate candidate pairs via LSH: ids sharing any band bucket,
    * with the number of matching signature components and the implied
    * Jaccard estimate. Join is on (band, band_key) — shuffle-friendly.
    */
  /** @param broadcastSide broadcast the build side of the band join and the
    *   signature lookups. Right for a corpus whose (id, 8×32B) signature
    *   frame fits an executor (up to tens of millions of docs); set false at
    *   full 100 TB scale to get plain shuffle joins on (band, band_key) /
    *   id — same semantics, bounded memory.
    */
  def lshCandidates(sigs: DataFrame, idCol: String, k: Int, rowsPerBand: Int,
                    broadcastSide: Boolean = true): DataFrame = {
    def bc(df: DataFrame): DataFrame = if (broadcastSide) broadcast(df) else df
    val bands = lshBands(sigs, idCol, k, rowsPerBand)
    // broadcasting the build side keeps the probe side's partitioning (no
    // shuffle by the low-cardinality band column); the distinct then
    // repartitions by pair id — full parallelism for everything after
    val pairs = bands.as("x")
      .join(
        bc(bands.as("y")),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
          col(s"x.$idCol") < col(s"y.$idCol")
      )
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
    // "__"-prefixed renames so they can't collide with pairs' id_a/id_b
    // (they would, whenever idCol itself is named "id")
    val sa = sigs.columns.foldLeft(sigs)((d, c) => d.withColumnRenamed(c, s"__${c}_a"))
    val sb = sigs.columns.foldLeft(sigs)((d, c) => d.withColumnRenamed(c, s"__${c}_b"))
    val nMatch = (0 until k)
      .map(i => when(col(s"__sig${i}_a") === col(s"__sig${i}_b"), 1L).otherwise(0L))
      .reduce(_ + _)
    pairs
      .join(bc(sa), col("id_a") === col(s"__${idCol}_a"))
      .join(bc(sb), col("id_b") === col(s"__${idCol}_b"))
      .select(
        col("id_a"), col("id_b"),
        nMatch.as("n_sig_match"),
        (nMatch / lit(k.toDouble)).as("est_jaccard")
      )
  }

  /** Exact word-n-gram Jaccard for all pairs inside a blocking group
    * (e.g. same `source`). Pairs with an empty intersection are omitted.
    * The blocking column is what keeps this from being an all-pairs join —
    * at scale, feed it LSH candidates or a coarse cluster id.
    *
    * Shape: shingle-level self-equi-join on (block, shingle) + pair count —
    * |A∩B| falls out as the number of matching shingle rows per (id_a,
    * id_b). Only pairs that actually SHARE a shingle ever materialize
    * (exactly the output pair set), every row in flight is narrow (two ids
    * + one shingle), and both the join and the count are plain
    * shuffle/hash-agg operators with map-side combine — no per-pair set
    * allocation. An earlier broadcast + per-pair `array_intersect` variant
    * enumerated ALL candidate pairs in each block (quadratic in block size
    * even when nothing matches) and built a hash set per comparison; under
    * memory pressure its allocation rate collapsed into GC thrash.
    */
  /** @param maxDocFreq drop shingles appearing in more than this many
    *   documents of a block before the self-join. A shingle shared by d
    *   documents contributes d·(d-1)/2 join rows, so Zipf-hot shingles
    *   ("of the", "in a") make a block quadratic in |block| even when no
    *   document pair is actually similar; they also carry ~zero Jaccard
    *   discrimination. The cap bounds any single shingle's contribution to
    *   maxDocFreq²/2 rows regardless of corpus size. Sizes are recomputed
    *   AFTER the filter, so the reported jaccard is the exact Jaccard over
    *   the discriminative (sub-cap) shingle sets — n_common ≤ min(n_a, n_b)
    *   always holds. Default keeps every shingle.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, blockCol: String,
                   shingleN: Int, maxDocFreq: Int = Int.MaxValue): DataFrame = {
    // One narrow row per DISTINCT (doc, shingle). The input is spread by id
    // first so per-doc shingling parallelizes even from a single input
    // split; sizes are re-aggregated from the exploded frame (one extra
    // cheap agg) instead of carrying the array through the join.
    val nPart = df.sparkSession.sparkContext.defaultParallelism
    val exAll = df
      .repartition(nPart, col(idCol))
      .select(col(idCol).as("id"), col(blockCol).as("blk"),
        explode(array_distinct(wordShingles(tokens(col(textCol)), shingleN))).as("s"))
    // Document-frequency cap: a whole-partition count over (blk, s) — the
    // same key the self-join shuffles on, so the exchange is reused.
    val ex =
      if (maxDocFreq == Int.MaxValue) exAll
      else exAll
        .withColumn("__df",
          count(lit(1)).over(Window.partitionBy(col("blk"), col("s"))))
        .filter(col("__df") <= maxDocFreq)
        .drop("__df")
    val sizes = ex.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val common = ex.as("a")
      .join(ex.as("b"),
        col("a.blk") === col("b.blk") && col("a.s") === col("b.s") &&
          col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    // size lookups: two equi-joins on id; AQE broadcasts them when the
    // per-doc size frame is small, and falls back to shuffle joins at scale
    common
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), "id_b")
      .select(
        col("id_a"), col("id_b"), col("n_a"), col("n_b"), col("n_common"),
        round(col("n_common") / (col("n_a") + col("n_b") - col("n_common")), 6)
          .as("jaccard"))
  }

  /** Asymmetric containment on top of [[jaccardPairs]]: C(A⊆B) =
    * |A∩B|/|A| — the quote/boilerplate detector symmetric Jaccard misses
    * (a short doc fully contained in a long one has containment ≈ 1 but
    * Jaccard ≈ |A|/|B| ≈ 0; MassiveText and C4 both scrub such inclusions
    * separately from near-dup pairs). Pure projection over the pair frame
    * — same blocked join, same cap, exact integer basis points (both
    * `div` operands non-negative, so Spark and any floor/trunc engine
    * agree).
    *
    * Output: (id_a, id_b, n_a, n_b, n_common, containment_a_bp,
    * containment_b_bp, max_containment_bp).
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String, blockCol: String,
                       shingleN: Int, maxDocFreq: Int = Int.MaxValue): DataFrame =
    jaccardPairs(df, idCol, textCol, blockCol, shingleN, maxDocFreq)
      .withColumn("containment_a_bp", expr("(n_common * 10000L) div n_a"))
      .withColumn("containment_b_bp", expr("(n_common * 10000L) div n_b"))
      .withColumn("max_containment_bp",
        greatest(col("containment_a_bp"), col("containment_b_bp")))
      .drop("jaccard")

  /** b-bit minhash similarity estimates over LSH candidate pairs (Li &
    * König, WWW 2010): store only the lowest `b` bits of each of the `k`
    * minhash values — a 16× signature compression at b=2 against 32-bit
    * minhashes — and unbias the collision rate analytically:
    * E[collision] = J + (1−J)/2^b, so Ĵ = (rate − 2⁻ᵇ)/(1 − 2⁻ᵇ). At
    * 100 TB the dedup index this feeds is itself terabytes; the b-bit form
    * is how it stays in memory.
    *
    * Everything integer-exact: the low bits come from the signature's
    * last hex nibble, and the estimator is computed as
    * ⌊greatest(m·2ᵇ − k, 0)·10000 / (k·(2ᵇ−1))⌋ basis points — the
    * numerator is clamped BEFORE the division so floor-vs-truncate
    * disagreement on negatives can never arise between engines.
    *
    * Output: (id_a, id_b, m_low, est_bp) for every [[lshCandidates]] pair.
    */
  def bBitEstimates(sigs: DataFrame, idCol: String, k: Int, rowsPerBand: Int,
                    b: Int = 2): DataFrame = {
    require(b >= 1 && b <= 4, "b must be in [1, 4] (bits of one hex nibble)")
    val mod = 1L << b
    def lowCols(prefix: String) =
      (0 until k).map(i =>
        (conv(substring(col(s"sig$i"), 32, 1), 16, 10).cast("long") % mod)
          .as(s"$prefix$i"))
    val cand = lshCandidates(sigs, idCol, k, rowsPerBand)
      .select(col("id_a"), col("id_b"))
    val lowA = sigs.select(col(idCol).as("id_a") +: lowCols("la"): _*)
    val lowB = sigs.select(col(idCol).as("id_b") +: lowCols("lb"): _*)
    val m = (0 until k)
      .map(i => when(col(s"la$i") === col(s"lb$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    cand.join(lowA, "id_a").join(lowB, "id_b")
      .withColumn("m_low", m)
      .withColumn("est_bp",
        expr(s"(greatest(m_low * ${mod}L - ${k}L, 0L) * 10000L) div (${k}L * ${mod - 1}L)"))
      .select(col("id_a"), col("id_b"), col("m_low"), col("est_bp"))
  }

  /** Prefix-filtered EXACT all-pairs Jaccard self-join (AllPairs / PPJoin
    * family — Bayardo et al., WWW 2007; Xiao et al., WWW 2008). The exact
    * counterpart to MinHash-LSH: instead of a probabilistic candidate
    * stage, it exploits the prefix-filter theorem — under ANY fixed global
    * token order, two sets with J(A,B) ≥ t must share a token inside their
    * first |X| − ⌈t·|X|⌉ + 1 tokens — so the candidate join touches only
    * doc-frequency-ORDERED prefixes of each document's shingle set, and
    * recall is 100% by construction (no banding S-curve, no missed pairs).
    *
    * Scale shape (the reason this exists next to lshCandidates):
    *   - the global order is (df asc, shingle asc) — RAREST FIRST — so the
    *     inverted-index join explodes on the rarest tokens of each doc; the
    *     frequent tokens that make a naive shingle self-join quadratic
    *     never enter the join. Stop-word-shaped skew is filtered by
    *     construction, not by a maxDocFreq heuristic.
    *   - the ordering is computed per-document (a window over id after one
    *     df aggregate) — no global sort of the token universe.
    *   - a length filter (⌈t·max⌉ ≤ min) prunes candidates before
    *     verification; verification is one array_intersect per surviving
    *     pair against collected shingle sets — per-pair work, no third
    *     shuffle explosion.
    *
    * Output: (id_a, id_b, n_a, n_b, n_common, jaccard_bp) for EXACTLY the
    * pairs with integer-exact Jaccard ≥ thresholdBp basis points.
    */
  def prefixFilterJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                               shingleN: Int, thresholdBp: Int): DataFrame = {
    require(thresholdBp > 0 && thresholdBp <= 10000, "thresholdBp in (0, 10000]")
    val nPart = df.sparkSession.sparkContext.defaultParallelism
    // one narrow row per DISTINCT (doc, shingle), spread before per-doc work
    val ex = df
      .repartition(nPart, col(idCol))
      .select(col(idCol).as("id"),
        explode(array_distinct(wordShingles(tokens(col(textCol)), shingleN))).as("s"))
    val dfreq = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
    // rarest-first rank within each doc; n = |doc| from the same window pass
    val ranked = ex.join(dfreq, "s")
      .withColumn("rnk",
        row_number().over(Window.partitionBy(col("id")).orderBy(col("df"), col("s"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("id"))))
    // prefix length p = n − ⌈t·n⌉ + 1 (exact integer ceil in basis points)
    val pref = ranked
      .filter(col("rnk") <= col("n") - expr(s"(n * ${thresholdBp}L + 9999L) div 10000L") + 1)
      .select(col("id"), col("n"), col("s"), col("rnk"))
    val cand = pref.as("a")
      .join(pref.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
          // length filter: J ≥ t ⇒ t·max(|A|,|B|) ≤ min(|A|,|B|)
          least(col("a.n"), col("b.n")) * 10000L >=
            lit(thresholdBp.toLong) * greatest(col("a.n"), col("b.n")) &&
          // positional filter (PPJoin, Xiao et al. 2008 §3.2): a match at
          // prefix ranks (i, j) caps the overlap at 1 + min(nₐ−i, n_b−j);
          // J ≥ t needs overlap ≥ ⌈t·(nₐ+n_b)/(1+t)⌉ — candidates whose
          // matching token sits too deep in both prefixes never reach
          // verification
          lit(1L) + least(col("a.n") - col("a.rnk"), col("b.n") - col("b.rnk")) >= {
            // ⌈t·(nₐ+n_b)/(1+t)⌉ in exact integer basis points (the operands
            // stay ≪ 2^53, so the double floor is exact)
            val num = lit(thresholdBp.toLong) * (col("a.n") + col("b.n")) +
              lit(10000L + thresholdBp - 1L)
            floor(num / lit(10000L + thresholdBp)).cast("long")
          })
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // verification: exact |A∩B| per candidate pair via array_intersect.
    // Sets are collected from `ranked`, NOT from `ex`: ranked is already
    // id-partitioned by its windows, so this groupBy adds no exchange
    // (from `ex` it would re-shuffle the whole exploded frame).
    val sets = ranked.groupBy(col("id"))
      .agg(collect_set(col("s")).as("toks"), max(col("n")).as("n"))
    cand
      .join(sets.select(col("id").as("id_a"), col("toks").as("toks_a"), col("n").as("n_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("toks").as("toks_b"), col("n").as("n_b")), "id_b")
      .withColumn("n_common", size(array_intersect(col("toks_a"), col("toks_b"))).cast("long"))
      .withColumn("jaccard_bp",
        expr("(n_common * 10000L) div (n_a + n_b - n_common)"))
      .filter(col("jaccard_bp") >= thresholdBp.toLong)
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"),
        col("n_common"), col("jaccard_bp"))
  }

  /** LSH calibration curve: per exact-Jaccard decile, the fraction of true
    * pairs the MinHash-LSH candidate stage recovers — the empirical trace
    * of the banding S-curve P(candidate) = 1 − (1 − s^r)^b (Broder 1997;
    * Leskovec-Rajaraman-Ullman ch. 3). The eval every LSH dedup deployment
    * publishes before picking (k, r): it answers "what similarity level do
    * I actually catch" with measurements instead of the formula.
    *
    * Ground truth is the exact shingle-Jaccard over all pairs sharing a
    * shingle, which is inherently quadratic — so this operator is meant to
    * run on a deterministic SAMPLE of the corpus (the caller pre-filters;
    * calibration needs thousands of documents, not the corpus), while the
    * production dedup path (lshCandidates) runs on everything. Buckets are
    * exact-integer deciles ((10·|A∩B|) div |A∪B|, so bucket 10 = exact
    * duplicates) — no float boundary can disagree between engines.
    *
    * Output: (bucket, n_true_pairs, n_found, recall_bp), one row per
    * non-empty decile.
    */
  def lshRecallCurve(df: DataFrame, idCol: String, textCol: String,
                     k: Int, rowsPerBand: Int, shingleN: Int): DataFrame = {
    val truth = jaccardPairs(df.withColumn("__blk", lit(0)), idCol, textCol, "__blk", shingleN)
    val cands = lshCandidates(minhashSignatures(df, idCol, textCol, k, shingleN),
        idCol, k, rowsPerBand)
      .select(col("id_a"), col("id_b"), lit(1L).as("__found"))
    truth
      .join(cands, Seq("id_a", "id_b"), "left")
      .withColumn("bucket", expr("(n_common * 10L) div (n_a + n_b - n_common)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_true_pairs"),
        sum(coalesce(col("__found"), lit(0L))).as("n_found"))
      .withColumn("recall_bp", expr("(n_found * 10000L) div n_true_pairs"))
  }

  /** Dedup yield-vs-threshold planning curve: for every Jaccard cutoff
    * tier, how many documents and tokens SURVIVE the greedy smaller-id-
    * wins near-dup drop (for each exact pair with jaccard ≥ t, the larger
    * id is removed — the policy MinHash-LSH dedup deployments apply to
    * their candidate pairs). The budgeting artifact a pipeline reads
    * before fixing its threshold: each tightening of t buys cleanliness
    * at a measured cost in data volume.
    *
    * Pairs come from [[prefixFilterJaccardPairs]] at the LOOSEST tier —
    * exact and complete by the prefix-filter theorem — so every tier's
    * victim set is a FILTER over one shared pair frame (bp ≥ t), never a
    * re-join. Victims are distinct larger-side ids; kept tokens follow
    * from one id-keyed join of the victim set onto per-doc token counts.
    *
    * Output per tier: (threshold_bp, n_docs, n_docs_kept, n_tokens,
    * n_tokens_kept, kept_docs_bp).
    */
  def dedupYieldCurve(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int, tiers: Seq[Int]): DataFrame = {
    require(tiers.nonEmpty && tiers.forall(t => t > 0 && t <= 10000),
      "tiers are jaccard cutoffs in (0, 10000]")
    val ts = tiers.distinct.sorted
    val pairs = prefixFilterJaccardPairs(df, idCol, textCol, shingleN, ts.min)
    val tierArr = array(ts.map(t => lit(t.toLong)): _*)
    // per tier, the docs removed: distinct larger-side ids of pairs >= t
    val victims = pairs
      .select(col("id_b"), col("jaccard_bp"), explode(tierArr).as("threshold_bp"))
      .filter(col("jaccard_bp") >= col("threshold_bp"))
      .select(col("threshold_bp"), col("id_b")).distinct()
    val lens = df.select(col(idCol).as("id_b"),
      size(tokens(col(textCol))).cast("long").as("__n"))
    val removed = victims.join(lens, "id_b")
      .groupBy(col("threshold_bp"))
      .agg(count(lit(1)).as("__rm_docs"), sum(col("__n")).as("__rm_toks"))
    val totals = lens.agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("n_tokens"))
    import df.sparkSession.implicits._
    ts.map(_.toLong).toDF("threshold_bp")
      .join(removed, Seq("threshold_bp"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("__rm_docs", coalesce(col("__rm_docs"), lit(0L)))
      .withColumn("__rm_toks", coalesce(col("__rm_toks"), lit(0L)))
      .select(col("threshold_bp"), col("n_docs"),
        (col("n_docs") - col("__rm_docs")).as("n_docs_kept"),
        col("n_tokens"),
        (col("n_tokens") - col("__rm_toks")).as("n_tokens_kept"))
      .withColumn("kept_docs_bp",
        expr("(n_docs_kept * 10000L) div n_docs"))
  }

  /** SimHash hamming-threshold calibration curve — the [[lshRecallCurve]]
    * artifact for the OTHER fingerprint family: per exact-Jaccard decile
    * of the true pair set, the mean 32-bit simhash hamming distance and
    * the recall a `hamming ≤ t` near-dup rule achieves at each threshold
    * in `thresholds`. This is how a deployment picks the Manku et al.
    * (WWW 2007) cutoff: simhash distance correlates with similarity only
    * statistically, and the curve shows where the correlation is tight
    * enough to act on (high deciles) versus noise (low deciles).
    *
    * Ground truth is quadratic by nature — run on a deterministic SAMPLE
    * (the [[lshRecallCurve]] contract); the production path
    * ([[simhashNearDups]]) stays banded and linear.
    *
    * Output per non-empty decile: (bucket, n_true_pairs,
    * mean_hamming_milli, recall_at_<t>_bp for each threshold).
    */
  def simhashDistanceCurve(df: DataFrame, idCol: String, textCol: String,
                           shingleN: Int, thresholds: Seq[Int]): DataFrame = {
    require(thresholds.nonEmpty && thresholds.forall(t => t >= 0 && t <= 32),
      "thresholds must be within [0, 32]")
    val truth = jaccardPairs(df.withColumn("__blk", lit(0)), idCol, textCol,
      "__blk", shingleN)
    val sh = simhash32(df, idCol, textCol)
    val recallCols = thresholds.distinct.sorted.map { t =>
      expr(s"(sum(CASE WHEN __ham <= $t THEN 1L ELSE 0L END) * 10000L) div count(1)")
        .as(s"recall_at_${t}_bp")
    }
    truth
      .join(sh.select(col(idCol).as("id_a"), col("simhash").as("__sa")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("simhash").as("__sb")), "id_b")
      .withColumn("__ham", hamming(col("__sa"), col("__sb")).cast("long"))
      .withColumn("bucket", expr("(n_common * 10L) div (n_a + n_b - n_common)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_true_pairs"),
        expr("sum(__ham) * 1000L div count(1)").as("mean_hamming_milli")
          +: recallCols: _*)
  }

  /** Exact edit-distance verification of candidate pairs: joins each
    * (id_a, id_b) candidate back to the corpus and computes the Levenshtein
    * distance of the documents' first `prefixLen` chars. The prefix cap
    * bounds the O(len²) DP per pair — the standard trick when candidates
    * come from a recall-oriented blocker (LSH, SimHash buckets) and only a
    * cheap high-precision confirmation is needed.
    *
    * Shape at scale: two equi-joins on id (shuffle or broadcast per AQE);
    * the quadratic-ish Levenshtein runs once per CANDIDATE, never per
    * corpus pair.
    */
  def editDistancePairs(candidates: DataFrame, docs: DataFrame,
                        idCol: String, textCol: String, prefixLen: Int): DataFrame = {
    val txt  = docs.select(col(idCol), substring(col(textCol), 1, prefixLen).as("__pfx"))
    val txtA = txt.select(col(idCol).as("id_a"), col("__pfx").as("__pfx_a"))
    val txtB = txt.select(col(idCol).as("id_b"), col("__pfx").as("__pfx_b"))
    candidates
      .join(txtA, "id_a")
      .join(txtB, "id_b")
      .withColumn("edit_dist", levenshtein(col("__pfx_a"), col("__pfx_b")).cast("long"))
      // USING joins reorder columns — restore the candidate frame's layout
      .select(candidates.columns.toIndexedSeq.map(col) :+ col("edit_dist"): _*)
  }

  /** 32-bit SimHash over the token multiset: for each bit, sum +1/-1 of the
    * token digest's bit, then set the result bit where the sum is positive.
    * One explode + one partial-aggregable hash-aggregate.
    */
  def simhash32(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
    // first 8 md5 hex chars as an unsigned 32-bit value
    val v = conv(substring(md5(col("__tok").cast("binary")), 1, 8), 16, 10).cast("long")
    val bitSums = toks
      .withColumn("__v", v)
      .groupBy(col(idCol))
      .agg(
        sum(when(shiftright(col("__v"), 0).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as("b0"),
        (1 until 32).map(i =>
          sum(when(shiftright(col("__v"), i).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"b$i")
        ): _*
      )
    val hash = (0 until 32)
      .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    bitSums.select(col(idCol), hash.as("simhash"))
  }

  /** Hamming distance between two simhash columns. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs via pigeonhole banding (the web-dedup
    * construction of Manku et al., "Detecting Near-Duplicates for Web
    * Crawling", WWW 2007): split the fingerprint into `nBands` contiguous
    * bit bands — any pair within hamming distance `maxHamming < nBands`
    * differs in at most `maxHamming` bands and therefore agrees EXACTLY on
    * at least one, so the complete candidate set falls out of an equi-join
    * on (band, band_value) and the exact hamming check runs once per
    * CANDIDATE, never per corpus pair. Same plan family as
    * [[lshCandidates]]: explode-to-bands, shuffle join on a short key,
    * distinct, verify.
    *
    * Scale note: a band carries 32/nBands bits, so a band value has
    * 2^(32/nBands) possible buckets and an n-doc corpus puts ~n/2^bits
    * docs in an average bucket. With the 32-bit fingerprint of
    * [[simhash32]] and 4 bands (8-bit buckets) that is fine up to ~10⁵-10⁶
    * docs; a 100 TB corpus needs a wider fingerprint (64/128-bit simhash,
    * 16+-bit bands — the WWW'07 paper's regime) so bucket occupancy stays
    * bounded. The join itself is shape-identical at any width.
    *
    * Output: (id_a, id_b, simhash_a, simhash_b, hamming), hamming ≤
    * `maxHamming`.
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      nBands: Int = 4, maxHamming: Int = 3): DataFrame = {
    require(32 % nBands == 0, "nBands must divide 32")
    require(maxHamming < nBands,
      s"pigeonhole completeness needs maxHamming < nBands, got $maxHamming >= $nBands")
    val bandBits = 32 / nBands
    val mask     = (1L << bandBits) - 1
    val sh = simhash32(df, idCol, textCol)
    val bands = sh
      .select(col(idCol), col("simhash"), posexplode(array(
        (0 until nBands).map(b =>
          shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_val")
    bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_val") === col("y.band_val") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(
        col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"),
        col("x.simhash").as("simhash_a"), col("y.simhash").as("simhash_b"))
      .distinct()
      .withColumn("hamming", hamming(col("simhash_a"), col("simhash_b")).cast("long"))
      .filter(col("hamming") <= maxHamming)
  }

  /** The persisted state behind [[simhashIncremental]]: one row per
    * indexed document — (idCol, simhash) — so an ingest batch probes
    * fingerprints without touching corpus text (the
    * [[graft.ext.ParagraphDedup.paragraphIndex]] /
    * [[graft.ext.VectorSearch.knnGraphIndex]] shape at the simhash tier).
    */
  def simhashIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    simhash32(df, idCol, textCol)

  /** Batch-incremental simhash near-dup detection — the ingest shape: a
    * new document batch arrives and must be checked for near-duplicates
    * against itself AND a persisted fingerprint index, without
    * re-fingerprinting the corpus. Re-delivered ids drop via one anti
    * join (the q81/q108 redelivery rule); surviving batch fingerprints
    * probe index ∪ batch through the same pigeonhole band equi-join as
    * [[simhashNearDups]] (complete for hamming ≤ maxHamming < nBands),
    * with the exact hamming check once per CANDIDATE. The caller appends
    * the fresh fingerprints to the index — merge is a union, no rebuild.
    *
    * Scale shape: per-batch cost tracks batch size × band-bucket
    * occupancy — the index side streams through the band join and is
    * never re-hashed; the asymmetry the incr_para/incr_knn probes
    * measure, one fingerprint family over.
    *
    * Output: (id, nbr_id, hamming) with `id` always the fresh batch
    * document and hamming ≤ maxHamming.
    */
  def simhashIncremental(batch: DataFrame, index: DataFrame,
                         idCol: String, textCol: String,
                         nBands: Int = 4, maxHamming: Int = 3): DataFrame = {
    val fresh = simhash32(batch, idCol, textCol)
      .join(index.select(col(idCol)), Seq(idCol), "left_anti")
    simhashIncrementalFromFresh(fresh, index, idCol, nBands, maxHamming)
  }

  /** [[simhashIncremental]] with the anti-joined fresh fingerprints
    * precomputed — the streaming sink persists `fresh` because the
    * near-dup check and the index append both consume it (the
    * [[graft.ext.VectorSearch.knnGraphIncrementalFromFresh]] convention).
    * `fresh` and `index` carry the [[simhashIndex]] layout
    * (idCol, simhash).
    */
  def simhashIncrementalFromFresh(fresh: DataFrame, index: DataFrame,
                                  idCol: String,
                                  nBands: Int = 4, maxHamming: Int = 3): DataFrame = {
    require(32 % nBands == 0, "nBands must divide 32")
    require(maxHamming < nBands,
      s"pigeonhole completeness needs maxHamming < nBands, got $maxHamming >= $nBands")
    val bandBits = 32 / nBands
    val mask     = (1L << bandBits) - 1
    def toBands(sh: DataFrame) = sh
      .select(col(idCol), col("simhash"), posexplode(array(
        (0 until nBands).map(b =>
          shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_val")
    val cand = index.select(col(idCol), col("simhash"))
      .unionByName(fresh.select(col(idCol), col("simhash")))
    toBands(fresh).as("x")
      .join(toBands(cand).as("y"),
        col("x.band") === col("y.band") && col("x.band_val") === col("y.band_val") &&
          col(s"x.$idCol") =!= col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id"), col(s"y.$idCol").as("nbr_id"),
        col("x.simhash").as("__sa"), col("y.simhash").as("__sb"))
      .distinct()
      .withColumn("hamming", hamming(col("__sa"), col("__sb")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id"), col("nbr_id"), col("hamming"))
  }

  /** 64-bit SimHash, carried as TWO unsigned 32-bit halves (sh_hi, sh_lo)
    * so every value stays comfortably inside a signed 64-bit integer in
    * any engine — no sign-bit or shift-overflow edge at bit 63, and the
    * oracle replays the identical md5-derived bits digit-by-digit. Bits
    * 0–31 of the fingerprint live in `sh_lo`, bits 32–63 in `sh_hi`; the
    * per-token digest is the FIRST 16 md5 hex chars (hi = chars 1–8,
    * lo = chars 9–16).
    *
    * This is the 100 TB regime fingerprint named in SCALING.md: with
    * 32-bit fingerprints and 8-bit bands, band-bucket occupancy grows as
    * n/2⁸ and the incremental probe curve bends (measured 1.9× per
    * doubling); at 64 bits with 16-bit bands occupancy is n/2¹⁶ — the
    * WWW'07 (Manku et al.) production regime — and the same band
    * equi-join flattens. Plan shape is width-independent: one explode +
    * one partial-aggregable hash-aggregate (64 bit-sums instead of 32).
    */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
    val digest = md5(col("__tok").cast("binary"))
    val withV = toks
      .withColumn("__vh", conv(substring(digest, 1, 8), 16, 10).cast("long"))
      .withColumn("__vl", conv(substring(digest, 9, 8), 16, 10).cast("long"))
    def bitSum(src: String, i: Int, as: String) =
      sum(when(shiftright(col(src), i).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(as)
    val aggs = (0 until 32).map(i => bitSum("__vh", i, s"h$i")) ++
      (0 until 32).map(i => bitSum("__vl", i, s"l$i"))
    val bitSums = withV.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    def rebuild(prefix: String) = (0 until 32)
      .map(i => when(col(s"$prefix$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    bitSums.select(col(idCol), rebuild("h").as("sh_hi"), rebuild("l").as("sh_lo"))
  }

  /** Hamming distance between two (hi, lo) 64-bit fingerprints. */
  def hamming64(hiA: Column, loA: Column, hiB: Column, loB: Column): Column =
    bit_count(hiA.bitwiseXOR(hiB)) + bit_count(loA.bitwiseXOR(loB))

  /** The persisted state behind [[simhash64Incremental]] — one row per
    * indexed document: (idCol, sh_hi, sh_lo).
    */
  def simhash64Index(df: DataFrame, idCol: String, textCol: String): DataFrame =
    simhash64(df, idCol, textCol)

  /** [[simhashIncremental]] at the 64-bit width: identical ingest contract
    * (anti-join re-delivery drop, band equi-join against index ∪ batch,
    * exact hamming once per candidate), but bands carry 64/nBands bits —
    * 16-bit bands at the default nBands = 4, the occupancy regime where
    * the fixed-batch probe curve stays flat as the index grows.
    * Pigeonhole completeness for hamming ≤ maxHamming < nBands holds at
    * any width. Output: (id, nbr_id, hamming).
    */
  def simhash64Incremental(batch: DataFrame, index: DataFrame,
                           idCol: String, textCol: String,
                           nBands: Int = 4, maxHamming: Int = 3): DataFrame = {
    val fresh = simhash64(batch, idCol, textCol)
      .join(index.select(col(idCol)), Seq(idCol), "left_anti")
    simhash64IncrementalFromFresh(fresh, index, idCol, nBands, maxHamming)
  }

  /** [[simhash64Incremental]] with the anti-joined fresh fingerprints
    * precomputed (the streaming-sink convention). `fresh` and `index`
    * carry the [[simhash64Index]] layout (idCol, sh_hi, sh_lo).
    */
  def simhash64IncrementalFromFresh(fresh: DataFrame, index: DataFrame,
                                    idCol: String,
                                    nBands: Int = 4, maxHamming: Int = 3): DataFrame = {
    require(64 % nBands == 0, "nBands must divide 64")
    val bandBits = 64 / nBands
    require(bandBits <= 32 && 32 % bandBits == 0,
      s"bands must tile the 32-bit halves; got $bandBits-bit bands")
    require(maxHamming < nBands,
      s"pigeonhole completeness needs maxHamming < nBands, got $maxHamming >= $nBands")
    val mask = (1L << bandBits) - 1
    def toBands(sh: DataFrame) = sh
      .select(col(idCol), col("sh_hi"), col("sh_lo"), posexplode(array(
        (0 until nBands).map { b =>
          val half  = if (b * bandBits < 32) "sh_lo" else "sh_hi"
          val shift = (b * bandBits) % 32
          shiftright(col(half), shift).bitwiseAND(lit(mask))
        }: _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_val")
    val cand = index.select(col(idCol), col("sh_hi"), col("sh_lo"))
      .unionByName(fresh.select(col(idCol), col("sh_hi"), col("sh_lo")))
    toBands(fresh).as("x")
      .join(toBands(cand).as("y"),
        col("x.band") === col("y.band") && col("x.band_val") === col("y.band_val") &&
          col(s"x.$idCol") =!= col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id"), col(s"y.$idCol").as("nbr_id"),
        col("x.sh_hi").as("__ha"), col("x.sh_lo").as("__la"),
        col("y.sh_hi").as("__hb"), col("y.sh_lo").as("__lb"))
      .distinct()
      .withColumn("hamming",
        hamming64(col("__ha"), col("__la"), col("__hb"), col("__lb")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id"), col("nbr_id"), col("hamming"))
  }

  /** Winnowing fingerprints: char-`k`-gram digests, minimum per sliding
    * window of `w` consecutive positions, distinct per document. Output:
    * (id, n_fingerprints, min_fp). Robust-winnowing document signature —
    * the standard plagiarism/near-dup fingerprint (Schleimer et al., SIGMOD
    * 2003). One explode + one window pass partitioned by document.
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String, k: Int = 8, w: Int = 4): DataFrame = {
    // gram start positions 1..len-k+1; documents shorter than k yield none
    val maxPos = length(col(textCol)) - lit(k - 1)
    val posSeq = when(maxPos < 1, array().cast("array<int>")).otherwise(sequence(lit(1), maxPos))
    val positions = df.select(col(idCol), col(textCol), explode(posSeq).as("i"))
    val grams = positions.select(
      col(idCol), col("i"),
      md5(col(textCol).substr(col("i"), lit(k)).cast("binary")).as("h")
    )
    val win = Window.partitionBy(col(idCol)).orderBy(col("i")).rowsBetween(0, w - 1)
    grams
      .withColumn("fp", min(col("h")).over(win))
      .groupBy(col(idCol))
      .agg(countDistinct(col("fp")).as("n_fingerprints"), min(col("fp")).as("min_fp"))
  }

  /** Incremental dedup: probe a NEW ingest batch against the band index of
    * an EXISTING corpus, instead of re-mining everything. The corpus-side
    * bands are computed once and persisted as a table (at 100 TB, bucketed
    * by (band, band_key) via [[graft.table.Bucketing]] so a daily batch
    * probes it with a co-located join — only the batch, which is orders of
    * magnitude smaller, shuffles). A new doc is a duplicate iff it shares
    * any band bucket with an index doc; `dup_of` is the smallest matching
    * index id (the canonical doc to dedup against), `n_index_hits` the
    * count of distinct index docs hit. New docs too short to shingle never
    * enter the index join and report is_dup = false via the left join.
    *
    * Output: (id, dup_of [null when fresh], n_index_hits, is_dup).
    */
  def incrementalDupCheck(
      newDocs: DataFrame, indexBands: DataFrame,
      idCol: String, textCol: String, k: Int, shingleN: Int, rowsPerBand: Int
  ): DataFrame = {
    val idx = indexBands.withColumnRenamed(idCol, "__idx_id")
    val nb  = lshBands(minhashSignatures(newDocs, idCol, textCol, k, shingleN),
      idCol, k, rowsPerBand)
    val hits = nb.join(idx, Seq("band", "band_key"))
      .groupBy(col(idCol))
      .agg(min(col("__idx_id")).as("dup_of"),
        countDistinct(col("__idx_id")).as("n_index_hits"))
    newDocs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .withColumn("n_index_hits", coalesce(col("n_index_hits"), lit(0L)))
      .withColumn("is_dup", col("dup_of").isNotNull)
  }

  /** LSH banding-parameter optimizer (Leskovec/Rajaraman/Ullman, "Mining
    * of Massive Datasets" §3.4.3): for every factorization k = b·r of the
    * signature budget, integrate the S-curve P(candidate | s) = 1−(1−sʳ)ᵇ
    * over a similarity grid to get the false-positive area below the
    * target threshold and the false-negative area above it; the chosen
    * (b, r) minimizes their sum. The ANALYTIC companion to the empirical
    * q161 sweep — it needs no candidate pairs at all, so re-tuning after
    * a threshold change is free.
    *
    * Pure bounded compute: |divisors(k)| × 99 grid rows built from
    * literals — no table scan, no shuffle beyond the few-row aggregate.
    * Areas are micro-units of similarity mass (grid step 0.01 → each
    * grid point contributes P·10⁴ micro).
    */
  def lshParameterSweep(spark: org.apache.spark.sql.SparkSession, k: Int,
      thresholdBp: Long): DataFrame = {
    require(k > 0, "k must be positive")
    import spark.implicits._
    val cands = (1 to k).filter(k % _ == 0).map(r => ((k / r).toLong, r.toLong))
      .toDF("b", "r")
    val spine = (1 until 100).map(_.toLong).toDF("s_cp") // similarity in 1/100s
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cost_micro"), col("b"))
    cands.crossJoin(broadcast(spine))
      .withColumn("__p",
        lit(1.0) - pow(lit(1.0) - pow(col("s_cp") / lit(100.0), col("r")), col("b")))
      .groupBy(col("b"), col("r"))
      .agg(
        round(sum(when(col("s_cp") * 100 < thresholdBp, col("__p"))
          .otherwise(0.0)) * 10000).cast("long").as("fp_micro"),
        round(sum(when(col("s_cp") * 100 >= thresholdBp, lit(1.0) - col("__p"))
          .otherwise(0.0)) * 10000).cast("long").as("fn_micro"))
      .withColumn("cost_micro", col("fp_micro") + col("fn_micro"))
      .withColumn("chosen", row_number().over(w) === 1)
  }

  /** The canonical text normalization for exact-dedup keys: lowercase,
    * trim, collapse whitespace runs. Deliberately minimal and FIXED —
    * the key's identity is part of the dedup contract (CCNet normalizes
    * before hashing, C4 does not, and their duplicate counts differ for
    * exactly this reason; Wenzek et al. 2020 §3.1).
    */
  def normalizeForDedup(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** Normalization-sensitivity audit: per source, exact-duplicate mass
    * under the RAW text key vs under [[normalizeForDedup]] — the
    * before/after table a pipeline reads when choosing its dedup key
    * (a large gap means near-identical pages differ only in case/
    * whitespace and a raw-key dedup under-collapses).
    *
    * Output: (source, n_docs, n_raw_groups, n_norm_groups, raw_dup_bp,
    * norm_dup_bp) with dup_bp = (n_docs − groups)·10000 div n_docs.
    *
    * Scale shape: documents collapse to 16-byte digests in the scan
    * projection; the two distinct-group counts are per-(source, digest)
    * hash-aggregates rolled up per source — two narrow aggregate chains,
    * no expand, no join wider than |sources| rows.
    */
  def normalizedDupStats(df: DataFrame, idCol: String, textCol: String,
                         sourceCol: String): DataFrame = {
    val keyed = df.select(col(sourceCol),
      md5(col(textCol).cast("binary")).as("__raw"),
      md5(normalizeForDedup(col(textCol)).cast("binary")).as("__norm"))
    val total = keyed.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_docs"))
    def groups(c: String, as: String) = keyed
      .groupBy(col(sourceCol), col(c)).agg(count(lit(1)).as("__g"))
      .groupBy(col(sourceCol)).agg(count(lit(1)).as(as))
    total
      .join(groups("__raw", "n_raw_groups"), sourceCol)
      .join(groups("__norm", "n_norm_groups"), sourceCol)
      .select(col(sourceCol), col("n_docs"), col("n_raw_groups"), col("n_norm_groups"),
        expr("(n_docs - n_raw_groups) * 10000 div n_docs").as("raw_dup_bp"),
        expr("(n_docs - n_norm_groups) * 10000 div n_docs").as("norm_dup_bp"))
  }

  /** Dedup-cluster quality audit — for every multi-member cluster, the
    * exact n-gram Jaccard statistics over its internal pairs: the QC pass
    * that catches FALSE MERGES before a dedup run deletes real content (a
    * cluster whose minimum intra-pair similarity is near 0 was chained
    * together by LSH false positives / transitive closure, the known
    * failure mode of connected-component dedup — MinHash band collisions
    * are probabilistic, and CC gladly glues two unrelated groups through
    * one bad pair).
    *
    * Pairs sharing no shingle never materialize ([[jaccardPairs]] omits
    * them), so the audit reconstructs them arithmetically: a cluster of n
    * members owes n·(n−1)/2 pairs; any shortfall is zero-similarity pairs,
    * which forces min_jaccard_bp to 0 and weights the mean accordingly.
    *
    * Scale shape: cluster sizes gate the input (2 ≤ n ≤ maxClusterSize —
    * the capped-block convention; dedup clusters are small by nature, and
    * a corpus-sized cluster means the dedup upstream already failed), so
    * the shingle self-join is bounded per cluster; everything else is
    * cluster-keyed hash-aggregates.
    *
    * Output per audited cluster: (clusterCol, n_members, n_pairs,
    * n_pairs_nonzero, min_jaccard_bp, mean_jaccard_bp).
    */
  def dedupClusterAudit(df: DataFrame, idCol: String, textCol: String,
                        clusterCol: String, shingleN: Int,
                        maxClusterSize: Int = 64): DataFrame = {
    require(shingleN >= 1, "shingle order must be >= 1")
    require(maxClusterSize >= 2, "maxClusterSize must be >= 2")
    val sizes = df.groupBy(col(clusterCol).as("__cl"))
      .agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") >= 2 && col("n_members") <= maxClusterSize)
    val member = df.join(sizes, col(clusterCol) === col("__cl"))
    val pairs = jaccardPairs(member, idCol, textCol, clusterCol, shingleN)
      .withColumn("__bp", expr("n_common * 10000L div (n_a + n_b - n_common)"))
    val lab = member.select(col(idCol).as("id_a"), col("__cl"))
    val scored = pairs.join(lab, "id_a")
      .groupBy(col("__cl"))
      .agg(count(lit(1)).as("__nz"), min(col("__bp")).as("__mn"),
        sum(col("__bp")).as("__sm"))
    sizes.join(scored, Seq("__cl"), "left")
      .withColumn("n_pairs", expr("n_members * (n_members - 1) div 2"))
      .withColumn("n_pairs_nonzero", coalesce(col("__nz"), lit(0L)))
      .withColumn("min_jaccard_bp",
        when(col("n_pairs_nonzero") < col("n_pairs"), 0L)
          .otherwise(col("__mn")))
      .withColumn("mean_jaccard_bp", expr("coalesce(__sm, 0L) div n_pairs"))
      .select(col("__cl").as(clusterCol), col("n_members"), col("n_pairs"),
        col("n_pairs_nonzero"), col("min_jaccard_bp"), col("mean_jaccard_bp"))
  }

  /** ROUGE-N overlap scores (Lin 2004, "ROUGE: A Package for Automatic
    * Evaluation of Summaries") for candidate document pairs — the
    * CLIPPED n-gram overlap Σ_g min(c_a(g), c_b(g)) over each side's
    * n-gram multiset, reported as precision (÷|a|), recall (÷|b|) and F1
    * in exact basis points. Beside the set-based Jaccard family this is
    * the multiset-aware overlap: a document that repeats a shared phrase
    * ten times counts it min(10, c_b) times, not once — the score
    * summarization/dedup-eval pipelines actually compare against.
    *
    * Pairs come from the caller (LSH candidates, a blocking join) — the
    * all-pairs form deliberately does not exist, matching [[jaccardPairs]].
    *
    * Scale shape: the corpus first shrinks to the documents the candidate
    * set actually references (one left-semi join on id — at 100 TB with a
    * bounded candidate list this is the difference between shingling the
    * corpus and shingling the candidates); each surviving side collapses
    * ONCE to a (doc, gram, count) hash-aggregate; the overlap is
    * pairs ⋈ grams(a) on id_a (rows per pair bounded by ONE document's
    * length) then an equi-join on (id_b, gram) — never a per-pair set
    * allocation — and one pair-keyed sum. Totals join back per side from
    * the same collapsed frame. Zero-overlap candidate pairs are kept
    * (score 0) via the left joins.
    *
    * Output: (id_a, id_b, n_a, n_b, n_overlap, rouge_p_bp, rouge_r_bp,
    * rouge_f_bp) with f = 2pr/(p+r) in integer bp, 0 when p + r = 0.
    */
  def rougeNPairs(candidates: DataFrame, docs: DataFrame,
                  idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, "n-gram order must be >= 1")
    val wanted = candidates.select(col("id_a").as("__want"))
      .unionByName(candidates.select(col("id_b").as("__want")))
      .distinct()
    val needed = docs.join(wanted, col(idCol) === col("__want"), "left_semi")
    val grams = needed.select(col(idCol).as("__id"),
        explode(wordShingles(tokens(col(textCol)), n)).as("__g"))
      .groupBy(col("__id"), col("__g")).agg(count(lit(1)).as("__c"))
    val totals = grams.groupBy(col("__id")).agg(sum(col("__c")).as("__t"))
    val pairs = candidates.select(col("id_a"), col("id_b"))
    val overlap = pairs
      .join(grams.select(col("__id").as("id_a"), col("__g"), col("__c").as("__ca")), "id_a")
      .join(grams.select(col("__id").as("id_b"), col("__g"), col("__c").as("__cb")),
        Seq("id_b", "__g"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(least(col("__ca"), col("__cb"))).as("n_overlap"))
    pairs
      .join(overlap, Seq("id_a", "id_b"), "left")
      .join(totals.select(col("__id").as("id_a"), col("__t").as("n_a")), Seq("id_a"), "left")
      .join(totals.select(col("__id").as("id_b"), col("__t").as("n_b")), Seq("id_b"), "left")
      .select(col("id_a"), col("id_b"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("rouge_p_bp",
        when(col("n_a") > 0, expr("(n_overlap * 10000L) div n_a")).otherwise(0L))
      .withColumn("rouge_r_bp",
        when(col("n_b") > 0, expr("(n_overlap * 10000L) div n_b")).otherwise(0L))
      .withColumn("rouge_f_bp",
        when(col("rouge_p_bp") + col("rouge_r_bp") > 0,
          expr("(2L * rouge_p_bp * rouge_r_bp) div (rouge_p_bp + rouge_r_bp)"))
        .otherwise(0L))
  }
}
