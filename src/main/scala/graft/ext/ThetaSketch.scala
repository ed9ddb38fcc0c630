package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Theta-framework SET OPERATIONS over per-group KMV sketches — the
  * "audience overlap" problem: given distinct-member sets per group
  * (users per event type, tokens per source, ...), estimate the
  * cardinality of every pairwise union / intersection / difference
  * WITHOUT ever co-locating the raw member sets.
  *
  * The sketch is the classic k-minimum-values bottom-k sample (Bar-Yossef
  * et al. 2002; Beyer et al. SIGMOD 2007 for the set-op estimators;
  * Dasgupta et al.'s theta-sketch framework generalizes the same idea):
  * keep the k smallest distinct hash values per group. For a pair (A, B)
  * with per-group thresholds θ_A, θ_B (the k-th min when the sketch
  * saturated, else the full hash space), every hash below
  * θ = min(θ_A, θ_B) is a uniform sample of the union, so
  * `|{h ∈ S : h < θ}| · M / θ` estimates |S| for S any boolean
  * combination computable from the retained values — union, intersection,
  * difference — with relative error ≈ 1/√(k−2).
  *
  * Scale shape: the corpus pays ONE hash-aggregate
  * ([[graft.functions.KmvMinValues]]: O(k) state, map-side combine,
  * union-then-truncate merge — partials ship from 1000 executors at
  * k·8 bytes each). Everything pairwise runs on the |groups|-row sketch
  * frame: the pair join is sketch×sketch, broadcast, and the set ops are
  * per-row array kernels inside whole-stage codegen. The raw member sets
  * never shuffle — the thing that makes "overlap matrix over 100 TB of
  * events" feasible at all.
  *
  * Determinism: hashes are md5-derived 40-bit integers
  * ([[hash40]] — identical in Spark and DuckDB, the suite's exact-replay
  * hashing convention, cf. reference design `docs/design_doc` metric
  * panels), all estimates are exact integer milli-counts, so an oracle
  * replays every value bit for bit (rank window ≤ k reproduces the k-min
  * set exactly).
  */
object ThetaSketch {

  /** 40-bit hash space: small enough that `n · 1000 · M` stays far below
    * the BIGINT range for any sketch-sized n, large enough that collision
    * mass at realistic k (≤ 4096) is negligible next to the 1/√k
    * estimator error.
    */
  val HashBits = 40
  val HashSpace: Long = 1L << HashBits

  /** First 10 md5 hex digits of the value's decimal string form, as a
    * non-negative BIGINT in [0, 2^40).
    */
  def hash40(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 10), 16, 10)
      .cast("long")

  /** Per-key KMV sketch frame: `(key, hs, theta)` where `hs` is the
    * ascending array of the k smallest distinct [[hash40]] values of
    * `valCol` within the key, and `theta` is the k-th min when the key
    * saturated the sketch (|distinct| ≥ k), else [[HashSpace]] (the
    * sketch is exhaustive and every estimate below is exact).
    */
  def kminSketch(df: DataFrame, keyCol: String, valCol: String, k: Int): DataFrame = {
    require(k >= 16, s"k must be >= 16, got $k")
    df.select(col(keyCol).as("key"), hash40(col(valCol)).as("__h"))
      .groupBy("key")
      .agg(graft.functions.GraftFunctions.kmvValues(col("__h"), k).as("hs"))
      .select(col("key"), col("hs"),
        when(size(col("hs")) === k, element_at(col("hs"), k))
          .otherwise(lit(HashSpace)).as("theta"))
  }

  /** Union-then-truncate merge of two sketch frames — the
    * [[graft.functions.KmvBuffer]] merge lifted to frames: per key, the
    * k smallest distinct hashes of either side, theta re-derived. KMV
    * bottom-k sampling is exactly mergeable, so
    * `mergeSketches(kminSketch(A), kminSketch(B)) == kminSketch(A ∪ B)`
    * bit for bit — the property that lets per-batch sketches fold into a
    * stored snapshot incrementally (streaming) or per-partition partials
    * fold across executors without ever re-reading the corpus.
    */
  def mergeSketches(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k >= 16, s"k must be >= 16, got $k")
    a.select("key", "hs").unionByName(b.select("key", "hs"))
      .select(col("key"), explode(col("hs")).as("__h"))
      .groupBy("key")
      .agg(graft.functions.GraftFunctions.kmvValues(col("__h"), k).as("hs"))
      .select(col("key"), col("hs"),
        when(size(col("hs")) === k, element_at(col("hs"), k))
          .otherwise(lit(HashSpace)).as("theta"))
  }

  /** `n · 1000 · M div theta` as exact BIGINT floor division (the
    * numerator peaks at `2k·1000·2^40` ≈ 9·10^18·(k/4096) — inside the
    * BIGINT range for any supported k, and far beyond double precision,
    * hence `div`, never `/`).
    */
  private def estMilliExpr(n: String): String =
    s"CAST(($n * 1000L * ${HashSpace}L) div __th AS BIGINT)"

  /** Every unordered key pair's estimated distinct cardinalities, in
    * exact integer milli units: `|A|`, `|B|`, `|A∪B|`, `|A∩B|`,
    * `|A\B|`, `|B\A|`, plus the Jaccard estimate in basis points
    * (`n_inter·10000 div n_union` on the retained samples). Keys pair
    * with `key_a < key_b`; per-key estimates are re-derived under the
    * PAIR theta so the identity `union = a + b − inter` holds exactly in
    * the retained-sample space.
    */
  def overlapEstimates(sketch: DataFrame): DataFrame = {
    val a = sketch.select(col("key").as("key_a"), col("hs").as("hs_a"),
      col("theta").as("th_a"))
    val b = sketch.select(col("key").as("key_b"), col("hs").as("hs_b"),
      col("theta").as("th_b"))
    a.join(broadcast(b), col("key_a") < col("key_b"))
      .withColumn("__th", least(col("th_a"), col("th_b")))
      .withColumn("__ka", filter(col("hs_a"), h => h < col("__th")))
      .withColumn("__kb", filter(col("hs_b"), h => h < col("__th")))
      .withColumn("__na", size(col("__ka")).cast("long"))
      .withColumn("__nb", size(col("__kb")).cast("long"))
      .withColumn("__nu", size(array_union(col("__ka"), col("__kb"))).cast("long"))
      .withColumn("__ni", size(array_intersect(col("__ka"), col("__kb"))).cast("long"))
      .select(
        col("key_a"), col("key_b"),
        expr(estMilliExpr("__na")).as("a_est_milli"),
        expr(estMilliExpr("__nb")).as("b_est_milli"),
        expr(estMilliExpr("__nu")).as("union_est_milli"),
        expr(estMilliExpr("__ni")).as("inter_est_milli"),
        expr(estMilliExpr("(__na - __ni)")).as("a_only_est_milli"),
        expr(estMilliExpr("(__nb - __ni)")).as("b_only_est_milli"),
        expr("CAST(CASE WHEN __nu > 0 THEN (__ni * 10000L) div __nu " +
          "ELSE 0L END AS BIGINT)").as("jaccard_est_bp"))
  }

  /** Sketch-vs-exact audit: [[overlapEstimates]] joined against the exact
    * pairwise intersection sizes (computed from the distinct member
    * frame — the per-member degree is bounded by |keys|, so the exact
    * side is a member-keyed self-pairing that never exceeds
    * |members|·|keys|² rows), with the intersection error in basis
    * points of the exact count. The audit quantifies the k trade on real
    * data the way q190 audits join-cardinality estimates.
    */
  def overlapAudit(df: DataFrame, keyCol: String, valCol: String, k: Int): DataFrame = {
    val est = overlapEstimates(kminSketch(df, keyCol, valCol, k))
    val m = df.select(col(keyCol).as("k1"), col(valCol).as("v")).distinct()
    val exact = m.join(m.select(col("k1").as("k2"), col("v")), "v")
      .filter(col("k1") < col("k2"))
      .groupBy(col("k1").as("key_a"), col("k2").as("key_b"))
      .agg(count(lit(1)).as("inter_exact"))
    est.join(exact, Seq("key_a", "key_b"), "left")
      .withColumn("inter_exact", coalesce(col("inter_exact"), lit(0L)))
      .withColumn("err_bp", expr(
        """CAST(CASE WHEN inter_exact > 0
          |  THEN (abs(inter_est_milli - inter_exact * 1000L) * 10000L)
          |       div (inter_exact * 1000L)
          |  ELSE 0L END AS BIGINT)""".stripMargin))
  }
}
