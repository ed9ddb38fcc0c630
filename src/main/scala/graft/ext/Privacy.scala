package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differential-privacy release primitives (Dwork et al., "Calibrating
  * Noise to Sensitivity in Private Data Analysis", TCC 2006) — the
  * aggregate-release tier a data platform runs when publishing corpus
  * statistics (per-source counts, contributor tallies) outside the
  * trust boundary.
  *
  * House determinism rule: the Laplace draw is SEEDED — the uniform comes
  * from md5(salt|group-key), so a release is a pure function of the data
  * and the salt and replays bit-for-bit on any engine (and in the DuckDB
  * oracle). A production deployment would rotate the salt per release
  * epoch; determinism per (salt, key) is exactly the "one noise draw per
  * released cell" discipline that prevents averaging attacks across
  * re-runs of the same release.
  *
  * Scale shape: noise attaches as a PROJECTION on the aggregated frame
  * (one row per released group) — the corpus-side work is the one
  * hash-aggregate producing the counts; nothing here touches occurrence
  * rows.
  */
object Privacy {

  /** Seeded uniform u ∈ (0,1): the first 8 md5 hex digits of
    * `salt|key` as a 32-bit value v, mapped to (v + 0.5) / 2^32 — the
    * half-step offset keeps u strictly inside (0,1) so the Laplace
    * inverse CDF below never sees ln(0).
    */
  def seededUniform(key: Column, salt: String): Column = {
    val v = conv(substring(
      md5(concat_ws("|", lit(salt), key.cast("string")).cast("binary")),
      1, 8), 16, 10).cast("long")
    (v.cast("double") + lit(0.5)) / lit(4294967296.0)
  }

  /** Laplace(b = `bMicro`/10^6) noise in integer micro-units via the
    * inverse CDF: with w = u − ½, noise = −b·sgn(w)·ln(1 − 2|w|).
    * For a count query (sensitivity 1), b = 1/ε — so ε = 1 is
    * `bMicro = 1000000`. |noise| ≤ b·ln(2^33) ≈ 22.9·b (the u offset
    * bounds the tail), so micro-unit longs never overflow.
    */
  def laplaceNoiseMicro(key: Column, salt: String, bMicro: Long): Column = {
    require(bMicro > 0, "bMicro must be positive")
    val w = seededUniform(key, salt) - lit(0.5)
    round(lit(-bMicro.toDouble) * signum(w) * log(lit(1.0) - lit(2.0) * abs(w)))
      .cast("long")
  }

  /** ε-DP noisy group counts: one Laplace(1/ε) draw per group, seeded by
    * the group key. `suppressBelow` additionally drops groups whose TRUE
    * count is under the floor (the k-anonymity-style small-cell rule
    * census-type releases layer on top of DP). The output keeps `true_n`
    * beside the release — this is the calibration AUDIT table (publishing
    * it would of course break the guarantee; the release view selects
    * only `released_micro`).
    *
    * Output: groupCols..., true_n, noise_micro,
    * released_micro = true_n·10^6 + noise_micro.
    */
  def noisyCounts(df: DataFrame, groupCols: Seq[String], salt: String,
      bMicro: Long, suppressBelow: Long): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    // "/" separator keeps adjacent keys unambiguous (("a","bc") vs ("ab","c"))
    val key = concat_ws("/", groupCols.map(c => col(c).cast("string")): _*)
    df.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("true_n"))
      .filter(col("true_n") >= suppressBelow)
      .withColumn("noise_micro", laplaceNoiseMicro(key, salt, bMicro))
      .withColumn("released_micro",
        col("true_n") * lit(1000000L) + col("noise_micro"))
  }
}
