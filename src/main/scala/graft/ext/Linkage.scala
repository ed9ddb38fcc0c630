package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probabilistic record linkage — the Fellegi–Sunter decision model
  * (Fellegi & Sunter 1969, JASA; the framework behind Splink and most
  * production entity-resolution stacks). Candidate pairs come from a
  * caller-supplied blocking join (the reference surface has nothing like
  * this; the closest public analogues are the linkage literature and the
  * blocked fuzzy-match shape q194 already pins).
  */
object Linkage {

  /** Fellegi–Sunter log-likelihood match scores over pre-blocked
    * candidate pairs.
    *
    * `fields` lists `(agreeCol, mBp)`: a boolean agreement-indicator
    * column present on BOTH frames, and the assumed m-probability
    * (chance a TRUE match agrees on the field) in basis points — m is a
    * modeling prior in [1, 9999]. The u-probabilities (chance a random
    * pair agrees) are ESTIMATED from `uPairs` — a caller-built random
    * pairing of the two record sets, NOT the blocked candidates
    * (blocking concentrates matches, which would inflate u; Splink's
    * u-training draws random pairs for the same reason). A deterministic
    * hash-pairing of linear size is the intended shape. Each field then
    * contributes log2(m/u) milli-bits when it agrees and
    * log2((1−m)/(1−u)) when it does not; the pair's score is the sum.
    *
    * Scale shape: one aggregate over the u-sample (count + one
    * conditional sum per field) rides back as a broadcast 1-row frame;
    * the weights and the score are pure projections on the candidate
    * rows. Nothing is collected, nothing re-joins on a data key. Both
    * weight ratios are quotients of EXACT integers cast to double
    * (mBp/uBp and (10000−mBp)/(10000−uBp)), so the only inexact step is
    * log2 itself — the same rounded-transcendental discipline as
    * zipfFit's ln and lshParameterSweep's pow. u is clamped to
    * [1, 9999] bp so the weights stay finite on degenerate samples.
    *
    * Output: `pairs` plus (`score_milli` LONG, `n_agree` LONG).
    */
  def fellegiSunterScores(pairs: DataFrame, uPairs: DataFrame,
                          fields: Seq[(String, Long)]): DataFrame = {
    require(fields.nonEmpty, "fields must be non-empty")
    require(fields.forall { case (_, m) => m >= 1L && m <= 9999L },
      "mBp must be in [1, 9999]")
    val aggs = fields.map { case (c, _) =>
      sum(when(col(c), lit(1L)).otherwise(lit(0L))).as(s"__a_$c")
    }
    val uAgg = uPairs.agg(count(lit(1)).as("__n"), aggs: _*)
    val withU = pairs.crossJoin(broadcast(uAgg))
    val contribs = fields.map { case (c, mBp) =>
      val uBp = greatest(lit(1L), least(lit(9999L),
        expr(s"(__a_$c * 10000L) div __n")))
      val wAgree = round(
        log2(lit(mBp).cast("double") / uBp.cast("double")) * 1000).cast("long")
      val wDisagree = round(
        log2(lit(10000L - mBp).cast("double")
          / (lit(10000L) - uBp).cast("double")) * 1000).cast("long")
      when(col(c), wAgree).otherwise(wDisagree)
    }
    val agreeCount = fields.map { case (c, _) =>
      when(col(c), lit(1L)).otherwise(lit(0L))
    }.reduce(_ + _)
    withU
      .withColumn("score_milli", contribs.reduce(_ + _))
      .withColumn("n_agree", agreeCount)
      .drop("__n" +: fields.map { case (c, _) => s"__a_$c" }: _*)
  }
}
