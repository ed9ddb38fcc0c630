package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov-chain multi-touch attribution (Anderl, Becker, v. Wangenheim &
  * Schumann 2014 — the "removal effect" model that replaced last-touch
  * heuristics): user journeys become a first-order Markov chain over
  * touch channels with absorbing `conv`/`null` states, a channel's
  * credit is how much conversion probability DISAPPEARS when the channel
  * is removed from the chain, and the chain is walked a fixed number of
  * steps in exact integer milli-probabilities so both engines replay the
  * identical absorption mass.
  *
  * Determinism contract: transition probabilities are BIGINT floor
  * divisions of transition counts; each walk step applies
  * `v'[d] = Σ_s (v[s]·p(s,d)) div 1000` with the division INSIDE the
  * per-source term (the replayable convention — a post-sum division
  * would differ); `steps` is fixed, so truncation drift is identical in
  * both engines. Removing channel X drops every transition touching X
  * (mass that would enter X vanishes, exactly like `null`).
  *
  * Scale shape: the corpus pays one user-keyed journey window and ONE
  * (src, dst) hash-aggregate; everything after runs on the ≤|channels|²
  * transition matrix, which is COLLECTED (bounded by the channel
  * vocabulary — the kmeansFit localization discipline) and walked on the
  * driver; the result is a localized |channels|-row frame.
  */
object Attribution {

  /** Build the (src, dst, n) transition-count frame: per user the events
    * order by (ts, id), the journey ends at the FIRST `convType` event
    * (mapped to the absorbing state `conv`) or, without one, falls to
    * `null` after the last touch; `start` opens every journey.
    */
  private[graft] def transitionCounts(events: DataFrame, userCol: String,
                                      tsCol: String, idCol: String,
                                      typeCol: String,
                                      convType: String): DataFrame = {
    val w = Window.partitionBy(col("__u")).orderBy(col("__ts"), col("__id"))
    val seq = events
      .select(col(userCol).as("__u"), col(tsCol).as("__ts"),
        col(idCol).as("__id"), col(typeCol).as("__t"))
      .withColumn("__rn", row_number().over(w))
    val firstConv = seq.filter(col("__t") === convType)
      .groupBy(col("__u")).agg(min(col("__rn")).as("__prn"))
    val kept = seq.join(firstConv, Seq("__u"), "left")
      .filter(col("__prn").isNull || col("__rn") <= col("__prn"))
      .withColumn("__dst",
        when(col("__t") === convType, lit("conv")).otherwise(col("__t")))
      .withColumn("__src", coalesce(
        lag(col("__dst"), 1).over(
          Window.partitionBy(col("__u")).orderBy(col("__rn"))), lit("start")))
    val steps = kept.select(col("__src").as("src"), col("__dst").as("dst"))
    val terminal = kept
      .groupBy(col("__u"))
      .agg(max(struct(col("__rn"), col("__dst"))).as("__last"))
      .filter(col("__last.__dst") =!= "conv")
      .select(col("__last.__dst").as("src"), lit("null").as("dst"))
    steps.unionByName(terminal)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
  }

  /** Fixed-step absorption walk over a milli-probability matrix with the
    * states in `drop` removed (transitions touching them vanish).
    * Returns the accumulated `conv` mass in milli of the start mass.
    */
  private def absorb(p: Map[(String, String), Long], steps: Int,
                     drop: Set[String]): Long = {
    var v = Map("start" -> 1000L)
    var conv = 0L
    for (_ <- 1 to steps) {
      val next = scala.collection.mutable.Map[String, Long]()
      for (((s, d), pm) <- p if v.contains(s) && !drop(s) && !drop(d)) {
        val mass = v(s) * pm / 1000L
        if (d == "conv") conv += mass
        else if (d != "null") next(d) = next.getOrElse(d, 0L) + mass
      }
      v = next.toMap
    }
    conv
  }

  /** Removal effects from a (src, dst, n) transition-COUNT frame — the
    * model core shared by [[markovRemovalEffects]] (counts from one batch
    * journey scan) and the streaming model-refresh sink (counts folded
    * across window closes into a versioned matrix). Output: one row per
    * entry of `channels` — (channel, conv_milli_full, conv_milli_removed,
    * removal_effect_bp) with `removal_effect_bp = (full − removed)·10⁴
    * div full` (0 when the full chain never converts).
    */
  def removalEffectsFromCounts(cnt: DataFrame, channels: Seq[String],
                               steps: Int = 12): DataFrame = {
    require(steps > 0, "steps must be positive")
    require(channels.nonEmpty, "need at least one channel")
    val spark = cnt.sparkSession
    // Vocabulary guard BEFORE the collect: states outside channels ∪
    // {start, conv, null} drop here — with per-src totals computed over
    // the FULL count frame first, an out-of-vocabulary event type behaves
    // exactly like a `drop`ped channel (its transition mass vanishes, no
    // renormalization), and the collected matrix is ≤ (|channels|+1) ×
    // (|channels|+2) rows BY CONSTRUCTION, not by data: a high-cardinality
    // typeCol cannot grow the driver state.
    val srcVocab = channels :+ "start"
    val dstVocab = channels ++ Seq("conv", "null")
    val probs = cnt
      .withColumn("__tot", sum(col("n")).over(
        Window.partitionBy(col("src"))))
      .select(col("src"), col("dst"),
        expr("n * 1000 div __tot").as("p_milli"))
      .filter(col("src").isin(srcVocab: _*) && col("dst").isin(dstVocab: _*))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val full = absorb(probs, steps, Set.empty)
    val rows = channels.map { ch =>
      val removed = absorb(probs, steps, Set(ch))
      val eff = if (full > 0) (full - removed) * 10000L / full else 0L
      (ch, full, removed, eff)
    }
    import spark.implicits._
    rows.toDF("channel", "conv_milli_full", "conv_milli_removed",
      "removal_effect_bp")
  }

  /** Removal-effect attribution over the journey chain — the batch model:
    * one journey scan into transition counts, then
    * [[removalEffectsFromCounts]].
    */
  def markovRemovalEffects(events: DataFrame, userCol: String, tsCol: String,
                           idCol: String, typeCol: String,
                           channels: Seq[String], convType: String = "purchase",
                           steps: Int = 12): DataFrame =
    removalEffectsFromCounts(
      transitionCounts(events, userCol, tsCol, idCol, typeCol, convType),
      channels, steps)
}
