package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-cardinality estimation audits — the statistics a cost-based
  * optimizer (Selinger et al., "Access Path Selection", SIGMOD 1979; the
  * CBO lineage Spark's own `ANALYZE TABLE` stats follow) keeps per join
  * key, exercised AGAINST ground truth so the error of each estimator is
  * a measured number, not an assumption.
  *
  * The self-equi-join on a key k has exactly `Σ_v c(v)²` result rows.
  * Estimators under test:
  *   - System R uniformity: `n² / d` (n rows, d distinct keys) — the
  *     textbook estimate, biased low under skew;
  *   - heavy-hitter corrected: the top-H key frequencies kept EXACT (the
  *     "end-biased histogram", Ioannidis & Christodoulakis 1993), tail
  *     assumed uniform: `Σ_HH c² + n_tail² / d_tail`.
  *
  * Scale shape: one corpus hash-aggregate builds the per-key counts; the
  * roll-up and the top-H cut (a TakeOrdered, H rows) both consume that
  * aggregate — the two branches share the identical aggregate subplan, so
  * the exchange is planned once and reused (plan-pinned), and the corpus
  * is scanned once.
  */
object OptimizerStats {

  /** floor(x² / d) exactly in BIGINT below the checked 3·10⁹ bound; the
    * single-rounded-double form above, capped at the 9.2e18 literal
    * (exactly representable as a double in both engines, unlike
    * Long.MaxValue which rounds UP past 2⁶³ and errors DuckDB's cast).
    */
  private[ext] def sqDiv(x: String, d: String): String =
    s"""CASE WHEN $d <= 0 THEN 0
       |  WHEN $x <= 3000000000L THEN ($x * $x) div $d
       |  ELSE CAST(least(round((CAST($x AS DOUBLE) * $x) / $d), 9.2e18)
       |    AS BIGINT) END""".stripMargin

  /** Audit row for the self-join |df ⋈ df on keyCol|.
    *
    * Output (one row): exact_pairs, n_rows, n_distinct, est_uniform,
    * est_hh, err_uniform_bp, err_hh_bp (absolute error in basis points
    * of the exact size; integer floor division throughout).
    *
    * Overflow regime (the [[RobustStats.chi2CentiCol]] convention —
    * `n²` wraps signed 64-bit at n > 3.03·10⁹, a REALISTIC table size):
    * below the checked 3·10⁹ bound every estimate is exact BIGINT;
    * above it the squares move to the single-rounded-double convention
    * (fixed association order, one terminal round — IEEE-identical in
    * Spark and DuckDB), saturating at 9.2·10¹⁸ so neither engine wraps
    * or errors. `exact_pairs`/`hh_sq` (Σc²) stay plain BIGINT sums —
    * they wrap only when the true pair count itself exceeds 9.2·10¹⁸,
    * i.e. when the audited self-join is beyond any system's reach.
    */
  def selfJoinSizeAudit(df: DataFrame, keyCol: String, hh: Int): DataFrame = {
    require(hh > 0, "need at least one heavy hitter")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
    val totals = counts.agg(
      sum(col("c")).as("n_rows"),
      count(lit(1)).as("n_distinct"),
      sum(col("c") * col("c")).as("exact_pairs"))
    val top = counts.orderBy(col("c").desc, col(keyCol)).limit(hh)
      .agg(coalesce(sum(col("c")), lit(0L)).as("hh_n"),
        coalesce(sum(col("c") * col("c")), lit(0L)).as("hh_sq"),
        count(lit(1)).as("hh_d"))
    // |est − exact|·10⁴ re-wraps at |diff| > 9.2e14: same branch shape
    def errBp(est: String) =
      s"""CASE WHEN abs($est - exact_pairs) <= 900000000000000L
         |  THEN (abs($est - exact_pairs) * 10000L) div exact_pairs
         |  ELSE CAST(least(round(CAST(abs($est - exact_pairs) AS DOUBLE)
         |      * 10000.0 / exact_pairs), 9.2e18) AS BIGINT) END""".stripMargin
    totals.crossJoin(top)
      .withColumn("est_uniform", expr(sqDiv("n_rows", "n_distinct")))
      .withColumn("est_hh", expr(
        s"""hh_sq + (CASE WHEN n_distinct > hh_d
           | THEN ${sqDiv("(n_rows - hh_n)", "(n_distinct - hh_d)")}
           | ELSE 0 END)""".stripMargin))
      .withColumn("err_uniform_bp", expr(errBp("est_uniform")))
      .withColumn("err_hh_bp", expr(errBp("est_hh")))
      .select(col("exact_pairs"), col("n_rows"), col("n_distinct"),
        col("est_uniform"), col("est_hh"),
        col("err_uniform_bp"), col("err_hh_bp"))
  }

  /** ANALYZE-style column profile: per listed column, the non-null/null
    * tallies, EXACT distinct-value count, lexicographic min/max of the
    * canonical string form, and the modal value with its count — the
    * statistics table a CBO ingests (Spark's `ANALYZE TABLE ... FOR
    * COLUMNS`, with exact NDV instead of its HLL estimate).
    *
    * Shape: the table MELTS to (col_name, value) rows — one explode, a
    * deliberate |cols|× row multiplication (exactly the cost a
    * multi-column `count(distinct)` pays via Expand, but in a form where
    * BOTH aggregates stay plain partial-aggregable hash aggregates: one
    * shuffle on (col_name, value), one on col_name; the modal value is a
    * map-side `max(struct(cnt, value))` argmax, never a rank window).
    * Values compare in canonical string form (numerics documented as
    * lexicographic in min/max_str).
    */
  /** MCV selectivity audit (the Postgres `pg_stats` estimation model;
    * public): keep the k most-common values EXACT, assume every other
    * value takes an equal share of the remaining mass — then score the
    * model against the truth for every distinct value as an equality
    * predicate. The table an optimizer review reads to decide whether k
    * MCV slots are enough for this column's skew: `err_bp` spikes exactly
    * where a common-but-not-kept value got the uniform guess.
    *
    * Exact integers: `actual_bp = c·10000 div N`; non-MCV estimate =
    * `(N − Σmcv)·10000 div ((ndv − k)·N)` (the uniform remainder share);
    * MCV rows estimate at their exact share by construction.
    *
    * Plan: one hash-agg to the |distinct|-row value histogram; the MCV
    * set is a TakeOrdered k and rides back as a broadcast, totals as
    * broadcast 1-rows — past the first aggregate nothing is input-sized.
    *
    * Output: (value, cnt, is_mcv, actual_bp, est_bp, err_bp) per
    * distinct value.
    */
  def mcvSelectivity(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val vh = df.select(col(valueCol).cast("long").as("value"))
      .filter(col("value").isNotNull)
      .groupBy(col("value")).agg(count(lit(1)).as("cnt"))
    val tot = broadcast(vh.agg(sum(col("cnt")).as("__n"),
      count(lit(1)).as("__ndv")))
    val mcv = vh.orderBy(col("cnt").desc, col("value")).limit(k)
      .select(col("value"), lit(1L).as("__mcv"))
    val mcvMass = broadcast(vh.join(mcv, Seq("value"))
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("__mcvsum")))
    vh.join(broadcast(mcv), Seq("value"), "left")
      .crossJoin(tot).crossJoin(mcvMass)
      .select(col("value"), col("cnt"),
        col("__mcv").isNotNull.as("is_mcv"),
        expr("cnt * 10000 div __n").as("actual_bp"),
        when(col("__mcv").isNotNull, expr("cnt * 10000 div __n"))
          .otherwise(when(col("__ndv") > k,
            expr(s"(__n - __mcvsum) * 10000 div ((__ndv - ${k}L) * __n)"))
            .otherwise(lit(0L))).as("est_bp"))
      .withColumn("err_bp", abs(col("actual_bp") - col("est_bp")))
  }

  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val melted = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)).as("m"))
      .select(col("m.col_name").as("col_name"), col("m.v").as("v"))
    val perVal = melted.groupBy(col("col_name"), col("v"))
      .agg(count(lit(1)).as("cnt"))
    perVal.groupBy(col("col_name"))
      .agg(
        sum(when(col("v").isNotNull, col("cnt")).otherwise(0L)).as("n_nonnull"),
        sum(when(col("v").isNull, col("cnt")).otherwise(0L)).as("n_null"),
        count(when(col("v").isNotNull, lit(1))).as("ndv"),
        min(col("v")).as("min_str"), max(col("v")).as("max_str"),
        max(when(col("v").isNotNull,
          struct(col("cnt").as("cnt"), col("v").as("v")))).as("__top"))
      .select(col("col_name"), col("n_nonnull"), col("n_null"), col("ndv"),
        col("min_str"), col("max_str"),
        col("__top.v").as("top_value"), col("__top.cnt").as("top_count"))
  }

  /** Equi-depth-histogram range-selectivity audit — the Selinger
    * estimation model over Piatetsky-Shapiro & Connell (SIGMOD 1984)
    * equal-height buckets, audited against exact counts (the q190/q251
    * discipline extended from equality to RANGE predicates, the other
    * half of what a CBO estimates).
    *
    * Histogram build: boundaries are the floored type-7 quantiles from
    * ONE partial+final `percentile` aggregate (floor makes the cut
    * points exact BIGINTs, so bucket assignment is pure integer
    * comparison in both engines — no last-ulp flip can move a row);
    * exact per-bucket counts come from one hash-aggregate against the
    * broadcast 1-row boundary frame. Per audited range [lo, hi) the
    * estimate assumes uniformity INSIDE each bucket (the model's defining
    * assumption): `est_b = cnt_b · overlap_b div width_b` on the integer
    * value span, summed over buckets; exact counts fold as conditional
    * aggregates in ONE corpus scan (never a corpus × ranges join).
    *
    * Output: one row per range — (range_lo, range_hi, exact_rows,
    * est_rows, err_bp) with err_bp = |est − exact|·10⁴ div max(exact, 1).
    */
  def rangeSelectivityAudit(df: DataFrame, valCol: String, nBuckets: Int,
                            ranges: Seq[(Long, Long)]): DataFrame = {
    require(nBuckets >= 2, "need at least two buckets")
    require(ranges.nonEmpty && ranges.forall(r => r._1 < r._2),
      "ranges must be non-empty with lo < hi")
    val spark = df.sparkSession
    val vals = df.select(col(valCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
    val qs = (1 until nBuckets).map(i =>
      s"CAST($i AS DOUBLE) / $nBuckets").mkString(", ")
    val bounds = vals.agg(
      expr(s"transform(percentile(v, array($qs)), x -> CAST(floor(x) AS BIGINT))")
        .as("bnds"),
      min(col("v")).as("vmin"), max(col("v")).as("vmax"))
    // bucket id = 1 + #boundaries strictly below v (1..B); bucket b spans
    // the integer values (lb_b, ub_b] with lb_1 closed at vmin
    val bucketed = vals.crossJoin(broadcast(bounds))
      .select(expr("1 + size(filter(bnds, x -> v > x))").as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("cnt"))
    val hist = bucketed.crossJoin(broadcast(bounds))
      .select(col("b"), col("cnt"),
        expr("CASE WHEN b = 1 THEN vmin - 1 ELSE element_at(bnds, b - 1) END").as("lb"),
        expr(s"CASE WHEN b = $nBuckets THEN vmax ELSE element_at(bnds, b) END").as("ub"))
    // exact counts: one scan, one conditional aggregate per range
    val exactCols = ranges.zipWithIndex.map { case ((lo, hi), i) =>
      sum(when(col("v") >= lo && col("v") < hi, 1L).otherwise(0L)).as(s"__x$i")
    }
    val exactAgg = vals.agg(exactCols.head, exactCols.tail: _*)
    import spark.implicits._
    val spine = ranges.toDF("range_lo", "range_hi")
    // histogram estimate: bucket b holds cnt rows uniformly over the
    // integer span (lb, ub] (width = ub - lb); overlap with [lo, hi) is
    // max(0, min(hi - 1, ub) - max(lo, lb + 1) + 1) values
    val est = spine.crossJoin(hist)
      .select(col("range_lo"), col("range_hi"),
        expr("""CASE WHEN ub - lb <= 0 THEN 0L ELSE
          | cnt * greatest(0L, least(range_hi - 1, ub) - greatest(range_lo, lb + 1) + 1)
          |   div (ub - lb) END""".stripMargin).as("__e"))
      .groupBy(col("range_lo"), col("range_hi"))
      .agg(sum(col("__e")).as("est_rows"))
    est.crossJoin(broadcast(exactAgg))
      .select(col("range_lo"), col("range_hi"),
        ranges.zipWithIndex.foldLeft(lit(0L)) { case (acc, ((lo, hi), i)) =>
          when(col("range_lo") === lo && col("range_hi") === hi, col(s"__x$i"))
            .otherwise(acc)
        }.as("exact_rows"), col("est_rows"))
      .withColumn("err_bp", expr(
        "abs(est_rows - exact_rows) * 10000 div greatest(exact_rows, 1L)"))
  }
}
