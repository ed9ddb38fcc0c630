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

  /** Audit row for the self-join |df ⋈ df on keyCol|.
    *
    * Output (one row): exact_pairs, n_rows, n_distinct, est_uniform,
    * est_hh, err_uniform_bp, err_hh_bp (absolute error in basis points
    * of the exact size; integer floor division throughout).
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
    totals.crossJoin(top)
      .withColumn("est_uniform", expr("(n_rows * n_rows) div n_distinct"))
      .withColumn("est_hh", expr(
        """hh_sq + (CASE WHEN n_distinct > hh_d
          | THEN ((n_rows - hh_n) * (n_rows - hh_n)) div (n_distinct - hh_d)
          | ELSE 0 END)""".stripMargin))
      .withColumn("err_uniform_bp",
        expr("(abs(est_uniform - exact_pairs) * 10000L) div exact_pairs"))
      .withColumn("err_hh_bp",
        expr("(abs(est_hh - exact_pairs) * 10000L) div exact_pairs"))
      .select(col("exact_pairs"), col("n_rows"), col("n_distinct"),
        col("est_uniform"), col("est_hh"),
        col("err_uniform_bp"), col("err_hh_bp"))
  }
}
