package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable fixed-accuracy quantile sketch over non-negative integer
  * values — the HdrHistogram / DDSketch idea (relative-error-bounded
  * log-spaced buckets; Dunning's t-digest solves the same problem with
  * randomized centroids, this is the DETERMINISTIC variant) expressed as
  * pure integer bit arithmetic both engines share:
  *
  *   bucket(v) = v                        for v < 16 (exact)
  *             = 16·e + ((v >> (e−4)) & 15)  otherwise, e = ⌊log₂ v⌋
  *
  * with e computed EXACTLY as `length(bin(v)) − 1` (no float log).
  * Sixteen sub-buckets per octave bound the relative error of any
  * bucket's lower bound at 1/16 = 625 bp. The histogram is a plain
  * (key, bucket) count frame: map-side combinable, mergeable by
  * addition, ~16·64 rows of state per key no matter how many values —
  * the single-pass alternative to a per-key sort when "p50/p90/p99 per
  * group over 100 TB" is the ask.
  *
  * Quantiles use the nearest-rank definition r = ⌈q·n/100⌉: the
  * estimate is the lower bound of the bucket containing the r-th
  * smallest value, so estimate ≤ true value < estimate·(1 + 1/16).
  */
object HdrSketch {

  /** Per-key HDR histogram: `(key, bucket, cnt)`, bucket ids ordered by
    * value (0-15 exact smalls, then 16·e + sub). Negative values are
    * rejected (count them on a shifted scale if needed).
    */
  def hdrHistogram(df: DataFrame, keyCol: String, vCol: String): DataFrame =
    df.select(col(keyCol).as("key"), col(vCol).cast("long").as("__v"))
      .withColumn("bucket", bucketCol(col("__v")))
      .groupBy("key", "bucket").agg(count(lit(1)).as("cnt"))

  /** The bucket id of a non-negative long value — usable anywhere a
    * projection fits (batch histograms here, streaming windowed
    * histograms in `StreamPipelines.hdrTelemetry`).
    */
  def bucketCol(v: Column): Column = {
    val e = (length(bin(v)) - 1).cast("long")
    when(v < 0L, expr("raise_error('hdrHistogram: negative value')").cast("long"))
      .when(v < 16L, v)
      .otherwise(e * 16L +
        (call_function("shiftright", v, (e - 4L).cast("int")) bitwiseAND 15L))
  }

  /** Lower bound of a bucket id — the quantile estimate surface. */
  private[ext] val bucketLowerSql: String =
    """CASE WHEN bucket < 16 THEN bucket
      |  ELSE shiftleft(16 + bucket % 16, CAST(bucket div 16 - 4 AS INT))
      |END""".stripMargin

  /** Sketch-vs-exact audit: for each key and each percentile in `qs`,
    * the HDR estimate (bucket lower bound at nearest rank
    * r = ⌈q·n/100⌉), the exact nearest-rank value, and the error in
    * basis points — bounded at 625 by construction. The exact side
    * re-sorts per key and exists only to certify the sketch (the q289
    * audit contract); the sketch side is the 100 TB path.
    */
  def hdrQuantileAudit(df: DataFrame, keyCol: String, vCol: String,
                       qs: Seq[Int]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 1 && q <= 100),
      "qs must be percentiles in [1, 100]")
    val hist = hdrHistogram(df, keyCol, vCol)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy("key").orderBy("bucket")))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("key")))
    val ranks = cum.select("key", "n").distinct()
      .withColumn("q", explode(array(qs.map(q => lit(q.toLong)): _*)))
      .withColumn("r", expr("(q * n + 99) div 100"))
    val est = ranks.join(cum.select("key", "bucket", "cum"), "key")
      .filter(col("cum") >= col("r"))
      .groupBy("key", "q", "n", "r")
      .agg(min(col("bucket")).as("bucket"))
      .withColumn("est", expr(bucketLowerSql))
    val exact = df
      .select(col(keyCol).as("key"), col(vCol).cast("long").as("__v"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("key").orderBy(col("__v"))).cast("long"))
    est.join(exact, est("key") === exact("key") && col("__rn") === col("r"))
      .select(est("key"), col("q"), col("n"), col("r"), col("est"),
        col("__v").as("exact_v"),
        expr("""CAST(CASE WHEN __v > 0 THEN (abs(est - __v) * 10000) div __v
          |  ELSE 0 END AS BIGINT)""".stripMargin).as("err_bp"))
  }
}
