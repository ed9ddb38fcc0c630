package graft.table

import org.apache.spark.sql.DataFrame

/** Bucketed (co-located) tables — the shuffle-elimination path for
  * repeated large joins on a stable key (SURVEY.md §4.2 "co-locate joins
  * via bucketing"). Two tables bucketed into the same number of buckets on
  * the join key can be joined with NO exchange on either side: each task
  * reads matching bucket files directly. At 100 TB this turns every
  * fact⋈fact join on the bucket key from a full shuffle into a local
  * merge — the single biggest join cost lever after broadcasting.
  *
  * Analog of the reference's `bucket(16, id)` Iceberg partition transform
  * (streaming_job.py:54), lifted to Spark's native bucketed-table support
  * (which, unlike the derived-column emulation in [[TableLayout.bucketOf]],
  * the planner actually exploits to drop the shuffle).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, nBuckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on the bucket key — plans with zero
    * Exchange when both sides' bucket specs line up. Keys are resolved
    * against their own side, so identically-named key columns (the common
    * co-located case) don't hit an ambiguous-reference error.
    */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
                   leftTable: String, rightTable: String,
                   leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
