package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet-backed table access for the driver test data
  * (`/root/testdata/sf*`; see TESTDATA.md).
  *
  * At 100 TB each of these becomes a partitioned parquet dataset (or a
  * Delta/Iceberg table); all call sites go through this one loader so the
  * storage layout can change without touching the operator library.
  */
object Tables {
  /** The test tables write naive (not UTC-adjusted) parquet timestamps;
    * Spark's default NTZ inference would surface them as TIMESTAMP_NTZ,
    * which `unix_micros`/interval arithmetic reject and the hidden-
    * partitioning rewrite doesn't match. The session runs in UTC, so
    * reading them as plain TimestampType (micros-since-epoch) preserves
    * the wall clock exactly AND keeps scan-level predicate pushdown on
    * the timestamp columns (a cast-on-top normalization would not).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  /** `events.ts` is parquet INT64 TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read nanos as long (legacy conf) and convert to a
    * microsecond TimestampType — the data carries no sub-microsecond
    * precision (verified), so the conversion is exact.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
