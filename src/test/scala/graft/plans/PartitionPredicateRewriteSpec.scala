package graft.plans

import graft.{SparkFunSuite, Tables}
import graft.table.TableLayout
import org.apache.spark.sql.functions._
import java.nio.file.Files

class PartitionPredicateRewriteSpec extends SparkFunSuite {

  private lazy val tablePath: String = {
    val p = graft.TestTmp.dir("hidden") + "/events"
    TableLayout.partitionedWrite(
      Tables.events(spark, sf), p,
      partitions = Seq(TableLayout.daysPartition("ts")), sortCols = Seq("ts"))
    p
  }

  test("raw-timestamp predicate prunes ts_day partitions") {
    val df = spark.read.parquet(tablePath)
      .filter(col("ts") >= lit("2024-01-20 06:30:00").cast("timestamp"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("ts_day"),
      s"implied partition filter missing:\n$plan")
    // pruning must not change results: compare against the unpartitioned scan
    val expected = Tables.events(spark, sf)
      .filter(col("ts") >= lit("2024-01-20 06:30:00").cast("timestamp")).count()
    assert(df.count() == expected)
  }

  test("between-style range implies both partition bounds") {
    val df = spark.read.parquet(tablePath).filter(
      col("ts") >= lit("2024-01-10 12:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-12 12:00:00").cast("timestamp"))
    val plan = df.queryExecution.executedPlan.toString
    assert("ts_day#\\d+ >= 2024-01-10".r.findFirstIn(plan).isDefined &&
      "ts_day#\\d+ <= 2024-01-12".r.findFirstIn(plan).isDefined, s"bounds missing:\n$plan")
    val expected = Tables.events(spark, sf).filter(
      col("ts") >= lit("2024-01-10 12:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-12 12:00:00").cast("timestamp")).count()
    assert(df.count() == expected)
  }

  test("hour-granularity partitions prune from raw-timestamp predicates") {
    val p = graft.TestTmp.dir("hidden-h") + "/events"
    TableLayout.partitionedWrite(
      Tables.events(spark, sf), p,
      partitions = Seq(TableLayout.hoursPartition("ts")))
    val pred = col("ts") >= lit("2024-01-20 06:30:00").cast("timestamp")
    val df = spark.read.parquet(p).filter(pred)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      "ts_hour#\\d+ >= 2024-01-20-06".r.findFirstIn(plan).isDefined,
      s"implied hour partition filter missing:\n$plan")
    assert(df.count() == Tables.events(spark, sf).filter(pred).count())
  }

  test("no ts_day column → rule is a no-op") {
    val df = Tables.events(spark, sf).filter(col("ts") >= lit("2024-01-20 00:00:00").cast("timestamp"))
    // just runs; nothing to assert beyond correctness
    assert(df.count() > 0)
  }
}
