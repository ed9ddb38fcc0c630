package graft.table

import graft.{SparkFunSuite, Tables}

class BucketingSpec extends SparkFunSuite {

  test("bucketed join on the bucket key plans with zero Exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice"),
        "orders_b", "o_orderkey", 8)
      Bucketing.writeBucketed(
        Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
        "lineitem_b", "l_orderkey", 8)
      val joined = Bucketing.bucketedJoin(spark, "orders_b", "lineitem_b", "o_orderkey", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // correctness: equals the plain join
      val o = Tables.orders(spark, sf)
      val l = Tables.lineitem(spark, sf)
      val expected = o.join(l, o("o_orderkey") === l("l_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
