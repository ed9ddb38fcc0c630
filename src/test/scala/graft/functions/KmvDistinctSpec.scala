package graft.functions

import graft.{SparkFunSuite, Tables}
import org.apache.spark.sql.functions._

class KmvDistinctSpec extends SparkFunSuite {
  import spark.implicits._

  test("exact below k") {
    val users = Tables.events(spark, sf) // 15 distinct users at sf0.001
      .agg(GraftFunctions.kmvDistinct(col("user_id"), 64).as("est"),
        countDistinct(col("user_id")).as("exact")).collect().head
    assert(users.getLong(0) == users.getLong(1))
  }

  test("estimates within ~3/sqrt(k) above k, merged across partitions") {
    // 10k distinct ids spread over 8 partitions → partial buffers MUST merge
    val ids = spark.range(0, 10000).repartition(8).select($"id".cast("string").as("s"))
    val k = 256
    val est = ids.agg(GraftFunctions.kmvDistinct($"s", k)).collect().head.getLong(0)
    val err = math.abs(est - 10000.0) / 10000.0
    assert(err < 3.0 / math.sqrt(k - 2), s"estimate $est, err $err")
  }

  test("grouped sketch (per-day reach) runs and stays sane") {
    val r = Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"))
      .agg(GraftFunctions.kmvDistinct($"user_id", 64).as("est"),
        countDistinct($"user_id").as("exact"))
      .collect()
    r.foreach(row => assert(row.getLong(1) == row.getLong(2))) // all < k → exact
  }

  test("sql surface") {
    graft.Tables.events(spark, sf).createOrReplaceTempView("ev_kmv")
    val n = spark.sql("SELECT graft_kmv_distinct(user_id, 64) FROM ev_kmv").collect().head.getLong(0)
    assert(n > 0)
  }

  test("kmvMergeArrays == kmvValues over explode, bit for bit, across partitions") {
    // per-group arrays of 40-bit-ish hashes with overlaps and duplicates,
    // spread over partitions so partial-buffer merges are exercised
    val rows = spark.range(0, 2000).repartition(8)
      .select(($"id" % 7).as("g"),
        expr("transform(sequence(0, 5), i -> (id * 37 + CAST(i AS BIGINT) * 1013904223) % 1099511627776)")
          .as("hs"))
      .persist()
    val k = 32
    val viaArrays = rows.groupBy($"g")
      .agg(GraftFunctions.kmvMergeArrays($"hs", k).as("sk"))
    val viaExplode = rows.select($"g", explode($"hs").as("h")).groupBy($"g")
      .agg(GraftFunctions.kmvValues($"h", k).as("sk"))
    val a = viaArrays.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = viaExplode.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a.keySet == b.keySet)
    for ((g, sk) <- a) {
      assert(sk == b(g), s"group $g diverged")
      assert(sk.size <= k && sk == sk.sorted)
    }
    rows.unpersist()
  }
}
