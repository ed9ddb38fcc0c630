package graft.ops

import graft.{SparkFunSuite, Tables}
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkFunSuite {

  test("saltedJoin equals the plain equi-join") {
    val ev   = Tables.events(spark, sf) // user_id is Zipf-ish: hot keys exist
    val cust = Tables.customer(spark, sf).withColumnRenamed("c_custkey", "user_id")
    val plain  = ev.join(cust, Seq("user_id")).count()
    val salted = SkewJoin.saltedJoin(ev, cust, Seq("user_id"), spreadCol = "event_id", saltBuckets = 4)
    assert(salted.count() == plain)
    // schema: left columns then right-only columns, no salt leakage
    assert(!salted.columns.contains("__salt"))
    assert(salted.columns.toSet == (ev.columns.toSet ++ cust.columns.toSet))
  }

  test("salt actually spreads a hot key over multiple buckets") {
    import spark.implicits._
    val hot = Seq.tabulate(100)(i => (1L, i.toLong)).toDF("k", "spread")
    val buckets = hot.select(pmod(hash(col("spread")), lit(4)).as("b")).distinct().count()
    assert(buckets > 1)
  }
}
