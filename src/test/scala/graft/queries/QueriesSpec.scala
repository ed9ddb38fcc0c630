package graft.queries

import graft.{SparkEntry, SparkFunSuite}

/** Smoke: every registered query runs at sf0.001 and returns rows with the
  * declared column set (the driver's hash compare is column-name-sensitive).
  * Deep value correctness is the driver's DuckDB oracle (tools/selfcheck.py).
  */
class QueriesSpec extends SparkFunSuite {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("temp-view SQL surface (S10): registered view queryable via spark.sql") {
    graft.Tables.events(spark, sf).createOrReplaceTempView("events_v")
    val n = spark.sql("SELECT count(DISTINCT user_id) AS u FROM events_v").collect().head.getLong(0)
    assert(n > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      df.count() // q18_anti_join can legitimately return 0 rows
    }
  }
}
