package graft.table

import graft.{SparkFunSuite, Tables}
import java.nio.file.Files

/** Source/sink format round trips (SURVEY.md S4/S6 beyond parquet): the
  * engine reads whatever `spark.read` reads; these pin csv/json/orc both
  * directions with explicit schemas (no inference in pipelines).
  */
class SourceFormatsSpec extends SparkFunSuite {

  private lazy val orders = Tables.orders(spark, sf)

  test("csv round trip with explicit schema") {
    val p = graft.TestTmp.dir("csv") + "/t"
    orders.write.option("header", "true").csv(p)
    val back = spark.read.option("header", "true").schema(orders.schema).csv(p)
    assert(back.count() == orders.count())
    assert(back.schema == orders.schema)
  }

  test("json round trip with explicit schema") {
    val p = graft.TestTmp.dir("json") + "/t"
    orders.write.json(p)
    val back = spark.read.schema(orders.schema).json(p)
    assert(back.count() == orders.count())
  }

  test("orc round trip") {
    val p = graft.TestTmp.dir("orc") + "/t"
    orders.write.orc(p)
    val back = spark.read.orc(p)
    assert(back.count() == orders.count())
    assert(back.schema == orders.schema)
  }
}
