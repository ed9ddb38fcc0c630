package graft.streaming

import graft.SparkFunSuite
import graft.streaming.StatefulUpsert.{KeyedEvent, KeyState}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StatefulUpsertSpec extends SparkFunSuite {
  import spark.implicits._

  test("fold: latest-wins with sparse carry-forward and replay idempotence") {
    val ev = Seq(
      KeyedEvent("k", 10L, 1L, "created", Some(5.0)),
      KeyedEvent("k", 20L, 2L, "paid", None),       // sparse update
      KeyedEvent("k", 15L, 3L, "ignored?", Some(9.9)))
    val s1 = StatefulUpsert.fold("k", None, ev.iterator)
    assert(s1 == KeyState("k", "paid", Some(9.9), 20L, 2L))
    // replaying the same events over the state is a no-op
    val s2 = StatefulUpsert.fold("k", Some(s1), ev.iterator)
    assert(s2 == s1)
  }

  test("streaming mapGroupsWithState maintains per-key state across batches") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val q = StatefulUpsert.latestPerKey(input.toDS())
      .writeStream.format("memory").queryName("su")
      .outputMode(StatefulUpsert.outputMode).start()
    try {
      input.addData(
        KeyedEvent("u1", 100L, 1L, "created", Some(10.0)),
        KeyedEvent("u2", 100L, 2L, "created", Some(20.0)))
      q.processAllAvailable()
      input.addData(KeyedEvent("u1", 200L, 3L, "paid", None)) // sparse update
      q.processAllAvailable()
      // memory sink accumulates update-mode rows; latest per key wins
      val states = spark.table("su").as[KeyState].collect()
        .groupBy(_.key).map { case (k, v) => k -> v.maxBy(s => (s.lastTs, s.lastId)) }
      assert(states("u1") == KeyState("u1", "paid", Some(10.0), 200L, 3L))
      assert(states("u2") == KeyState("u2", "created", Some(20.0), 100L, 2L))
    } finally q.stop()
  }

  test("agrees with the LatestWins batch reduction") {
    val ev = Seq(
      KeyedEvent("a", 1L, 1L, "x", Some(1.0)), KeyedEvent("a", 3L, 2L, "y", None),
      KeyedEvent("b", 2L, 3L, "x", None), KeyedEvent("b", 5L, 4L, "z", Some(7.0)))
    val viaState = ev.groupBy(_.key).map { case (k, es) =>
      val s = StatefulUpsert.fold(k, None, es.iterator); k -> (s.status, s.amount)
    }
    val viaBatch = graft.ops.LatestWins.latestState(
      ev.toDF(), Seq("key"), "ts", Seq("id"), Seq("status"), Seq("amount"), "last_seen")
      .collect().map(r => r.getString(0) -> (r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(viaState == viaBatch)
  }
}
