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
      KeyedEvent("k", 15L, 3L, "mid", Some(9.9)))
    val s1 = StatefulUpsert.fold("k", None, ev.iterator)
    assert(s1 == KeyState("k", "paid", Some(9.9), 20L, 2L, 15L, 3L))
    // replaying the same events over the state is a no-op
    val s2 = StatefulUpsert.fold("k", Some(s1), ev.iterator)
    assert(s2 == s1)
  }

  test("fold: a late first-non-null amount still updates the sparse field") {
    // batch 1: only a sparse-less event; batch 2: a LATE event (older ts)
    // carrying the amount — batch reduction would carry it, so must we
    val s1 = StatefulUpsert.fold("k", None,
      Iterator(KeyedEvent("k", 20L, 2L, "paid", None)))
    assert(s1.amount.isEmpty)
    val s2 = StatefulUpsert.fold("k", Some(s1),
      Iterator(KeyedEvent("k", 10L, 1L, "created", Some(5.0))))
    assert(s2 == KeyState("k", "paid", Some(5.0), 20L, 2L, 10L, 1L))
    // but a late NON-null older than the current amount source does not win
    val s3 = StatefulUpsert.fold("k", Some(s2),
      Iterator(KeyedEvent("k", 5L, 0L, "x", Some(1.0))))
    assert(s3.amount == Some(5.0) && s3.status == "paid")
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
      assert(states("u1") == KeyState("u1", "paid", Some(10.0), 200L, 3L, 100L, 1L))
      assert(states("u2") == KeyState("u2", "created", Some(20.0), 100L, 2L, 100L, 2L))
    } finally q.stop()
  }

  test("latestPerKeyWithTtl evicts idle keys once the watermark passes their TTL") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val q = StatefulUpsert.latestPerKeyWithTtl(input.toDS(), ttlMs = 60000L) // 1 min TTL
      .writeStream.format("memory").queryName("ttl").outputMode("update").start()
    try {
      input.addData(KeyedEvent("idle", base, 1L, "created", Some(1.0)))
      q.processAllAvailable()
      // watermark far past idle's ttl → eviction fires on the next batch
      input.addData(KeyedEvent("live", base + 10 * 60000L, 2L, "created", Some(2.0)))
      q.processAllAvailable()
      input.addData(KeyedEvent("live", base + 11 * 60000L, 3L, "paid", None))
      q.processAllAvailable()
      val rows = spark.table("ttl").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(rows.contains(("idle", StatefulUpsert.ExpiredStatus)), s"no tombstone in ${rows.toSeq}")
      // live key keeps updating normally after the eviction
      assert(rows.contains(("live", "paid")))
    } finally q.stop()
  }

  test("typed Aggregator agrees with fold (partial-merge across partitions)") {
    val rnd = new scala.util.Random(7)
    val ev = Seq.tabulate(80) { i =>
      KeyedEvent(s"k${rnd.nextInt(4)}", rnd.nextInt(40).toLong, i.toLong,
        Seq("x", "y")(rnd.nextInt(2)),
        if (rnd.nextBoolean()) Some(rnd.nextInt(50).toDouble) else None)
    }
    val viaAgg = ev.toDS().repartition(8) // force partial buffers + merge
      .groupByKey(_.key)
      .agg(LatestStateAggregator.toColumn)
      .collect().map { case (k, s) => k -> (s.status, s.amount) }.toMap
    val viaFold = ev.groupBy(_.key).map { case (k, es) =>
      val s = StatefulUpsert.fold(k, None, es.iterator); k -> (s.status, s.amount)
    }
    assert(viaAgg == viaFold)
  }

  test("agrees with the LatestWins batch reduction under any batching/order") {
    val rnd = new scala.util.Random(42)
    val ev = Seq.tabulate(60) { i =>
      KeyedEvent(s"k${rnd.nextInt(5)}", rnd.nextInt(50).toLong, i.toLong,
        Seq("x", "y", "z")(rnd.nextInt(3)),
        if (rnd.nextBoolean()) Some(rnd.nextInt(100).toDouble) else None)
    }
    // random batching AND random intra-batch order (late arrivals included)
    val batches = rnd.shuffle(ev).grouped(17).toSeq
    val viaState = ev.map(_.key).distinct.map { k =>
      val fin = batches.foldLeft(Option.empty[KeyState]) { (st, b) =>
        Some(StatefulUpsert.fold(k, st, b.iterator.filter(_.key == k)))
      }.get
      k -> (fin.status, fin.amount)
    }.toMap
    val viaBatch = graft.ops.LatestWins.latestState(
      ev.toDF(), Seq("key"), "ts", Seq("id"), Seq("status"), Seq("amount"), "last_seen")
      .collect().map(r => r.getString(0) -> (r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(viaState == viaBatch)
  }
}
