package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class LatestWinsSpec extends SparkFunSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // (key, ts, id, status, amount) — amount is the sparse/nullable column
  private val rows = Seq(
    ("k1", ts("2024-01-01 00:00:00"), 1L, "CREATED", Some(10.0)),
    ("k1", ts("2024-01-01 00:01:00"), 2L, "PAID", None),
    ("k1", ts("2024-01-01 00:02:00"), 3L, "SHIPPED", None),
    ("k2", ts("2024-01-01 00:00:30"), 4L, "CREATED", Some(5.0)),
    ("k2", ts("2024-01-01 00:00:30"), 5L, "CANCELLED", None) // ts tie → id wins
  )

  private def df = rows.toDF("k", "ts", "id", "status", "amount")

  test("latestRow keeps exactly the newest row per key with tiebreak") {
    val out = LatestWins.latestRow(df, Seq("k"), "ts", Seq("id"))
      .select("k", "id").as[(String, Long)].collect().toMap
    assert(out == Map("k1" -> 3L, "k2" -> 5L))
  }

  test("latestRowAgg (max_by) agrees with latestRow") {
    val a = LatestWins.latestRow(df, Seq("k"), "ts", Seq("id"))
      .select("k", "id", "status").collect().map(_.toSeq).toSet
    val b = LatestWins.latestRowAgg(df, Seq("k"), "ts", Seq("id"))
      .select("k", "id", "status").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("latestState carries sparse columns forward from newest non-null") {
    val out = LatestWins.latestState(df, Seq("k"), "ts", Seq("id"),
        denseCols = Seq("status"), sparseCols = Seq("amount"))
      .select("k", "status", "amount", "last_seen")
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.get(2), r.getTimestamp(3)))).toMap
    assert(out("k1") == (("SHIPPED", 10.0, ts("2024-01-01 00:02:00"))))
    assert(out("k2") == (("CANCELLED", 5.0, ts("2024-01-01 00:00:30"))))
  }

  test("latestState is replay-convergent: any input order gives same state") {
    val shuffled = rows.reverse ++ rows // duplicates + reversed order
    val a = LatestWins.latestState(shuffled.toDF("k", "ts", "id", "status", "amount"),
      Seq("k"), "ts", Seq("id"), Seq("status"), Seq("amount"))
    val b = LatestWins.latestState(df, Seq("k"), "ts", Seq("id"), Seq("status"), Seq("amount"))
    assert(a.collect().map(_.toSeq).toSet == b.collect().map(_.toSeq).toSet)
  }

  test("merge: matched rows updated with coalesce, unmatched kept/inserted") {
    val target = Seq(
      ("k1", "PAID", Some(10.0), ts("2024-01-01 00:01:00")),
      ("k2", "CREATED", Some(5.0), ts("2024-01-01 00:00:30"))
    ).toDF("k", "status", "amount", "last_seen")
    val batch = Seq(
      ("k1", "SHIPPED", None: Option[Double], ts("2024-01-01 00:02:00")), // update, null amount
      ("k3", "CREATED", Some(7.0), ts("2024-01-01 00:03:00"))             // insert
    ).toDF("k", "status", "amount", "last_seen")

    val out = LatestWins.merge(target, batch, Seq("k"), coalesceCols = Seq("amount"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.get(2)))).toMap
    assert(out.size == 3)
    assert(out("k1") == (("SHIPPED", 10.0))) // status from batch, amount carried from target
    assert(out("k2") == (("CREATED", 5.0)))  // untouched
    assert(out("k3") == (("CREATED", 7.0)))  // inserted
  }

  test("merge then merge equals merge of union (idempotent convergence)") {
    val ev = df
    val split = ts("2024-01-01 00:01:30")
    def state(d: org.apache.spark.sql.DataFrame) =
      LatestWins.latestState(d, Seq("k"), "ts", Seq("id"), Seq("status"), Seq("amount"))
    val merged = LatestWins.merge(
      state(ev.filter($"ts" < split)), state(ev.filter($"ts" >= split)),
      Seq("k"), Seq("amount"))
    val direct = state(ev)
    assert(merged.collect().map(_.toSeq).toSet == direct.collect().map(_.toSeq).toSet)
  }

  test("scd2History: versions carry validity intervals; unchanged redeliveries collapse") {
    val log = Seq(
      ("u1", 1L, "bronze"),
      ("u1", 5L, "bronze"),  // unchanged redelivery: must NOT open a version
      ("u1", 10L, "gold"),
      ("u1", 20L, "silver"),
      ("u2", 3L, "gold")
    ).toDF("k", "ts", "tier")
    val got = LatestWins.scd2History(log, Seq("k"), "ts", Seq("tier"))
      .collect().map(r => (r.getString(0), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5), r.getString(2))).toSet
    assert(got == Set(
      ("u1", 1L, Some(10L), false, "bronze"),
      ("u1", 10L, Some(20L), false, "gold"),
      ("u1", 20L, None, true, "silver"),
      ("u2", 3L, None, true, "gold")))
  }
}
