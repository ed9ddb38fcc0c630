package graft.ops

import graft.SparkFunSuite
import java.sql.Timestamp
import org.apache.spark.sql.functions.expr

class AsOfJoinSpec extends SparkFunSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("each left row gets the newest right row at-or-before its time") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 12:00:00")),
      (3L, "u1", ts("2024-01-01 09:00:00")), // before any right row
      (4L, "u2", ts("2024-01-01 10:30:00")),
      (5L, "u3", ts("2024-01-01 10:30:00"))  // key with no right rows
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      ("u1", ts("2024-01-01 09:30:00"), "v1"),
      ("u1", ts("2024-01-01 11:00:00"), "v2"),
      ("u2", ts("2024-01-01 10:30:00"), "w1") // equal ts → matches
    ).toDF("k", "valid_from", "version")

    val out = AsOfJoin(left, right, "k", "k", "ts", "valid_from", Seq("version"))
      .select("event_id", "version").as[(Long, Option[String])]
      .collect().toMap
    assert(out == Map(1L -> Some("v1"), 2L -> Some("v2"), 3L -> None,
      4L -> Some("w1"), 5L -> None))
  }

  test("nearest: closest right row wins, backward breaks ties, tolerance gates") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")), // past 09:30 (30m) vs next 11:00 (60m) → past
      (2L, "u1", ts("2024-01-01 10:50:00")), // past (80m) vs next (10m) → FUTURE v2
      (3L, "u1", ts("2024-01-01 10:15:00")), // 45m both ways → tie → backward v1
      (4L, "u1", ts("2024-01-01 13:00:00")), // nearest 11:00 is 120m > tol → NULL
      (5L, "u2", ts("2024-01-01 10:30:00"))  // equal ts → matches through backward
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      ("u1", ts("2024-01-01 09:30:00"), "v1"),
      ("u1", ts("2024-01-01 11:00:00"), "v2"),
      ("u2", ts("2024-01-01 10:30:00"), "w1")
    ).toDF("k", "valid_from", "version")
    val out = AsOfJoin.nearest(left, right, "k", "k", "ts", "valid_from",
        Seq("version"), expr("INTERVAL 90 MINUTES"))
      .select("event_id", "version").as[(Long, Option[String])]
      .collect().toMap
    assert(out == Map(1L -> Some("v1"), 2L -> Some("v2"), 3L -> Some("v1"),
      4L -> None, 5L -> Some("w1")))
  }

  test("tolerance bounds staleness: matches older than the bound attach NULL") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),  // 30 min after v1 → within 1h
      (2L, "u1", ts("2024-01-01 13:00:00")),  // 2h after v2 → too stale
      (3L, "u2", ts("2024-01-01 10:00:00"))   // no right row at all
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      ("u1", ts("2024-01-01 09:30:00"), "v1"),
      ("u1", ts("2024-01-01 11:00:00"), "v2")
    ).toDF("k", "valid_from", "version")
    val out = AsOfJoin(left, right, "k", "k", "ts", "valid_from", Seq("version"),
      tolerance = Some(org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR")))
      .select("event_id", "version").as[(Long, Option[String])]
      .collect().toMap
    assert(out == Map(1L -> Some("v1"), 2L -> None, 3L -> None))
  }

  test("left columns and row count preserved") {
    val left  = Seq((1L, "a", ts("2024-01-01 00:00:00"))).toDF("id", "k", "ts")
    val right = Seq(("a", ts("2023-01-01 00:00:00"), 9L)).toDF("k", "t", "x")
    val out = AsOfJoin(left, right, "k", "k", "ts", "t", Seq("x"))
    assert(out.columns.toSeq == Seq("id", "k", "ts", "x"))
    assert(out.count() == 1)
  }
}
