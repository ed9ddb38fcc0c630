package graft.ops

import graft.SparkFunSuite
import java.sql.Timestamp

class SessionizeSpec extends SparkFunSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gap > threshold starts a new session; boundary gap does not") {
    val df = Seq(
      ("u1", ts("2024-01-01 00:00:00")),
      ("u1", ts("2024-01-01 00:30:00")), // gap exactly 1800s → same session
      ("u1", ts("2024-01-01 01:00:01")), // gap 1801s → new session
      ("u2", ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "ts")

    val sessions = Sessionize.sessions(df, "user_id", "ts", 1800)
      .select("user_id", "session_seq", "n_events")
      .as[(String, Long, Long)].collect().toSet
    assert(sessions == Set(("u1", 1L, 2L), ("u1", 2L, 1L), ("u2", 1L, 1L)))
  }

  test("session bounds and duration are exact microseconds") {
    val df = Seq(
      ("u1", ts("2024-01-01 00:00:00.000001")),
      ("u1", ts("2024-01-01 00:10:00.000003"))
    ).toDF("user_id", "ts")
    val row = Sessionize.sessions(df, "user_id", "ts", 1800).collect().head
    assert(row.getAs[Long]("duration_us") == 600000002L)
  }

  test("queries on real data: session count matches event count lower bound") {
    val ev = graft.Tables.events(spark, sf)
    val n  = Sessionize.sessions(ev, "user_id", "ts", 1800).count()
    assert(n > 0 && n <= ev.count())
  }
}
