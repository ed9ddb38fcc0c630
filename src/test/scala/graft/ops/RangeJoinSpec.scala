package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class RangeJoinSpec extends SparkFunSuite {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private lazy val points = Seq(
    (1L, "k1", t("2024-01-01 10:30:00")),
    (2L, "k1", t("2024-01-01 13:00:00")),
    (3L, "k2", t("2024-01-01 10:30:00")),
    (4L, "k1", t("2024-01-01 11:00:00"))  // exactly at an interval end → excluded
  ).toDF("pid", "key", "ts")

  private lazy val intervals = Seq(
    (10L, "k1", t("2024-01-01 10:00:00"), t("2024-01-01 11:00:00")),
    (11L, "k1", t("2024-01-01 10:45:00"), t("2024-01-01 14:00:00")), // overlaps 10
    (12L, "k2", t("2024-01-01 09:00:00"), t("2024-01-01 12:00:00"))
  ).toDF("iid", "ikey", "istart", "iend")

  test("matches the naive theta join exactly (half-open intervals, overlaps)") {
    val fast = RangeJoin.pointInInterval(points, intervals,
        "key", "ikey", "ts", "istart", "iend", Seq("iid"), bucketWidthSeconds = 1800)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals,
        col("key") === col("ikey") && col("ts") >= col("istart") && col("ts") < col("iend"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naive)
    assert(fast == Set((1L, 10L), (2L, 11L), (3L, 12L), (4L, 11L)))
  }

  test("plans as a hash join on (key, bucket), not a nested-loop product") {
    val plan = RangeJoin.pointInInterval(points, intervals,
        "key", "ikey", "ts", "istart", "iend", Seq("iid"), 1800)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degraded to a product join:\n$plan")
    // the naive formulation DOES degrade — that's the point of the operator
    val naivePlan = points.join(intervals,
        col("key") === col("ikey") && col("ts") >= col("istart") && col("ts") < col("iend"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("Join"), "sanity")
  }

  test("intervalOverlap plans as a hash equi-join, not a nested-loop product") {
    val ls = Seq((1L, "k1", t("2024-01-01 10:00:00"), t("2024-01-01 12:00:00")))
      .toDF("lid", "lkey", "ls", "le")
    val rs = Seq((2L, "k1", t("2024-01-01 11:00:00"), t("2024-01-01 13:00:00")))
      .toDF("rid", "rkey", "rs", "re")
    val p = RangeJoin.intervalOverlap(ls, rs, "lkey", "rkey", "ls", "le", "rs", "re", 3600)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"interval overlap degraded to a product join:\n$p")
  }

  test("intervalOverlap: randomized equivalence with the naive overlap join, no duplicate pairs") {
    val rnd  = new scala.util.Random(23)
    val base = t("2024-01-01 00:00:00").getTime
    def mkIntervals(n: Int, idCol: String, keyCol: String, sCol: String, eCol: String) =
      Seq.tabulate(n) { i =>
        val s = base + rnd.nextInt(86400) * 1000L
        (i.toLong, s"k${rnd.nextInt(4)}", new Timestamp(s),
          new Timestamp(s + (60 + rnd.nextInt(10800)) * 1000L))
      }.toDF(idCol, keyCol, sCol, eCol)
    val ls = mkIntervals(80, "lid", "lkey", "ls", "le")
    val rs = mkIntervals(70, "rid", "rkey", "rs", "re")
    val fast = RangeJoin.intervalOverlap(ls, rs, "lkey", "rkey", "ls", "le", "rs", "re", 1800)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = ls.join(rs,
        col("lkey") === col("rkey") && col("ls") < col("re") && col("rs") < col("le"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fast.length == fast.toSet.size, "bucket replication produced duplicate pairs")
    assert(fast.toSet == naive.toSet)
    assert(naive.nonEmpty, "sanity: some overlaps exist")
  }

  test("randomized equivalence with the naive join") {
    val rnd = new scala.util.Random(11)
    val base = t("2024-01-01 00:00:00").getTime
    val ps = Seq.tabulate(300)(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", new Timestamp(base + rnd.nextInt(86400) * 1000L)))
      .toDF("pid", "key", "ts")
    val is = Seq.tabulate(60) { i =>
      val s = base + rnd.nextInt(86400) * 1000L
      (i.toLong, s"k${rnd.nextInt(5)}", new Timestamp(s), new Timestamp(s + (60 + rnd.nextInt(7200)) * 1000L))
    }.toDF("iid", "ikey", "istart", "iend")
    val fast = RangeJoin.pointInInterval(ps, is, "key", "ikey", "ts", "istart", "iend", Seq("iid"), 600)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = ps.join(is,
        col("key") === col("ikey") && col("ts") >= col("istart") && col("ts") < col("iend"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naive)
  }
}
