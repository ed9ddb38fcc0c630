package graft.ext

import graft.SparkFunSuite

class OptimizerStatsSpec extends SparkFunSuite {
  import spark.implicits._

  test("selfJoinSizeAudit: exact Σc², System R underestimates skew, HH corrects it") {
    val rows = (Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d")).toDF("k")
    val r = OptimizerStats.selfJoinSizeAudit(rows, "k", hh = 2).collect().head
    assert(r.getAs[Long]("n_rows") == 8L && r.getAs[Long]("n_distinct") == 4L)
    assert(r.getAs[Long]("exact_pairs") == 22L) // 16+4+1+1
    assert(r.getAs[Long]("est_uniform") == 16L) // 64/4 — biased low
    // top-2 exact (16+4) + tail uniform (2²/2 = 2) = 22 — exact here
    assert(r.getAs[Long]("est_hh") == 22L)
    assert(r.getAs[Long]("err_uniform_bp") == 6L * 10000L / 22L)
    assert(r.getAs[Long]("err_hh_bp") == 0L)
  }

  test("selfJoinSizeAudit: hh wider than the key space leaves no tail term") {
    val rows = Seq("a", "a", "b").toDF("k")
    val r = OptimizerStats.selfJoinSizeAudit(rows, "k", hh = 10).collect().head
    assert(r.getAs[Long]("exact_pairs") == 5L && r.getAs[Long]("est_hh") == 5L)
  }

  test("columnProfile: exact ndv, null tallies, modal value with max-value tiebreak") {
    val rows = Seq(
      (Some("x"), 1L), (Some("x"), 2L), (Some("y"), 2L), (None, 3L)
    ).toDF("s", "k")
    val got = OptimizerStats.columnProfile(rows, Seq("s", "k"))
      .collect().map(r => r.getString(0) -> r).toMap
    val sCol = got("s"); val kCol = got("k")
    assert(sCol.getAs[Long]("n_nonnull") == 3L && sCol.getAs[Long]("n_null") == 1L)
    assert(sCol.getAs[Long]("ndv") == 2L)
    assert(sCol.getAs[String]("top_value") == "x" && sCol.getAs[Long]("top_count") == 2L)
    assert(sCol.getAs[String]("min_str") == "x" && sCol.getAs[String]("max_str") == "y")
    assert(kCol.getAs[Long]("n_null") == 0L && kCol.getAs[Long]("ndv") == 3L)
    // counts tie at 1,1 for k=1,3 vs 2 at cnt 2 → modal is ("2", 2)
    assert(kCol.getAs[String]("top_value") == "2" && kCol.getAs[Long]("top_count") == 2L)
  }
}
