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

  test("mcvSelectivity: MCVs exact, remainder uniform, hand-computed bp") {
    // counts: 10→6, 20→2, 30→1, 40→1; N=10, ndv=4, k=2 → MCV {10, 20},
    // Σmcv=8; uniform remainder share = 2·10000 div (2·10) = 1000 bp
    val rows = (Seq.fill(6)(10L) ++ Seq.fill(2)(20L) ++ Seq(30L, 40L)).toDF("v")
    val out = OptimizerStats.mcvSelectivity(rows, "v", k = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(10L) == ((6L, true, 6000L, 6000L, 0L)))
    assert(out(20L) == ((2L, true, 2000L, 2000L, 0L)))
    assert(out(30L) == ((1L, false, 1000L, 1000L, 0L)))
    assert(out(40L) == ((1L, false, 1000L, 1000L, 0L)))
    // skewed tail: the uniform guess misses — 50→3 vs 60→1 share one est
    val skew = (Seq.fill(6)(10L) ++ Seq.fill(3)(50L) ++ Seq(60L)).toDF("v")
    val o2 = OptimizerStats.mcvSelectivity(skew, "v", k = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(4), r.getLong(5)))).toMap
    // non-MCV est = (10−6)·10000 div (2·10) = 2000 bp for both 50 and 60
    assert(o2(50L) == ((2000L, 1000L))) // actual 3000 → err 1000
    assert(o2(60L) == ((2000L, 1000L))) // actual 1000 → err 1000
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

  test("sqDiv: exact below the 3e9 bound, single-rounded-double + saturation above") {
    // cells fed directly (building 3e9+ rows is pointless — the
    // chi2CentiCol test convention)
    val rows = Seq(
      (1000L, 7L),                     // exact: 1000000 div 7
      (4000000000L, 100L),             // double branch: 1.6e19/100 = 1.6e17
      (4000000000L, 1L),               // saturates: 1.6e19 > 9.2e18
      (5L, 0L))                        // degenerate divisor -> 0
      .toDF("x", "d")
      .withColumn("got", org.apache.spark.sql.functions.expr(OptimizerStats.sqDiv("x", "d")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows((1000L, 7L)) == 1000L * 1000L / 7L)
    assert(rows((4000000000L, 100L)) ==
      math.round(4000000000L.toDouble * 4000000000L / 100L))
    assert(rows((4000000000L, 1L)) == 9.2e18.toLong)
    assert(rows((5L, 0L)) == 0L)
  }

  test("rangeSelectivityAudit: uniform data estimates exactly; out-of-data ranges expose the model") {
    import spark.implicits._
    // 1..16 with 4 buckets -> floored type-7 boundaries [4, 8, 12],
    // perfectly equi-depth: the uniform model is exact on any range
    val uni = (1L to 16L).toDF("v")
    val r1 = OptimizerStats.rangeSelectivityAudit(uni, "v", 4, Seq((3L, 11L)))
      .collect()(0)
    assert((r1.getLong(2), r1.getLong(3), r1.getLong(4)) == ((8L, 8L, 0L)))
    // skew: 1..12 plus four 100s -> boundaries [4, 8, 34]; bucket 3 spans
    // (8, 34] holding only 9..12, so a range inside the empty stretch
    // (20, 40) gets a nonzero uniform guess against an exact 0
    val skew = ((1L to 12L) ++ Seq.fill(4)(100L)).toDF("v")
    val r2 = OptimizerStats.rangeSelectivityAudit(skew, "v", 4,
        Seq((9L, 50L), (20L, 40L)))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(r2((9L, 50L)) == ((4L, 4L, 0L)))
    assert(r2((20L, 40L)) == ((0L, 2L, 20000L)))
  }
}
