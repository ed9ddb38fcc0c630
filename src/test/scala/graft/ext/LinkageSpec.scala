package graft.ext

import graft.SparkFunSuite

class LinkageSpec extends SparkFunSuite {
  import spark.implicits._

  // hand-computable u-sample: 4 pairs, a_x agrees on 1 (u = 2500 bp),
  // a_y agrees on 2 (u = 5000 bp)
  private def uSample = Seq(
    (true, true), (false, true), (false, false), (false, false)
  ).toDF("a_x", "a_y")

  test("fellegiSunterScores: weights are log2(m/u) / log2((1-m)/(1-u)) milli-bits") {
    val pairs = Seq((1L, true, true), (2L, true, false), (3L, false, false))
      .toDF("id", "a_x", "a_y")
    val out = Linkage.fellegiSunterScores(pairs, uSample,
        Seq(("a_x", 9000L), ("a_y", 5000L)))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("score_milli"), r.getAs[Long]("n_agree"))).toMap
    def w(num: Long, den: Long): Long =
      math.round(math.log(num.toDouble / den.toDouble) / math.log(2.0) * 1000)
    val waX = w(9000L, 2500L); val wdX = w(1000L, 7500L)
    val waY = w(5000L, 5000L); val wdY = w(5000L, 5000L)
    assert(waY == 0L && wdY == 0L) // m = u → zero evidence either way
    assert(out(1L) == (waX + waY, 2L))
    assert(out(2L) == (waX + wdY, 1L))
    assert(out(3L) == (wdX + wdY, 0L))
  }

  test("fellegiSunterScores: u clamps keep weights finite on degenerate samples") {
    val pairs = Seq((1L, true), (2L, false)).toDF("id", "a_x")
    // all-agree u-sample → raw u = 10000 bp, clamped to 9999
    val allAgree = Seq(true, true).toDF("a_x")
    val hi = Linkage.fellegiSunterScores(pairs, allAgree, Seq(("a_x", 9000L)))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("score_milli")).toMap
    def w(num: Long, den: Long): Long =
      math.round(math.log(num.toDouble / den.toDouble) / math.log(2.0) * 1000)
    assert(hi(1L) == w(9000L, 9999L) && hi(2L) == w(1000L, 1L))
    // none-agree u-sample → raw u = 0 bp, clamped to 1
    val noneAgree = Seq(false, false).toDF("a_x")
    val lo = Linkage.fellegiSunterScores(pairs, noneAgree, Seq(("a_x", 9000L)))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("score_milli")).toMap
    assert(lo(1L) == w(9000L, 1L) && lo(2L) == w(1000L, 9999L))
  }

  test("fellegiSunterScores: helper columns are dropped, inputs preserved") {
    val pairs = Seq((7L, "x", true)).toDF("left_id", "payload", "a_f")
    val out = Linkage.fellegiSunterScores(pairs, uSample.select($"a_x".as("a_f")),
      Seq(("a_f", 9000L)))
    assert(out.columns.toSeq ==
      Seq("left_id", "payload", "a_f", "score_milli", "n_agree"))
  }
}
