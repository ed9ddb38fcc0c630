package graft.ext

import graft.SparkFunSuite

class RobustStatsSpec extends SparkFunSuite {
  import spark.implicits._

  test("madOutliers: exact half/quarter-unit median and MAD, Hampel cut") {
    val df = Seq(1L, 2L, 3L, 4L, 5L, 6L, 1000L).map(("A", _)).toDF("g", "x")
    val r = RobustStats.madOutliers(df, "g", "x").collect().head
    assert(r.getAs[Long]("med_x2") == 8L)   // median 4
    assert(r.getAs[Long]("mad_x4") == 8L)   // MAD 2
    // only |1000−4| = 996 > 3·1.4826·2 ≈ 8.9
    assert(r.getAs[Long]("n") == 7L && r.getAs[Long]("n_outliers") == 1L)
    assert(r.getAs[Long]("outlier_bp") == 10000L / 7L)
  }

  test("madOutliers: even-count group interpolates to a half-unit median") {
    val df = Seq(1L, 2L, 3L, 10L).map(("A", _)).toDF("g", "x")
    val r = RobustStats.madOutliers(df, "g", "x").collect().head
    assert(r.getAs[Long]("med_x2") == 5L)   // median 2.5 → ×2 = 5, exact
    // d2 = |2x−5| = [3,1,1,15] → median 2 → mad_x4 = 4 (MAD 1)
    assert(r.getAs[Long]("mad_x4") == 4L)
    // cut: d2·2·10⁴ > 4·44478 → d2 > 8.9 → only x=10
    assert(r.getAs[Long]("n_outliers") == 1L)
  }

  test("benfordAudit: digit counts and centi-χ², non-positive rows excluded") {
    val df = Seq(10L, 20L, 25L, 300L, 4L, 0L, -7L).map(("g", _)).toDF("g", "x")
    val r = RobustStats.benfordAudit(df, "g", "x").collect().head
    assert(r.getAs[Long]("n") == 5L)
    val obs = (1 to 9).map(d => r.getAs[Long](s"d$d"))
    assert(obs == Seq(1L, 2L, 1L, 1L, 0L, 0L, 0L, 0L, 0L))
    val expBp = Seq(3010L, 1761L, 1249L, 969L, 792L, 669L, 580L, 512L, 458L)
    val chi2 = (1 to 9).map { d =>
      val e = expBp(d - 1); val diff = obs(d - 1) * 10000L - 5L * e
      diff * diff / (5L * e * 100L)
    }.sum
    assert(r.getAs[Long]("chi2_centi") == chi2)
  }

  test("autocorrelation: hand-computed lags on a ramp, signed rounding") {
    val s = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("t", "v")
    val out = RobustStats.autocorrelation(s, "t", "v", maxLag = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // dx = v·4 − 10 = [-6,-2,2,6], den = 80
    // lag1: 12−4+12 = 20 → 250; lag2: −12−12 = −24 → −300
    assert(out == Map(1L -> ((3L, 250L)), 2L -> ((2L, -300L))))
  }

  test("autocorrelation fills index gaps with zero before shifting") {
    val s = Seq((0L, 3L), (2L, 3L)).toDF("t", "v")
    val out = RobustStats.autocorrelation(s, "t", "v", maxLag = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // filled [3,0,3]: dx = [3,−6,3], den 54; lag1: −18−18 = −36 → −667
    assert(out.toSeq == Seq((1L, 2L, -667L)))
  }

  test("kaplanMeier: censoring shrinks at-risk, exhaustion zeroes the tail") {
    val subj = Seq((1L, true), (2L, true), (2L, false), (3L, true))
      .toDF("dur", "ev")
    val out = RobustStats.kaplanMeier(subj, "dur", "ev")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // S(1) = 3/4, S(2) = 3/4 · 2/3 = 1/2 (the censored subject left the
    // risk set WITHOUT a death), S(3): n = d = 1 → 0
    assert(out == Map(1L -> ((4L, 1L, 750000L)),
      2L -> ((3L, 1L, 500000L)), 3L -> ((1L, 1L, 0L))))
  }

  test("kaplanMeier: censor-only times emit no row but stay in earlier risk sets") {
    val subj = Seq((1L, true), (5L, false), (9L, true)).toDF("dur", "ev")
    val out = RobustStats.kaplanMeier(subj, "dur", "ev")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // t=5 is censoring-only → no curve row; t=1 risk set still counts it
    assert(out.map(_._1).toSet == Set(1L, 9L))
    assert(out.find(_._1 == 1L).get == ((1L, 3L, 1L, 666667L))) // 2/3
    assert(out.find(_._1 == 9L).get == ((9L, 1L, 1L, 0L)))
  }

  test("ksPairwise: disjoint→1000, identical→0, shifted→exact max ECDF gap") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L),
      ("c", 1L), ("c", 2L)).toDF("g", "v")
    val out = RobustStats.ksPairwise(df, "g", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(out(("a", "b")) == 1000L) // disjoint supports
    assert(out(("a", "c")) == 0L)    // identical distributions
    val shifted = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 2L), ("b", 3L), ("b", 4L)).toDF("g", "v")
    val o2 = RobustStats.ksPairwise(shifted, "g", "v").collect().head
    assert(o2.getLong(4) == 333L) // D = 1/3 exactly, floored milli
  }

  test("chiSquareIndependence: hand-computed 2x2, zero under independence") {
    val rows = (Seq.fill(30)(("x", "p")) ++ Seq.fill(10)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(30)(("y", "q"))).toDF("a", "b")
    val r = RobustStats.chiSquareIndependence(rows, "a", "b").collect().head
    // e = 20 per cell → χ² = 4·(10²/20) = 20.00 → 2000 centi, dof 1
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((80L, 1L, 2000L)))
    val indep = (Seq.fill(20)(("x", "p")) ++ Seq.fill(20)(("x", "q")) ++
      Seq.fill(20)(("y", "p")) ++ Seq.fill(20)(("y", "q"))).toDF("a", "b")
    assert(RobustStats.chiSquareIndependence(indep, "a", "b")
      .collect().head.getLong(2) == 0L)
  }

  test("chiSquareIndependence counts absent cells as zero observations") {
    // (y, q) never occurs; the spine must still charge its expectation
    val rows = (Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("x", "q")) ++
      Seq.fill(10)(("y", "p"))).toDF("a", "b")
    val r = RobustStats.chiSquareIndependence(rows, "a", "b").collect().head
    // margins: x=20, y=10, p=20, q=10, N=30; cells o·N−r·c:
    // (x,p): 300−400=−100 → 100·10000/(30·400)=83; (x,q): 300−200=100
    // → 100·10000/(30·200)=166; (y,p): 300−200=100 → 166;
    // (y,q): 0−100=−100 → 100·10000/(30·100)=333 → Σ=748
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((30L, 1L, 748L)))
  }

  test("pageHinkley: level drop grows the statistic; gaps fill as zero") {
    val s = Seq((0L, 5L), (1L, 5L), (2L, 5L), (3L, 0L), (4L, 0L)).toDF("t", "v")
    val out = RobustStats.pageHinkley(s, "t", "v", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // after the drop: M falls −3750 then −6750 (milli) from the high mark
    assert(out.toSeq == Seq((4L, 0L, 6750L), (3L, 0L, 3750L)))
    val gap = Seq((0L, 4L), (2L, 0L)).toDF("t", "v") // t=1 filled as 0
    val g = RobustStats.pageHinkley(gap, "t", "v", k = 1).collect().head
    assert((g.getLong(0), g.getLong(2)) == ((2L, 3333L)))
  }

  test("spearmanRank: +/-1000 on monotone data, 0 under independence, tie-correct") {
    val up = Seq((1L, 10L), (2L, 20L), (3L, 25L), (4L, 90L), (5L, 91L)).toDF("x", "y")
    assert(RobustStats.spearmanRank(up, "x", "y").collect().head.getLong(1) == 1000L)
    val dn = up.withColumn("y", -org.apache.spark.sql.functions.col("y"))
    assert(RobustStats.spearmanRank(dn, "x", "y").collect().head.getLong(1) == -1000L)
    // balanced 2x2 with ties: average ranks make every deviation +/-2,
    // products cancel -> exactly 0
    val ind = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)).toDF("x", "y")
    val r = RobustStats.spearmanRank(ind, "x", "y").collect().head
    assert((r.getLong(0), r.getLong(1)) == ((4L, 0L)))
  }
  test("seasonalNaiveMase: hand-computed series with a gap; constant series reports 0") {
    // t=0..7 with a gap at t=5 (fills to 0): v = [5,7,5,5,7,0,9,5]
    // season 3 -> |e| = 0,0,5,4,2 (sum 11 over 5 terms)
    // naive lag-1 -> |e| = 2,2,0,2,7,9,4 (sum 26 over 7 terms)
    // mase_milli = 11*7*1000 div (26*5) = 592
    val rows = Seq(("k",0L,5L),("k",1L,7L),("k",2L,5L),("k",3L,5L),
      ("k",4L,7L),("k",6L,9L),("k",7L,5L),
      ("c",10L,4L),("c",11L,4L),("c",12L,4L),("c",13L,4L),("c",14L,4L))
      .toDF("key", "t", "v")
    val out = RobustStats.seasonalNaiveMase(rows, "key", "t", "v", season = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_days"), r.getAs[Long]("n_eval"), r.getAs[Long]("n_scale"),
          r.getAs[Long]("sae_seasonal"), r.getAs[Long]("sae_naive"),
          r.getAs[Long]("mase_milli")))).toMap
    assert(out("k") == ((8L, 5L, 7L, 11L, 26L, 592L)))
    // constant series: zero naive error -> mase reports 0, counts intact
    assert(out("c") == ((5L, 2L, 4L, 0L, 0L, 0L)))
  }
  test("seasonalDecompose: pure trend+seasonal series decomposes exactly with zero remainder") {
    // v_t = 10 + s_{t%3}, s = (0, 3, 6): every centered MA-3 window sums
    // to 39 -> trend 13000 milli everywhere it exists (t = 1..7)
    val rows = (0L to 8L).map(t => ("k", t, 10L + 3L * (t % 3))).toDF("key", "t", "v")
    val out = RobustStats.seasonalDecompose(rows, "key", "t", "v", period = 3)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getAs[Long]("trend_milli"), r.getAs[Long]("seasonal_milli"),
          r.getAs[Long]("remainder_milli"), r.getAs[Boolean]("is_anomaly")))).toMap
    assert(out.keySet == (1L to 7L).toSet)
    for ((t, (v, tr, se, rem, an)) <- out) {
      assert(tr == 13000L, s"t=$t trend $tr")
      assert(se == (t % 3 match { case 0 => -3000L; case 1 => 0L; case 2 => 3000L }),
        s"t=$t seasonal $se")
      assert(rem == 0L && !an, s"t=$t rem=$rem an=$an")
      assert(v == 10L + 3L * (t % 3))
    }
  }

  test("seasonalDecompose: a planted spike is flagged and the flag matches its own rule") {
    val rows = (0L to 20L).map(t => ("k", t, if (t == 10L) 60L else 10L + 3L * (t % 3)))
      .toDF("key", "t", "v")
    val out = RobustStats.seasonalDecompose(rows, "key", "t", "v", period = 3).collect()
    val rem = out.map(r => r.getLong(1) -> r.getAs[Long]("remainder_milli")).toMap
    val flags = out.map(r => r.getLong(1) -> r.getAs[Boolean]("is_anomaly")).toMap
    // the spike row carries the largest absolute remainder and is flagged
    val maxT = rem.maxBy { case (_, v) => math.abs(v) }._1
    assert(maxT == 10L && flags(10L), s"maxT=$maxT flags=$flags")
    // every flag agrees with the documented rule |rem|*n > 3*sum|rem|
    val n = rem.size.toLong
    val sar = rem.values.map(math.abs).sum
    for ((t, f) <- flags)
      assert(f == (math.abs(rem(t)) * n > 3L * sar), s"t=$t")
  }
  test("abTestChi2: hand 2x2 matches the textbook statistic; degenerate arms report 0") {
    // a=30 b=20 c=15 d=35: chi2 = 100*(30*35-20*15)^2*100 / (50*50*45*55)
    //  = 100*(750)^2*100 / 6187500 = 909 centi (9.09) -> significant
    val rows = (Seq.fill(30)((true, true)) ++ Seq.fill(20)((true, false)) ++
      Seq.fill(15)((false, true)) ++ Seq.fill(35)((false, false)))
      .toDF("treat", "conv")
    val r = RobustStats.abTestChi2(rows, "treat", "conv").head()
    assert((r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("c"),
      r.getAs[Long]("d")) == ((30L, 20L, 15L, 35L)))
    assert(r.getAs[Long]("rate_treat_bp") == 6000L)
    assert(r.getAs[Long]("rate_ctrl_bp") == 3000L)
    assert(r.getAs[Long]("chi2_centi") == 909L)
    assert(r.getAs[Boolean]("significant"))
    // one empty margin -> statistic undefined -> 0, not significant
    val deg = Seq.fill(10)((true, true)).toDF("treat", "conv")
    val d = RobustStats.abTestChi2(deg, "treat", "conv").head()
    assert(d.getAs[Long]("chi2_centi") == 0L && !d.getAs[Boolean]("significant"))
  }

  test("abTestChi2: exact past the old int64 wrap (N=10k strong effect)") {
    // a=d=4000, b=c=1000: det = 15e6, 100·N·det² = 2.25e20 — the naive
    // all-BIGINT numerator wrapped signed 64-bit here (N ≈ 4,300 bound);
    // the DECIMAL(38,0) staging must report the exact 360000 centi
    // (chi2 = 1e4·2.25e14/(5000⁴) = 3600).
    val rows = (Seq.fill(4000)((true, true)) ++ Seq.fill(1000)((true, false)) ++
      Seq.fill(1000)((false, true)) ++ Seq.fill(4000)((false, false)))
      .toDF("treat", "conv")
    val r = RobustStats.abTestChi2(rows, "treat", "conv").head()
    assert(r.getAs[Long]("chi2_centi") == 360000L)
    assert(r.getAs[Boolean]("significant"))
  }

  test("chi2CentiCol: above the exact bound the single-rounded-double branch fires") {
    // N = 3e7 > Chi2ExactMaxN — cells fed directly (building 3e7 subject
    // rows is pointless); expected value recomputed with the IDENTICAL
    // double association order the SQL fixes
    val (a, b, c, d) = (9000000L, 6000000L, 6000000L, 9000000L)
    val r = Seq((a, b, c, d)).toDF("a", "b", "c", "d")
      .select(RobustStats.chi2CentiCol.as("chi2_centi")).head()
    val det = a.toDouble * d - b.toDouble * c
    val expected = math.round(
      ((det * det) * (a.toDouble + b + c + d)) * 100.0 /
        ((((a + b).toDouble * (c + d)) * (a + c)) * (b + d)))
    assert(r.getAs[Long]("chi2_centi") == expected)
    assert(expected > 384L)
  }
}
