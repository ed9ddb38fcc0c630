package graft.ext

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class PreferenceSpec extends SparkFunSuite {
  import spark.implicits._

  test("agreementStats: exact kappa, self-agreement = 1000, disagreement < 0") {
    // 20 a/a + 15 b/b + 10 a/b + 5 b/a: p_o = 700000 ppm,
    // p_e = 600000*25//50 + 400000*25//50 = 500000 ppm, kappa = 400 milli
    val rows = Seq.fill(20)(("a", "a")) ++ Seq.fill(15)(("b", "b")) ++
      Seq.fill(10)(("a", "b")) ++ Seq.fill(5)(("b", "a"))
    val df = rows.toDF("la", "lb")
    val got = Preference.agreementStats(df, "la", "lb").collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) ==
      ((50L, 700000L, 500000L, 400L)))
    // a rater agrees with itself perfectly
    val self = Preference.agreementStats(df, "la", "la").collect().head
    assert(self.getLong(3) == 1000L)
    // balanced perfect disagreement: p_o = 0, p_e = 500000 -> kappa = -1000
    val dis = Seq.fill(3)(("a", "b")) ++ Seq.fill(3)(("b", "a"))
    val kd = Preference.agreementStats(dis.toDF("la", "lb"), "la", "lb")
      .collect().head.getLong(3)
    assert(kd == -1000L)
  }

  test("pairedBootstrap: constant deltas give exact point/CI/win-rate in both signs") {
    val df = (1L to 40L).map(i => (i, 50L + i % 7, 50L + i % 7)).toDF("k", "a", "b")
    // identical systems: delta 0 everywhere, no replicate where A wins
    val eq = Preference.pairedBootstrap(df, "k", "a", "b", reps = 32).collect().head
    assert((eq.getLong(1), eq.getLong(2), eq.getLong(3), eq.getLong(4)) ==
      ((0L, 0L, 0L, 0L)))
    // A = B + 3 everywhere: every replicate mean is exactly 3000 permille
    val up = Preference.pairedBootstrap(
      df.withColumn("a", col("a") + 3L), "k", "a", "b", reps = 32).collect().head
    assert((up.getLong(1), up.getLong(2), up.getLong(3), up.getLong(4)) ==
      ((3000L, 3000L, 3000L, 10000L)))
    // A = B - 3: the negative-division branch, zero wins
    val dn = Preference.pairedBootstrap(
      df.withColumn("a", col("a") - 3L), "k", "a", "b", reps = 32).collect().head
    assert((dn.getLong(1), dn.getLong(2), dn.getLong(3), dn.getLong(4)) ==
      ((-3000L, -3000L, -3000L, 0L)))
  }

  test("btStrengths: one exact MM round; more rounds keep the ranking and stay deterministic") {
    // 1 beats 2 twice, 2 beats 3 twice, 1 beats 3 once
    val cmp = Seq((1L, 2L), (1L, 2L), (2L, 3L), (2L, 3L), (1L, 3L)).toDF("w", "l")
    // round 1 from uniform 1e6: c(1,2)=1e6 c(2,3)=1e6 c(1,3)=5e5
    // D1=1.5e6 D2=2e6 D3=1.5e6 -> w1=2e6, w2=1e6, w3=floor 0 -> clamp 1
    val r1 = Preference.btStrengths(cmp, "w", "l", iters = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(r1(1L) == ((3L, 3L, 2000000L)))
    assert(r1(2L) == ((2L, 4L, 1000000L)))
    assert(r1(3L) == ((0L, 3L, 1L)))
    // two rounds: ranking preserved, result deterministic across runs
    def run() = Preference.btStrengths(cmp, "w", "l", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val a = run(); val b = run()
    assert(a == b)
    assert(a(1L) > a(2L) && a(2L) > a(3L))
  }
}
