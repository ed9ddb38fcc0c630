package graft.ext

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Specs for the trained quality classifier (LR over exact-integer
  * features) and the deterministic epoch shuffle.
  */
class ClassifierSpec extends SparkFunSuite {
  import spark.implicits._

  // Separable toy corpus: "english-looking" docs are stopword-dense,
  // negatives are stopword-free symbol soup.
  private lazy val docs = Seq(
    (1L, "the quick fox of the hill and the dale went to a town", 1L),
    (2L, "a cat and a dog sat on the mat of the house to rest", 1L),
    (3L, "the rain of spain stays mainly and falls to a plain", 1L),
    (4L, "xx1! yy2@ zz3# qq4$ ww5% vv6^ uu7& tt8* ss9( rr0)", 0L),
    (5L, "zzz9 yyy8 xxx7 www6 vvv5 uuu4 ttt3 sss2 rrr1 qqq0", 0L),
    (6L, "k9- j8- h7- g6- f5- d4- s3- a2- p1- o0-", 0L)
  ).toDF("id", "text", "label")

  private lazy val feats =
    Classifier.lrFeatures(docs, "id", "text", col("label") === 1L)

  test("lrFeatures: exact-integer features, bias 1, caps hold") {
    val rows = feats.collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getLong(2) == 1L) // x0 bias
      (2 until 8).foreach(i => assert(r.getLong(i) >= 0L && r.getLong(i) <= 100L))
    }
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // doc 1 has 5+ stopword occurrences in 13 tokens → stop share well over 20%
    assert(byId(1L).getLong(4) > 20L)
    // doc 4 is all-symbol tokens → x5 (symbol pct) = 100
    assert(byId(4L).getLong(7) == 100L)
  }

  test("lrTrain separates the weak labels and is deterministic") {
    val f = feats.persist()
    try {
      val w  = Classifier.lrTrain(f, iters = 6)
      val w2 = Classifier.lrTrain(f, iters = 6)
      assert(w == w2) // replayable: same corpus, same weights
      val scored = Classifier.lrScore(f, "id", w)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val pos = Seq(1L, 2L, 3L).map(scored)
      val neg = Seq(4L, 5L, 6L).map(scored)
      assert(pos.min > neg.max,
        s"trained scores must separate classes: pos=$pos neg=$neg")
    } finally f.unpersist()
  }

  test("lrTrain one step matches the centered-GD + bias-fold arithmetic") {
    // w = 0 → z = 0 → p_ppm = 500000 for every row; the first gradient on
    // MEAN-CENTERED features is sum((500000 - y*1e6) * (x_j - μ_j)), and
    // the returned weights fold the means back into the bias.
    val f = feats.persist()
    try {
      val w1 = Classifier.lrTrain(f, iters = 1)
      val local = f.collect().map(r =>
        (r.getLong(1), (2 until 8).map(r.getLong).toSeq))
      val n = local.length
      val mu = 0L +: (1 until 6).map(j => local.map(_._2(j)).sum / n)
      def sgnDiv(a: Long, b: Long) = if (a >= 0) a / b else -((-a) / b)
      val centeredW = (0 until 6).map { j =>
        val g = local.map { case (y, x) => (500000L - y * 1000000L) * (x(j) - mu(j)) }.sum
        -sgnDiv(g, n * 100L)
      }
      val expected = centeredW.updated(0,
        centeredW.head - (1 until 6).map(j => centeredW(j) * mu(j)).sum)
      assert(w1 == expected)
    } finally f.unpersist()
  }

  test("prCurve: exact confusion counts and bp rates") {
    val scored = Seq(
      (1L, 1L, 900000L), (2L, 1L, 600000L), (3L, 0L, 700000L), (4L, 0L, 100000L)
    ).toDF("id", "y", "p_ppm")
    val curve = Classifier.prCurve(scored, Seq(500000L))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // τ=0.5: tp=2 (ids 1,2), fp=1 (id 3), fn=0, tn=1
    assert(curve.toSeq == Seq((2L, 1L, 0L, 1L, 6666L, 10000L)))
  }

  test("calibrationBins: exact ppm bins, clamp at the top bin") {
    val scored = Seq(
      (1L, 1L, 950000L), (2L, 0L, 980000L),  // bin 9
      (3L, 1L, 1000000L),                     // p=1.0 clamps into bin 9
      (4L, 0L, 120000L), (5L, 0L, 140000L),  // bin 1
      (6L, 1L, 50000L)                        // bin 0
    ).toDF("id", "y", "p_ppm")
    val got = Classifier.calibrationBins(scored, bins = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // bin 9: n=3, conf=(950000+980000+1000000)/3=976666, acc=2/3=666666
    assert(got(9L) == ((3L, 976666L, 666666L, 310000L)))
    assert(got(1L) == ((2L, 130000L, 0L, 130000L)))
    assert(got(0L) == ((1L, 50000L, 1000000L, 950000L)))
    assert(got.size == 3)
  }

  test("aucStats: exact Mann-Whitney wins/ties arithmetic") {
    val scored = Seq(
      (1L, 1L, 900000L), (2L, 1L, 600000L), (3L, 1L, 500000L),
      (4L, 0L, 700000L), (5L, 0L, 500000L), (6L, 0L, 100000L)
    ).toDF("id", "y", "p_ppm")
    val r = Classifier.aucStats(scored).collect().head
    // wins: 900k beats 3 negs, 600k beats 2, 500k beats 1 → 6; one tie at 500k
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((3L, 3L, 6L, 1L, 722222L))) // (2·6+1)/(2·9) = 13/18 → 722222 ppm
    // perfect separation → AUC exactly 1
    val perfect = Seq((1L, 1L, 900000L), (2L, 0L, 100000L)).toDF("id", "y", "p_ppm")
    assert(Classifier.aucStats(perfect).collect().head.getLong(4) == 1000000L)
  }

  test("poissonBootstrapCI matches an md5-replaying model and brackets the point") {
    val df = (1L to 200L).map(i => (i, 10L + (i % 17L))).toDF("doc_id", "v")
    val out = Sampling.poissonBootstrapCI(df, "doc_id", "v", reps = 16).collect()
    assert(out.length == 1)
    val r = out.head
    val (nReps, point, lo, hi) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nReps == 16L)
    assert(lo <= point && point <= hi, s"CI [$lo, $hi] must bracket point $point")
    // exact replay: same md5-derived Poisson weights, same rank statistics
    val md = java.security.MessageDigest.getInstance("MD5")
    def h16(key: String): Long = {
      val hex = md.digest(key.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val cdf = Seq(24109L, 48218L, 60273L, 64291L, 65296L, 65497L, 65530L)
    def w(h: Long): Long = cdf.indexWhere(h < _) match { case -1 => 7L; case k => k.toLong }
    val means = (0 until 16).map { b =>
      val (wx, ws) = (1L to 200L).foldLeft((0L, 0L)) { case ((ax, as), i) =>
        val wi = w(h16(s"$b|$i"))
        (ax + wi * (10L + (i % 17L)), as + wi)
      }
      (wx * 1000L / ws, b.toLong)
    }.sorted
    assert(lo == means(0)._1, "lo must be the rank-⌈0.025·16⌉=1 statistic")
    assert(hi == means(15)._1, "hi must be the rank-⌈0.975·16⌉=16 statistic")
    val expectedPoint = (1L to 200L).map(i => 10L + (i % 17L)).sum * 1000L / 200L
    assert(point == expectedPoint)
  }

  test("epochShuffle: dense per-shard positions, epoch-distinct order") {
    val ids = (0L until 64L).toDF("id")
    val out = Packing.epochShuffle(ids, "id", Seq(1, 2)).persist()
    try {
      assert(out.count() == 128L) // every doc appears once per epoch
      // positions within (epoch, shard) are dense 0..n-1
      val bad = out.groupBy("epoch", "shard")
        .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"), min(col("pos")).as("mn"),
          countDistinct(col("pos")).as("nd"))
        .filter(col("mn") =!= 0L || col("mx") =!= col("n") - 1L || col("nd") =!= col("n"))
      assert(bad.count() == 0L)
      // the two epochs give different orders (seeded hash actually varies)
      val o1 = out.filter(col("epoch") === 1L).orderBy("shard", "pos")
        .select("id").collect().map(_.getLong(0)).toSeq
      val o2 = out.filter(col("epoch") === 2L).orderBy("shard", "pos")
        .select("id").collect().map(_.getLong(0)).toSeq
      assert(o1.sorted == o2.sorted) // same membership
      assert(o1 != o2)               // different permutation
      // replay determinism
      val o1b = Packing.epochShuffle(ids, "id", Seq(1)).orderBy("shard", "pos")
        .select("id").collect().map(_.getLong(0)).toSeq
      assert(o1 == o1b)
    } finally out.unpersist()
  }

  test("calibrationTable: bin means and observed rates, top bin absorbs p=1e6") {
    val scored = Seq(
      (1L, 150000L), (0L, 180000L),   // bin 1: mean 165000, obs 500000
      (1L, 950000L), (1L, 1000000L)   // p=1e6 would index bin 10 → capped 9
    ).toDF("y", "p_ppm")
    val out = Classifier.calibrationTable(scored, buckets = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == ((2L, 165000L, 500000L, 335000L)))
    assert(out(9L) == ((2L, 975000L, 1000000L, 25000L)))
    assert(out.size == 2)
  }

  test("brierDecomposition: hand-computed terms satisfy BS = REL − RES + UNC") {
    val scored = Seq((1L, 800000L), (0L, 200000L), (1L, 900000L), (0L, 100000L))
      .toDF("y", "p_ppm")
    val r = Classifier.brierDecomposition(scored, buckets = 10).collect().head
    // brier 25000; rel 25000; res 250000; unc 250000 → identity exact here
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((4L, 25000L, 25000L, 250000L, 250000L)))
    assert(r.getLong(1) == r.getLong(2) - r.getLong(3) + r.getLong(4))
  }

  test("passAtK: falling-factorial estimator, n<k tasks excluded") {
    import spark.implicits._
    val attempts = (
      Seq.fill(3)(("g", "t1", false)) ++ Seq(("g", "t1", true)) ++ // n=4, c=1
      Seq.fill(3)(("g", "t2", false)) ++                           // n=3, c=0
      Seq.fill(2)(("g", "t3", true))                               // n=2 → excluded
    ).toDF("grp", "task", "ok")
    val r = Classifier.passAtK(attempts, "task", "grp", "ok", k = 3).collect().head
    assert(r.getAs[Long]("n_tasks") == 2L)
    assert(r.getAs[Long]("n_attempts") == 7L)
    // t1: 1e6 − (3·2·1)·1e6/(4·3·2) = 750000; t2: 0 → mean 375000
    assert(r.getAs[Long]("mean_pass_micro") == 375000L)
  }

  test("passAtK: all-success and all-fail edges") {
    import spark.implicits._
    val attempts = (Seq.fill(3)(("g", "t1", true)) ++ Seq.fill(4)(("g", "t2", false)))
      .toDF("grp", "task", "ok")
    val byTask = Classifier.passAtK(attempts, "task", "grp", "ok", k = 3)
      .collect().head
    // t1: c=n → pass 1e6 exactly; t2: c=0, n=4 → 1e6 − 24e5/24 → 0
    assert(byTask.getAs[Long]("mean_pass_micro") == 500000L)
  }

  test("splitConformal: perfect scorer gives singleton sets, constant scorer pays with full sets") {
    import spark.implicits._
    // perfect scorer: every true-class nonconformity is 0, so q̂ = 0 at
    // every α with k ≤ n_cal — eval coverage is total and every set is
    // the singleton true label (avg 1000 milli), whichever side of the
    // hash split each id lands on
    val perfect = (1L to 60L).map(i => (i, i % 2, if (i % 2 == 1) 1000000L else 0L))
      .toDF("doc_id", "y", "p_ppm")
    val gotP = Classifier.splitConformal(perfect, "doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(6), r.getLong(7)))).toMap
    assert(gotP.keySet == Set(5L, 10L, 20L))
    gotP.foreach { case (a, (nCal, k, qhat, covBp, setMilli)) =>
      assert(k == ((nCal + 1) * (100 - a) + 99) / 100, s"alpha=$a k")
      if (k <= nCal) {
        assert(qhat == 0L, s"alpha=$a qhat")
        assert(covBp == 10000L && setMilli == 1000L, s"alpha=$a cov/set")
      } else assert(qhat == 1000001L, s"alpha=$a conformal infinity")
    }
    // constant scorer p = 0.5: every score is 500000, q̂ = 500000,
    // coverage still total — but every prediction set is {0, 1}: the
    // distribution-free guarantee holds by paying the efficiency price
    val constant = (1L to 60L).map(i => (i, i % 2, 500000L))
      .toDF("doc_id", "y", "p_ppm")
    val gotC = Classifier.splitConformal(constant, "doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(6),
        r.getLong(7)))).toMap
    gotC.foreach { case (a, (k, qhat, covBp, setMilli)) =>
      val nCal = gotP(a)._1 // same ids → same split
      if (k <= nCal) {
        assert(qhat == 500000L, s"alpha=$a qhat")
        assert(covBp == 10000L && setMilli == 2000L, s"alpha=$a cov/set")
      }
    }
  }

  test("isotonicCalibration: adjacent violators pool to the segment rate") {
    import spark.implicits._
    // low bins read rate 1.0, high bins 0.0 — a full inversion PAV must
    // pool into the common 2/4 rate across all four non-empty bins
    // (verified against a rational-arithmetic PAV reference)
    val scored = Seq(
      (1L, 1L, 100000L), (2L, 1L, 200000L),   // bins 1-2, both positive
      (3L, 0L, 700000L), (4L, 0L, 800000L))   // bins 7-8, both negative
      .toDF("doc_id", "y", "p_ppm")
    val got = Classifier.isotonicCalibration(scored, bins = 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet == Set(1L, 2L, 7L, 8L))
    assert(got(1L) == ((1L, 1L, 1000000000000L, 500000000000L)), got.toString)
    assert(got(2L) == ((1L, 1L, 1000000000000L, 500000000000L)), got.toString)
    assert(got(7L) == ((1L, 0L, 0L, 500000000000L)), got.toString)
    assert(got(8L) == ((1L, 0L, 0L, 500000000000L)), got.toString)
  }

  test("isotonicCalibration: already-monotone bins pass through; output is monotone") {
    import spark.implicits._
    val scored = (
      Seq.fill(4)((0L, 50000L)) ++ Seq((1L, 50000L)) ++            // bin 0: 1/5
      Seq.fill(2)((0L, 450000L)) ++ Seq.fill(3)((1L, 450000L)) ++  // bin 4: 3/5
      Seq.fill(1)((0L, 950000L)) ++ Seq.fill(4)((1L, 950000L))     // bin 9: 4/5
    ).zipWithIndex.map { case ((y, p), i) => (i.toLong, y, p) }
      .toDF("doc_id", "y", "p_ppm")
    val rows = Classifier.isotonicCalibration(scored, bins = 10).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).sortBy(_._1)
    // monotone input: iso == raw per bin
    assert(rows.forall { case (_, raw, iso) => raw == iso }, rows.mkString(","))
    assert(rows.map(_._3).sliding(2).forall(s => s.length < 2 || s(0) <= s(1)))
    assert(rows.map(_._2).toSeq ==
      Seq(200000000000L, 600000000000L, 800000000000L))
  }
}
