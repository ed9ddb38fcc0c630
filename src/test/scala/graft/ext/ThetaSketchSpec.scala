package graft.ext

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class ThetaSketchSpec extends SparkFunSuite {
  import spark.implicits._

  test("kminSketch: exhaustive below k (theta = hash space), truncated at k (theta = kth min)") {
    val df = (1 to 10).map(i => ("small", i.toLong))
      .++((1 to 100).map(i => ("big", i.toLong))).toDF("key", "member")
    val sk = ThetaSketch.kminSketch(df, "key", "member", k = 16)
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[Long](1), r.getLong(2)))).toMap
    val (smallHs, smallTh) = sk("small")
    assert(smallHs.length == 10 && smallTh == ThetaSketch.HashSpace)
    assert(smallHs == smallHs.sorted)
    val (bigHs, bigTh) = sk("big")
    assert(bigHs.length == 16 && bigTh == bigHs.max)
    // the retained values ARE the 16 smallest of the 100 hashes
    val all100 = (1 to 100)
      .map(i => spark.range(1).select(ThetaSketch.hash40(lit(i.toLong))).head().getLong(0))
      .sorted.take(16)
    assert(bigHs.toList == all100.toList)
  }

  test("kminSketch dedups: re-delivered members never change the sketch") {
    val once = (1 to 50).map(i => ("k", i.toLong)).toDF("key", "member")
    val thrice = (1 to 3).flatMap(_ => (1 to 50).map(i => ("k", i.toLong)))
      .toDF("key", "member").repartition(7)
    val a = ThetaSketch.kminSketch(once, "key", "member", 16).head()
    val b = ThetaSketch.kminSketch(thrice, "key", "member", 16).head()
    assert(a.getSeq[Long](1) == b.getSeq[Long](1) && a.getLong(2) == b.getLong(2))
  }

  test("overlapEstimates is EXACT while both sketches are exhaustive") {
    // A = 1..40, B = 21..60: |A|=|B|=40, inter=20, union=60
    val df = ((1 to 40).map(i => ("A", i.toLong)) ++
      (21 to 60).map(i => ("B", i.toLong))).toDF("key", "member")
    val est = ThetaSketch.overlapEstimates(
      ThetaSketch.kminSketch(df, "key", "member", k = 64)).head()
    assert(est.getAs[String]("key_a") == "A" && est.getAs[String]("key_b") == "B")
    assert(est.getAs[Long]("a_est_milli") == 40000L)
    assert(est.getAs[Long]("b_est_milli") == 40000L)
    assert(est.getAs[Long]("union_est_milli") == 60000L)
    assert(est.getAs[Long]("inter_est_milli") == 20000L)
    assert(est.getAs[Long]("a_only_est_milli") == 20000L)
    assert(est.getAs[Long]("b_only_est_milli") == 20000L)
    // jaccard 20/60 = 3333 bp
    assert(est.getAs[Long]("jaccard_est_bp") == 3333L)
  }

  test("estimates stay within the 1/sqrt(k) envelope on saturated sketches") {
    // A = 1..3000, B = 2001..5000: inter 1000, union 5000
    val df = ((1 to 3000).map(i => ("A", i.toLong)) ++
      (2001 to 5000).map(i => ("B", i.toLong))).toDF("key", "member")
    val est = ThetaSketch.overlapEstimates(
      ThetaSketch.kminSketch(df, "key", "member", k = 256)).head()
    def milli(c: String) = est.getAs[Long](c).toDouble / 1000.0
    // ~6.25% per-set at k=256; allow 4 sigma, intersections are noisier
    assert(math.abs(milli("a_est_milli") - 3000) < 3000 * 0.25,
      s"a=${milli("a_est_milli")}")
    assert(math.abs(milli("union_est_milli") - 5000) < 5000 * 0.25,
      s"u=${milli("union_est_milli")}")
    assert(math.abs(milli("inter_est_milli") - 1000) < 1000 * 0.6,
      s"i=${milli("inter_est_milli")}")
    // retained-sample identity: union = a + b − inter, exactly
    assert(est.getAs[Long]("union_est_milli") ==
      est.getAs[Long]("a_est_milli") + est.getAs[Long]("b_est_milli") -
        est.getAs[Long]("inter_est_milli"))
  }

  test("overlapAudit reports exact intersections and bp error; disjoint pairs stay zero") {
    val df = ((1 to 30).map(i => ("A", i.toLong)) ++
      (11 to 40).map(i => ("B", i.toLong)) ++
      (100 to 120).map(i => ("C", i.toLong))).toDF("key", "member")
    val out = ThetaSketch.overlapAudit(df, "key", "member", k = 64)
      .collect().map(r => (r.getAs[String]("key_a"), r.getAs[String]("key_b")) ->
        ((r.getAs[Long]("inter_exact"), r.getAs[Long]("err_bp")))).toMap
    assert(out(("A", "B")) == ((20L, 0L)))   // exhaustive → exact → 0 error
    assert(out(("A", "C")) == ((0L, 0L)))
    assert(out(("B", "C")) == ((0L, 0L)))
  }

  test("mergeSketches(kmin(A), kmin(B)) equals kmin(A ∪ B) bit for bit") {
    val aRows = (1 to 80).map(i => ("x", i.toLong)) ++ (1 to 10).map(i => ("y", i.toLong))
    val bRows = (41 to 120).map(i => ("x", i.toLong)) ++ (5 to 30).map(i => ("y", i.toLong))
    val a = aRows.toDF("key", "member")
    val b = bRows.toDF("key", "member")
    val union = (aRows ++ bRows).toDF("key", "member")
    def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> ((r.getSeq[Long](1).toList, r.getLong(2)))).toMap
    val merged = snap(ThetaSketch.mergeSketches(
      ThetaSketch.kminSketch(a, "key", "member", 32),
      ThetaSketch.kminSketch(b, "key", "member", 32), 32))
    val direct = snap(ThetaSketch.kminSketch(union, "key", "member", 32))
    assert(merged == direct)
    // and a merge with itself is the identity
    val sk = ThetaSketch.kminSketch(a, "key", "member", 32)
    assert(snap(ThetaSketch.mergeSketches(sk, sk, 32)) == snap(sk))
  }

  test("graft_kmv_values orders the full 64-bit space unsigned (negatives rank last)") {
    val df = Seq(-1L, -100L, 5L, 3L, Long.MinValue, 0L).toDF("h")
    val out = df.agg(graft.functions.GraftFunctions.kmvValues(col("h"), 16))
      .head().getSeq[Long](0)
    assert(out.toList == List(0L, 3L, 5L, Long.MinValue, -100L, -1L))
  }
}
