package graft.ext

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class HdrSketchSpec extends SparkFunSuite {
  import spark.implicits._

  test("bucket ids: exact below 16, octave+sub above; lower bounds tight at boundaries") {
    val vs = Seq(0L, 1L, 15L, 16L, 31L, 32L, 50L, 1023L, 1024L)
    val rows = HdrSketch.hdrHistogram(vs.map(("k", _)).toDF("key", "v"), "key", "v")
      .withColumn("lb", expr(HdrSketch.bucketLowerSql)).collect()
      .map(r => (r.getLong(1), r.getLong(3)))
    // exact small buckets
    assert(rows.contains((0L, 0L)) && rows.contains((15L, 15L)))
    // 16 and 31 share the first octave (lb 16 and 31); 32 starts the next
    assert(rows.contains((64L, 16L)) && rows.contains((79L, 31L)) &&
      rows.contains((80L, 32L)))
    // 1023 vs 1024 split octaves: lb(1023) = 992, lb(1024) = 1024
    assert(rows.contains((9L * 16 + 15, 992L)) && rows.contains((160L, 1024L)))
  }

  test("hand quantile audit: 1..100 per the nearest-rank definition; error within 625 bp") {
    val df = (1 to 100).map(i => ("k", i.toLong)).toDF("key", "v")
    val out = HdrSketch.hdrQuantileAudit(df, "key", "v", Seq(50, 90, 99))
      .collect().map(r => r.getAs[Long]("q") ->
        ((r.getAs[Long]("r"), r.getAs[Long]("est"), r.getAs[Long]("exact_v"),
          r.getAs[Long]("err_bp")))).toMap
    assert(out(50L) == ((50L, 50L, 50L, 0L)))   // 50 is its own bucket floor
    assert(out(90L) == ((90L, 88L, 90L, 222L)))
    assert(out(99L) == ((99L, 96L, 99L, 303L)))
    assert(out.values.forall(_._4 <= 625L))
  }

  test("error bound holds on a pseudo-random heavy-tailed set; estimate never exceeds exact") {
    // deterministic LCG values spanning 6 orders of magnitude
    val vs = Iterator.iterate(12345L)(x => (x * 48271) % 2147483647L)
      .take(5000).map(x => x % 1000000L).toSeq
    val out = HdrSketch.hdrQuantileAudit(
      vs.map(("k", _)).toDF("key", "v"), "key", "v", Seq(1, 25, 50, 75, 90, 99, 100))
      .collect()
    assert(out.length == 7)
    for (r <- out) {
      assert(r.getAs[Long]("est") <= r.getAs[Long]("exact_v"))
      assert(r.getAs[Long]("err_bp") <= 625L,
        s"q=${r.getAs[Long]("q")}: ${r.getAs[Long]("err_bp")} bp")
    }
  }

  test("histograms merge by addition: hist(A ∪ B) = hist(A) + hist(B)") {
    val a = (1 to 300).map(i => ("k", (i * 7 % 500).toLong)).toDF("key", "v")
    val b = (1 to 200).map(i => ("k", (i * 13 % 900).toLong)).toDF("key", "v")
    def m(df: org.apache.spark.sql.DataFrame) =
      HdrSketch.hdrHistogram(df, "key", "v").collect()
        .map(r => r.getLong(1) -> r.getLong(2)).toMap
    val ma = m(a); val mb = m(b); val mu = m(a.unionByName(b))
    val summed = (ma.keySet ++ mb.keySet)
      .map(k => k -> (ma.getOrElse(k, 0L) + mb.getOrElse(k, 0L))).toMap
    assert(mu == summed)
  }

  test("negative values are rejected, not silently bucketed") {
    intercept[Exception] {
      HdrSketch.hdrHistogram(Seq(("k", -1L)).toDF("key", "v"), "key", "v").collect()
    }
  }
}
