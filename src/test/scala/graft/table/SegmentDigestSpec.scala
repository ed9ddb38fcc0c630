package graft.table

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class SegmentDigestSpec extends SparkFunSuite {
  import spark.implicits._

  private val rows = Seq(
    (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"), (6L, "f")
  ).toDF("k", "payload")

  test("digests are order-independent and partition-independent") {
    val d1 = SegmentDigest.digests(rows, "k", Seq("k", "payload"), nBuckets = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val shuffled = rows.orderBy(col("payload").desc).repartition(7)
    val d2 = SegmentDigest.digests(shuffled, "k", Seq("k", "payload"), nBuckets = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(d1 == d2 && d1.values.map(_._1).sum == 6L)
  }

  test("diff reports exactly the drifted segments: modify, delete, clean") {
    val modified = rows
      .withColumn("payload", when(col("k") === 3L, lit("C")).otherwise(col("payload")))
      .filter(col("k") =!= 5L)
    val a = SegmentDigest.digests(rows, "k", Seq("k", "payload"), nBuckets = 4)
    val b = SegmentDigest.digests(modified, "k", Seq("k", "payload"), nBuckets = 4)
    val drift = SegmentDigest.diff(a, b).collect()
    // which buckets hold k=3 and k=5?
    val buckets = SegmentDigest.digests(rows, "k", Seq("k", "payload"), nBuckets = 4)
    val keyBucket = rows.select(col("k"),
        pmod(conv(substring(md5(col("k").cast("string").cast("binary")), 1, 4), 16, 10)
          .cast("long"), lit(4L)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = Set(keyBucket(3L), keyBucket(5L))
    assert(drift.map(_.getLong(0)).toSet == expect)
    // identical inputs → empty drift
    assert(SegmentDigest.diff(a, a).collect().isEmpty)
  }

  test("row canonicalization is NULL-safe and separator-safe: divergent replicas never digest clean") {
    // every pair below collapses to the same concat_ws string; the
    // injective encoding must keep them apart so the diff reports drift
    val cases = Seq(
      (Seq(("x", null: String)), Seq((null: String, "x"))),
      (Seq(("a|b", null: String)), Seq(("a", "b"))),
      (Seq(("a", null: String)), Seq(("a", "n"))) // NULL vs literal sentinel
    )
    for (((l, r), i) <- cases.zipWithIndex) {
      val la = l.map { case (x, y) => (1L, x, y) }.toDF("k", "c1", "c2")
      val rb = r.map { case (x, y) => (1L, x, y) }.toDF("k", "c1", "c2")
      val drift = SegmentDigest.diff(
        SegmentDigest.digests(la, "k", Seq("c1", "c2"), nBuckets = 4),
        SegmentDigest.digests(rb, "k", Seq("c1", "c2"), nBuckets = 4)).collect()
      assert(drift.nonEmpty, s"case $i digested clean: $l vs $r")
    }
    // and a genuinely identical pair (with NULLs present) stays clean
    val same = Seq((1L, null: String, "x"), (2L, "a|b", null: String))
      .toDF("k", "c1", "c2")
    val d = SegmentDigest.digests(same, "k", Seq("c1", "c2"), nBuckets = 4)
    assert(SegmentDigest.diff(d, d).collect().isEmpty)
  }
}
