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
}
