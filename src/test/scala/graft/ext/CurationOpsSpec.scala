package graft.ext

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class CurationOpsSpec extends SparkFunSuite {
  import spark.implicits._

  // ---- Decontaminate ----

  test("contamination flags exactly the docs sharing an n-gram with the holdout") {
    val train = Seq(
      (1L, "alpha beta gamma delta"),   // shares "beta gamma delta" with holdout
      (2L, "epsilon zeta eta theta"),   // clean
      (3L, "beta gamma delta epsilon"), // shares two trigrams
      (4L, "x y")                       // too short for a trigram
    ).toDF("doc_id", "text")
    val holdout = Seq(
      (100L, "omega beta gamma delta epsilon psi")
    ).toDF("doc_id", "text")

    val out = Decontaminate.contamination(train, holdout, "doc_id", "text", shingleN = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap

    // doc 1: trigrams {a b g, b g d}; holdout has "beta gamma delta" → 1 hit of 2
    assert(out(1L) == ((2L, 1L, 5000L, true)))
    assert(out(2L) == ((2L, 0L, 0L, false)))
    // doc 3: {b g d, g d e} both in holdout → 2 of 2
    assert(out(3L) == ((2L, 2L, 10000L, true)))
    // shingle-free doc: clean by definition, present in output
    assert(out(4L) == ((0L, 0L, 0L, false)))
  }

  test("contamination counts distinct shingles, not occurrences") {
    val train   = Seq((1L, "a b c a b c a b c")).toDF("doc_id", "text")
    val holdout = Seq((9L, "a b c")).toDF("doc_id", "text")
    val Array(r) = Decontaminate.contamination(train, holdout, "doc_id", "text", 3).collect()
    // 7 trigram occurrences but only 3 distinct ("a b c","b c a","c a b");
    // exactly one collides with the holdout
    assert((r.getLong(1), r.getLong(2)) == ((3L, 1L)))
  }

  // ---- Packing ----

  test("packSequences tiles each shard's token stream exactly") {
    val docs = (0L until 40L).map(i => (i, Seq.fill((i % 7 + 1).toInt)("tok").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Packing.packSequences(docs, "doc_id", "text", ctxLen = 5)
      .orderBy("shard", "doc_id").collect()

    // within every shard: spans are contiguous from 0, and window math is
    // consistent with the running total
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      var expectedStart = 0L
      rows.foreach { r =>
        val (n, start, sf, sl, ns) =
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
        assert(start == expectedStart)
        assert(sf == start / 5)
        assert(sl == (start + n - 1) / 5)
        assert(ns == sl - sf + 1)
        expectedStart += n
      }
    }
    // shard assignment is the deterministic 16-way md5 bucket
    val shards = out.map(_.getLong(1)).distinct
    assert(shards.forall(s => s >= 0 && s < 16))
  }

  test("packSequences drops token-free docs and spans windows correctly") {
    val docs = Seq((1L, "   "), (2L, Seq.fill(12)("t").mkString(" "))).toDF("doc_id", "text")
    val out = Packing.packSequences(docs, "doc_id", "text", ctxLen = 5).collect()
    assert(out.map(_.getLong(0)).toSet == Set(2L))
    val r = out.head
    // 12 tokens from offset 0 with C=5 → windows 0..2
    assert((r.getLong(4), r.getLong(5), r.getLong(6)) == ((0L, 2L, 3L)))
  }

  // ---- repetitionStats ----

  test("repetitionStats measures duplicate-shingle share in basis points") {
    val docs = Seq(
      (1L, "a b a b a b"),   // 5 bigrams, 2 distinct → rep 6000 bp
      (2L, "v w x y z"),     // all distinct → 0 bp
      (3L, "solo")           // no bigram → 0/0 → 0 bp
    ).toDF("doc_id", "text")
    val out = TextStats.repetitionStats(docs, "doc_id", "text", shingleN = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((5L, 2L, 6000L)))
    assert(out(2L) == ((4L, 4L, 0L)))
    assert(out(3L) == ((0L, 0L, 0L)))
  }
}
