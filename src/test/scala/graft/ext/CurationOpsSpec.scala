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

  test("sourceOverlap: shared-shingle pairs with exact integer Jaccard; disjoint pairs absent") {
    val docs = Seq(
      (1L, "A", "a b c"),   // A 2-gram set {a b, b c} ∪ {c d} (doc 2) = 3
      (2L, "A", "c d"),
      (3L, "B", "a b x"),   // B set {a b, b x} — shares "a b" with A
      (4L, "C", "q r s")    // C set {q r, r s} — disjoint from both
    ).toDF("doc_id", "src", "text")
    val rows = Decontaminate.sourceOverlap(docs, "src", "text", shingleN = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // only (A, B) shares anything: 1 common of |A∪B| = 3 + 2 − 1 → 250‰
    assert(rows.toSeq == Seq(("A", "B", 3L, 2L, 1L, 250L)))
  }

  test("overlapSketch: exact when cardinality ≤ k; inclusion–exclusion identity holds") {
    val train = Seq(
      (1L, "alpha beta gamma delta"),    // trigrams: a-b-g, b-g-d
      (2L, "epsilon zeta eta theta")     // e-z-e, z-e-t
    ).toDF("doc_id", "text")
    val holdout = Seq(
      (9L, "beta gamma delta epsilon"),  // b-g-d (shared), g-d-e
      (10L, "iota kappa lambda")         // i-k-l
    ).toDF("doc_id", "text")
    val Array(r) = Decontaminate.overlapSketch(train, holdout, "text", shingleN = 3, k = 256)
      .collect()
    // cardinalities (4 train / 3 holdout distinct trigrams, 1 shared) are
    // far below k = 256, so every KMV estimate is exact
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((4L, 3L, 6L, 1L)))
  }

  test("overlapSketch: disjoint corpora estimate zero overlap at low cardinality") {
    val a = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val b = Seq((2L, "p q r s")).toDF("doc_id", "text")
    val Array(r) = Decontaminate.overlapSketch(a, b, "text", shingleN = 3, k = 64).collect()
    assert(r.getLong(3) == 0L)
  }

  test("overlapSketch plan: no join, no distinct shuffle — one single-partition aggregate") {
    val a = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val b = Seq((2L, "p q r s")).toDF("doc_id", "text")
    val p = Decontaminate.overlapSketch(a, b, "text", shingleN = 3, k = 64)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"the sketch gauge must not join:\n$p")
    // the only exchange is the 1-row final aggregate's SinglePartition
    assert(p.split("Exchange").length - 1 == 1, s"expected exactly 1 exchange:\n$p")
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

  test("packEfficiency aggregates the packing layout per shard exactly") {
    val docs = (0L until 40L).map(i => (i, Seq.fill((i % 7 + 1).toInt)("tok").mkString(" ")))
      .toDF("doc_id", "text")
    // reference roll-up recomputed from the packing frame itself
    val packed = Packing.packSequences(docs, "doc_id", "text", ctxLen = 5).collect()
    val expect = packed.groupBy(_.getLong(1)).map { case (shard, rows) =>
      val total = rows.map(_.getLong(2)).sum
      val segs  = rows.map(_.getLong(6)).sum
      val split = rows.count(_.getLong(6) > 1L).toLong
      val nw    = (total + 4) / 5
      shard -> ((rows.length.toLong, total, segs, split, nw, nw * 5 - total,
        total * 10000 / (nw * 5), split * 10000 / rows.length))
    }
    val out = Packing.packEfficiency(docs, "doc_id", "text", ctxLen = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))).toMap
    assert(out == expect)
    // gapless packing: every shard wastes strictly less than one window
    assert(out.values.forall(_._6 < 5))
  }

  test("qualityCutoff admits whole score levels best-first within the budget") {
    val rows = Seq(
      // source A: levels 90 (10 tok), 80 (25 tok over two docs), 70 (100 tok)
      ("A", 90L, 10L), ("A", 80L, 10L), ("A", 80L, 15L), ("A", 70L, 100L),
      // source B: the best level alone overflows
      ("B", 95L, 500L), ("B", 50L, 5L)
    ).toDF("source", "ttr_bp", "n_tokens").withColumn("doc_id", lit(0L))
    val out = Sampling.qualityCutoff(rows, "source", "ttr_bp", "n_tokens",
        budget = 40L, scoreSentinel = 101L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // A: 90 (cum 10) + 80 (cum 35) fit; 70 would hit 135 → cutoff 80
    assert(out("A") == ((80L, 3L, 35L)))
    // B: 95's level alone is 500 > 40 → nothing admitted, sentinel cutoff
    assert(out("B") == ((101L, 0L, 0L)))
  }

  test("scorePercentile: strict-below permille per stratum; ties share a value") {
    val rows = Seq(("A", 10L, 1L), ("A", 10L, 2L), ("A", 20L, 3L), ("A", 30L, 4L),
        ("B", 99L, 5L))
      .toDF("source", "ttr_bp", "doc_id")
    val out = Sampling.scorePercentile(rows, "source", "ttr_bp")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pct_permille")).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 500L, 4L -> 750L, 5L -> 0L))
  }

  // ---- Retrieval (BM25) ----

  test("bm25TopK ranks higher-tf docs first and respects doc-length normalization") {
    val docs = Seq(
      (1L, "cat cat cat"),                         // tf=3, dl=3
      (2L, "cat dog bird fish mouse horse"),       // tf=1, dl=6
      (3L, "cat cat dog bird"),                    // tf=2, dl=4
      (4L, "dog dog dog")                          // tf=0 → absent for 'cat'
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("cat"), k = 10)
      .orderBy("rnk").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 3L, 2L)) // by tf density
    // exact integer recomputation: N=4, sumdl=16, avgdl=4, df=3, idf=(4-3+1)*1e6/4=500000
    val scores = out.map(r => r.getLong(2) -> r.getLong(5)).toMap
    def s(tf: Long, dl: Long): Long =
      (500000L * tf * 44 * 4) / (20 * 4 * tf + 6 * 4 + 18 * dl)
    assert(scores(1L) == s(3, 3) && scores(3L) == s(2, 4) && scores(2L) == s(1, 6))
  }

  test("bm25TopK caps output at k per term with doc_id tiebreak") {
    val docs = (0L until 20L).map(i => (i, "term filler")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("term"), k = 5).collect()
    // all docs tie on (tf, dl) → scores equal → first 5 doc_ids win
    assert(out.map(_.getLong(2)).sorted.toSeq == (0L until 5L))
  }

  test("bm25QueryTopK sums per-term scores into one whole-query ranking") {
    val docs = Seq(
      (1L, "cat dog"),   // matches both terms
      (2L, "cat cat"),   // one term, double tf
      (3L, "dog fish"),  // one term
      (4L, "fish fish")  // neither
    ).toDF("doc_id", "text")
    val perTerm = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("cat", "dog"), k = 10)
      .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getLong(5)).toMap
    val out = Retrieval.bm25QueryTopK(docs, "doc_id", "text", Seq("cat", "dog"),
        perTermK = 10, k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bm25_micro")).toMap
    assert(out(1L) == perTerm(("cat", 1L)) + perTerm(("dog", 1L)))
    assert(out(2L) == perTerm(("cat", 2L)) && out(3L) == perTerm(("dog", 3L)))
    assert(!out.contains(4L))
  }

  test("spanCorruptionStats: islands merge, unmasked docs keep zeros, mask replays") {
    import graft.ext.{Packing, Sampling}
    val docs = Seq((7L, ("w " * 40).trim), (8L, "x")).toDF("doc_id", "text")
    val got = Packing.spanCorruptionStats(docs, "doc_id", "text", maskBp = 3000L)
      .collect().map(r => r.getLong(0) -> r).toMap
    // independent replay of the seeded mask for doc 7
    val thr = 65536L * 3000L / 10000L
    val md = java.security.MessageDigest.getInstance("MD5")
    def h16(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString, 16)
    val maskedPos = (0 until 40).filter(p => h16(s"7|$p") < thr)
    val spans = maskedPos.foldLeft(List.empty[List[Int]]) {
      case (acc, p) if acc.nonEmpty && acc.head.head == p - 1 => (p :: acc.head) :: acc.tail
      case (acc, p) => List(p) :: acc
    }
    val r7 = got(7L)
    assert(r7.getAs[Long]("n_tokens") == 40L)
    assert(r7.getAs[Long]("n_masked") == maskedPos.size.toLong)
    assert(r7.getAs[Long]("n_spans") == spans.size.toLong)
    assert(r7.getAs[Long]("max_span") == spans.map(_.size).max.toLong)
    assert(r7.getAs[Long]("corruption_bp") == maskedPos.size * 10000L / 40L)
    // the 1-token doc: either fully masked (1 span) or zeros — and real
    // zeros must surface, not drop
    val r8 = got(8L)
    assert(r8.getAs[Long]("n_tokens") == 1L)
    assert(Set(0L, 1L).contains(r8.getAs[Long]("n_masked")))
  }

  test("phraseMatches counts overlapping starts; short docs guard to zero") {
    val docs = Seq(
      (1L, "a a a b"),     // "a a" starts at 1 and 2
      (2L, "x a a y a a"), // starts at 2 and 5
      (3L, "a"),           // shorter than the phrase
      (4L, "b c")          // no match
    ).toDF("doc_id", "text")
    val got = Retrieval.phraseMatches(docs, "doc_id", "text", Seq(Seq("a", "a")))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L))
    // multi-phrase union tags rows by phrase
    val multi = Retrieval.phraseMatches(docs, "doc_id", "text",
      Seq(Seq("a", "a"), Seq("b", "c")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(multi == Set(("a a", 1L), ("a a", 2L), ("b c", 4L)))
  }

  test("rrfFuse sums 1e6 div (k0+rank) across systems with per-system rank columns") {
    val a = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("doc_id", "rnk")
    val b = Seq((11L, 1L), (13L, 2L)).toDF("doc_id", "rnk")
    val out = Retrieval.rrfFuse(Seq("a" -> a, "b" -> b), "doc_id", "rnk",
        k0 = 60, topK = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((Option(r.getAs[Any]("rnk_a")), Option(r.getAs[Any]("rnk_b")),
          r.getAs[Long]("rrf_micro"), r.getAs[Long]("fused_rnk")))).toMap
    // doc 11 is ranked by both systems → highest fused score
    assert(out(11L) == ((Some(2L), Some(1L), 1000000L / 62 + 1000000L / 61, 1L)))
    assert(out(10L) == ((Some(1L), None, 1000000L / 61, 2L)))
    assert(out(13L) == ((None, Some(2L), 1000000L / 62, 3L)))
    assert(out(12L)._4 == 4L) // 1/(60+3), lowest
  }

  test("overlapAtK counts top-k intersections per depth; empty join → 0 rows kept") {
    val a = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("doc_id", "rnk")
    val b = Seq((11L, 1L), (10L, 2L), (13L, 3L)).toDF("doc_id", "rnk")
    val out = Retrieval.overlapAtK(a, b, "doc_id", "rnk", ks = Seq(1, 2, 3))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // k=1: {10} vs {11} → 0; k=2: {10,11} vs {11,10} → 2; k=3: adds 12 vs 13 → 2
    assert(out == Map(1L -> ((0L, 0L)), 2L -> ((2L, 1000L)), 3L -> ((2L, 666L))))
    val disjoint = Retrieval.overlapAtK(a,
        Seq((99L, 1L)).toDF("doc_id", "rnk"), "doc_id", "rnk", ks = Seq(2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(disjoint.toSeq == Seq((2L, 0L, 0L))) // the depth row survives
  }

  // ---- tokenBudgetSample ----

  test("tokenBudgetSample admits in hash order until the stratum budget") {
    val docs = (0L until 30L).map(i => (i, if (i < 15) "a" else "b", 10L))
      .toDF("doc_id", "source", "n_tokens")
    val out = Sampling.tokenBudgetSample(docs, "source", "doc_id", "n_tokens", budget = 45L)
      .collect()
    // budget 45 at 10 tokens/doc → 5 docs per stratum (5th starts at 40 < 45)
    assert(out.groupBy(_.getString(1)).view.mapValues(_.length).toMap == Map("a" -> 5, "b" -> 5))
    // cum_tokens is the inclusive running total in admission order
    out.groupBy(_.getString(1)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == Seq(10L, 20L, 30L, 40L, 50L))
    }
  }

  test("tokenBudgetSample admits the budget-crossing doc, then stops") {
    val docs = Seq((1L, "x", 100L), (2L, "x", 100L)).toDF("doc_id", "source", "n_tokens")
    // budget 1: only the first doc in hash order is admitted (it overshoots)
    val one = Sampling.tokenBudgetSample(docs, "source", "doc_id", "n_tokens", budget = 1L).collect()
    assert(one.length == 1 && one.head.getLong(3) == 100L)
  }

  test("tokenBudgetSample sharded decomposition equals the single-window formulation") {
    // keys spread across all 16 shards, token counts varied so budget
    // boundaries land mid-shard; 3 strata of different sizes
    val docs = (0L until 400L).map(i => (i, s"s${i % 3}", 1L + i % 7))
      .toDF("doc_id", "source", "n_tokens")
    for (budget <- Seq(1L, 37L, 100L, 100000L)) {
      val got = Sampling.tokenBudgetSample(docs, "source", "doc_id", "n_tokens", budget)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy(col("source"))
        .orderBy(Sampling.hashBucket16(col("doc_id")), col("doc_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      val want = docs.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .filter(col("cum_tokens") - col("n_tokens") < budget)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
      assert(got == want, s"budget=$budget: admitted set or cum values diverge")
    }
  }

  // ---- mixtureSample ----

  test("mixtureSample applies per-group rates; 10000 keeps all, 0 drops all") {
    val docs = (0L until 200L).map(i => (i, if (i < 100) "a" else "b")).toDF("doc_id", "source")
    val all = Sampling.mixtureSample(docs, "source", "doc_id", Map("a" -> 10000), defaultBp = 0).collect()
    assert(all.length == 100 && all.forall(_.getLong(0) < 100))
  }

  test("mixtureSample kept set is exactly the bucket rule and is rerun-stable") {
    val docs = (0L until 200L).map(i => (i, if (i < 100) "a" else "b")).toDF("doc_id", "source")
    def run() = Sampling.mixtureSample(docs, "source", "doc_id", Map("a" -> 5000), defaultBp = 2000)
      .collect().map(_.getLong(0)).toSet
    val kept = run()
    assert(kept == run())
    val expect = docs.select(col("doc_id"), Sampling.hashBucket16(col("doc_id")).as("b"), col("source"))
      .collect()
      .filter(r => r.getLong(1) * 10000L < (if (r.getString(2) == "a") 5000L else 2000L) * 65536L)
      .map(_.getLong(0)).toSet
    assert(kept == expect && kept.nonEmpty && kept.size < 200)
  }

  // ---- chunkDocuments ----

  test("chunkDocuments tiles with overlap and keeps the partial tail") {
    val docs = Seq((1L, (1 to 25).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = Packing.chunkDocuments(docs, "doc_id", "text", chunkTokens = 10, stride = 7)
      .orderBy("chunk_id").collect()
    // 25 tokens, stride 7 → starts 0,7,14,21 (4 chunks; last is partial)
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 0L, 10L), (1L, 7L, 17L), (2L, 14L, 24L), (3L, 21L, 25L)))
    // chunk text is the exact token slice
    assert(out(1).getString(5) == (8 to 17).map(i => s"t$i").mkString(" "))
    assert(out(3).getString(5) == (22 to 25).map(i => s"t$i").mkString(" "))
    // consecutive chunks overlap by chunkTokens - stride = 3
    assert(out(0).getLong(3) - out(1).getLong(2) == 3L)
  }

  test("chunkDocuments drops token-free docs; single short doc is one chunk") {
    val docs = Seq((1L, "  "), (2L, "a b c")).toDF("doc_id", "text")
    val out = Packing.chunkDocuments(docs, "doc_id", "text", 10, 7).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L))
    assert((out.head.getLong(2), out.head.getLong(3), out.head.getString(5)) == ((0L, 3L, "a b c")))
  }

  // ---- contrastivePairs ----

  test("contrastivePairs pairs each chunk with its successor; singles drop") {
    val docs = Seq(
      (1L, (1 to 25).map(i => s"t$i").mkString(" ")), // 4 chunks → 3 pairs
      (2L, "a b c")                                   // 1 chunk → no pair
    ).toDF("doc_id", "text")
    val out = Packing.contrastivePairs(docs, "doc_id", "text", chunkTokens = 10, stride = 7)
      .orderBy("doc_id", "anchor_chunk_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 0L, 1L), (1L, 1L, 2L), (1L, 2L, 3L)))
    // anchor/positive texts are the adjacent chunk slices (3-token overlap)
    assert(out(0).getString(3) == (1 to 10).map(i => s"t$i").mkString(" "))
    assert(out(0).getString(4) == (8 to 17).map(i => s"t$i").mkString(" "))
  }

  // ---- quantizeInt8 ----

  test("quantizeInt8 codes are exact and dequantize within a half step") {
    val vecs = Seq((1L, Array(-1.0f, 0.0f, 0.5f, 1.0f)), (2L, Array(0.3f, 0.3f))).toDF("id", "embedding")
    val out = VectorSearch.quantizeInt8(vecs, "id", "embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // vector 1: mn=-1e6, mx=1e6 → code = (m+1e6)*254/2e6 - 127
    assert(out((1L, 1L))._1 == -127L)                      // min → -127
    assert(out((1L, 4L))._1 == 127L)                       // max → 127
    assert(out((1L, 2L))._1 == 0L)                         // midpoint → 0
    assert(out((1L, 3L))._1 == ((1500000L * 254L) / 2000000L - 127L)) // 63
    // constant vector codes to 0 with mn = mx
    assert(out((2L, 1L)) == ((0L, 300000L, 300000L)))
    // dequantization error ≤ half a quantization step
    val (code, mn, mx) = out((1L, 3L))
    val deq = mn + (code + 127L) * (mx - mn) / 254.0
    assert(math.abs(deq - 500000.0) <= (mx - mn) / 254.0)
  }

  // ---- signRandomProjection ----

  test("signRandomProjection computes exact signed micro sums") {
    val vecs = Seq((1L, Array(1.0f, -0.5f, 0.25f))).toDF("id", "embedding")
    val out = VectorSearch.signRandomProjection(vecs, "id", "embedding", inDims = 3, outDims = 4)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    for (j <- 0 until 4) {
      val expected = Seq(1000000L, -500000L, 250000L).zipWithIndex
        .map { case (m, i) => m * VectorSearch.signAt(i, j) }.sum
      assert(out(j.toLong) == expected, s"dim $j")
    }
  }

  test("signAt is a balanced-ish deterministic ±1 matrix") {
    val entries = for (i <- 0 until 64; j <- 0 until 8) yield VectorSearch.signAt(i, j)
    assert(entries.forall(s => s == 1 || s == -1))
    // parity of md5 should not collapse to one sign
    val pos = entries.count(_ == 1)
    assert(pos > entries.size / 4 && pos < entries.size * 3 / 4)
    assert(VectorSearch.signAt(3, 5) == VectorSearch.signAt(3, 5)) // stable
  }

  // ---- piiStats ----

  test("piiStats counts emails, urls, digit runs and flags") {
    val docs = Seq(
      (1L, "write to alice.smith@corp.example.org today"),
      (2L, "fetch https://a.example.com/x and http://b.example.net"),
      (3L, "card 12345678901 and pin 9876543"),
      (4L, "nothing suspicious here 123 456")
    ).toDF("doc_id", "text")
    val out = TextStats.piiStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((1L, 0L, 0L, true)))
    assert(out(2L) == ((0L, 2L, 0L, true)))
    assert(out(3L) == ((0L, 0L, 2L, true)))
    assert(out(4L) == ((0L, 0L, 0L, false)))
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

  test("roundRobinShards ranks exactly like a global sort and deals r mod k") {
    val rnd  = new scala.util.Random(5)
    val rows = (1L to 97L).map(i => (i, 10L + rnd.nextInt(6).toLong)) // heavy size ties
    val got = Packing.roundRobinShards(rows.toDF("id", "sz"), "id", "sz", k = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val want = rows.sortBy { case (id, sz) => (-sz, id) }.zipWithIndex
      .map { case ((id, _), r) => id -> ((r.toLong, r.toLong % 4L)) }.toMap
    assert(got == want)
    // balance: shard totals differ by at most one max-size row
    val totals = rows.map { case (id, sz) => (want(id)._2, sz) }
      .groupBy(_._1).values.map(_.map(_._2).sum)
    assert(totals.max - totals.min <= 15L)
  }

  test("paddingWasteCurve: exact waste per tier, monotone toward zero") {
    // lengths 2, 2, 4, 10 -> total 18 tokens, 4 docs
    val docs = Seq("a b", "c d", "a b c d", "a b c d e f g h i j").toDF("text")
    val got = Packing.paddingWasteCurve(docs, "text", Seq(1, 2, 4))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // B=1: pad all to 10 -> 40 padded, waste (40-18)*10000 div 40 = 5500
    assert(got(1L) == ((4L, 18L, 40L, 5500L)))
    // B=2: [2,2]->max 2 (4 padded), [4,10]->max 10 (20) -> 24, waste 2500
    assert(got(2L) == ((4L, 18L, 24L, 2500L)))
    // B=4: every doc its own bucket -> zero waste
    assert(got(4L) == ((4L, 18L, 18L, 0L)))
  }

  test("paddingWasteCurve: a length group straddling bucket boundaries splits exactly") {
    // three equal-length docs, B=2: the single length group spans both
    // buckets (2 rows + 1 row), both padded to the same max -> zero waste
    val eq = Seq("a b c d e", "f g h i j", "k l m n o").toDF("text")
    val g1 = Packing.paddingWasteCurve(eq, "text", Seq(2))
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4))).head
    assert(g1 == ((3L, 15L, 0L)))
    // lengths 1, 2, 3 with B=2: bucket0 = [1,2] pad to 2 (4), bucket1 =
    // [3] (3) -> padded 7, total 6, waste 10000 div 7 = 1428
    val mix = Seq("a", "a b", "a b c").toDF("text")
    val g2 = Packing.paddingWasteCurve(mix, "text", Seq(2))
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).head
    assert(g2 == ((6L, 7L, 1428L)))
  }
}
