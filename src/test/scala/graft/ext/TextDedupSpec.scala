package graft.ext

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkFunSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "the quick brown fox"),      // exact dup of 1
    (3L, "the quick brown wolf"),     // near dup of 1 (3/5 shingle overlap... actually 2/4∪4)
    (4L, "completely different words here"),
    (5L, "x")                         // single token → no 2-gram shingles
  ).toDF("id", "text")

  test("wordShingles produces n-1 shingles, empty below n") {
    val sh = docs.select($"id", TextDedup.wordShingles(TextDedup.tokens($"text"), 2).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(1L) == Seq("the quick", "quick brown", "brown fox"))
    assert(sh(5L).isEmpty)
  }

  test("minhash signatures: identical text → identical signature") {
    val sigs = TextDedup.minhashSignatures(docs, "id", "text", k = 4, shingleN = 2)
    val rows = sigs.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(rows(1L) == rows(2L))
    assert(rows(1L) != rows(4L))
    assert(!rows.contains(5L)) // no shingles → absent, documented behavior
  }

  test("lshCandidates finds the exact dup with all signatures matching") {
    val sigs  = TextDedup.minhashSignatures(docs, "id", "text", k = 4, shingleN = 2)
    val cands = TextDedup.lshCandidates(sigs, "id", k = 4, rowsPerBand = 2).collect()
    val dup   = cands.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(dup.isDefined && dup.get.getLong(2) == 4L && dup.get.getDouble(3) == 1.0)
  }

  test("jaccardPairs: identical docs have jaccard 1, disjoint pairs absent") {
    val blocked = docs.withColumn("blk", lit("b"))
    val pairs = TextDedup.jaccardPairs(blocked, "id", "text", "blk", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(!pairs.contains((1L, 4L))) // no common shingles
    assert(pairs((1L, 3L)) > 0 && pairs((1L, 3L)) < 1.0)
  }

  test("jaccardPairs matches a naive set-intersection model on random corpora") {
    val rnd   = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val corpus = (1L to 30L).map { id =>
      val len = 2 + rnd.nextInt(8)
      (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "), s"blk${id % 3}")
    }
    def shingles(text: String): Set[String] =
      text.split("\\s+").toSeq.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSet
    val expected = (for {
      (ia, ta, ba) <- corpus; (ib, tb, bb) <- corpus
      if ba == bb && ia < ib
      common = (shingles(ta) intersect shingles(tb)).size if common >= 1
    } yield (ia, ib) -> (shingles(ta).size.toLong, shingles(tb).size.toLong, common.toLong)).toMap
    val got = TextDedup.jaccardPairs(corpus.toDF("id", "text", "blk"), "id", "text", "blk", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected)
  }

  test("jaccardPairs maxDocFreq drops hot shingles but keeps discriminative ones") {
    // stop-word-heavy corpus: every doc shares the hot bigram "of the";
    // docs 1/2 also share the discriminative "alpha beta".
    val corpus = (1L to 20L).map { id =>
      val rare = if (id <= 2) "alpha beta " else s"uniq$id tok$id "
      (id, rare + "of the", "b")
    }
    val df = corpus.toDF("id", "text", "blk")
    val unguarded = TextDedup.jaccardPairs(df, "id", "text", "blk", 2)
    val guarded   = TextDedup.jaccardPairs(df, "id", "text", "blk", 2, maxDocFreq = 5)
    // hot shingle ("of the", df=20 > 5) joins every pair unguarded: 190 pairs
    assert(unguarded.count() == 190L)
    // guarded: only the discriminative pair (1,2) survives, and its jaccard
    // is exact over the SUB-CAP shingle sets (sizes recomputed post-filter)
    val g = guarded.collect()
    assert(g.length == 1)
    val r = g.head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 2L)))
    assert(r.getDouble(5) == 1.0) // both docs' sub-cap sets are exactly {"alpha beta", "beta of"}
  }

  test("prefixFilterJaccardPairs: exact dup at 10000 bp, sub-threshold pairs pruned") {
    val pairs = TextDedup.prefixFilterJaccardPairs(docs, "id", "text", 2, thresholdBp = 8000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(5)).toMap
    assert(pairs((1L, 2L)) == 10000L)
    // (1,3) share 2 of 4 distinct shingles → J = 2/4 = 5000 bp < 8000 → pruned
    assert(!pairs.contains((1L, 3L)))
    assert(!pairs.contains((1L, 4L)))
  }

  test("prefixFilterJaccardPairs is EXACT: equals brute-force all-pairs on random corpora") {
    val rnd   = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val corpus = (1L to 40L).map { id =>
      val n = 3 + rnd.nextInt(8)
      id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val df = corpus.toDF("id", "text")
    for (t <- Seq(3000, 5000, 8000)) {
      val got = TextDedup.prefixFilterJaccardPairs(df, "id", "text", 2, t)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(5)).toMap
      // brute-force model: distinct 2-gram shingle sets, all pairs
      val sets = corpus.map { case (id, text) =>
        id -> text.split("\\s+").sliding(2).map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty).toMap
      val want = (for {
        (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
        inter = (sa & sb).size if inter > 0
        bp = inter.toLong * 10000L / (sa.size + sb.size - inter).toLong if bp >= t
      } yield (ia, ib) -> bp).toMap
      assert(got == want, s"threshold $t")
    }
  }

  test("bBitEstimates: exact dup estimates 10000 bp; sub-floor collision clamps to 0") {
    val sigs = TextDedup.minhashSignatures(docs, "id", "text", k = 8, shingleN = 2)
    val est = TextDedup.bBitEstimates(sigs, "id", k = 8, rowsPerBand = 2, b = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(est((1L, 2L)) == ((8L, 10000L))) // identical sigs → all low bits match
    // clamp path: a crafted pair band-matches on (sig0, sig1) but the low
    // bits of the other six signatures all differ → m=2, 2·4−8=0 → 0 bp
    val fake = Seq(
      Seq(1L) ++ Seq.fill(8)("0" * 32),
      Seq(2L) ++ Seq("0" * 32, "0" * 32) ++ Seq.fill(6)("0" * 31 + "1")
    )
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType) +:
        (0 until 8).map(i => org.apache.spark.sql.types.StructField(s"sig$i",
          org.apache.spark.sql.types.StringType)))
    val fakeDf = spark.createDataFrame(
      spark.sparkContext.parallelize(fake.map(org.apache.spark.sql.Row.fromSeq)), schema)
    val clamp = TextDedup.bBitEstimates(fakeDf, "id", k = 8, rowsPerBand = 2, b = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(clamp((1L, 2L)) == ((2L, 0L)))
  }

  test("simhash32: identical text → distance 0; different text → > 0") {
    val sh = TextDedup.simhash32(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(4L)) > 0)
    // values are 32-bit
    sh.values.foreach(v => assert(v >= 0 && v <= 0xffffffffL))
  }

  test("winnowFingerprints: deterministic, short docs drop out") {
    val fp1 = TextDedup.winnowFingerprints(docs, "id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(fp1(1L) == fp1(2L))
    assert(!fp1.contains(5L)) // len 1 < k=8 → no grams
    assert(fp1(1L)._1 > 0)
  }

  test("containmentPairs: a contained snippet scores 10000 bp while Jaccard stays low") {
    val corpus = Seq(
      (1L, "one two three four five six seven eight nine ten", "s"),
      (2L, "one two three", "s"), // all 2 snippet shingles inside doc 1
      (3L, "alpha beta gamma delta", "s")
    ).toDF("id", "text", "src")
    val r = TextDedup.containmentPairs(corpus, "id", "text", "src", shingleN = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getLong(5), x.getLong(6), x.getLong(7)))).toMap
    // doc 2 (2 shingles) ⊆ doc 1 (9 shingles): containment_b = 10000,
    // containment_a = 2*10000 div 9 = 2222
    assert(r == Map((1L, 2L) -> ((2222L, 10000L, 10000L))))
  }

  test("simhashNearDups equals the brute-force hamming filter (pigeonhole completeness)") {
    // mixed corpus: exact copies (hamming 0), light perturbations (small
    // hamming), unrelated docs — enough docs that band buckets collide
    val rnd   = new scala.util.Random(7)
    val vocab = Vector("red", "green", "blue", "fox", "wolf", "jumps", "over", "lazy", "dog", "cat")
    val base = (1L to 25L).map { id =>
      (id, Seq.fill(10 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val corpus = (base ++
      base.filter(_._1 % 5 == 0).map { case (id, t) => (id + 100, t) } ++          // exact
      base.filter(_._1 % 5 == 1).map { case (id, t) => (id + 200, t + " tail") })  // near
      .toDF("id", "text")
    val sh = TextDedup.simhash32(corpus, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (for {
      (ia, ha) <- sh; (ib, hb) <- sh
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib) -> java.lang.Long.bitCount(ha ^ hb).toLong).toMap
    val got = TextDedup.simhashNearDups(corpus, "id", "text", nBands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(got == expected)           // complete (pigeonhole) AND precise (verify step)
    assert(expected.exists(_._2 == 0L)) // the planted exact copies are in there
  }

  test("lshRecallCurve: exact duplicates land in bucket 10 with full recall; " +
      "disjoint docs contribute no true pair") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),  // exact dup of 2 → bucket 10
      (2L, "alpha beta gamma delta epsilon"),  //   (identical sigs → must be found)
      (3L, "totally different words here now"),// disjoint from everything
      (4L, "unrelated content stream tokens")  // disjoint from everything
    ).toDF("id", "text")
    val curve = TextDedup.lshRecallCurve(corpus, "id", "text",
        k = 8, rowsPerBand = 2, shingleN = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // the only shingle-sharing pair is (1,2): jaccard 1 → bucket 10,
    // identical signatures collide in every band → recall 10000 bp
    assert(curve == Map(10L -> ((1L, 1L, 10000L))))
  }

  test("lshRecallCurve buckets by exact-integer decile and counts misses") {
    // (1,2) share 2 of 6 distinct shingles: jaccard 2/(4+4-2)=1/3 → bucket 3.
    // Whether LSH finds the pair is probabilistic per the fixed digests, so
    // assert the truth-side columns and that n_found ∈ {0, 1}.
    val corpus = Seq(
      (1L, "a b c d e"),   // shingles: "a b","b c","c d","d e"
      (2L, "a b c x y")    // shingles: "a b","b c","c x","x y" → 2 common
    ).toDF("id", "text")
    val rows = TextDedup.lshRecallCurve(corpus, "id", "text",
        k = 8, rowsPerBand = 2, shingleN = 2).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L)   // bucket 3, one true pair
    assert(r.getLong(2) == 0L || r.getLong(2) == 1L)
    assert(r.getLong(3) == r.getLong(2) * 10000L)
  }

  test("incrementalDupCheck: exact copy hits the index, fresh and unshingleable docs do not") {
    val index = docs.filter($"id" <= 4L)
    val idxBands = TextDedup.lshBands(
      TextDedup.minhashSignatures(index, "id", "text", 8, 2), "id", 8, 2)
    val batch = Seq(
      (10L, "the quick brown fox"),          // exact copy of index doc 1 (and 2)
      (11L, "entirely novel content tokens"),// fresh
      (12L, "y")                             // too short to shingle
    ).toDF("id", "text")
    val r = TextDedup.incrementalDupCheck(batch, idxBands, "id", "text", 8, 2, 2)
      .collect().map(x => x.getLong(0) ->
        ((Option(x.get(1)).map(_.asInstanceOf[Long]), x.getLong(2), x.getBoolean(3)))).toMap
    assert(r(10L)._3 && r(10L)._1.contains(1L) && r(10L)._2 >= 2L) // dup_of = min(1,2)
    assert(r(11L) == ((None, 0L, false)))
    assert(r(12L) == ((None, 0L, false)))
  }

  test("normalizedDupStats: raw key misses case/ws variants, normalized key collapses them") {
    val df = Seq(
      (1L, "hello world", "a"),
      (2L, "  Hello   WORLD ", "a"), // normalizes to doc 1's key
      (3L, "other text", "a"),
      (4L, "unique", "b"),
      (5L, "unique", "b")            // exact dup, caught by BOTH keys
    ).toDF("doc_id", "text", "source")
    val r = TextDedup.normalizedDupStats(df, "doc_id", "text", "source")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))).toMap
    // a: 3 docs, 3 raw groups (variant differs raw), 2 norm groups
    assert(r("a") == ((3L, 3L, 2L, 0L, 3333L)))
    // b: exact dup collapses under both keys
    assert(r("b") == ((2L, 1L, 1L, 5000L, 5000L)))
  }

  test("normalizeForDedup is a fixpoint and collapses only case/whitespace") {
    val df = Seq((1L, "  A  b\tC ")).toDF("id", "t")
      .select(TextDedup.normalizeForDedup(col("t")).as("n"))
    val once = df.collect().head.getString(0)
    assert(once == "a b c")
    val twice = Seq((1L, once)).toDF("id", "t")
      .select(TextDedup.normalizeForDedup(col("t")).as("n")).collect().head.getString(0)
    assert(twice == once)
  }

  test("lshParameterSweep: S-curve areas match the closed form; chosen minimizes cost") {
    val out = TextDedup.lshParameterSweep(spark, k = 4, thresholdBp = 5000L)
      .collect().map(r => (r.getAs[Long]("b"), r.getAs[Long]("r")) ->
        ((r.getAs[Long]("fp_micro"), r.getAs[Long]("fn_micro"), r.getAs[Boolean]("chosen"))))
      .toMap
    assert(out.keySet == Set((4L, 1L), (2L, 2L), (1L, 4L)))
    // independent recomputation of each integral
    def areas(b: Int, r: Int): (Long, Long) = {
      val ps = (1 until 100).map { cp =>
        val s = cp / 100.0
        cp -> (1.0 - math.pow(1.0 - math.pow(s, r), b))
      }
      (math.round(ps.filter(_._1 * 100 < 5000).map(_._2).sum * 10000),
       math.round(ps.filter(_._1 * 100 >= 5000).map(p => 1.0 - p._2).sum * 10000))
    }
    for (((b, r), (fp, fn, _)) <- out)
      assert((fp, fn) == areas(b.toInt, r.toInt), s"(b=$b, r=$r)")
    // exactly one chosen row, and it has the minimal cost
    val costs = out.map { case (k, (fp, fn, ch)) => (k, fp + fn, ch) }
    val minCost = costs.map(_._2).min
    assert(costs.count(_._3) == 1 && costs.filter(_._3).forall(_._2 == minCost))
    // banding beats both degenerate extremes at a mid threshold
    assert(out((2L, 2L))._3)
  }

  test("dedupYieldCurve: victims are larger ids per tier; yield is monotone in the cutoff") {
    val docs = Seq(
      (1L, "a b c d e"),  // kept at every tier
      (2L, "a b c d e"),  // exact dup of 1 (jaccard 10000): dropped everywhere
      (3L, "p q r s t"),
      (4L, "p q r s t x") // near-dup of 3: shingles 4/... -> 4 common, union 6 -> 6666
    ).toDF("id", "text")
    val got = TextDedup.dedupYieldCurve(docs, "id", "text",
        shingleN = 2, tiers = Seq(6000, 9000))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // loose tier 6000: both 2 and 4 are victims -> 2 of 4 docs kept,
    // tokens kept = 21 - 5 - 6 = 10
    assert(got(6000L) == ((4L, 2L, 21L, 10L, 5000L)))
    // tight tier 9000: only the exact dup drops
    assert(got(9000L) == ((4L, 3L, 21L, 16L, 7500L)))
  }

  test("simhashIncremental: redelivery dropped, index and in-batch near-dups both surface") {
    val corpus = Seq((1L, "a b c d e f")).toDF("id", "text")
    val index = TextDedup.simhashIndex(corpus, "id", "text").persist()
    index.count()
    val batch = Seq(
      (1L, "a b c d e f"),  // redelivered id: must not re-emit
      (2L, "a b c d e f"),  // near-dup of INDEXED 1 (hamming 0)
      (3L, "z y x w v u"),  // genuinely fresh, unrelated
      (4L, "a b c d e f")   // in-batch dup of 2
    ).toDF("id", "text")
    val got = TextDedup.simhashIncremental(batch, index, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    index.unpersist()
    assert(got == Set((2L, 1L, 0L), (2L, 4L, 0L), (4L, 1L, 0L), (4L, 2L, 0L)))
  }

  test("simhash64: halves stay unsigned-32-bit; identical text → hamming 0, disjoint > 0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "zz yy xx ww vv uu tt ss")).toDF("id", "text")
    val sh = TextDedup.simhash64(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    sh.values.foreach { case (hi, lo) =>
      assert(hi >= 0L && hi < (1L << 32) && lo >= 0L && lo < (1L << 32))
    }
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    assert(ham(sh(1L), sh(2L)) == 0)
    assert(ham(sh(1L), sh(3L)) > 0)
  }

  test("simhash64Incremental: redelivery dropped, 16-bit-band probe surfaces index and in-batch dups") {
    val corpus = Seq((1L, "a b c d e f")).toDF("id", "text")
    val index = TextDedup.simhash64Index(corpus, "id", "text").persist()
    index.count()
    val batch = Seq(
      (1L, "a b c d e f"),  // redelivered id: must not re-emit
      (2L, "a b c d e f"),  // near-dup of INDEXED 1 (hamming 0)
      (3L, "z y x w v u"),  // genuinely fresh, unrelated
      (4L, "a b c d e f")   // in-batch dup of 2
    ).toDF("id", "text")
    val got = TextDedup.simhash64Incremental(batch, index, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    index.unpersist()
    assert(got == Set((2L, 1L, 0L), (2L, 4L, 0L), (4L, 1L, 0L), (4L, 2L, 0L)))
  }

  test("dedupClusterAudit: zero-sim pairs reconstructed, singletons and oversized clusters gated") {
    val df = Seq(
      (1L, 10L, "a b c"),   // cluster 10: 1~2 identical, 3 unrelated
      (2L, 10L, "a b c"),
      (3L, 10L, "x y z"),
      (4L, 20L, "p q r s"), // cluster 20: one near-dup pair
      (5L, 20L, "p q r t"),
      (6L, 30L, "solo doc here"),          // singleton: excluded
      (7L, 40L, "m n"), (8L, 40L, "m n"),  // oversized vs cap=3? no — 2 ok
      (9L, 50L, "k1 k2"), (10L, 50L, "k1 k2"),
      (11L, 50L, "k1 k2"), (12L, 50L, "k1 k2") // 4 members > cap 3: excluded
    ).toDF("id", "cluster", "text")
    val got = TextDedup.dedupClusterAudit(df, "id", "text", "cluster",
        shingleN = 2, maxClusterSize = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // cluster 10: 3 pairs owed, only (1,2) materializes (bp 10000) ->
    // min forced to 0 by the shortfall, mean = 10000 div 3
    assert(got(10L) == ((3L, 3L, 1L, 0L, 3333L)))
    // cluster 20: {p q, q r, r s} vs {p q, q r, r t}: 2/4 -> 5000 bp
    assert(got(20L) == ((2L, 1L, 1L, 5000L, 5000L)))
    assert(got(40L) == ((2L, 1L, 1L, 10000L, 10000L)))
    assert(!got.contains(30L) && !got.contains(50L))
  }

  test("simhashDistanceCurve: exact dups land in bucket 10 at hamming 0 and full recall") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d"),        // exact dup pair
      (3L, "a b q r"), (4L, "m n q r")         // partial-overlap pair (via "q r")
    ).toDF("id", "text")
    val got = TextDedup.simhashDistanceCurve(docs, "id", "text",
        shingleN = 2, thresholds = Seq(0, 3))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // the exact-dup pair: jaccard 1 -> bucket 10, hamming 0, both recalls
    assert(got(10L) == ((1L, 0L, 10000L, 10000L)))
    // every decile's recall at t=3 is >= recall at t=0 (monotone in t)
    got.values.foreach { case (_, _, r0, r3) => assert(r3 >= r0) }
  }

  test("rougeNPairs: clipped multiset overlap, asymmetric p/r, zero-overlap pairs kept") {
    val d = Seq(
      (1L, "a b a b a b"),  // bigrams: "a b"x3, "b a"x2 -> n_a = 5
      (2L, "a b c d"),      // bigrams: "a b", "b c", "c d" -> n_b = 3
      (3L, "x y z")         // no shared bigram with 1
    ).toDF("id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = TextDedup.rougeNPairs(pairs, d, "id", "text", n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // columns after the two pair-id join keys: (n_a, n_b, n_overlap, p, r, f)
    // overlap(1,2) = min(3, 1) = 1 -- CLIPPED: the 3 repeats of "a b" in
    // doc 1 count once against doc 2's single copy
    // p = 10000/5 = 2000, r = 10000/3 = 3333, f = 2*2000*3333 div 5333 = 2499
    assert(out((1L, 2L)) == ((5L, 3L, 1L, 2000L, 3333L, 2499L)))
    // zero-overlap candidate pair is KEPT with score 0, not dropped
    assert(out((1L, 3L)) == ((5L, 2L, 0L, 0L, 0L, 0L)))
  }
}
