package graft.ext

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Specs for the dataset-curation operators (vocabulary/tf-idf, hash
  * split/sample, edit-distance verification, label centroids).
  */
class TrainingOpsSpec extends SparkFunSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "apple banana"),
    (3L, "cherry cherry cherry date"),
    (4L, "")
  ).toDF("id", "text")

  test("vocabulary: document frequency and total occurrences") {
    val v = TextStats.vocabulary(docs, "id", "text", k = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(v("apple") == (2L, 3L))   // docs 1,2; 3 occurrences
    assert(v("cherry") == (2L, 4L))  // docs 1,3; 4 occurrences
    assert(v("date") == (1L, 1L))
    assert(!v.contains(""))          // empty doc contributes nothing
  }

  test("vocabulary: top-k cuts on (df desc, token asc)") {
    val top2 = TextStats.vocabulary(docs, "id", "text", k = 2).collect().map(_.getString(0))
    // df: apple 2, banana 2, cherry 2, date 1 → ties broken by token order
    assert(top2.toSeq == Seq("apple", "banana"))
  }

  test("tfidfTop: rare tokens outrank common ones at equal tf") {
    val scored = TextStats.tfidfTop(docs, "id", "text", k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(4)).toMap
    // doc 3: tf(cherry)=3 df=2 vs tf(date)=1 df=1 → cherry 3*10000*4/2=60000 > date 40000
    assert(scored((3L, "cherry")) == 60000L)
    assert(scored((3L, "date")) == 40000L)
    // rnk within k and deterministic
    val r3 = TextStats.tfidfTop(docs, "id", "text", k = 1)
      .filter($"id" === 3L).collect()
    assert(r3.length == 1 && r3.head.getString(1) == "cherry")
  }

  test("hash split: deterministic, exhaustive, key-stable under resharding") {
    val ids = (1L to 1000L).toDF("k")
    val s1 = ids.withColumn("split", Sampling.splitLabel($"k", 9000))
    val s2 = ids.repartition(7).withColumn("split", Sampling.splitLabel($"k", 9000))
    val m1 = s1.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val m2 = s2.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m1 == m2) // partitioning never moves a key across the boundary
    val frac = m1.values.count(_ == "train").toDouble / m1.size
    assert(frac > 0.85 && frac < 0.95) // ~90% within hash noise
  }

  test("deterministicSample: subset property — a smaller sample is contained in a larger one") {
    val ids  = (1L to 500L).toDF("k")
    val s10  = Sampling.deterministicSample(ids, "k", 1000).collect().map(_.getLong(0)).toSet
    val s50  = Sampling.deterministicSample(ids, "k", 5000).collect().map(_.getLong(0)).toSet
    assert(s10.subsetOf(s50))
    assert(s10.nonEmpty && s50.size < 500)
  }

  test("editDistancePairs: zero for identical prefixes, exact DP distance otherwise") {
    val corpus = Seq((1L, "kitten"), (2L, "sitting"), (3L, "kitten")).toDF("id", "text")
    val cands  = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val d = TextDedup.editDistancePairs(cands, corpus, "id", "text", prefixLen = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(d((1L, 3L)) == 0L)
    assert(d((1L, 2L)) == 3L) // canonical kitten→sitting
  }

  test("stratifiedSample: exactly n per stratum, deterministic across reruns") {
    val df = (1L to 200L).map(i => (i, s"s${i % 4}")).toDF("k", "stratum")
    val s1 = Sampling.stratifiedSample(df, "stratum", "k", n = 5)
    val s2 = Sampling.stratifiedSample(df.repartition(9), "stratum", "k", n = 5)
    val g1 = s1.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(g1 == s2.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    assert(s1.groupBy("stratum").count().collect().forall(_.getLong(1) == 5L))
  }

  test("assignToNearestCentroid: vectors go to their own tight cluster, ties to smallest label") {
    val emb = Seq(
      (1L, 0, Array(0.0f, 0.0f)), (2L, 0, Array(0.1f, 0.0f)),
      (3L, 1, Array(5.0f, 5.0f)), (4L, 1, Array(5.1f, 5.0f))
    ).toDF("vec_id", "label", "embedding")
    val cent = VectorSearch.centroidsBp(emb, "embedding", "label")
    val got = VectorSearch.assignToNearestCentroid(emb, "vec_id", "embedding", cent)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
    // equidistant point → smallest label wins
    val tie = Seq((9L, 9, Array(2.55f, 2.5f))).toDF("vec_id", "label", "embedding")
    val t = VectorSearch.assignToNearestCentroid(tie, "vec_id", "embedding", cent).collect().head
    assert(t.getLong(1) == 0L)
  }

  test("kmeansFit separates well-separated blobs and is deterministic") {
    val rnd = new scala.util.Random(7)
    val blobA = (1L to 40L).map(i => (i, Array.fill(3)(0.0f + rnd.nextFloat() * 0.1f)))
    val blobB = (41L to 80L).map(i => (i, Array.fill(3)(5.0f + rnd.nextFloat() * 0.1f)))
    val df = (blobA ++ blobB).toDF("vec_id", "embedding")
    val cent = VectorSearch.kmeansFit(df, "vec_id", "embedding", k = 2, iters = 3)
    val cells = cent.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cells.size == 6) // 2 labels × 3 dims
    // each converged centroid sits in one blob's range (≈0.05 or ≈5.05 in bp)
    val mags = (0L to 1L).map(l => (1L to 3L).map(d => cells((l, d))).max)
    assert(mags.count(_ < 2500L) == 1 && mags.count(_ > 47500L) == 1,
      s"centroids did not converge to the two blobs: $cells")
    // assignment under the fit centroids groups the blobs exactly
    val assigned = VectorSearch.assignToNearestCentroid(df, "vec_id", "embedding", cent)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(blobA.map(b => assigned(b._1)).toSet.size == 1)
    assert(blobB.map(b => assigned(b._1)).toSet.size == 1)
    assert(assigned(1L) != assigned(41L))
    // rerun is bit-identical (hash seeding, integer math)
    val again = VectorSearch.kmeansFit(df, "vec_id", "embedding", k = 2, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(again == cells)
  }

  test("labelCentroids: exact integer-scaled means per (label, dim)") {
    val emb = Seq(
      (1L, 0, Array(1.0f, 2.0f)),
      (2L, 0, Array(3.0f, 4.0f)),
      (3L, 1, Array(-1.0f, 0.5f))
    ).toDF("vec_id", "label", "embedding")
    val c = VectorSearch.labelCentroids(emb, "embedding", "label")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(c((0L, 1L)) == (2L, 2000000.0)) // mean(1,3) µ-units
    assert(c((0L, 2L)) == (2L, 3000000.0)) // mean(2,4)
    assert(c((1L, 1L)) == (1L, -1000000.0))
    assert(c((1L, 2L)) == (1L, 500000.0))
  }

  test("importanceWeights: target-matching raw doc outscores off-target; target docs absent") {
    // buckets = 65536 → bucket = raw 16-bit token hash, "aa" and "zz"
    // land apart. Model: ct(aa)=4 cr(aa)=4, ct(zz)=0 cr(zz)=4, nt=4 nr=8.
    // pt(aa) = 5e6 div 65540 = 76, pr(aa) = 5e6 div 65544 = 76 → lr 1000
    // pt(zz) = 1e6 div 65540 = 15, pr(zz) = 5e6 div 65544 = 76 → lr 197
    val df = Seq(
      (10L, true, "aa aa aa aa"),  // defines the target distribution
      (1L, false, "aa aa aa aa"),  // raw, exactly target-like
      (2L, false, "zz zz zz zz")   // raw, fully off-target
    ).toDF("doc_id", "is_t", "text")
    val r = Sampling.importanceWeights(df, "doc_id", "text", "is_t", buckets = 65536)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map(1L -> ((4L, 1000L)), 2L -> ((4L, 197L))))
  }

  test("prioritySample: heavy row always wins; constant weights reduce to lowest-hash pick") {
    val rows = (1L to 40L).map(id => (id, if (id <= 20) "s" else "t", 1L))
    val heavy = rows.map { case (id, st, _) => (id, st, if (id == 7L) 1000000000L else 1L) }
      .toDF("id", "stratum", "w")
    val winner = Sampling.prioritySample(heavy, "stratum", "id", "w", k = 1)
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    // min heavy priority = 1e9·65536 div 65536 = 1e9 > max light = 65536
    assert(winner("s") == 7L)
    val flat = rows.toDF("id", "stratum", "w")
    val picked = Sampling.prioritySample(flat, "stratum", "id", "w", k = 3)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    // exact local replay: priority = 65536 div (h+1), top-3 per stratum,
    // ties by key — must match the operator bit-for-bit
    val hs = flat.select(col("id"), col("stratum"), Sampling.hashBucket16(col("id")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = hs.groupBy(_._2).toSeq.flatMap { case (st, g) =>
      g.map { case (id, _, h) => (65536L / (h + 1L), id) }
        .sortBy { case (p, id) => (-p, id) }.take(3).map { case (_, id) => (st, id) }
    }.toSet
    assert(picked == expected)
  }

  test("prioritySample: shard decomposition is invisible — shards=1 and shards=16 agree") {
    val df = (1L to 60L).map(id => (id, "only", id % 7 + 1)).toDF("id", "stratum", "w")
    def run(sh: Int) = Sampling.prioritySample(df, "stratum", "id", "w", k = 5, shards = sh)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(run(1) == run(16))
    assert(run(16).size == 5)
  }

  test("domainReweight: uniform-target rates, keep-all floor, admission matches mixtureSample") {
    // heavy: 3 docs × 100 tokens = 300; light: 3 docs × 20 tokens = 60
    // total 360, target per source 180 → heavy rate = 3600000 div 600
    // capped... = min(10000, 360*10000 div (2*300)) = 6000; light = 10000
    val rows = (1L to 3L).map(id => (id, "heavy", 100L)) ++
               (4L to 6L).map(id => (id, "light", 20L))
    val df = rows.toDF("doc_id", "source", "n_tokens")
    val out = Sampling.domainReweight(df, "source", "doc_id", "n_tokens")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val (hb, ht, hr, _, _) = out("heavy")
    assert((hb, ht, hr) == ((3L, 300L, 6000L)))
    // under-represented source keeps everything (rate floor at 10000)
    assert(out("light") == ((3L, 60L, 10000L, 3L, 60L)))
    // admission replays mixtureSample's deterministic hash rule exactly
    val admittedHeavy = Sampling.mixtureSample(
      df.filter(col("source") === "heavy"), "source", "doc_id",
      Map("heavy" -> 6000), defaultBp = 0).count()
    assert(out("heavy")._4 == admittedHeavy)
    assert(out("heavy")._5 == admittedHeavy * 100L)
  }

  test("temperatureReweight: sqrt-scaled rates, cap at keep-all, hash admission") {
    // heavy 300 tokens, light 60: isqrt = 17 / 7, S = 24, total = 360
    // heavy: ((360·10000 div 24)·17) div 300 = (150000·17) div 300 = 8500
    // light: (150000·7) div 60 = 17500 → capped at 10000
    val rows = (1L to 3L).map(id => (id, "heavy", 100L)) ++
               (4L to 6L).map(id => (id, "light", 20L))
    val df = rows.toDF("doc_id", "source", "n_tokens")
    val out = Sampling.temperatureReweight(df, "source", "doc_id", "n_tokens")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val (hb, ht, hs, hr, _, _) = out("heavy")
    assert((hb, ht, hs, hr) == ((3L, 300L, 17L, 8500L)))
    assert(out("light") == ((3L, 60L, 7L, 10000L, 3L, 60L)))
    // between uniform (q128: 6000) and raw (10000): temperature softens,
    // never inverts, the down-weighting of the over-represented source
    assert(hr > 6000L && hr < 10000L)
    // admission is the shared deterministic hash rule
    val admittedHeavy = Sampling.mixtureSample(
      df.filter(col("source") === "heavy"), "source", "doc_id",
      Map("heavy" -> 8500), defaultBp = 0).count()
    assert(out("heavy")._5 == admittedHeavy)
  }

  test("paretoFront equals the brute-force dominance model, keeps ties, drops dominated") {
    val rnd  = new scala.util.Random(13)
    val rows = (1L to 80L).map(i => (i, rnd.nextInt(6).toLong, rnd.nextInt(10).toLong))
    val got = Sampling.paretoFront(rows.toDF("id", "q", "t"), "id", "q", "t")
      .collect().map(r => r.getLong(0)).toSet
    def dominated(a: (Long, Long, Long)) = rows.exists { b =>
      b._1 != a._1 && b._2 >= a._2 && b._3 <= a._3 && (b._2 > a._2 || b._3 < a._3)
    }
    val want = rows.filterNot(dominated).map(_._1).toSet
    assert(got == want)
    // equal (q, t) twins both survive
    val twins = Seq((1L, 5L, 1L), (2L, 5L, 1L), (3L, 4L, 2L)).toDF("id", "q", "t")
    val tw = Sampling.paretoFront(twins, "id", "q", "t")
      .collect().map(_.getLong(0)).toSet
    assert(tw == Set(1L, 2L))
  }

  test("rendezvousShard: in-range, md5-replayable, and stable under k -> k+1") {
    val keys = (1L to 300L).toDF("id")
    val out = keys.select(col("id"),
        Sampling.rendezvousShard(col("id"), 8).as("r8"),
        Sampling.rendezvousShard(col("id"), 9).as("r9"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.forall { case (_, r8, r9) => r8 >= 0 && r8 < 8 && r9 >= 0 && r9 < 9 })
    // exact md5 replay of the argmax-with-smallest-j rule
    val md = java.security.MessageDigest.getInstance("MD5")
    def h16(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString, 16)
    def hrw(id: Long, k: Int): Long = {
      val hs = (0 until k).map(j => h16(s"$id|$j"))
      hs.indexOf(hs.max).toLong
    }
    assert(out.forall { case (id, r8, r9) => r8 == hrw(id, 8) && r9 == hrw(id, 9) })
    // the HRW guarantee: a key moves iff the NEW shard wins it — so the
    // only moves are to shard 8, and far fewer keys move than under mod
    assert(out.forall { case (_, r8, r9) => r8 == r9 || r9 == 8L })
    val moved = out.count { case (_, r8, r9) => r8 != r9 }
    assert(moved < 300 / 4, s"HRW moved $moved of 300 — expected ~1/9")
  }

  test("temperatureSweep: uniform at alpha 0, proportional at 1000, sqrt between") {
    val df = Seq(("a", "t1 t2"), ("b", "t1 t2 t3 t4 t5 t6 t7 t8")).toDF("lang", "text")
    val got = Sampling.temperatureSweep(df, "lang", "text", Seq(0, 500, 1000))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(got((0L, "a")) == 5000L && got((0L, "b")) == 5000L)
    // sqrt(2)*1000 = 1414, sqrt(8)*1000 = 2828 -> 3333 / 6666 bp
    assert(got((500L, "a")) == 3333L && got((500L, "b")) == 6666L)
    assert(got((1000L, "a")) == 2000L && got((1000L, "b")) == 8000L)
  }

  test("mixtureConcentration: uniform mixture reads zero Gini; skew concentrates every metric") {
    val even = Seq(("a", "t1 t2"), ("b", "t1 t2"), ("c", "t1 t2"), ("d", "t1 t2"))
      .toDF("src", "text")
    val e = Sampling.mixtureConcentration(even, "src", "text").collect().head
    // H = ln 4 = 1386 m-nats, eff = round(1000*e^1.386) = 3999, gini 0
    assert((e.getLong(0), e.getLong(1), e.getLong(2), e.getLong(3),
      e.getLong(4), e.getLong(5), e.getLong(6)) ==
      ((4L, 8L, 1386L, 3999L, 0L, 2500L, 10000L)))
    val skew = Seq(("a", "t1 t2"), ("b", "t1 t2 t3 t4 t5 t6 t7 t8"))
      .toDF("src", "text")
    val s2 = Sampling.mixtureConcentration(skew, "src", "text").collect().head
    // H = 2303 - (2*693 + 8*2079) div 10 = 502; eff = e^0.502 -> 1652;
    // gini = (2*(1*2+2*8) - 3*10)*1000 div 20 = 300; top1 = 8000 bp
    assert((s2.getLong(2), s2.getLong(3), s2.getLong(4), s2.getLong(5)) ==
      ((502L, 1652L, 300L, 8000L)))
  }

  test("unimaxBudget: capped prefix + water-filled head, and both degenerate budgets") {
    val df = Seq(
      ("a", "t1 t2"),                                   // 2 tokens, cap 4
      ("b", "t1 t2 t3"),                                // 3 tokens, cap 6
      ("c", "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")           // 10 tokens, cap 20
    ).toDF("lang", "text")
    // B=16, E=2, k=3: a capped (4*3 <= 16), b capped (6*2 <= 12),
    // c uncapped -> (16-10) div 1 = 6 tokens = 0.6 epochs
    val out = Sampling.unimaxBudget(df, "lang", "text", budgetTokens = 16L, maxEpochs = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out("a") == ((true, 4L, 2000L)))
    assert(out("b") == ((true, 6L, 2000L)))
    assert(out("c") == ((false, 6L, 600L)))
    // budget below the smallest fair share: NOBODY capped, equal split
    val lo = Sampling.unimaxBudget(df, "lang", "text", budgetTokens = 9L, maxEpochs = 2)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(lo == Map("a" -> 3L, "b" -> 3L, "c" -> 3L))
    // budget above the cap total: EVERYONE capped at maxEpochs, leftover unspent
    val hi = Sampling.unimaxBudget(df, "lang", "text", budgetTokens = 1000L, maxEpochs = 2)
      .collect().map(r => r.getString(0) -> ((r.getBoolean(3), r.getLong(4)))).toMap
    assert(hi == Map("a" -> ((true, 4L)), "b" -> ((true, 6L)), "c" -> ((true, 20L))))
  }

  test("neymanAllocation: budget follows N_h*S_h; zero-variance strata weigh nothing") {
    // A: sd 0 -> weight 0; B: sd 11.547 -> weight round(4*11.547) = 46;
    // C: sd 70.711 -> weight round(2*70.711) = 141; wtot = 187
    val df = (Seq.fill(4)(("A", 10L)) ++
      Seq(("B", 0L), ("B", 20L), ("B", 0L), ("B", 20L), ("C", 0L), ("C", 100L)))
      .toDF("stratum", "v")
    val got = Sampling.neymanAllocation(df, "stratum", "v", budget = 100L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got("A") == ((4L, 10L, 0L, 0L, 0L, 40L)))
    assert(got("B") == ((4L, 10L, 12L, 46L, 100L * 46L / 187L, 40L)))
    assert(got("C") == ((2L, 50L, 71L, 141L, 100L * 141L / 187L, 20L)))
  }

  test("mwDomainWeights: hand-walked 2-round multiplicative-weights update") {
    // A: mean loss 0; B: mean loss 3000. η = 500 milli, 2 rounds.
    // r1: avg = 1500 → B's mult = 1 + 0.5·1.5 = 1.75 → w = (1000, 1750)
    // r2: avg = 5250000 div 2750 = 1909 → excess_B = 1091 →
    //     mult_B = 1000 + 545 → w_B = 1750·1545 div 1000 = 2703
    // iterate averages: (1000, (1750+2703) div 2 = 2226); shares of 3226.
    val df = Seq(("A", 0L), ("A", 0L), ("B", 2000L), ("B", 4000L))
      .toDF("domain", "loss")
    val got = Sampling.mwDomainWeights(df, "domain", "loss",
        rounds = 2, etaMilli = 500L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("A") == ((2L, 0L, 1000L, 1000L * 10000L / 3226L)), got.toString)
    assert(got("B") == ((2L, 3000L, 2226L, 2226L * 10000L / 3226L)), got.toString)
  }

  test("mwDomainWeights: empty input returns an empty frame, not a zero-division") {
    // an empty (or fully n_docs=0-filtered) moments frame used to reach
    // the driver loop with wSum = 0 and throw ArithmeticException
    val empty = Seq.empty[(String, Long)].toDF("domain", "loss")
    val out = Sampling.mwDomainWeights(empty, "domain", "loss",
      rounds = 2, etaMilli = 500L)
    assert(out.columns.toSeq ==
      Seq("domain", "n_docs", "mean_loss_milli", "weight_milli", "share_bp"))
    assert(out.count() == 0L)
    // zero-doc moments filter to the same empty path
    val zeroDocs = Seq(("A", 0L, 0L)).toDF("domain", "n_docs", "loss_sum")
    assert(Sampling.mwDomainWeightsFromMoments(zeroDocs,
      rounds = 2, etaMilli = 500L).count() == 0L)
  }

  test("mwDomainWeights: the bounded-vocabulary contract is mechanical (maxDomains cap)") {
    // an unbounded domain column must fail loudly on the limit-capped
    // collect — it can never materialize more than maxDomains+1 driver rows
    val wide = (1 to 10).map(i => (s"d$i", 100L)).toDF("domain", "loss")
    val ex = intercept[IllegalArgumentException] {
      Sampling.mwDomainWeightsFromMoments(
        wide.groupBy(col("domain"))
          .agg(count(lit(1)).as("n_docs"), sum(col("loss")).as("loss_sum")),
        rounds = 2, etaMilli = 500L, maxDomains = 4)
    }
    assert(ex.getMessage.contains("maxDomains"))
    // at exactly the cap it runs — 10 domains under maxDomains = 10
    val ok = Sampling.mwDomainWeights(wide, "domain", "loss",
      rounds = 2, etaMilli = 500L)
    assert(ok.count() == 10L)
  }

  test("neymanAllocation: exact past the int64 Σy² wrap (DECIMAL staging at the bound)") {
    // y = 3.2e9 squares to 1.024e19 > 2⁶³ — the pre-guard BIGINT staging
    // wrapped negative here and the greatest(0, …) clamp silently zeroed
    // the stratum's weight; the DECIMAL(38,0) staging keeps it exact.
    val y = 3200000000L
    val df = Seq(("D", y), ("D", 0L)).toDF("stratum", "v")
    val r = Sampling.neymanAllocation(df, "stratum", "v", budget = 100L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // variance = (Σy² − (Σy)²/n)/(n−1) = 1.024e19 − 5.12e18 = 5.12e18,
    // every double step exactly representable
    val sd = math.round(math.sqrt(5.12e18))
    val w  = math.round(2 * math.sqrt(5.12e18))
    assert(r("D") == ((2L, y / 2, sd, w)),
      s"expected sd=$sd w=$w, got ${r("D")}")
  }
}
