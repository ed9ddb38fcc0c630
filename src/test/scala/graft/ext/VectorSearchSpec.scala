package graft.ext

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class VectorSearchSpec extends SparkFunSuite {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1f, 0f, 0f)),
    (2L, Array(2f, 0f, 0f)),   // same direction as 1 → cosine 1
    (3L, Array(0f, 1f, 0f)),   // orthogonal to 1
    (4L, Array(-1f, 0f, 0f))   // opposite → cosine -1
  ).toDF("id", "embedding")

  test("cosine: colinear 1, orthogonal 0, opposite -1") {
    val sims = vecs.as("a").join(vecs.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        VectorSearch.cosine(
          VectorSearch.asDouble(col("a.embedding")),
          VectorSearch.asDouble(col("b.embedding"))).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sims((1L, 2L)) == 1.0)
    assert(sims((1L, 3L)) == 0.0)
    assert(sims((1L, 4L)) == -1.0)
  }

  test("bruteForceTopK ranks by similarity with id tiebreak") {
    val q = vecs.filter($"id" === 1L)
    val c = vecs.filter($"id" =!= 1L)
    val top = VectorSearch.bruteForceTopK(q, c, "id", "embedding", "id", "embedding", k = 3)
      .orderBy("rnk").collect()
    assert(top.map(_.getLong(1)).toSeq == Seq(2L, 3L, 4L))
    assert(top.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L))
  }

  test("quantizedTopK ranks by exact integer dot of the reconstructions") {
    val q = Seq((100L, Array(1.0f, 0.5f))).toDF("id", "embedding")
    val c = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.9f, 0.45f)),   // colinear with q, shorter → dot 1.125
      (4L, Array(0.3f, 0.3f))     // constant vector → mx = mn branch
    ).toDF("id", "embedding")
    val out = VectorSearch.quantizedTopK(q, c, "id", "embedding", "id", "embedding", k = 4)
      .orderBy("rnk").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 1L, 2L, 4L))
    // hand-computed: recon = milli·254 exactly for these inputs
    // (each (m−mn)·254 is a multiple of mx−mn), e.g. q = (254000, 127000)
    assert(out.map(_.getLong(2)).toSeq ==
      Seq(72580500000L, 64516000000L, 32258000000L, 29032200000L))
  }

  test("quantizedTopK qdot matches the integer reference model on seeded random vectors") {
    val rnd = new scala.util.Random(42)
    def vec() = Array.fill(64)((rnd.nextDouble() * 8 - 4).toFloat)
    def milli(x: Float): Long = // Spark round() is HALF_UP away from zero
      BigDecimal(x.toDouble * 1000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def recon(v: Array[Float]): Array[Long] = {
      val m  = v.map(milli)
      val mn = m.min; val mx = m.max
      // non-negative numerator, so Long / == Spark div == DuckDB //
      m.map(e => mn * 254 + (if (mx == mn) 0L else ((e - mn) * 254) / (mx - mn)) * (mx - mn))
    }
    val qv  = vec()
    val cvs = (1L to 200L).map(i => (i, vec()))
    val expect = cvs.map { case (i, cv) =>
      i -> recon(qv).zip(recon(cv)).map { case (a, b) => a * b }.sum
    }.toMap
    val out = VectorSearch.quantizedTopK(
        Seq((0L, qv)).toDF("id", "embedding"), cvs.toDF("id", "embedding"),
        "id", "embedding", "id", "embedding", k = 200)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out == expect)
  }

  test("hardNegatives excludes same-label rows and ranks the rest") {
    val lbl = Seq(
      (1L, Array(1f, 0f, 0f), 0),  // anchor, label 0
      (2L, Array(1f, 0f, 0f), 0),  // identical but SAME label → excluded
      (3L, Array(0.9f, 0.1f, 0f), 1), // closest different-label
      (4L, Array(0f, 1f, 0f), 1),
      (5L, Array(-1f, 0f, 0f), 2)
    ).toDF("id", "embedding", "label")
    val out = VectorSearch.hardNegatives(
      lbl.filter($"id" === 1L), lbl.filter($"id" =!= 1L),
      "id", "embedding", "label", "id", "embedding", "label", k = 3)
      .orderBy("rnk").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 4L, 5L)) // 2L never appears
    assert(out.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L))
  }

  test("ivfTopK nprobe=2 recovers a neighbor just across the list boundary") {
    // list 0's rep is closest to the query AMONG REPS, but the true
    // nearest member (id 21, an exact match) lives in list 1 behind a
    // mediocre rep — nprobe=1 routes to list 0 only and misses it,
    // nprobe=2 probes both lists and finds it
    val corpus = Seq(
      (10L, Array(1f, 0f, 0f), 0),      // list 0 rep (min id): cos ≈ 0.995
      (11L, Array(0.6f, 0.8f, 0f), 0),  // cos ≈ 0.68
      (20L, Array(0.7f, 0.7f, 0f), 1),  // list 1 rep (min id): cos ≈ 0.77
      (21L, Array(1f, 0.1f, 0f), 1)     // exact match: cos = 1.0
    ).toDF("id", "embedding", "label")
    val query = Seq((1L, Array(1f, 0.1f, 0f))).toDF("id", "embedding")
    def top(nprobe: Int) = VectorSearch.ivfTopK(query, corpus,
        "id", "embedding", "id", "embedding", "label", k = 1, nprobe = nprobe)
      .collect().map(_.getLong(1)).toSeq
    assert(top(1) == Seq(10L)) // routed to list 0 only: best member is its rep
    assert(top(2) == Seq(21L)) // list 1's members join: the exact match wins
  }

  test("signBucket groups identical sign patterns; nearDupPairs finds planted dup") {
    val planted = vecs.union(Seq((100L, Array(1f, 0f, 0f))).toDF("id", "embedding"))
    val pairs = VectorSearch.nearDupPairs(planted, "id", "embedding", bits = 3, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.contains((1L, 100L)) && pairs((1L, 100L)) == 1.0)
    assert(pairs.contains((2L, 100L))) // colinear, same bucket
    assert(!pairs.keys.exists { case (a, b) => a == 4L || b == 4L }) // opposite signs → other bucket
  }

  test("lshTopK only searches the query's bucket") {
    val q = vecs.filter($"id" === 1L)
    val c = vecs.filter($"id" =!= 1L)
    val hits = VectorSearch.lshTopK(q, c, "id", "embedding", "id", "embedding", k = 4, bits = 3)
      .collect().map(_.getLong(1)).toSet
    assert(hits.contains(2L))   // same bucket, found
    assert(!hits.contains(4L))  // negative first component → different bucket
  }

  // Adversarially skewed corpus: every vector has positive first 2 dims, so
  // with bits=2 ALL of them land in one sign bucket. Dims 3-8 alternate sign
  // by id, so the 6-bit refinement splits the hot bucket.
  private lazy val skewed = {
    val rows = (0 until 64).map { i =>
      val tail = (0 until 6).map(b => if (((i >> b) & 1) == 1) 1f else -1f)
      (i.toLong, (Array(1f, 1f) ++ tail))
    }
    rows.toDF("id", "embedding")
  }

  test("nearDupPairs bucket guard splits a hot bucket but keeps exact dups") {
    val planted = skewed.union(Seq((999L, Array(1f, 1f, 1f, -1f, -1f, -1f, -1f, -1f)))
      .toDF("id", "embedding")) // exact sign-pattern twin of id=1
    val unguarded = VectorSearch.nearDupPairs(planted, "id", "embedding",
      bits = 2, threshold = -1.0)
    val guarded = VectorSearch.nearDupPairs(planted, "id", "embedding",
      bits = 2, threshold = -1.0, maxBucketSize = 8, extraBits = 6)
    val nUnguarded = unguarded.count()
    val nGuarded = guarded.count()
    // 65 vectors in one bucket → 65*64/2 = 2080 pairs unguarded; the 6-bit
    // refinement puts ≤2 vectors per sub-bucket → ≤65 pairs.
    assert(nUnguarded == 2080L)
    assert(nGuarded < nUnguarded / 10)
    // the sign-identical planted twin is never lost by refinement
    val g = guarded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(g.contains((1L, 999L)))
  }

  test("lshTopK bucket guard restricts a hot bucket to the query's sub-bucket") {
    val q = skewed.filter($"id" === 1L)
    val c = skewed.filter($"id" =!= 1L)
    val guarded = VectorSearch.lshTopK(q, c, "id", "embedding", "id", "embedding",
      k = 100, bits = 2, maxBucketSize = 8, extraBits = 6)
    // only the query's own 6-bit sub-bucket survives the residual predicate:
    // id=1's refinement bits are unique among ids 0..63 → zero candidates
    assert(guarded.count() == 0L)
    // small buckets are untouched: guard with a cap nothing exceeds
    val loose = VectorSearch.lshTopK(q, c, "id", "embedding", "id", "embedding",
      k = 100, bits = 2, maxBucketSize = 1000, extraBits = 6)
    assert(loose.count() == 63L)
  }

  // 4-dim corpus, 2 subspaces of 2 dims; labels cluster the first two ids
  // on axis x and the last two on axis y, so codebooks are axis-aligned
  private lazy val pqCorpus = Seq(
    (1L, 0L, Array(1.0f, 0.9f, 0.0f, 0.0f)),
    (2L, 0L, Array(0.9f, 1.0f, 0.0f, 0.1f)),
    (3L, 1L, Array(0.0f, 0.0f, 1.0f, 0.9f)),
    (4L, 1L, Array(0.1f, 0.0f, 0.9f, 1.0f))
  ).toDF("vec_id", "label", "embedding")

  test("pqEncode assigns each vector m codes, each the true per-subspace argmin") {
    val cb = VectorSearch.pqCodebooks(pqCorpus, "embedding", "label", m = 2, dims = 4)
    val codes = VectorSearch.pqEncode(pqCorpus, "vec_id", "embedding", cb, m = 2, dims = 4)
    val rows = codes.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // exactly m = 2 codes per vector
    assert(rows.size == 8)
    // label-0 vectors pick codeword 0 in subspace 0 (their own cluster)
    // and 1 in subspace 1 only if it is closer — verify against a brute
    // model computed from the same integer cells
    val cbCells = cb.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap // (sub, code, dim) -> c_bp
    val vecCells = pqCorpus.collect().map { r =>
      val v = r.getSeq[Float](2)
      r.getLong(0) -> v.indices.map(i => (i + 1).toLong -> math.round(v(i) * 10000d)).toMap
    }.toMap
    for (id <- 1L to 4L; sub <- 0L to 1L) {
      val dims = if (sub == 0L) Seq(1L, 2L) else Seq(3L, 4L)
      val best = (0L to 1L).map { code =>
        val d = dims.map(dm => { val x = vecCells(id)(dm) - cbCells((sub, code, dm)); x * x }).sum
        (d, code)
      }.min
      assert(rows((id, sub)) == ((best._2, best._1)),
        s"vec $id subspace $sub: got ${rows((id, sub))}, want $best")
    }
  }

  test("pqAdcTopK: ADC distance equals exact query-to-reconstruction distance") {
    val cb    = VectorSearch.pqCodebooks(pqCorpus, "embedding", "label", m = 2, dims = 4)
    val codes = VectorSearch.pqEncode(pqCorpus, "vec_id", "embedding", cb, m = 2, dims = 4).drop("dist_bp2")
    val topk = VectorSearch.pqAdcTopK(pqCorpus.filter(col("vec_id") === 1L),
        "vec_id", "embedding", codes, cb, k = 4)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // brute model: ||q − recon(x)||² where recon takes x's codeword cells
    val cbCells = cb.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    val codeMap = codes.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap // (id, sub) -> code
    val q = Map(1L -> 10000L, 2L -> 9000L, 3L -> 0L, 4L -> 0L) // vec 1 cells
    (1L to 4L).foreach { id =>
      val want = (1L to 4L).map { dm =>
        val sub = (dm - 1) / 2
        val d = q(dm) - cbCells((sub, codeMap((id, sub)), dm))
        d * d
      }.sum
      assert(topk(id) == want, s"ADC distance for corpus vec $id: ${topk(id)} vs $want")
    }
    // the query's own cluster ranks above the other label's cluster
    assert(Seq(1L, 2L).map(topk).max < Seq(3L, 4L).map(topk).min)
  }

  test("ivfTopKTrained: routing metric agrees with list assignment; nprobe=all equals brute force") {
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f, 0.1f, 0.0f)), (11L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (12L, Array(1.1f, 0.0f, 0.0f, 0.1f)),
      (20L, Array(0.0f, 1.0f, 0.0f, 0.1f)), (21L, Array(0.1f, 0.9f, 0.0f, 0.0f)),
      (22L, Array(0.0f, 1.1f, 0.1f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cent = VectorSearch.kmeansFit(corpus, "vec_id", "embedding", k = 2, iters = 3)
    val q = Seq((1L, Array(1.0f, 0.05f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    // nprobe=1 scans exactly the members of the list the query routes to —
    // the same list assignToNearestCentroid gives, since the router uses
    // the identical integer metric
    val got = VectorSearch.ivfTopKTrained(q, corpus,
        "vec_id", "embedding", "vec_id", "embedding", cent, k = 10)
      .collect().map(_.getLong(1)).toSet
    val lists = VectorSearch.assignToNearestCentroid(corpus, "vec_id", "embedding", cent)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val qList = VectorSearch.assignToNearestCentroid(q, "vec_id", "embedding", cent)
      .collect().head.getLong(1)
    assert(got.nonEmpty && got == lists.filter(_._2 == qList).keySet)
    // probing every list degrades gracefully to exact brute-force top-k
    val nLists = lists.values.toSet.size
    val full = VectorSearch.ivfTopKTrained(q, corpus,
        "vec_id", "embedding", "vec_id", "embedding", cent, k = 3, nprobe = nLists)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
    val brute = VectorSearch.bruteForceTopK(q, corpus,
        "vec_id", "embedding", "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
    assert(full == brute)
  }

  test("ivfTopKTrainedCurve: each tier equals the matching single-nprobe call; widest tier is exact") {
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f, 0.1f, 0.0f)), (11L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (12L, Array(1.1f, 0.0f, 0.0f, 0.1f)),
      (20L, Array(0.0f, 1.0f, 0.0f, 0.1f)), (21L, Array(0.1f, 0.9f, 0.0f, 0.0f)),
      (22L, Array(0.0f, 1.1f, 0.1f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cent = VectorSearch.kmeansFit(corpus, "vec_id", "embedding", k = 2, iters = 3)
    val q = Seq((1L, Array(1.0f, 0.05f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val curve = VectorSearch.ivfTopKTrainedCurve(q, corpus,
        "vec_id", "embedding", "vec_id", "embedding", cent, k = 3, nprobes = Seq(1, 2))
      .collect().groupBy(_.getLong(0))
      .map { case (np, rs) => np -> rs.map(r => (r.getLong(2), r.getLong(4))).toSet }
    Seq(1, 2).foreach { np =>
      val single = VectorSearch.ivfTopKTrained(q, corpus,
          "vec_id", "embedding", "vec_id", "embedding", cent, k = 3, nprobe = np)
        .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
      assert(curve(np.toLong) == single, s"tier $np must equal the single-nprobe plan")
    }
    // widest tier covers every list → exact brute-force top-k
    val brute = VectorSearch.bruteForceTopK(q, corpus,
        "vec_id", "embedding", "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
    assert(curve(2L) == brute)
  }

  test("ivfAdcTopK: nprobe=all lists degrades to full ADC; nprobe=1 scans only the routed list") {
    val cent  = VectorSearch.kmeansFit(pqCorpus, "vec_id", "embedding", k = 2, iters = 3)
    val lists = VectorSearch.assignToNearestCentroid(pqCorpus, "vec_id", "embedding", cent)
      .select(col("id"), col("label"))
    val cb    = VectorSearch.pqCodebooks(pqCorpus, "embedding", "label", m = 2, dims = 4)
    val codes = VectorSearch.pqEncode(pqCorpus, "vec_id", "embedding", cb, m = 2, dims = 4)
      .drop("dist_bp2")
    val q = pqCorpus.filter(col("vec_id") === 1L)
    val full = VectorSearch.ivfAdcTopK(q, "vec_id", "embedding", codes, cb, lists, cent,
        k = 4, nprobe = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val adc = VectorSearch.pqAdcTopK(q, "vec_id", "embedding", codes, cb, k = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(full == adc)
    val one = VectorSearch.ivfAdcTopK(q, "vec_id", "embedding", codes, cb, lists, cent,
        k = 4, nprobe = 1)
      .collect().map(_.getLong(1)).toSet
    val listOf = lists.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val qList = VectorSearch.assignToNearestCentroid(q, "vec_id", "embedding", cent)
      .collect().head.getLong(1)
    assert(one.nonEmpty && one == listOf.filter(_._2 == qList).keySet)
  }

  test("semanticDedup flags near-identical lower-id neighbors within a cluster only") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f)),  // exact dup of 1
      (3L, Array(0.9f, 0.1f, 0.0f, 0.0f)),  // same cluster, cos ≈ 0.9939 < 1.0
      (10L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (11L, Array(0.0f, 1.0f, 0.0f, 0.0f))  // exact dup of 10, other cluster
    ).toDF("vec_id", "embedding")
    val cent = VectorSearch.kmeansFit(corpus, "vec_id", "embedding", k = 2, iters = 3)
    val got = VectorSearch.semanticDedup(corpus, "vec_id", "embedding", cent, threshold = 1.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    // only the HIGHER id of each exact-dup pair flags; the 0.9939 neighbor
    // stays below the threshold; identical vectors always share a cluster
    assert(got.filter(_._2._2).keySet == Set(2L, 11L), s"got $got")
    assert(got(2L)._1 == 1L && got(3L)._1 == 0L)
  }

  test("semanticDedup occupancy guard splits hot clusters but never misses exact duplicates") {
    // k=1 collapses everything into one cluster (the degenerate-embedding
    // mode the guard exists for); maxClusterSize=2 forces the sign-bit
    // sub-split, and each exact-dup pair shares every sign bit, so both
    // pairs are still found while the cross-group pairs are never scored
    val corpus = Seq(
      (1L, Array(1.0f, 0.2f, 0.1f, 0.0f)),
      (2L, Array(1.0f, 0.2f, 0.1f, 0.0f)),
      (10L, Array(-1.0f, -0.2f, 0.1f, 0.0f)),
      (11L, Array(-1.0f, -0.2f, 0.1f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cent = VectorSearch.kmeansFit(corpus, "vec_id", "embedding", k = 1, iters = 1)
    val got = VectorSearch.semanticDedup(corpus, "vec_id", "embedding", cent,
        threshold = 1.0, maxClusterSize = 2, extraBits = 4)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got == Map(1L -> false, 2L -> true, 10L -> false, 11L -> true))
  }

  test("pqCodebooksKmeans runs exact-integer per-subspace Lloyd's (reference replay)") {
    val data = Seq(
      (1L, Array(1.0f, 0.9f, -1.0f, -0.8f)),
      (2L, Array(0.8f, 1.1f, -0.9f, -1.1f)),
      (3L, Array(-1.0f, -0.9f, 1.0f, 0.8f)),
      (4L, Array(-0.8f, -1.2f, 0.9f, 1.1f)),
      (5L, Array(0.9f, 1.0f, 1.0f, 1.0f)),
      (6L, Array(-0.9f, -1.0f, -1.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    val got = VectorSearch
      .pqCodebooksKmeans(data, "vec_id", "embedding", m = 2, dims = 4, k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap

    // independent reference: same hash-lowest seeding, same E/M steps,
    // HALF_UP integer rounding — every cell must match bit-for-bit
    def half(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def h16(id: Long): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString, 16)
    val cells: Map[Long, Array[Long]] = data.collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1).map(x => half(x.toDouble * 10000d)).toArray
    }.toMap
    val ids = cells.keys.toSeq
    var cent: Map[(Int, Int), Array[Long]] =
      (for ((id, code) <- ids.sortBy(id => (h16(id), id)).take(2).zipWithIndex; sub <- 0 to 1)
        yield (sub, code) -> cells(id).slice(sub * 2, sub * 2 + 2)).toMap
    for (_ <- 1 to 2) {
      val assigned = for (id <- ids; sub <- 0 to 1) yield {
        val v = cells(id).slice(sub * 2, sub * 2 + 2)
        (id, sub, cent.keys.filter(_._1 == sub).toSeq.map { case (s, c) =>
          (v.zip(cent((s, c))).map { case (a, b) => (a - b) * (a - b) }.sum, c)
        }.min._2)
      }
      cent = assigned.groupBy(a => (a._2, a._3)).map { case ((sub, code), ms) =>
        val vs = ms.map(mm => cells(mm._1).slice(sub * 2, sub * 2 + 2))
        (sub, code) -> Array.tabulate(2)(i => half(vs.map(_(i)).sum.toDouble / vs.size))
      }
    }
    val want = (for (((sub, code), arr) <- cent; i <- 0 until 2)
      yield (sub.toLong, code.toLong, (sub * 2 + i + 1).toLong) -> arr(i)).toMap
    assert(got == want)
  }

  test("mmrRerank: diversification flips the second pick; pure relevance keeps it") {
    // q = [1,0]; A dup-direction of q, B a near-duplicate of A (cos 1.0
    // after rounding), C diverse at cos 0.6. rel_bp: A 10000, B 10000,
    // C 6000; sim_bp(A,B) = 10000, sim_bp(A,C) = sim_bp(B,C) = 6000.
    val q = Seq((100L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val c = Seq(
      (1L, Array(1f, 0f)),     // A
      (2L, Array(1f, 0.01f)),  // B: cos(q,B)=0.99995 → rounds to 1.0
      (3L, Array(0.6f, 0.8f))  // C
    ).toDF("vec_id", "embedding")
    def run(lam: Long) = VectorSearch.mmrRerank(q, c, "vec_id", "embedding",
        "vec_id", "embedding", candK = 3, k = 2, lambdaPermille = lam)
      .collect().map(r => r.getLong(3) -> ((r.getLong(1), r.getLong(2)))).toMap
    // λ=400: step 2 scores B: 400·10000 − 600·10000 = −2e6,
    //                       C: 400·6000 − 600·6000 = −1.2e6 → C wins
    val diverse = run(400L)
    assert(diverse(1L) == ((1L, 400L * 10000L)))   // seed: argmax rel, ties by id
    assert(diverse(2L) == ((3L, -1200000L)))
    // λ=1000: pure relevance — the near-duplicate B wins step 2
    val flat = run(1000L)
    assert(flat(1L) == ((1L, 1000L * 10000L)))
    assert(flat(2L) == ((2L, 1000L * 10000L)))
  }

  test("mmr plan: candidate re-attach broadcasts; selection is qid-keyed, product-free") {
    // the public output is a checkpoint scan (q87 pattern), so the audit
    // reads the two unexecuted stage frames directly
    val q = Seq((100L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val c = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val cv = VectorSearch.mmrCandidateVectors(q, c, "vec_id", "embedding",
      "vec_id", "embedding", candK = 2)
    val pCv = cv.queryExecution.executedPlan.toString
    assert(pCv.contains("BroadcastHashJoin"),
      s"candidate set must broadcast against the corpus:\n$pCv")
    val pSel = VectorSearch.mmrSelect(cv, k = 2, lambdaPermille = 700L)
      .queryExecution.executedPlan.toString
    // stage 1's brute-force product is upstream (and deliberate); the
    // selection stages must stay qid-keyed equi-joins
    assert(!pSel.contains("CartesianProduct"),
      s"pair self-join must be a qid equi-join:\n$pSel")
  }

  test("mmrRerank: fewer candidates than k returns all, ranked") {
    val q = Seq((100L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val c = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val r = VectorSearch.mmrRerank(q, c, "vec_id", "embedding",
        "vec_id", "embedding", candK = 5, k = 5, lambdaPermille = 700L)
      .collect().map(x => x.getLong(3) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 1L, 2L -> 2L))
  }

  // ------------------------------------------------------------------
  // knnGraph

  test("knnGraph: directed top-k within a bucket, exact cosine order") {
    // one bucket (all dims ≥ 0): 1 is closer to 2 than to 3; 4 is a twin of 1
    val vs = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(0.9f, 0.1f, 0f)),
      (3L, Array(0f, 1f, 0f)), (4L, Array(2f, 0f, 0f)))
      .toDF("id", "embedding")
    val g = VectorSearch.knnGraph(vs, "id", "embedding", k = 2, bits = 3)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap
    // 1's nearest is its scaled twin 4 (cos = 1), then 2
    assert(g((1L, 1L)) == 4L && g((1L, 2L)) == 2L)
    assert(g((4L, 1L)) == 1L && g((4L, 2L)) == 2L)
    // the graph is directed: 3 still ranks ITS neighbors even though no
    // node ranks 3 in its top-2
    assert(g.contains((3L, 1L)) && g.contains((3L, 2L)))
    // k bounds every adjacency list
    assert(g.keys.map(_._2).max <= 2L)
  }

  test("knnGraph: cross-bucket neighbors are invisible; singleton bucket emits nothing") {
    // bit 1 (sign of dim 1) splits: ids 1,2 positive; id 3 negative & alone
    val vs = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.5f, 0.5f)), (3L, Array(-1f, 0f)))
      .toDF("id", "embedding")
    val g = VectorSearch.knnGraph(vs, "id", "embedding", k = 3, bits = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(g == Set((1L, 2L), (2L, 1L)))
  }

  test("embeddingDrift: hand-computed means, single-cohort labels omitted") {
    val df = Seq(
      (0L, 0, Array(1f, 0f), true), (2L, 0, Array(0f, 1f), true), // A mean (5000, 5000)
      (1L, 0, Array(1f, 0f), false),                              // B mean (10000, 0)
      (4L, 1, Array(1f, 1f), true)                                // label 1: A only
    ).toDF("vec_id", "label", "embedding", "a")
    val r = VectorSearch.embeddingDrift(df, "embedding", "label", "a")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    // drift = (5000−10000)² + (5000−0)² = 50,000,000
    assert(r == Map(0L -> ((2L, 1L, 50000000L))))
  }

  test("embeddingDrift: identical cohorts drift zero") {
    val df = Seq(
      (0L, 7, Array(0.3f, -0.4f), true), (1L, 7, Array(0.3f, -0.4f), false))
      .toDF("vec_id", "label", "embedding", "a")
    val r = VectorSearch.embeddingDrift(df, "embedding", "label", "a").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(3))).toSeq == Seq((7L, 0L)))
  }

  test("kmeansUpdateBatch: running-mean update, untouched centroids pass through") {
    // two 2-dim centroids: label 0 at (10000, 0) with history n=3,
    // label 1 at (0, 10000) with history n=5
    val cents = Seq((0L, 1L, 10000L), (0L, 2L, 0L), (1L, 1L, 0L), (1L, 2L, 10000L))
      .toDF("label", "dim", "c_bp")
    val counts = Seq((0L, 3L), (1L, 5L)).toDF("label", "n")
    // both batch vectors assign to label 0; nothing arrives at label 1
    val batch = Seq((101L, Array(0.8f, 0.2f)), (102L, Array(0.6f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = VectorSearch.kmeansUpdateBatch(batch, "vec_id", "embedding", cents, counts)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    // label 0 dim 1: (10000·3 + 8000 + 6000) div 5 = 44000 div 5 = 8800
    // label 0 dim 2: (0·3 + 2000 + 0) div 5 = 400
    assert(got((0L, 1L)) == ((8800L, 5L)))
    assert(got((0L, 2L)) == ((400L, 5L)))
    // label 1 untouched: cells and count unchanged
    assert(got((1L, 1L)) == ((0L, 5L)) && got((1L, 2L)) == ((10000L, 5L)))
  }

  test("kmeansUpdateBatch: empty batch is the identity") {
    val cents = Seq((0L, 1L, 7000L), (0L, 2L, -3000L)).toDF("label", "dim", "c_bp")
    val counts = Seq((0L, 4L)).toDF("label", "n")
    val batch = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val got = VectorSearch.kmeansUpdateBatch(batch, "vec_id", "embedding", cents, counts)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map((0L, 1L) -> ((7000L, 4L)), (0L, 2L) -> ((-3000L, 4L))))
  }

  test("knnGraphIncremental: re-delivery dropped, out ranks index∪batch, in ranks batch only") {
    // one bucket: index = {1, 2}, batch = {2 (re-delivered), 3, 4}
    val vs = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(0.9f, 0.1f, 0f)),
      (3L, Array(0.8f, 0.2f, 0f)), (4L, Array(0.5f, 0.5f, 0f)))
      .toDF("id", "embedding")
    val index = VectorSearch.knnGraphIndex(
      vs.filter($"id" <= 2), "id", "embedding", bits = 3)
    val got = VectorSearch.knnGraphIncremental(
      vs.filter($"id" >= 2), index, "id", "embedding", k = 2, bits = 3)
      .collect().map(r =>
        (r.getString(4), r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap
    // re-delivered id=2 emits no out rows
    assert(!got.keys.exists { case (dir, id, _) => dir == "out" && id == 2L })
    // 3's nearest among {1,2,4} is 2, then 1
    assert(got(("out", 3L, 1L)) == 2L && got(("out", 3L, 2L)) == 1L)
    // indexed nodes rank ONLY the new arrivals: 1's in-candidates are {3,4}
    assert(got(("in", 1L, 1L)) == 3L && got(("in", 1L, 2L)) == 4L)
    assert(got(("in", 2L, 1L)) == 3L)
    // nothing ranks deeper than k
    assert(got.keys.map(_._3).max <= 2L)
  }

  test("mergeAdjacency: monotone top-k fold — better edges displace, re-delivery is a no-op") {
    val adj = Seq(
      (1L, 2L, 9000L), (1L, 3L, 8000L), (2L, 1L, 9000L)
    ).toDF("id", "nbr_id", "sim_bp")
    val edges = Seq(
      (1L, 4L, 8500L),  // displaces (1,3,8000) at k=2
      (1L, 2L, 9000L),  // re-delivered edge: identical sim_bp, collapses
      (5L, 1L, 7000L)   // brand-new node's adjacency appends
    ).toDF("id", "nbr_id", "sim_bp")
    val once = VectorSearch.mergeAdjacency(adj, edges, k = 2)
    val got = once.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 2L) -> 9000L, (1L, 4L) -> 8500L,
      (2L, 1L) -> 9000L, (5L, 1L) -> 7000L))
    // replaying the same edge batch converges (idempotent merge)
    val twice = VectorSearch.mergeAdjacency(once, edges, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(twice == got)
  }

  test("knnGraph bucket guard splits a hot bucket like nearDupPairs") {
    val g = VectorSearch.knnGraph(skewed, "id", "embedding",
      k = 100, bits = 2, maxBucketSize = 8, extraBits = 6)
    // 6-bit refinement isolates every id's unique sign pattern → no pairs
    assert(g.count() == 0L)
    val loose = VectorSearch.knnGraph(skewed, "id", "embedding",
      k = 100, bits = 2, maxBucketSize = 1000)
    // unguarded: all 64 in one bucket, 63 directed neighbors each
    assert(loose.count() == 64L * 63L)
  }

  test("kCenterSelect matches a driver-side greedy reference exactly") {
    val pts = Seq(
      (1L, Array(0f, 0f)), (2L, Array(1f, 0f)), (3L, Array(0.9f, 0.1f)),
      (4L, Array(0f, 1f)), (5L, Array(0.5f, 0.5f)), (6L, Array(1f, 1f))
    ).toDF("vec_id", "embedding")
    val out = VectorSearch.kCenterSelect(pts, "vec_id", "embedding", k = 4)
      .orderBy("sel_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // reference: same integer basis, same hash seed, O(n·k) on the driver
    val bp = pts.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))"),
        Sampling.hashBucket16(col("vec_id")))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
    def d2(a: Seq[Long], b: Seq[Long]) = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val seed = bp.minBy(p => (p._3, p._1))
    var chosen = Vector((0L, seed._1, 0L)); var chosenVecs = Vector(seed._2)
    for (i <- 1 until 4) {
      val cand = bp.filter(p => !chosen.exists(_._2 == p._1))
        .map(p => (p._1, chosenVecs.map(v => d2(p._2, v)).min))
      val best = cand.minBy { case (id, md) => (-md, id) }
      chosen :+= ((i.toLong, best._1, best._2))
      chosenVecs :+= bp.find(_._1 == best._1).get._2
    }
    assert(out.toSeq == chosen)
    // coverage radius is non-increasing after the seed
    assert(out.drop(1).map(_._3).sliding(2).forall(s => s.length < 2 || s(0) >= s(1)))
  }

  test("jlProject packs signRandomProjection's components in dim order") {
    val emb = Seq((1L, Array(0.5f, -0.25f, 1.0f)), (2L, Array(-1.0f, 0.0f, 0.75f)))
      .toDF("vec_id", "embedding")
    val packed = VectorSearch.jlProject(emb, "vec_id", "embedding", inDims = 3, outDims = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(packed.values.forall(_.length == 4))
    VectorSearch.signRandomProjection(emb, "vec_id", "embedding", inDims = 3, outDims = 4)
      .collect().foreach { r =>
        assert(packed(r.getLong(0))(r.getLong(1).toInt) == r.getLong(2))
      }
  }

  test("intL2TopK: exact integer distances, (d2, id) tie order, k cap") {
    val qs = Seq((100L, Array(0L, 0L))).toDF("qid", "v")
    val cs = Seq(
      (1L, Array(1L, 1L)),  // d2 = 2
      (2L, Array(0L, 1L)),  // d2 = 1, wins the tie on id
      (3L, Array(1L, 0L)),  // d2 = 1
      (4L, Array(3L, 4L))   // d2 = 25, cut by k
    ).toDF("id", "v")
    val out = VectorSearch.intL2TopK(qs, cs, "qid", "v", "id", "v", k = 3)
      .orderBy("rnk").collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((2L, 1L, 1L), (3L, 1L, 2L), (1L, 2L, 3L)))
  }

  test("prefixDimTopK: prefix tiers genuinely re-rank; full tier equals bruteForceTopK") {
    val qs = Seq((0L, Array(1f, 0f, 0f, 1f))).toDF("vid", "v")
    val cs = Seq(
      (1L, Array(1f, 0f, 0f, -1f)), // prefix-2 cos = 1.0, full cos = 0.0
      (2L, Array(0f, 1f, 0f, 1f))   // prefix-2 cos = 0.0, full cos = 0.5
    ).toDF("vid", "v")
    val top = VectorSearch.prefixDimTopK(qs, cs, "vid", "v", "vid", "v",
        k = 1, dims = Seq(2, 4))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(top == Map(2L -> 1L, 4L -> 2L))
    // the full-dimension tier must agree with bruteForceTopK row-for-row
    val full = VectorSearch.bruteForceTopK(qs, cs, "vid", "v", "vid", "v", k = 2)
      .orderBy("rnk").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val t4 = VectorSearch.prefixDimTopK(qs, cs, "vid", "v", "vid", "v", k = 2, dims = Seq(4))
      .orderBy("rnk").collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(full.toSeq == t4.toSeq)
  }

  test("graphSearchCurve: the beam walk reaches the true neighbor hop by hop") {
    // path graph 1 - 2 - 3; query (0,1): sims are 0 / 0.7071 / 1.0 —
    // entry (smallest id) is the WORST node, each round advances one hop
    val qs = Seq((0L, Array(0f, 1f))).toDF("vid", "v")
    val cs = Seq(
      (1L, Array(1f, 0f)),
      (2L, Array(0.7f, 0.7f)),
      (3L, Array(0f, 1f))
    ).toDF("vid", "v")
    val graph = Seq((1L, 2L), (2L, 3L)).toDF("id", "nbr_id")
    val out = VectorSearch.graphSearchCurve(qs, cs, graph,
        "vid", "v", "vid", "v", k = 1, beam = 2, rounds = 2, entries = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(0L -> 1L, 1L -> 2L, 2L -> 3L))
    // graphSearchTopK returns the final tier only, and it must agree
    // with exact truth once the walk has reached the neighborhood
    val top = VectorSearch.graphSearchTopK(qs, cs, graph,
        "vid", "v", "vid", "v", k = 1, beam = 2, rounds = 2, entries = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(top.toSeq == Seq((0L, 3L, 1L)))
  }

  test("semanticYieldCurve: victims per cosine tier, monotone yield toward tight cutoffs") {
    val vs = Seq(
      (1L, Array(1f, 0f)),
      (2L, Array(1f, 0f)),   // cos(1,2) = 1.0: victim everywhere
      (3L, Array(2f, 1f)),   // cos(1,3) = 0.8944: victim below 8944 only
      (4L, Array(0f, 1f))    // unrelated
    ).toDF("vid", "v")
    // single centroid: everything lands in one blocking cluster
    val cent = Seq((0L, 1L, 10000L), (0L, 2L, 0L)).toDF("label", "dim", "c_bp")
    val got = VectorSearch.semanticYieldCurve(vs, "vid", "v", cent,
        tiersBp = Seq(8000, 9500))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(8000L) == ((4L, 2L, 5000L)))
    assert(got(9500L) == ((4L, 3L, 7500L)))
  }

  test("graphSearchBeamSweep: every tier equals its standalone walk row-for-row") {
    val qs = Seq((0L, Array(0f, 1f)), (1L, Array(1f, 0.2f))).toDF("vid", "v")
    val cs = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.7f, 0.7f)), (3L, Array(0f, 1f)),
      (4L, Array(0.9f, 0.3f)), (5L, Array(-1f, 0f))
    ).toDF("vid", "v")
    val graph = Seq((1L, 2L), (2L, 3L), (1L, 4L), (4L, 5L)).toDF("id", "nbr_id")
    val adj = graph.select(col("id"), col("nbr_id"))
      .unionByName(graph.select(col("nbr_id").as("id"), col("id").as("nbr_id")))
      .distinct().persist()
    adj.count()
    val entries = cs.select(col("vid").as("id")).orderBy(col("id")).limit(1)
    val sweep = VectorSearch.graphSearchBeamSweep(qs, cs, adj,
        "vid", "v", "vid", "v", k = 2, beams = Seq(2, 4), rounds = 2,
        entryIds = entries)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))).toSet
    val solo = Seq(2, 4).flatMap { b =>
      VectorSearch.graphSearchCurve(qs, cs, adj, "vid", "v", "vid", "v",
          k = 2, beam = b, rounds = 2, entryIds = entries,
          graphIsAdjacency = true)
        .filter(col("round_tier") === 2L)
        .collect().map(r => (b.toLong, r.getLong(1), r.getLong(2), r.getLong(4)))
    }.toSet
    adj.unpersist()
    assert(sweep == solo)
    // the wider beam must explore at least as much: its candidate pool is
    // a superset, so its top-2 sims dominate the narrow beam's
    assert(sweep.nonEmpty)
  }

  test("silhouette: hand-computed exact-integer scores against two centroids") {
    import org.apache.spark.sql.functions._
    // centroids at 0.0 and 1.0 (one dim); vectors 0.0, 0.1, 1.0:
    // v1: a2=0, b2=1e8 -> 10000; v2: a2=1e6, b2=81e6 -> floor(80e6*1e4/81e6)=9876;
    // v3: a2=0, b2=1e8 -> 10000
    val vecs = Seq(
      (1L, Seq(0.0f)), (2L, Seq(0.1f)), (3L, Seq(1.0f))
    ).toDF("id", "v")
    val cents = Seq((0L, 1L, 0L), (1L, 1L, 10000L)).toDF("label", "dim", "c_bp")
    val got = VectorSearch.silhouette(vecs, "id", "v", cents)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(
      0L -> ((2L, 9938L, 9876L, 10000L)),
      1L -> ((1L, 10000L, 10000L, 10000L))))
  }
}
