package graft.ext

import graft.SparkFunSuite
import org.apache.spark.sql.Row

/** [[Graphs.pageRankInt]] against a pure-Scala integer reference model:
  * the operator's contract is exact integer arithmetic, so the model and
  * the distributed run must agree to the last micro-unit, not within a
  * tolerance.
  */
class GraphsSpec extends SparkFunSuite {
  import spark.implicits._

  /** Reference PageRank with the operator's exact semantics: distinct
    * edges, rank div outdeg shares, (85 × inflow) div 100 damping over a
    * 150000-µ floor, dangling mass dropped.
    */
  private def ref(edges: Set[(String, String)], iters: Int,
                  dampingPct: Long = 85L): Map[String, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val odeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = (100L - dampingPct) * 1000000L / 100L
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val inflow = edges.toSeq
        .map { case (u, v) => v -> rank(u) / odeg(u) }
        .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).sum }
      rank = nodes.map(n => n -> (base + dampingPct * inflow.getOrElse(n, 0L) / 100L)).toMap
    }
    rank
  }

  private def run(edges: Seq[(String, String)], iters: Int): Map[String, Long] =
    Graphs.pageRankInt(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map { case Row(n: String, r: Long) => n -> r }.toMap

  private val chain = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "d")

  test("matches the integer reference model at 0 through 4 iterations") {
    for (it <- 0 to 4)
      assert(run(chain, it) === ref(chain.toSet, it), s"iteration $it")
  }

  test("duplicate edge rows collapse to the distinct graph") {
    assert(run(chain ++ chain ++ chain.take(2), 3) === ref(chain.toSet, 3))
  }

  test("dangling node keeps teleport floor plus inflow but emits nothing") {
    // d has no out-edges: its rank must still be base + damped inflow,
    // and a's rank must NOT include any share from d
    val got = run(chain, 2)
    assert(got === ref(chain.toSet, 2))
    assert(got("d") > 0L)
  }

  test("a hub cited by every node outranks its citers") {
    val hub = Seq("a" -> "h", "b" -> "h", "c" -> "h", "a" -> "b", "b" -> "c")
    val got = run(hub, 3)
    assert(got === ref(hub.toSet, 3))
    assert(got("h") > got("a") && got("h") > got("b") && got("h") > got("c"))
  }

  test("self-loops are kept, not dropped") {
    val g = Seq("a" -> "a", "a" -> "b")
    assert(run(g, 3) === ref(g.toSet, 3))
  }

  test("iteration plan: equi-joins + partial/final share agg, no product join, no window") {
    val p = Graphs.iterationPlanFrame(chain.toDF("src", "dst"), "src", "dst")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"iteration must never fall back to a product join:\n$p")
    assert(!p.contains("Window"), s"no window in the iteration:\n$p")
    // inflow sum is partial+final (map-side combine absorbs in-degree skew)
    assert(p.split("HashAggregate").length >= 3, s"expected partial+final agg:\n$p")
  }

  /** [[ref]] with the conserved-mass dangling treatment: each round the
    * dangling total is shared uniformly before damping.
    */
  private def refDangling(edges: Set[(String, String)], iters: Int): Map[String, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val odeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = 15L * 1000000L / 100L
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val inflow = edges.toSeq
        .map { case (u, v) => v -> rank(u) / odeg(u) }
        .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).sum }
      val dsum = nodes.filterNot(odeg.contains).toSeq.map(rank).sum
      rank = nodes.map(n =>
        n -> (base + 85L * (inflow.getOrElse(n, 0L) + dsum / nodes.size) / 100L)).toMap
    }
    rank
  }

  test("redistributeDangling conserves mass and matches its reference model") {
    val got = Graphs.pageRankInt(chain.toDF("src", "dst"), "src", "dst",
        iters = 3, redistributeDangling = true)
      .collect().map { case Row(n: String, r: Long) => n -> r }.toMap
    assert(got === refDangling(chain.toSet, 3))
    // mass stays within floor-division dust of N × 1e6; the lost-mass
    // default decays well below it
    val n = got.size
    assert(got.values.sum > n * 1000000L - 100L * n && got.values.sum <= n * 1000000L)
    assert(run(chain, 3).values.sum < got.values.sum)
  }

  test("idDictionary assigns exactly the dense ids 0..n-1, deterministically") {
    val keys = ('a' to 'z').map(_.toString)
    val df = scala.util.Random.shuffle(keys ++ keys.take(9)).toDF("k")
    // shards = 3 << n so the multi-shard offset prefix-sum is exercised
    val a = Graphs.idDictionary(df, "k", shards = 3)
      .collect().map { case Row(k: String, id: Long) => k -> id }.toMap
    assert(a.keySet === keys.toSet, "one row per distinct key")
    assert(a.values.toSeq.sorted === (0L until 26L), "ids are dense 0..n-1")
    val b = Graphs.idDictionary(df.repartition(5), "k", shards = 3)
      .collect().map { case Row(k: String, id: Long) => k -> id }.toMap
    assert(a === b, "assignment is independent of input partitioning")
  }

  test("encodeIds path is bit-identical to the string path") {
    for (dangle <- Seq(false, true)) {
      val direct = Graphs.pageRankInt(chain.toDF("src", "dst"), "src", "dst",
          iters = 3, redistributeDangling = dangle)
        .collect().map { case Row(n: String, r: Long) => n -> r }.toMap
      val encoded = Graphs.pageRankInt(chain.toDF("src", "dst"), "src", "dst",
          iters = 3, redistributeDangling = dangle, encodeIds = true)
        .collect().map { case Row(n: String, r: Long) => n -> r }.toMap
      assert(encoded === direct, s"redistributeDangling=$dangle")
    }
  }

  test("encoded iteration exchanges hash LONG keys, never strings") {
    val p = Graphs.iterationPlanFrameEncoded(chain.toDF("src", "dst"), "src", "dst")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"encoded iteration must never fall back to a product join:\n$p")
    // the per-iteration hot aggregate — the inflow share sum — must key on
    // a LONG node attribute (the #NNL suffix; a string key prints without
    // L). The one-time dictionary/encode subtree legitimately hashes the
    // string keys once, so the pin targets the iteration agg, not every
    // exchange in the frame.
    val inflowAggs = raw"HashAggregate\(keys=\[node#\d+(L?)[^\n]*sum\(__share".r
      .findAllMatchIn(p).toSeq
    assert(inflowAggs.nonEmpty, s"expected the inflow share agg in:\n$p")
    assert(inflowAggs.forall(_.group(1) == "L"),
      s"inflow agg keyed on a string node — encode did not reach the loop:\n$p")
  }

  test("deterministic under input partitioning") {
    val df = chain.toDF("src", "dst").repartition(7)
    val a = Graphs.pageRankInt(df, "src", "dst", 3)
      .collect().map { case Row(n: String, r: Long) => n -> r }.toMap
    assert(a === ref(chain.toSet, 3))
  }

  // ------------------------------------------------------------------
  // labelPropagation

  /** Reference synchronous LPA with the operator's exact semantics:
    * undirected distinct adjacency, self-loops dropped, winner =
    * (max neighbor-label count, then min label).
    */
  private def lpRef(edges: Seq[(String, String)], iters: Int): Map[String, String] = {
    val adj = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, (e._2, e._1))).distinct
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    var labels = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      labels = adj.map { case (n, nbrs) =>
        val votes = nbrs.map(labels).groupBy(identity).map { case (l, xs) => (l, xs.size) }
        n -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    labels
  }

  private def lpRun(edges: Seq[(String, String)], iters: Int): Map[String, String] =
    Graphs.labelPropagation(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map { case Row(n: String, l: String) => n -> l }.toMap

  // two triangles bridged by one edge — the canonical two-community graph
  private val twoTri = Seq("a" -> "b", "b" -> "c", "c" -> "a",
    "x" -> "y", "y" -> "z", "z" -> "x", "c" -> "x")

  test("labelPropagation matches the reference model at 0 through 3 rounds") {
    for (it <- 0 to 3)
      assert(lpRun(twoTri, it) === lpRef(twoTri, it), s"round $it")
  }

  test("labelPropagation: two triangles converge to two communities") {
    val got = lpRun(twoTri, 3)
    assert(got === lpRef(twoTri, 3))
    // each triangle is label-uniform; 'a' (min of left) and one of the
    // right labels win their sides
    assert(Set(got("a"), got("b")).size == 1 || Set(got("a"), got("b"), got("c")).size <= 2)
    assert(got("x") == got("y") && got("y") == got("z"))
  }

  test("labelPropagation: duplicate rows, reversed rows, self-loops collapse") {
    val noisy = twoTri ++ twoTri.map(e => (e._2, e._1)) ++ Seq("a" -> "a", "x" -> "x")
    assert(lpRun(noisy, 2) === lpRef(twoTri, 2))
  }

  test("triangleCounts: known graph, reversed/duplicate edges, pendant and square") {
    // triangle 1-2-3, pendant 3-4, square 5-6-7-8 (no triangle); noise:
    // reversed dup of (1,2), a self-loop, an exact dup of (5,6)
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (5L, 6L), (6L, 7L), (7L, 8L), (5L, 8L),
      (2L, 1L), (4L, 4L), (5L, 6L)
    ).toDF("src", "dst")
    val got = Graphs.triangleCounts(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((2L, 1L, 10000L)))
    assert(got(2L) == ((2L, 1L, 10000L)))
    assert(got(3L) == ((3L, 1L, 3333L)))
    assert(got(4L) == ((1L, 0L, 0L)))
    for (n <- 5L to 8L) assert(got(n) == ((2L, 0L, 0L)), s"square node $n")
    assert(got.size == 8)
  }

  test("triangleCounts equals the brute-force model on a random graph") {
    val rnd = new scala.util.Random(11)
    val raw = Seq.fill(120)((rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
    val es = raw.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val nbr = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    val want = nbr.map { case (n, ns) =>
      val nsq = ns.toSeq
      val tri = (for { a <- nsq; b <- nsq if a < b && nbr(a).contains(b) } yield 1).size.toLong
      val d = ns.size.toLong
      n -> ((d, tri, if (d >= 2) tri * 20000L / (d * (d - 1)) else 0L))
    }
    val got = Graphs.triangleCounts(raw.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want)
  }

  test("hitsInt: hand-computed L1-normalized hubs/authorities, one iteration") {
    val edges = Seq(("1", "3"), ("2", "3"), ("3", "4")).toDF("src", "dst")
    val out = Graphs.hitsInt(edges, "src", "dst", iters = 1)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // auth_raw: 3←2e6, 4←1e6, Σ=3e6 → auth 3=666666, 4=333333
    // hub_raw: 1←666666, 2←666666, 3←333333, Σ=1666665
    //   → hub 1=2=400000 exact, 3=200000 exact, 4=0
    assert(out == Map(
      "1" -> ((400000L, 0L)), "2" -> ((400000L, 0L)),
      "3" -> ((200000L, 666666L)), "4" -> ((0L, 333333L))))
  }

  test("hitsInt: duplicate/reversed-free distinct edges; masses stay normalized") {
    val edges = Seq(("a", "b"), ("a", "b"), ("b", "a")).toDF("src", "dst")
    val out = Graphs.hitsInt(edges, "src", "dst", iters = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // symmetric 2-cycle: every phase spreads all mass evenly
    assert(out == Map("a" -> ((500000L, 500000L)), "b" -> ((500000L, 500000L))))
  }

  test("adamicAdar: path graph predicts the two-hop pairs, skips existing edges") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 4L)).toDF("src", "dst")
    val out = Graphs.adamicAdar(edges, "src", "dst", maxDeg = 10, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // (1,3) via z=2 (deg 2), (2,4) via z=1 (deg 2); 1e9 div 693 = 1443001
    assert(out.toSeq == Seq((1L, 3L, 1L, 1443001L), (2L, 4L, 1L, 1443001L)))
  }

  test("adamicAdar: hub centers above maxDeg are excluded as wedge centers") {
    val star = (1L to 4L).map(i => (0L, i)).toDF("src", "dst")
    assert(Graphs.adamicAdar(star, "src", "dst", maxDeg = 3, k = 10).count() == 0L)
    // with the cap lifted, the 6 leaf pairs appear via center 0 (deg 4)
    val lifted = Graphs.adamicAdar(star, "src", "dst", maxDeg = 4, k = 10).collect()
    assert(lifted.length == 6)
    // 1e9 div round(ln(4)·1000=1386) = 721500
    assert(lifted.forall(r => r.getLong(2) == 1L && r.getLong(3) == 721500L))
  }

  test("personalizedPageRankInt: seed-only teleport, hand-computed two rounds") {
    val edges = Seq(("1", "2"), ("2", "1"), ("2", "3")).toDF("src", "dst")
    val seeds = Seq("1").toDF("s")
    // N=3, |S|=1: base(1)=15e5·3/100=450000, rank0(1)=3e6, others 0
    val r1 = Graphs.personalizedPageRankInt(edges, "src", "dst", seeds, "s", iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // inflow: 2←3e6 (odeg(1)=1); rank1 = base + 85%·inflow
    assert(r1 == Map("1" -> 450000L, "2" -> 2550000L, "3" -> 0L))
    val r2 = Graphs.personalizedPageRankInt(edges, "src", "dst", seeds, "s", iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // shares: 1→2: 450000; 2→{1,3}: 2550000 div 2 = 1275000 each
    assert(r2 == Map("1" -> (450000L + 85L * 1275000L / 100L),
      "2" -> (85L * 450000L / 100L), "3" -> (85L * 1275000L / 100L)))
  }

  test("personalizedPageRankInt rejects a seed set disjoint from the graph") {
    val edges = Seq(("1", "2")).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Graphs.personalizedPageRankInt(edges, "src", "dst",
        Seq("99").toDF("s"), "s", iters = 1)
    }
  }

  test("hitsPhase plan: edge join + node agg, 1-row total broadcast, no window") {
    val p = Graphs.hitsPhasePlanFrame(twoTri.toDF("src", "dst"), "src", "dst")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      s"normalization must be arithmetic, not a window:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"only the broadcast 1-row total may cross:\n$p")
    assert(p.contains("HashAggregate"),
      s"the phase sum must map-side combine:\n$p")
  }

  test("lpRound plan: join + two hash aggregates, no window, no product join") {
    val p = Graphs.lpRoundPlanFrame(twoTri.toDF("src", "dst"), "src", "dst")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"LPA round must never fall back to a product join:\n$p")
    assert(!p.contains("Window"),
      s"per-node argmax must be an aggregate, not a row_number window:\n$p")
    assert(raw"HashAggregate\(keys=\[node#\d+, label#\d+"
      .r.findFirstIn(p).nonEmpty, s"expected the (node, label) vote agg in:\n$p")
  }

  test("kCore: hand graph peels in the documented order; core and rounds exact") {
    // K4 on {1,2,3,4} plus a tail 4-5-6-7. k=2: the tail peels one layer
    // per round (7 at r1, then 6, then 5 — each only falls below k after
    // its outer neighbor leaves), and the K4 is the fixpoint core.
    val edges = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),
      (4L,5L),(5L,6L),(6L,7L)).toDF("src", "dst")
    val out = Graphs.kCore(edges, "src", "dst", k = 2, rounds = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(out(7L) == ((1L, 0L, false, true)))
    assert(out(6L) == ((2L, 0L, false, true)))
    assert(out(5L) == ((3L, 0L, false, true)))
    for (n <- Seq(1L, 2L, 3L, 4L)) assert(out(n) == ((0L, 3L, true, true)), s"node $n: " + out(n))
  }

  test("kCore: unconverged budget reports converged=false; whole graph can peel away") {
    // path 1-2-3-4-5: k=2 peels one endpoint layer per round
    val path = Seq((1L,2L),(2L,3L),(3L,4L),(4L,5L)).toDF("src", "dst")
    val tight = Graphs.kCore(path, "src", "dst", k = 2, rounds = 1).collect()
    assert(tight.forall(!_.getBoolean(4)))          // round 1 removed 1 and 5 -> not fixpoint
    val full = Graphs.kCore(path, "src", "dst", k = 2, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rounds: {1,5} at r1 -> {2,4} at r2 -> {3} at r3; nothing survives
    assert(full == Map(1L -> 1L, 5L -> 1L, 2L -> 2L, 4L -> 2L, 3L -> 3L))
  }
  test("kCore round plan: delta join + degree agg + survivor FILTER, no anti-join, no window") {
    val p = Graphs.kCoreRoundPlanFrame(
        Seq((1L,2L),(2L,3L)).toDF("src", "dst"), "src", "dst", k = 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"peel rounds must stay node-keyed equi-joins:\n$p")
    assert(!p.contains("Window"), s"degrees are aggregates, not windows:\n$p")
    // the survivor set is `deg >= k` over the SAME keyed aggregate the
    // frontier filters — an anti-join here would be a whole extra
    // exchange per round for a predicate the filter already expresses
    assert(!p.contains("LeftAnti"),
      s"survivors must come from the deg >= k filter, not an anti join:\n$p")
    assert(p.contains("(deg"), s"expected the survivor degree filter:\n$p")
  }
  test("harmonicCentrality: exact reciprocal-distance sums on a path graph") {
    // path 1-2-3-4, sketches below k exact: node 2 reaches {1,3} at d=1
    // and {4} at d=2 → H = 2000/1 + 1000/2 = 2500 milli; node 1 reaches
    // {2} at 1, {3} at 2, {4} at 3 → 1000 + 500 + 333 = 1833. Inner
    // nodes outrank the endpoints; node id breaks the tie.
    val edges = Seq((1L,2L),(2L,3L),(3L,4L)).toDF("src", "dst")
    val out = Graphs.harmonicCentrality(edges, "src", "dst",
        rounds = 3, k = 16, topK = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((2L, 4000L, 2500L), (3L, 4000L, 2500L),
      (1L, 4000L, 1833L), (4L, 4000L, 1833L)), s"got $out")
  }

  test("betweenness: exact Brandes dependency sums on a path graph (all nodes as pivots)") {
    // path 1-2-3-4-5, unique shortest paths (σ = 1 everywhere, so the
    // milli quantization is exact): node 3 is interior to 4 unordered
    // pairs → 8 ordered → 8000 milli; nodes 2/4 to 3 → 6000; ends 0.
    // n_pivots counts pivot trees that REACHED the node within the
    // horizon (δ = 0 arrivals included) — the node's own BFS excluded.
    val edges = Seq((1L,2L),(2L,3L),(3L,4L),(4L,5L)).toDF("src", "dst")
    val out = Graphs.betweenness(edges, "src", "dst",
        pivots = 5, rounds = 4, topK = 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(3L -> ((8000L, 4L)), 2L -> ((6000L, 4L)), 4L -> ((6000L, 4L))),
      s"got $out")
  }

  test("hyperAnf: exact neighborhood function on a path graph (sketches below k are exact)") {
    // path 1-2-3-4: |ball_t| sums = 4, 10, 14, 16; mean distance at
    // t=3 over all 16 pairs = 20/16 = 1.25
    val edges = Seq((1L,2L),(2L,3L),(3L,4L)).toDF("src", "dst")
    val out = Graphs.hyperAnf(edges, "src", "dst", rounds = 3, k = 16).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == ((4000L, 4000L, 0L)))
    assert(out(1L) == ((10000L, 6000L, 600L)))
    assert(out(2L) == ((14000L, 4000L, 1000L)))
    assert(out(3L) == ((16000L, 2000L, 1250L)))
  }

  test("hyperAnf: per-round deltas are never negative (sketches grow monotonically)") {
    val edges = (1 to 60).map(i => (i.toLong, ((i * 7) % 60 + 1).toLong))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    val out = Graphs.hyperAnf(edges, "src", "dst", rounds = 4, k = 16).collect()
    assert(out.forall(_.getLong(2) >= 0L))
    // nf is non-decreasing in t
    val byT = out.map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).map(_._2)
    assert(byT.zip(byT.tail).forall { case (a, b) => b >= a })
  }

  test("modularity: two triangles bridged by one edge, hand-computed Q") {
    import org.apache.spark.sql.functions._
    // edges ab ac bc de df ef cd → m = 7; labels {a,b,c} vs {d,e,f}:
    // tot = (7, 7), sum_tot_sq = 98, intra = 6,
    // num = 4·7·6 − 98 = 70, Q = 70/196 → bp = ⌊266·10⁴/196⌋ − 10⁴ = 3571
    val edges = Seq(("a","b"),("a","c"),("b","c"),("d","e"),("d","f"),
      ("e","f"),("c","d")).toDF("src", "dst")
    val labels = Seq(("a","X"),("b","X"),("c","X"),("d","Y"),("e","Y"),("f","Y"))
      .toDF("node", "label")
    val r = Graphs.modularity(edges, "src", "dst", labels).collect()(0)
    assert(r.toSeq == Seq(6L, 7L, 2L, 6L, 98L, 3571L))
    // the degenerate all-one-label partition scores exactly 0
    val one = Graphs.modularity(edges, "src", "dst",
      labels.select(col("node"), lit("Z").as("label"))).collect()(0)
    assert(one.getLong(5) == 0L && one.getLong(3) == 7L)
    // reversed duplicate edges and self-loops collapse before scoring
    val messy = edges.unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .unionAll(Seq(("a","a")).toDF("src", "dst"))
    assert(Graphs.modularity(messy, "src", "dst", labels).collect()(0).toSeq
      == r.toSeq)
  }

  test("modularityRefine: a mislabeled bridge node moves home; settled nodes stay") {
    import org.apache.spark.sql.functions._
    // bridged triangles with c mislabeled into Y: m = 7, 2m = 14.
    // c's gains: G(X) = 14·2 − 3·tot_X(4) = 16 > G(Y own) = 14·1 −
    // 3·(tot_Y(10) − 3) = −7 → c moves to X. a/b/d/e/f all stay
    // (a: G(X own) = 14 − 2·(4−2) = 10 > G(Y) = 14 − 2·10 = −6).
    val edges = Seq(("a","b"),("a","c"),("b","c"),("d","e"),("d","f"),
      ("e","f"),("c","d")).toDF("src", "dst")
    val labels = Seq(("a","X"),("b","X"),("c","Y"),("d","Y"),("e","Y"),("f","Y"))
      .toDF("node", "label")
    val refined = Graphs.modularityRefine(edges, "src", "dst", labels)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(refined == Map("a" -> "X", "b" -> "X", "c" -> "X",
      "d" -> "Y", "e" -> "Y", "f" -> "Y"))
    // the move strictly improves modularity: 1224 bp → 3571 bp
    val before = Graphs.modularity(edges, "src", "dst", labels).collect()(0).getLong(5)
    val after = Graphs.modularity(edges, "src", "dst",
      Seq(("a","X"),("b","X"),("c","X"),("d","Y"),("e","Y"),("f","Y"))
        .toDF("node", "label")).collect()(0).getLong(5)
    assert(before == 1224L && after == 3571L)
    // a well-partitioned assignment is a fixpoint (no strict gain anywhere)
    val settled = Graphs.modularityRefine(edges, "src", "dst",
      Seq(("a","X"),("b","X"),("c","X"),("d","Y"),("e","Y"),("f","Y"))
        .toDF("node", "label"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(settled == Map("a" -> "X", "b" -> "X", "c" -> "X",
      "d" -> "Y", "e" -> "Y", "f" -> "Y"))
  }

  test("hyperAnf round plan: adjacency equi-join + explode + O(k)-state sketch agg, no window") {
    import org.apache.spark.sql.functions._
    val e = Seq((1L,2L),(2L,3L)).toDF("src", "dst")
    val adj = e.select(col("src").as("node"), col("dst").as("nbr"))
      .unionAll(e.select(col("dst").as("node"), col("src").as("nbr")))
    val sk = adj.select(col("node")).distinct()
      .withColumn("hs", array(graft.ext.ThetaSketch.hash40(col("node"))))
    val p = adj.join(sk.select(col("node").as("nbr"), col("hs")), "nbr")
      .select(col("node"), explode(col("hs")).as("__h"))
      .unionByName(sk.select(col("node"), explode(col("hs")).as("__h")))
      .groupBy("node")
      .agg(graft.functions.GraftFunctions.kmvValues(col("__h"), 16).as("hs"))
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"),
      s"the sketch union must fold as the O(k) typed aggregate:\n$p")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      s"rounds are join + explode + agg only:\n$p")
  }

  test("assortativity: a perfect star is perfectly disassortative; constant degrees degenerate to 0") {
    import org.apache.spark.sql.functions._
    // star: hub degree 3, leaves 1 → M=6, Σx=Σd²=12, Σx²=Σd³=30, Σxy=18
    // r = (6·18 − 144)/(6·30 − 144) = −36/36 = −1 → −1000 milli
    val star = Seq(("h","a"),("h","b"),("h","c")).toDF("src", "dst")
    val r = Graphs.assortativity(star, "src", "dst").collect()(0)
    assert(r.toSeq == Seq(4L, 3L, 12L, 30L, 18L, -1000L))
    // triangle: every degree 2 → zero variance → the 0 convention
    val tri = Seq(("a","b"),("b","c"),("c","a")).toDF("src", "dst")
    assert(Graphs.assortativity(tri, "src", "dst").collect()(0).getLong(5) == 0L)
  }
}
