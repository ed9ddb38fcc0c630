package graft.ext

import graft.SparkFunSuite

class AffinitySpec extends SparkFunSuite {
  import spark.implicits._

  // baskets: b1{1,2,3} b2{1,2} b3{1,2} b4{2,3} b5{9} (size 1 — out)
  // b6{1,2,3,4} (size 4 — dropped by maxBasket = 3).
  // Capped population: 4 baskets; item counts 1→3, 2→4, 3→2;
  // pair counts (1,2)→3, (2,3)→2, (1,3)→1 (under minBoth).
  private def baskets = Seq(
    (1L, 1L), (1L, 2L), (1L, 3L),
    (2L, 1L), (2L, 2L),
    (3L, 1L), (3L, 2L),
    (4L, 2L), (4L, 3L),
    (5L, 9L),
    (6L, 1L), (6L, 2L), (6L, 3L), (6L, 4L)
  ).toDF("bk", "it")

  test("basketRules: hand-computed support/confidence/lift with the size guard applied") {
    val got = Affinity.basketRules(baskets, "bk", "it",
        minBoth = 2L, maxBasket = 3, topK = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    // all four rules have lift 1000 (independent at these margins);
    // order: (lift desc, confidence desc, antecedent, consequent)
    assert(got.toSeq == Seq(
      (1L, 2L, 3L, 4L, 3L, 7500L, 10000L, 1000L),
      (3L, 2L, 2L, 4L, 2L, 5000L, 10000L, 1000L),
      (2L, 1L, 4L, 3L, 3L, 7500L, 7500L, 1000L),
      (2L, 3L, 4L, 2L, 2L, 5000L, 5000L, 1000L)))
  }

  test("basketRules: minBoth floors pairs before the metric joins") {
    val got = Affinity.basketRules(baskets, "bk", "it",
      minBoth = 3L, maxBasket = 3, topK = 30).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L), (2L, 1L)))
  }

  test("itemNeighbors: cosine of basket-membership vectors, per-item top-k") {
    // (1,2): 3/√(3·4) → 8660 bp; (2,3): 2/√(4·2) → 7071 bp
    val got = Affinity.itemNeighbors(baskets, "bk", "it",
        minBoth = 2L, maxBasket = 3, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5), r.getLong(6))).toSet
    assert(got == Set(
      (1L, 2L, 8660L, 1L),
      (2L, 1L, 8660L, 1L), (2L, 3L, 7071L, 2L),
      (3L, 2L, 7071L, 1L)))
  }

  test("pairCounts: singleton and oversized baskets never reach the pair explode") {
    val got = Affinity.pairCounts(baskets, "bk", "it", maxBasket = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == Map((1L, 2L) -> 3L, (1L, 3L) -> 1L, (2L, 3L) -> 2L))
  }
}
