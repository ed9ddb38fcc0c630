package graft.ext

import graft.SparkFunSuite

class ComponentsSpec extends SparkFunSuite {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], maxIter: Int = 16): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("src", "dst"), "src", "dst", maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference union-find: component = min node id. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // path-compress to true roots, then label every node by its root,
    // which by the min-union above is the component min
    parent.keys.toSeq.map(n => n -> find(n)).toMap
  }

  test("matches union-find on random graphs (multiple shapes)") {
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(120)((rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
        .filter { case (a, b) => a != b }
      assert(cc(edges) == unionFind(edges), s"seed=$seed")
    }
  }

  test("long chain converges within log2-ish rounds (pointer jumping, not O(diameter))") {
    // a 300-node path has diameter 299: plain edge propagation would need
    // ~300 rounds; the label-of-label jump must close it within 16
    val edges = (0L until 299L).map(i => (i, i + 1))
    val result = cc(edges, maxIter = 16)
    assert(result.size == 300 && result.values.forall(_ == 0L))
  }

  test("disconnected components each get their own min label; non-edge nodes absent") {
    val edges = Seq((5L, 3L), (3L, 9L), (20L, 21L))
    assert(cc(edges) == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
  }

  test("duplicate, reversed, and self-loop edges do not change the answer") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (7L, 7L), (2L, 4L))
    assert(cc(edges) == Map(1L -> 1L, 2L -> 1L, 4L -> 1L))
  }

  test("connectedComponentsStr: string nodes, component = min node string, dictionary-independent") {
    // url-ish keys whose LEXICOGRAPHIC min differs from hash order, plus a
    // reversed edge and a self-loop; clusters {a.example, m.example,
    // z.example} and {beta.example, delta.example}
    val edges = Seq(
      "z.example" -> "m.example", "m.example" -> "a.example",
      "a.example" -> "a.example", "delta.example" -> "beta.example")
    val got = Components.connectedComponentsStr(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map(
      "a.example" -> "a.example", "m.example" -> "a.example", "z.example" -> "a.example",
      "beta.example" -> "beta.example", "delta.example" -> "beta.example"))
  }

  test("representatives: highest score wins, smallest id on ties, singletons pass through") {
    import spark.implicits._
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L)).toDF("doc_id", "cluster_id")
    val scores = Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 7L)).toDF("doc_id", "n_tokens")
    val out = Components.representatives(labels, scores, "doc_id", "cluster_id", "n_tokens")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // cluster 1: docs 2 and 3 tie at 9 → smallest id 2 kept, 2 removed
    assert(out(1L) == ((3L, 2L, 9L, 2L)))
    assert(out(4L) == ((1L, 4L, 7L, 0L)))
  }
}
