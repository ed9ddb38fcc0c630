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
}
