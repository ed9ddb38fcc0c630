package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class BloomSketchSpec extends SparkFunSuite {
  import spark.implicits._

  test("BloomBuffer: added items always contained, parameter mismatch refuses merge") {
    val b = new BloomBuffer(1024, 5)
    val hs = (1L to 200L).map(i => BloomBuffer.hashOf(
      org.apache.spark.unsafe.types.UTF8String.fromString(s"item$i"),
      org.apache.spark.sql.types.StringType))
    hs.foreach(b.addHash)
    assert(hs.forall(b.containsHash)) // no false negatives, ever
    val other = new BloomBuffer(2048, 5)
    intercept[IllegalArgumentException](b.mergeFrom(other))
  }

  test("distributed build across partitions: sound membership + low FP at design load") {
    // 2k members over 8 partitions — partial filters must OR-merge correctly
    val members = spark.range(0, 2000, 1, 8).select(concat(lit("m"), $"id").as("s"))
    val bytes = members.agg(GraftFunctions.bloomAgg($"s", 1 << 15, 5)).head().getAs[Array[Byte]](0)
    val bf = lit(bytes)
    // every member flagged (soundness would break if partial merge dropped bits)
    val missed = members.filter(!GraftFunctions.bloomContains(bf, $"s")).count()
    assert(missed == 0L)
    // non-members: ~10 bits/item, k=5 → FP ≈ 1%; allow generous 5%
    val probes = spark.range(0, 2000).select(concat(lit("x"), $"id").as("s"))
    val fp = probes.filter(GraftFunctions.bloomContains(bf, $"s")).count()
    assert(fp < 100L, s"false-positive count $fp out of 2000 exceeds 5%")
  }

  test("probe agrees between codegen projection and interpreted HOF lambda") {
    val members = spark.range(0, 500).select(concat(lit("m"), $"id").as("s"))
    val bytes = members.agg(GraftFunctions.bloomAgg($"s", 1 << 14, 5)).head().getAs[Array[Byte]](0)
    val bf = lit(bytes)
    val probeSet = spark.range(0, 1000).select(concat(lit("m"), $"id").as("s"))
    // top-level projection (whole-stage codegen path)
    val viaProjection = probeSet
      .select($"s", GraftFunctions.bloomContains(bf, $"s").as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // inside an array HOF (interpreted eval path)
    val viaLambda = probeSet
      .select($"s", size(filter(array($"s"), e => GraftFunctions.bloomContains(bf, e))) > 0)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(viaProjection == viaLambda)
    assert((0 until 500).forall(i => viaProjection(s"m$i"))) // members all hit
  }

  test("SQL surface: graft_bloom_agg / graft_bloom_contains round-trip") {
    spark.range(0, 100).select(concat(lit("k"), $"id").as("s")).createOrReplaceTempView("bloom_in")
    val bytes = spark.sql(s"SELECT graft_bloom_agg(s, ${1 << 12}, 4) FROM bloom_in")
      .head().getAs[Array[Byte]](0)
    Seq("k5", "definitely-not-there-zzz").toDF("s").createOrReplaceTempView("bloom_probe")
    // filter side must be foldable — ship the bytes as a named literal param
    val viaParam = spark.sql(
      "SELECT s, graft_bloom_contains(:bf, s) AS hit FROM bloom_probe",
      Map("bf" -> bytes)).collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(viaParam("k5"))
    assert(!viaParam("definitely-not-there-zzz"))
  }

  test("null semantics: null item → null, null filter → null") {
    val bytes = spark.range(0, 10).select(concat(lit("m"), $"id").as("s"))
      .agg(GraftFunctions.bloomAgg($"s", 1 << 10, 3)).head().getAs[Array[Byte]](0)
    val df = Seq(Some("m1"), None).toDF("s")
    val withFilter = df.select(GraftFunctions.bloomContains(lit(bytes), $"s")).collect()
    assert(withFilter(0).getBoolean(0))
    assert(withFilter(1).isNullAt(0))
    val nullFilter = df.filter($"s".isNotNull)
      .select(GraftFunctions.bloomContains(lit(null).cast("binary"), $"s")).collect()
    assert(nullFilter(0).isNullAt(0))
  }
}
