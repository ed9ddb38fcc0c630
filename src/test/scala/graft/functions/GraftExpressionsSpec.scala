package graft.functions

import graft.SparkFunSuite
import graft.ext.VectorSearch
import org.apache.spark.sql.functions._

class GraftExpressionsSpec extends SparkFunSuite {
  import spark.implicits._

  test("extensions are installed on the test session") {
    assert(GraftFunctions.installed(spark))
  }

  test("graft_dot is bit-identical to the aggregate/zip_with fold") {
    val vecs = Seq(
      (1L, Array(1.0, 2.5, -3.0), Array(0.5, -1.0, 2.0)),
      (2L, Array.empty[Double], Array.empty[Double]),
      (3L, Array(1e-17, 1e17, 1.0), Array(1e17, 1e-17, 3.0)) // fold-order sensitive
    ).toDF("id", "a", "b")
    val r = vecs.select(
      GraftFunctions.dot($"a", $"b").as("native"),
      VectorSearch.dot($"a", $"b").as("hof")
    ).collect()
    r.foreach(row => assert(
      java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(1))))
  }

  test("graft_dot null semantics match the built-in composition") {
    val df = Seq(
      (1L, Some(Array(1.0, 2.0)), Some(Array(1.0))),        // length mismatch
      (2L, None: Option[Array[Double]], Some(Array(1.0))),  // null input
      (3L, Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0)))
    ).toDF("id", "a", "b")
    val r = df.select($"id", GraftFunctions.dot($"a", $"b").as("n"), VectorSearch.dot($"a", $"b").as("h"))
      .collect().map(x => x.getLong(0) -> (x.isNullAt(1), x.isNullAt(2), if (x.isNullAt(1)) 0.0 else x.getDouble(1))).toMap
    assert(r(1L)._1 && r(1L)._2)  // both null on mismatch
    assert(r(2L)._1 && r(2L)._2)  // both null on null input
    assert(!r(3L)._1 && r(3L)._3 == 11.0)
  }

  test("graft_intersect_size equals size(array_intersect)") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a", "a", "b"), Seq("a")),         // dup in left counts once
      (Seq.empty[String], Seq("x")),
      (Seq("x", "y"), Seq.empty[String])
    ).toDF("a", "b")
    val r = df.select(
      GraftFunctions.intersectSize($"a", $"b").as("native"),
      size(array_intersect($"a", $"b")).as("builtin")).collect()
    r.foreach(row => assert(row.getInt(0) == row.getInt(1)))
    assert(r.map(_.getInt(0)).toSeq == Seq(2, 1, 0, 0))
  }

  test("native expressions run inside whole-stage codegen on real data") {
    val emb = graft.Tables.embeddings(spark, sf)
    val d = emb.select(GraftFunctions.dot(
      VectorSearch.asDouble($"embedding"), VectorSearch.asDouble($"embedding")).as("sq"))
    assert(d.agg(sum($"sq")).collect().head.getDouble(0) > 0)
    // On a double-array scan (no HOF cast in the projection) graft_dot
    // stays inside a WholeStageCodegen span — unlike aggregate/zip_with,
    // which force the projection out of codegen. Parquet-backed input so
    // constant folding can't collapse the plan.
    val p = graft.TestTmp.dir("dot") + "/v"
    emb.select($"vec_id", VectorSearch.asDouble($"embedding").as("v")).write.parquet(p)
    val dd = spark.read.parquet(p).select(GraftFunctions.dot($"v", $"v").as("d"))
    // "*(1)" is the whole-stage-codegen marker on the Project
    assert(dd.queryExecution.executedPlan.toString.contains("*(1) Project [graft_dot"))
    assert(dd.agg(min($"d")).collect().head.getDouble(0) >= 0.0)
  }

  test("sql surface: graft_dot callable from spark.sql") {
    val r = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").collect()
    assert(r.head.getDouble(0) == 11.0)
  }

  test("graft_freq_items keeps every key above N/(m+1) with bounded undercount, across partitions") {
    // skewed stream: "hot" 4000×, "warm" 1000×, 5000 singletons (N = 10000)
    val rows = (Seq.fill(4000)("hot") ++ Seq.fill(1000)("warm") ++
      (1 to 5000).map(i => s"cold$i"))
    val df = spark.sparkContext.parallelize(scala.util.Random.shuffle(rows), 16).toDF("tok")
    val m  = 16
    val got = df.agg(GraftFunctions.freqItems($"tok", m).as("f"))
      .collect().head.getMap[String, Long](0)
    val bound = rows.size / (m + 1) // = 588
    assert(got.contains("hot") && got.contains("warm"))
    assert(got("hot") <= 4000 && got("hot") >= 4000 - bound)
    assert(got("warm") <= 1000 && got("warm") >= 1000 - bound)
    assert(got.size <= m)
    // grouped usage: per-group heavy hitters in one pass
    val g = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z")).toDF("grp", "tok")
      .groupBy($"grp").agg(GraftFunctions.freqItems($"tok", 4).as("f"))
      .collect().map(r => r.getString(0) -> r.getMap[String, Long](1)).toMap
    assert(g("a")("x") == 2L && g("a")("y") == 1L && g("b")("z") == 1L)
  }

  test("sql surface: graft_freq_items callable from spark.sql") {
    val r = spark.sql(
      "SELECT graft_freq_items(c, 4) AS f FROM VALUES ('a'),('a'),('b') AS t(c)")
      .collect().head.getMap[String, Long](0)
    assert(r("a") == 2L && r("b") == 1L)
  }

  test("graft_jaro_winkler matches the canonical worked examples") {
    import spark.implicits._
    // the Winkler-paper / DuckDB-verified reference values
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.961111),   // one transposition + prefix bonus
      ("DIXON", "DICKSONX", 0.813333),  // boost applies (jaro 0.766… > 0.7)
      ("JELLYFISH", "SMELLYFISH", 0.896296), // no common prefix → no boost
      ("DWAYNE", "DUANE", 0.84),
      ("abc", "abc", 1.0),
      ("abc", "xyz", 0.0),
      ("a", "", 0.0))
    val got = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select($"a", $"b",
        round(GraftFunctions.jaroWinkler($"a", $"b"), 6).as("jw"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    cases.foreach { case (a, b, want) =>
      assert(got((a, b)) == want, s"jw($a, $b)")
    }
  }

  test("graft_jaro_winkler is null-safe and codegen-compatible") {
    val r = spark.sql(
      "SELECT graft_jaro_winkler(a, b) FROM VALUES ('x', NULL), (NULL, 'y'), ('ab', 'ab') AS t(a, b)")
      .collect()
    assert(r(0).isNullAt(0) && r(1).isNullAt(0) && r(2).getDouble(0) == 1.0)
    // inside WholeStageCodegen on a non-local projection (a local relation
    // constant-folds to LocalTableScan, which proves nothing)
    import spark.implicits._
    val plan = spark.range(8)
      .select(GraftFunctions.jaroWinkler(
        concat(lit("a"), $"id".cast("string")), lit("ab")))
      .queryExecution.executedPlan.toString
    // "*(1)" is the whole-stage-codegen marker on the Project
    assert(plan.contains("*(1) Project [graft_jaro_winkler"), plan)
  }

  test("graft_dhash64 == the HOF fingerprint, bit for bit, on adversarial payloads") {
    import spark.implicits._
    val payloads = Seq(
      "",                                             // zero-length: all cells 0
      "a",                                            // 1 char: one covered cell
      "ab" * 36,                                      // exactly 72 chars: 1/cell
      (1 to 400).map(i => ('a' + (i * 7 % 26)).toChar).mkString,
      (1 to 2000).map(i => (' ' + (i * 31 % 90)).toChar).mkString, // wide code range
      "The quick brown fox jumps over the lazy dog. " * 20)
    val df = payloads.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "__t").persist()
    val native = df.select($"id", GraftFunctions.dhash64($"__t").as("f"))
      .select($"id", $"f.hi", $"f.lo").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val hof = df.withColumn("f", expr(graft.ext.Multimodal.DhashFpSql))
      .select($"id", $"f.hi", $"f.lo").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(native == hof, s"native=$native\nhof=$hof")
    df.unpersist()
    // codegen-compatible on a non-local projection
    val plan = spark.range(8)
      .select(GraftFunctions.dhash64(concat(lit("payload"), $"id".cast("string"))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_dhash64"), plan)
  }

  test("graft_dhash64 char domain is the UTF-16 unit — non-ASCII pins the documented contract") {
    // The stub-decode contract is all-ASCII, where UTF-16 units, code
    // points, and latin-1 bytes coincide. This spec PINS the domain the
    // implementation actually sums — java charAt, i.e. UTF-16 units: a
    // surrogate pair contributes its TWO surrogate units, not one code
    // point and not four UTF-8 bytes. A codec-equipped build that swaps
    // in real byte payloads must either feed latin-1 (one byte ↔ one
    // unit) or replace the char scan with a byte scan — if that swap
    // silently changes the domain, this test fails loudly.
    import spark.implicits._
    def reference(str: String): (Long, Long) = {
      val len = str.length                 // UTF-16 units, surrogates separate
      val cells = new Array[Long](72)
      for (j <- 0 until 72) {
        val lo = j.toLong * len / 72
        val hi = (j + 1).toLong * len / 72
        if (hi >= lo + 1) {
          var sum = 0L
          for (i <- lo.toInt until hi.toInt) sum += str.charAt(i).toLong
          cells(j) = sum / (hi - lo)
        }
      }
      var hiB = 0L; var loB = 0L
      for (k <- 0 until 64) {
        val bit = if (cells((k / 8) * 9 + k % 8) > cells((k / 8) * 9 + k % 8 + 1)) 1L else 0L
        if (k < 32) hiB = hiB * 2 + bit else loB = loB * 2 + bit
      }
      (hiB, loB)
    }
    val payloads = Seq(
      "café " * 40,                      // latin-1 range (é = 233)
      "中文測試" * 30,        // BMP CJK (units ≈ 20013+)
      ("ab😀" * 40) + "tail",       // surrogate pair: 2 units of 55357/56832
      " ÿ" * 50)              // control + upper latin-1 edge
    val df = payloads.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "__t")
    val got = df.select($"id", GraftFunctions.dhash64($"__t").as("f"))
      .select($"id", $"f.hi", $"f.lo").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    payloads.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == reference(t),
        s"payload $i: UTF-16-unit domain drifted (got ${got(i.toLong)}, want ${reference(t)})")
    }
    // sanity: the emoji payload genuinely exercises the surrogate split
    // (fewer code points than UTF-16 units), so the reference comparison
    // above really did pin the unit domain, not a coincidence
    val s = ("ab😀" * 40) + "tail"
    assert(s.codePointCount(0, s.length) < s.length,
      "surrogate payload must have fewer code points than units")
  }

  test("graft_chroma32 == the HOF fingerprint, bit for bit, on adversarial window pairs") {
    import spark.implicits._
    val windows = Seq(
      ("", ""),                                       // zero-length: all bands 0
      ("a", ""),                                      // 1-char vs empty
      ("ab" * 20, "ba" * 20),                         // 40 chars: bands of 1-2
      ("x" * 33, "y" * 33),                           // exactly 33: 1/band
      ((1 to 128).map(i => ('a' + (i * 7 % 26)).toChar).mkString,
        (1 to 128).map(i => ('a' + (i * 11 % 26)).toChar).mkString),
      ((1 to 128).map(i => (' ' + (i * 31 % 90)).toChar).mkString, // wide code range
        (1 to 100).map(i => (' ' + (i * 17 % 90)).toChar).mkString)) // uneven lengths
    val df = windows.zipWithIndex.map { case ((t, p), i) => (i.toLong, t, p) }
      .toDF("id", "__t", "__p").persist()
    val native = df.select($"id", GraftFunctions.chroma32($"__t", $"__p").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hof = df.withColumn("fp", expr(graft.ext.Multimodal.ChromaFpSql))
      .select($"id", $"fp").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == hof, s"native=$native\nhof=$hof")
    // the uniform-shift invariance the near-dup tier leans on: +1 on every
    // code leaves every gradient delta — so the whole word — unchanged
    val base = (1 to 128).map(i => ('a' + (i * 7 % 26)).toChar).mkString
    val prev = (1 to 128).map(i => ('a' + (i * 11 % 26)).toChar).mkString
    val shifted = Seq((0L, base.map(c => (c + 1).toChar), prev.map(c => (c + 1).toChar)))
      .toDF("id", "__t", "__p")
      .select(GraftFunctions.chroma32($"__t", $"__p")).collect()(0).getLong(0)
    val plain = Seq((0L, base, prev)).toDF("id", "__t", "__p")
      .select(GraftFunctions.chroma32($"__t", $"__p")).collect()(0).getLong(0)
    assert(shifted == plain)
    df.unpersist()
    // codegen-compatible on a non-local projection
    val plan = spark.range(8)
      .select(GraftFunctions.chroma32(
        concat(lit("cur"), $"id".cast("string")), lit("prevwindow")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_chroma32"), plan)
  }
}
