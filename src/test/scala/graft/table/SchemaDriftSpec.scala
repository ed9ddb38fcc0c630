package graft.table

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class SchemaDriftSpec extends SparkFunSuite {
  import spark.implicits._

  // era midpoint of [0, 100] is 50: ts*2 < 100 → early, else late
  private def frame(rows: (String, Long, String)*) =
    rows.toDF("grp", "ts", "props").withColumn("ts", col("ts").cast("timestamp"))

  test("classifies new / dropped / shifted / stable per (group, key)") {
    val df = frame(
      ("a", 0L, """{"stable": 1, "old": 2}"""),
      ("a", 10L, """{"stable": 1, "old": 2, "fade": 3}"""),
      ("a", 20L, """{"stable": 1, "old": 2}"""),
      ("a", 30L, """{"stable": 1, "old": 2, "fade": 3}"""),
      ("a", 60L, """{"stable": 1, "fresh": 9, "fade": 3}"""),
      ("a", 70L, """{"stable": 1, "fresh": 9}"""),
      ("a", 80L, """{"stable": 1, "fresh": 9}"""),
      ("a", 100L, """{"stable": 1, "fresh": 9}""")
    )
    val out = SchemaDrift.payloadDriftAudit(df, "grp", "ts", "props")
      .collect().map(r => r.getAs[String]("key") ->
        ((r.getAs[Long]("n_early"), r.getAs[Long]("n_late"),
          r.getAs[Long]("early_bp"), r.getAs[Long]("late_bp"),
          r.getAs[String]("drift")))).toMap
    assert(out("stable") == ((4L, 4L, 10000L, 10000L, "stable")))
    assert(out("old") == ((4L, 0L, 10000L, 0L, "dropped")))
    assert(out("fresh") == ((0L, 4L, 0L, 10000L, "new")))
    // fade: 2/4 early (5000 bp) vs 1/4 late (2500 bp) → |Δ|=2500 > 500
    assert(out("fade") == ((2L, 1L, 5000L, 2500L, "shifted")))
  }

  test("shiftBp threshold gates shifted vs stable; rates are exact integer bp") {
    val df = frame(
      ("g", 0L, """{"k": 1}"""), ("g", 10L, """{"k": 1}"""),
      ("g", 20L, """{"x": 1}"""),
      ("g", 60L, """{"k": 1}"""), ("g", 70L, """{"k": 1}"""),
      ("g", 80L, """{"k": 1}""")
    )
    // k: early 2/3 = 6666 bp, late 3/3 = 10000 bp → |Δ| = 3334
    val strict = SchemaDrift.payloadDriftAudit(df, "grp", "ts", "props", shiftBp = 3000L)
      .filter(col("key") === "k").collect().head
    assert(strict.getAs[Long]("early_bp") == 6666L)
    assert(strict.getAs[String]("drift") == "shifted")
    val lax = SchemaDrift.payloadDriftAudit(df, "grp", "ts", "props", shiftBp = 4000L)
      .filter(col("key") === "k").collect().head
    assert(lax.getAs[String]("drift") == "stable")
  }

  test("malformed payloads drop out of presence but still count in denominators") {
    val df = frame(
      ("g", 0L, """{"k": 1}"""), ("g", 10L, "not json"),
      ("g", 60L, """{"k": 1}"""), ("g", 70L, """{"k": 1}""")
    )
    val row = SchemaDrift.payloadDriftAudit(df, "grp", "ts", "props")
      .collect().map(r => r.getAs[String]("key") ->
        ((r.getAs[Long]("early_bp"), r.getAs[Long]("late_bp")))).toMap
    // early denominator is 2 (malformed row counts): 1/2 = 5000 bp
    assert(row("k") == ((5000L, 10000L)))
  }

  test("groups never mix: same key drifts independently per group") {
    val df = frame(
      ("a", 0L, """{"k": 1}"""), ("a", 60L, "{}"),
      ("b", 0L, "{}"), ("b", 60L, """{"k": 1}""")
    )
    val out = SchemaDrift.payloadDriftAudit(df, "grp", "ts", "props")
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[String]("key")) ->
        r.getAs[String]("drift")).toMap
    assert(out(("a", "k")) == "dropped" && out(("b", "k")) == "new")
  }
}
