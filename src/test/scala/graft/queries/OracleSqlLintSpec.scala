package graft.queries

import graft.SparkEntry
import org.scalatest.funsuite.AnyFunSuite

/** Lint over every registered DuckDB oracle: no final-projection item may
  * leak a HUGEINT to the output. DuckDB promotes `sum(BIGINT)` to HUGEINT,
  * and HUGEINT never hash-matches Spark's int64 at the driver's raw-value
  * compare — the exact r9 q277 failure, where the local sweep's DB-API
  * type codes collapsed BIGINT and HUGEINT into one code and certified a
  * query the driver rejected. The repo rule (TrainingQueries.scala header):
  * explicit BIGINT casts in every DuckDB oracle sum.
  *
  * Rule enforced here, on the FINAL top-level projection(s) only (CTE-
  * internal sums that are cast or consumed before the output are fine):
  * every aggregate `sum(` must either sit inside a `CAST( ... )` span or
  * have its value immediately consumed by float division `/` (which
  * produces DOUBLE, not HUGEINT). `list_sum` is exempt — over DOUBLE
  * lists it yields DOUBLE, and the BIGINT-list cases are covered by the
  * sweep's DESCRIBE type gate (tools/selfcheck.py), the authoritative
  * check this lint fast-fails for in `sbt test`.
  */
class OracleSqlLintSpec extends AnyFunSuite {

  /** Character spans covered by a CAST( ... ) call (content between the
    * CAST keyword and its matching close paren).
    */
  private def castSpans(sql: String): Seq[(Int, Int)] = {
    val spans = Seq.newBuilder[(Int, Int)]
    val re = "(?i)\\bCAST\\s*\\(".r
    for (m <- re.findAllMatchIn(sql)) {
      var depth = 0
      var i = m.end - 1
      var close = -1
      while (i < sql.length && close < 0) {
        sql.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) close = i
          case _ =>
        }
        i += 1
      }
      if (close >= 0) spans += ((m.start, close))
    }
    spans.result()
  }

  /** (start, end) of every TOP-LEVEL `SELECT ... FROM` projection list —
    * depth-0 scan, so CTE bodies (inside parens) are skipped. A UNION ALL
    * of top-level SELECTs yields one segment per branch.
    */
  private def finalProjections(sql: String): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    var depth = 0
    var sel = -1
    var i = 0
    def kwAt(kw: String): Boolean =
      sql.regionMatches(true, i, kw, 0, kw.length) &&
        (i == 0 || { val p = sql.charAt(i - 1); !p.isLetterOrDigit && p != '_' }) &&
        (i + kw.length >= sql.length || {
          val n = sql.charAt(i + kw.length); !n.isLetterOrDigit && n != '_'
        })
    while (i < sql.length) {
      sql.charAt(i) match {
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case _ if depth == 0 && kwAt("SELECT") => sel = i + 6; i += 6
        case _ if depth == 0 && sel >= 0 && kwAt("FROM") =>
          out += ((sel, i)); sel = -1; i += 4
        case _ => i += 1
      }
    }
    if (sel >= 0) out += ((sel, sql.length))
    out.result()
  }

  /** Offsets of aggregate `sum(` calls (list_sum excluded) inside the
    * final projections that are neither CAST-covered nor float-divided.
    */
  private[queries] def uncastSums(sql: String): Seq[String] = {
    val spans = castSpans(sql)
    val projections = finalProjections(sql)
    val re = "(?i)(?<![a-z_])sum\\s*\\(".r
    re.findAllMatchIn(sql).toSeq.collect {
      case m
          if projections.exists { case (a, b) => m.start >= a && m.start < b } &&
            !spans.exists { case (a, b) => m.start >= a && m.start <= b } &&
            !floatDivided(sql, m.end - 1) =>
        sql.substring(m.start, math.min(sql.length, m.start + 40)).replace('\n', ' ')
    }
  }

  /** True when the char after the sum's matching close paren is a single
    * `/` (float division → DOUBLE); `//` stays integer and keeps HUGEINT.
    */
  private def floatDivided(sql: String, open: Int): Boolean = {
    var depth = 0
    var i = open
    var close = -1
    while (i < sql.length && close < 0) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) close = i
        case _ =>
      }
      i += 1
    }
    if (close < 0) return false
    var j = close + 1
    while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
    j < sql.length && sql.charAt(j) == '/' &&
      (j + 1 >= sql.length || sql.charAt(j + 1) != '/')
  }

  test("lint catches the r9 q277 defect text (un-CAST sum in final projection)") {
    val r9q277 =
      """WITH per AS (SELECT epoch_us(ts) // 86400000000 AS day,
        CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1)
      SELECT CAST(count(*) AS BIGINT) AS n_partitions,
        CAST(sum(n) AS BIGINT) AS n_rows,
        CAST(min(n) AS BIGINT) AS min_rows,
        CAST(max(n) AS BIGINT) AS max_rows,
        CAST(max(n) AS BIGINT) * 1000 * count(*) // sum(n) AS skew_milli
      FROM per"""
    val flags = uncastSums(r9q277)
    assert(flags.nonEmpty, "the r9 q277 oracle text must be red under this lint")
    assert(flags.exists(_.startsWith("sum(n)")))
  }

  test("lint passes CAST-covered and float-divided sums") {
    assert(uncastSums("SELECT CAST(sum(n) AS BIGINT) AS s FROM t").isEmpty)
    assert(uncastSums("SELECT round(sum(n) / count(*), 4) AS m FROM t").isEmpty)
    // CTE-internal sums are out of scope (consumed before the output)
    assert(uncastSums(
      "WITH a AS (SELECT sum(n) AS s FROM t) SELECT CAST(s AS BIGINT) AS s FROM a").isEmpty)
    assert(uncastSums("SELECT sum(n) AS s FROM t").nonEmpty)
    assert(uncastSums("SELECT sum(n) // 2 AS s FROM t").nonEmpty)
  }

  test("every registered oracle SQL is free of un-CAST final-projection sums") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      val flags = uncastSums(sql)
      if (flags.nonEmpty) Some(s"$name: ${flags.mkString("; ")}") else None
    }
    assert(bad.isEmpty, s"HUGEINT-leaking oracle projections:\n${bad.mkString("\n")}")
  }
}
