package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The read-path serving layer as pure SQL — the role Trino plays in the
  * reference (design_doc/Dashboard.md:45-48, PipelineArchitecture.md:180;
  * SURVEY.md §3.3). In this engine the same SQL runs on Spark directly:
  * register the tables as views once, then every dashboard panel is a
  * `spark.sql` call, including the engine's extension functions
  * (graft_dot / graft_kmv_distinct) which are full SQL citizens via
  * SparkSessionExtensions.
  *
  * Each query mirrors a reference dashboard panel, re-based onto the
  * driver test tables; the trending panel is asserted equal to its
  * DataFrame-API twin (q09) in ServingSqlSpec.
  */
object ServingSql {

  /** Register the serving views for a scale-factor directory. */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    Tables.events(spark, dir).createOrReplaceTempView("events")
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
  }

  /** Dashboard panels (name → SQL). */
  val panels: Map[String, String] = Map(
    // Dashboard.md:48 — trending table: weighted engagement, dim enrich, top-k
    "trending" ->
      """WITH scores AS (
        |  SELECT user_id,
        |         sum((CASE event_type WHEN 'purchase' THEN 5 WHEN 'signup' THEN 3
        |              WHEN 'click' THEN 2 WHEN 'view' THEN 1 ELSE 0 END)
        |             * CAST(round(value*100, 0) AS BIGINT)) AS score,
        |         count(*) AS n_events
        |  FROM events GROUP BY user_id)
        |SELECT s.user_id, c.c_mktsegment, s.score, s.n_events
        |FROM scores s LEFT JOIN customer c ON s.user_id = c.c_custkey
        |ORDER BY s.score DESC, s.user_id LIMIT 50""".stripMargin,

    // Dashboard.md:46 — "doomscroll"-style rate: error share per minute bin
    "error_rate_per_minute" ->
      """SELECT date_trunc('minute', ts) AS minute_start,
        |       count(*) AS n_events,
        |       round(count(IF(event_type = 'error', 1, NULL))
        |             / CAST(count(*) AS DOUBLE), 6) AS error_rate
        |FROM events GROUP BY 1""".stripMargin,

    // Dashboard.md:85 / lakehouse_monitor freshness gauge (injectable 'now'
    // via the literal — deterministic here)
    "freshness" ->
      """SELECT max(ts) AS max_ts,
        |       unix_timestamp(TIMESTAMP '2024-02-01 00:00:00') - unix_timestamp(max(ts))
        |         AS lag_s
        |FROM events""".stripMargin,

    // reach panel using the engine's sketch aggregate from SQL (requires
    // GraftExtensions on the session — run() substitutes HLL otherwise)
    "daily_reach_sketch" ->
      """SELECT to_date(ts) AS day,
        |       graft_kmv_distinct(user_id, 64) AS kmv_users,
        |       approx_count_distinct(user_id) AS hll_users
        |FROM events GROUP BY 1""".stripMargin,

    // Dashboard.md:45 velocity-style ratio of weighted sums
    "conversion_velocity" ->
      """SELECT user_id,
        |       round(count(IF(event_type = 'purchase', 1, NULL))
        |             / CAST(nullif(count(IF(event_type = 'click', 1, NULL)), 0) AS DOUBLE), 6)
        |         AS conversion
        |FROM events GROUP BY user_id""".stripMargin,

    // curation tier in pure SQL — same results as the DataFrame twins
    // (asserted in ServingSqlSpec): corpus vocabulary by document
    // frequency (q44) ...
    "vocabulary" ->
      """WITH ex AS (SELECT doc_id,
        |    explode(filter(split(trim(text), '\\s+'), x -> x != '')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM ex GROUP BY 1, 2)
        |SELECT token, count(*) AS df_docs, sum(tf) AS tf_total
        |FROM tf GROUP BY token
        |ORDER BY df_docs DESC, token LIMIT 50""".stripMargin,

    // ... and the deterministic 90/10 hash split (q46)
    "train_split" ->
      """WITH b AS (SELECT doc_id, n_chars,
        |    CAST(conv(substring(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 1, 4), 16, 10)
        |      AS BIGINT) AS bkt
        |  FROM documents)
        |SELECT CASE WHEN bkt < 58982 THEN 'train' ELSE 'val' END AS split,
        |       count(*) AS n_docs, sum(n_chars) AS sum_chars,
        |       min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM b GROUP BY 1""".stripMargin
  )

  def run(spark: SparkSession, name: String): DataFrame = {
    val sql =
      if (graft.functions.GraftFunctions.installed(spark)) panels(name)
      else panels(name).replace("graft_kmv_distinct(user_id, 64)",
        "approx_count_distinct(user_id, 0.01)")
    spark.sql(sql)
  }
}
