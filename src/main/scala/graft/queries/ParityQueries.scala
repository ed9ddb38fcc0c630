package graft.queries

import graft.Tables
import graft.ops.{AsOfJoin, LatestWins, Sessionize}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-parity query suite (SURVEY.md §2) over the driver test data.
  *
  * Every query is paired with an ANSI-SQL oracle executed by DuckDB on the
  * same parquet files. Determinism rules (SURVEY.md §7.5):
  *   - money math in exact integer cents: per-row `round(x*100)::bigint`
  *     then integer SUM — identical regardless of partial-agg order;
  *   - ratios as a single final division of exact integers;
  *   - total ordering everywhere a window/top-k needs one (unique
  *     event_id / orderkey tiebreaks);
  *   - time comparisons in integer microseconds (`unix_micros`).
  */
object ParityQueries {

  final case class Q(name: String, fn: (SparkSession, String) => DataFrame, oracle: Option[String])

  /** round(x*100) as exact bigint cents (order-independent to sum);
    * the one DuckDB-parity money convention shared by every suite. */
  private[queries] def cents(c: Column): Column = round(c * 100, 0).cast("long")

  // ---------------------------------------------------------------------
  // A2/A5 — pricing summary (hash aggregate with partial+final combine)
  private val q01 = Q(
    "q01_pricing_summary",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).cast("long").as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_cents"),
          count(lit(1)).as("count_order")
        )
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
      CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS sum_base_cents,
      CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100,0) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
      count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus""")
  )

  // P5 — filter + projection (predicate/column pushdown to the parquet scan)
  private val q02 = Q(
    "q02_filter_project",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R" && col("l_shipdate") >= lit("1996-01-01"))
        .select(
          col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          cents(col("l_extendedprice")).as("price_cents"),
          to_date(col("l_shipdate")).as("ship_date")
        )
    },
    Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      CAST(round(l_extendedprice*100,0) AS BIGINT) AS price_cents,
      CAST(l_shipdate AS DATE) AS ship_date
      FROM lineitem
      WHERE l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'""")
  )

  // A2/P6 — group-by count + HAVING (reference verify_medallion.py:19-24)
  private val q03 = Q(
    "q03_having",
    (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"))).as("spend_cents"))
        .filter(col("n_orders") > 5),
    Some("""SELECT o_custkey, count(*) AS n_orders,
      CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS spend_cents
      FROM orders GROUP BY o_custkey HAVING count(*) > 5""")
  )

  // P7 — IN-list predicate (reference stream_dims.py:79 `op IN ('c','u')`)
  private val q04 = Q(
    "q04_in_filter",
    (s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderstatus").isin("O", "F"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("total_cents")),
    Some("""SELECT o_orderpriority, count(*) AS n,
      CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS total_cents
      FROM orders WHERE o_orderstatus IN ('O','F') GROUP BY o_orderpriority""")
  )

  // A3/W6 — 1-minute tumbling window × conditional counts
  // (reference stream_content.py:125-135, the video_stats_1min table)
  private val q05 = Q(
    "q05_minute_metrics",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 minute"), col("user_id"))
        .agg(
          count(when(col("event_type") === "view", 1)).as("views"),
          count(when(col("event_type") === "click", 1)).as("clicks"),
          count(when(col("event_type") === "purchase", 1)).as("purchases"),
          count(when(col("event_type") === "signup", 1)).as("signups"),
          count(when(col("event_type") === "error", 1)).as("errors")
        )
        .select(
          col("window.start").as("minute_start"),
          col("user_id"), col("views"), col("clicks"),
          col("purchases"), col("signups"), col("errors")
        ),
    Some("""SELECT date_trunc('minute', ts) AS minute_start, user_id,
      count(*) FILTER (event_type = 'view') AS views,
      count(*) FILTER (event_type = 'click') AS clicks,
      count(*) FILTER (event_type = 'purchase') AS purchases,
      count(*) FILTER (event_type = 'signup') AS signups,
      count(*) FILTER (event_type = 'error') AS errors
      FROM events GROUP BY 1, 2""")
  )

  // W1 — latest event per key (ROW_NUMBER rn=1 dedup, streaming_job.py:133)
  private val q06 = Q(
    "q06_latest_event",
    (s, dir) =>
      LatestWins
        .latestRow(Tables.events(s, dir), Seq("user_id"), "ts", Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("event_type"), cents(col("value")).as("value_cents")),
    Some("""SELECT user_id, event_id, event_type,
      CAST(round(value*100,0) AS BIGINT) AS value_cents
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events) WHERE rn = 1""")
  )

  // W3 — IGNORE NULLS carry-forward (streaming_job.py:106-128): treat
  // 'view' rows as sparse update events that omit the amount field.
  private val q07 = Q(
    "q07_carry_forward",
    (s, dir) => {
      val src = Tables.events(s, dir)
        .withColumn("amount", when(col("event_type") =!= "view", col("value")))
      LatestWins
        .latestState(src, Seq("user_id"), "ts", Seq("event_id"),
          denseCols = Seq("event_type"), sparseCols = Seq("amount"), maxOrderAlias = "last_seen")
        .select(
          col("user_id"),
          col("event_type").as("current_status"),
          cents(col("amount")).as("last_amount_cents"),
          col("last_seen")
        )
    },
    Some("""WITH src AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN event_type <> 'view' THEN value END AS amount
        FROM events),
      ranked AS (
        SELECT user_id, event_type, ts,
               row_number() OVER w AS rn,
               first_value(amount IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_amount,
               max(ts) OVER (PARTITION BY user_id) AS last_seen
        FROM src WINDOW w AS (PARTITION BY user_id ORDER BY ts DESC, event_id DESC))
      SELECT user_id, event_type AS current_status,
             CAST(round(last_amount*100,0) AS BIGINT) AS last_amount_cents, last_seen
      FROM ranked WHERE rn = 1""")
  )

  // J1 — full MERGE upsert semantics: latest batch state merged into a
  // prior target snapshot with per-column coalesce (streaming_job.py:92-155).
  // Target = state built from events before the split point; source batch =
  // events after it; result must equal the state over ALL events.
  private val q08 = Q(
    "q08_merge_upsert",
    (s, dir) => {
      val ev    = Tables.events(s, dir)
        .withColumn("amount", when(col("event_type") =!= "view", col("value")))
      val split = lit("2024-01-20 00:00:00").cast("timestamp")
      def state(df: DataFrame) =
        LatestWins.latestState(df, Seq("user_id"), "ts", Seq("event_id"),
          denseCols = Seq("event_type"), sparseCols = Seq("amount"), maxOrderAlias = "last_seen")
      val target = state(ev.filter(col("ts") < split))
      val batch  = state(ev.filter(col("ts") >= split))
      LatestWins
        .merge(target, batch, key = Seq("user_id"), coalesceCols = Seq("amount"))
        .select(
          col("user_id"),
          col("event_type").as("current_status"),
          cents(col("amount")).as("last_amount_cents"),
          col("last_seen")
        )
    },
    // Upsert of the newer batch over the older snapshot ≡ latest state over
    // the full history (replay convergence property) — same oracle as q07.
    Some("""WITH src AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN event_type <> 'view' THEN value END AS amount
        FROM events),
      ranked AS (
        SELECT user_id, event_type, ts,
               row_number() OVER w AS rn,
               first_value(amount IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_amount,
               max(ts) OVER (PARTITION BY user_id) AS last_seen
        FROM src WINDOW w AS (PARTITION BY user_id ORDER BY ts DESC, event_id DESC))
      SELECT user_id, event_type AS current_status,
             CAST(round(last_amount*100,0) AS BIGINT) AS last_amount_cents, last_seen
      FROM ranked WHERE rn = 1""")
  )

  // J3/A5/O4 — "trending" read-time join: fact agg ⟕ broadcast dim, top-k
  // (design_doc/Dashboard.md:48).
  private val q09 = Q(
    "q09_trending",
    (s, dir) => {
      val weight = when(col("event_type") === "purchase", 5)
        .when(col("event_type") === "signup", 3)
        .when(col("event_type") === "click", 2)
        .when(col("event_type") === "view", 1)
        .otherwise(0)
      val scores = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(sum(weight.cast("long") * cents(col("value"))).as("score"), count(lit(1)).as("n_events"))
      scores
        .join(broadcast(Tables.customer(s, dir)), scores("user_id") === col("c_custkey"), "left")
        .select(col("user_id"), col("c_mktsegment"), col("score"), col("n_events"))
        .orderBy(col("score").desc, col("user_id"))
        .limit(50)
    },
    Some("""WITH scores AS (
        SELECT user_id,
               CAST(sum((CASE event_type WHEN 'purchase' THEN 5 WHEN 'signup' THEN 3
                    WHEN 'click' THEN 2 WHEN 'view' THEN 1 ELSE 0 END)
                   * CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS score,
               count(*) AS n_events
        FROM events GROUP BY user_id)
      SELECT user_id, c_mktsegment, score, n_events
      FROM scores LEFT JOIN customer ON user_id = c_custkey
      ORDER BY score DESC, user_id LIMIT 50""")
  )

  // A5/A6/F10 — ratio-of-sums with null-on-zero-divide (Dashboard.md:45-46)
  private val q10 = Q(
    "q10_funnel_ratio",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
          count(when(col("event_type") === "click", 1)).as("n_click")
        )
        .withColumn(
          "conversion",
          round(col("n_purchase") / when(col("n_click") === 0, lit(null)).otherwise(col("n_click")), 6)
        ),
    Some("""SELECT user_id,
      count(*) FILTER (event_type = 'purchase') AS n_purchase,
      count(*) FILTER (event_type = 'click') AS n_click,
      round(count(*) FILTER (event_type = 'purchase')
            / CAST(nullif(count(*) FILTER (event_type = 'click'), 0) AS DOUBLE), 6) AS conversion
      FROM events GROUP BY user_id""")
  )

  // J3 chain — multiway broadcast joins lineitem⋈supplier⋈nation⋈region
  private val q11 = Q(
    "q11_region_revenue",
    (s, dir) => {
      val li  = Tables.lineitem(s, dir)
      val sup = broadcast(Tables.supplier(s, dir))
      val nat = broadcast(Tables.nation(s, dir))
      val reg = broadcast(Tables.region(s, dir))
      li.join(sup, li("l_suppkey") === sup("s_suppkey"))
        .join(nat, sup("s_nationkey") === nat("n_nationkey"))
        .join(reg, nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_cents"),
          count(lit(1)).as("n_items")
        )
    },
    Some("""SELECT r_name, n_name,
      CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents,
      count(*) AS n_items
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name""")
  )

  // W5 — gap sessionization (30-minute gap, Silver design)
  private val q12 = Q(
    "q12_sessionize",
    (s, dir) =>
      Sessionize.sessions(Tables.events(s, dir), "user_id", "ts", gapSeconds = 1800),
    Some("""WITH g AS (
        SELECT user_id, ts,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS ns
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      tagged AS (
        SELECT user_id, ts,
               CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        FROM g)
      SELECT user_id, session_seq, count(*) AS n_events,
             min(ts) AS session_start, max(ts) AS session_end,
             epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
      FROM tagged GROUP BY user_id, session_seq""")
  )

  // J4 — as-of join: each event matched to the newest order of the same
  // customer at event time (point-in-time enrichment, Silver design).
  private val q13 = Q(
    "q13_asof_join",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      // right side must be unique per (key, time): keep max orderkey
      val ord = LatestWins.latestRowAgg(
        Tables.orders(s, dir).select("o_custkey", "o_orderdate", "o_orderkey", "o_orderstatus"),
        key = Seq("o_custkey", "o_orderdate"), orderCol = "o_orderkey", tieBreak = Nil)
      AsOfJoin(ev, ord,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        rightCols = Seq("o_orderkey", "o_orderstatus"))
        .select(col("event_id"), col("user_id"), col("o_orderkey"), col("o_orderstatus"))
    },
    Some("""WITH o AS (
        SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey,
               max_by(o_orderstatus, o_orderkey) AS o_orderstatus
        FROM orders GROUP BY o_custkey, o_orderdate)
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderstatus
      FROM events e ASOF LEFT JOIN o
        ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""")
  )

  // F1-F3 — JSON body extraction (Header+Body schema-drift design,
  // DataModel_SchemaDesign.md:129 get_json_object)
  private val q14 = Q(
    "q14_json_extract",
    (s, dir) =>
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"), count(col("k")).as("n_k")),
    Some("""SELECT event_type,
      CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
      count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k
      FROM events GROUP BY event_type""")
  )

  // A9 — manual width-bucket heatmap aggregate (Dashboard.md:70)
  private val q15 = Q(
    "q15_value_bins",
    (s, dir) => {
      val bin = when(col("value") < 50, "lo").when(col("value") < 150, "mid").otherwise("hi")
      Tables.events(s, dir)
        .groupBy(col("event_type"), bin.as("value_bin"))
        .agg(
          count(lit(1)).as("n"),
          sum(cents(col("value"))).as("sum_cents")
        )
        .withColumn("avg_cents", round(col("sum_cents") / col("n"), 4))
    },
    Some("""SELECT event_type,
      CASE WHEN value < 50 THEN 'lo' WHEN value < 150 THEN 'mid' ELSE 'hi' END AS value_bin,
      count(*) AS n,
      CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS sum_cents,
      round(sum(CAST(round(value*100,0) AS BIGINT)) / CAST(count(*) AS DOUBLE), 4) AS avg_cents
      FROM events GROUP BY 1, 2""")
  )

  // A10 — month-over-month cohort retention (Dashboard.md:71)
  private val q16 = Q(
    "q16_cohort_retention",
    (s, dir) => {
      val months = Tables.events(s, dir)
        .select(col("user_id"), to_date(date_trunc("month", col("ts"))).as("month"))
        .distinct()
      val m = months.as("m")
      val n = months.select(col("user_id"), col("month").as("next_month")).as("n")
      m.join(n, col("m.user_id") === col("n.user_id") &&
          add_months(col("m.month"), 1) === col("n.next_month"), "left")
        .groupBy(col("m.month"))
        .agg(
          count(lit(1)).as("n_active"),
          count(col("n.next_month")).as("n_retained")
        )
    },
    Some("""WITH months AS (
        SELECT DISTINCT user_id, CAST(date_trunc('month', ts) AS DATE) AS month FROM events)
      SELECT m.month, count(*) AS n_active, count(n.next_month) AS n_retained
      FROM months m LEFT JOIN (SELECT user_id, month AS next_month FROM months) n
        ON m.user_id = n.user_id AND CAST(m.month + INTERVAL 1 MONTH AS DATE) = n.next_month
      GROUP BY m.month""")
  )

  // O4 — top-k (TakeOrderedAndProject, Dashboard.md:48 trending LIMIT 50)
  private val q17 = Q(
    "q17_topk_orders",
    (s, dir) =>
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(50)
        .select(col("o_orderkey"), col("o_custkey"), cents(col("o_totalprice")).as("price_cents")),
    Some("""SELECT o_orderkey, o_custkey, CAST(round(o_totalprice*100,0) AS BIGINT) AS price_cents
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""")
  )

  // left-anti join — the WHEN NOT MATCHED half of MERGE (SURVEY §2.3)
  private val q18 = Q(
    "q18_anti_join",
    (s, dir) => {
      val cust = Tables.customer(s, dir)
      val ord  = Tables.orders(s, dir)
      cust
        .join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""")
  )

  // W2/W4 — analytic windows: per-key max + rank, top-3 rows per key
  private val q19 = Q(
    "q19_window_rank",
    (s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
      val ranked = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
      Tables.events(s, dir)
        .withColumn("max_value", max(col("value")).over(byUser))
        .withColumn("rnk", row_number().over(ranked).cast("long"))
        .filter(col("rnk") <= 3)
        .select(
          col("event_id"), col("user_id"),
          cents(col("value")).as("value_cents"),
          round(col("value") / col("max_value"), 6).as("pct_of_max"),
          col("rnk")
        )
    },
    Some("""SELECT event_id, user_id,
      CAST(round(value*100,0) AS BIGINT) AS value_cents,
      round(value / max_value, 6) AS pct_of_max, rnk
      FROM (SELECT *, max(value) OVER (PARTITION BY user_id) AS max_value,
                   row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk
            FROM events) WHERE rnk <= 3""")
  )

  // A2 + countDistinct — daily distincts (reach-style metric)
  private val q20 = Q(
    "q20_daily_distincts",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("event_type")).as("n_types")
        ),
    Some("""SELECT CAST(ts AS DATE) AS day, count(*) AS n_events,
      count(DISTINCT user_id) AS n_users, count(DISTINCT event_type) AS n_types
      FROM events GROUP BY 1""")
  )

  val all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20)
}
