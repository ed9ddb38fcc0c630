package graft.ext

import graft.SparkFunSuite

class AttributionSpec extends SparkFunSuite {
  import spark.implicits._

  // journeys: u1 view→click→purchase; u2 view (no conversion);
  // u3 click→purchase. Transition counts: start→{view 2, click 1};
  // view→{click 1, null 1}; click→conv 2. Probabilities (milli, floor):
  // start→view 666, start→click 333; view→click 500, view→null 500;
  // click→conv 1000.
  private def events = Seq(
    (1L, 1L, 1L, "view"), (1L, 2L, 2L, "click"), (1L, 3L, 3L, "purchase"),
    (2L, 1L, 4L, "view"),
    (3L, 1L, 5L, "click"), (3L, 2L, 6L, "purchase")
  ).toDF("user_id", "ts", "event_id", "event_type")
    .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))

  test("transitionCounts: journeys open at start, end at first conv or fall to null") {
    val got = Attribution.transitionCounts(events, "user_id", "ts",
        "event_id", "event_type", "purchase")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("start", "view") -> 2L, ("start", "click") -> 1L,
      ("view", "click") -> 1L, ("view", "null") -> 1L,
      ("click", "conv") -> 2L))
  }

  test("markovRemovalEffects: hand-walked absorption and removal credits") {
    // full walk: r1 view 666 / click 333; r2 click +333, conv +333;
    // r3 conv +333 → full = 666. Remove click → conv 0 (10000 bp);
    // remove view → conv 333 (5000 bp exactly).
    val got = Attribution.markovRemovalEffects(events, "user_id", "ts",
        "event_id", "event_type", channels = Seq("view", "click"),
        convType = "purchase", steps = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      "view" -> ((666L, 333L, 5000L)),
      "click" -> ((666L, 0L, 10000L))))
  }

  test("transition build plan: user-keyed windows + one hash-aggregate, never a product") {
    val p = Attribution.transitionCounts(events, "user_id", "ts",
        "event_id", "event_type", "purchase")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"journeys key on the user; nothing crosses:\n$p")
  }
}
