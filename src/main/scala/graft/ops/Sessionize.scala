package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — reference Silver design
  * (design_doc/DataModel_SchemaDesign.md:47,58;
  * design_doc/PipelineArchitecture.md:217-222; SURVEY.md §2.5 W5):
  * a new session starts when the gap to the user's previous event exceeds
  * `gapSeconds` (reference uses 30 minutes).
  *
  * Classic LAG → gap-flag → running-sum formulation: one shuffle on the
  * user key, window passes share the same partitioning (Catalyst plans a
  * single exchange + sort). No driver state; sessions never span keys so
  * this parallelizes per user at any scale. For the streaming variant use
  * `session_window` (graft.streaming.Pipelines).
  *
  * Gap comparison is done in exact integer microseconds (`unix_micros`) —
  * second-truncation would silently move boundary events between sessions.
  */
object Sessionize {

  /** Adds `session_seq` (1-based per key) to every event row. */
  def tag(df: DataFrame, key: String, ts: String, gapSeconds: Long): DataFrame = {
    val byTime  = Window.partitionBy(col(key)).orderBy(col(ts).asc)
    val gapUs   = gapSeconds * 1000000L
    df.withColumn("__prev_us", lag(unix_micros(col(ts)), 1).over(byTime))
      .withColumn(
        "__new_session",
        when(col("__prev_us").isNull || (unix_micros(col(ts)) - col("__prev_us")) > gapUs, 1L).otherwise(0L)
      )
      .withColumn(
        "session_seq",
        sum(col("__new_session")).over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      )
      .drop("__prev_us", "__new_session")
  }

  /** One row per session: key, session_seq, n_events, start/end, duration(us). */
  def sessions(df: DataFrame, key: String, ts: String, gapSeconds: Long): DataFrame =
    tag(df, key, ts, gapSeconds)
      .groupBy(col(key), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        (unix_micros(max(col(ts))) - unix_micros(min(col(ts)))).as("duration_us")
      )
}
