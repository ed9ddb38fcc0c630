package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-wins keyed-state reduction — the heart of the reference's Gold
  * upsert path (reference: src/spark/streaming_job.py:92-155 — MERGE with
  * batch-local ROW_NUMBER dedup, first_value IGNORE NULLS carry-forward, and
  * per-column coalesce against the target).
  *
  * Semantics implemented here (SURVEY.md §2.5 W1-W4, §2.3 J1/J2):
  *   - `latestRow`   — exactly one row per key: the newest by `orderBy`
  *     (W1, ROW_NUMBER rn=1).
  *   - `latestState` — newest row per key, but nullable "sparse" columns are
  *     carried forward from the newest NON-NULL occurrence (W3,
  *     first_value IGNORE NULLS over the full partition frame), plus
  *     `max(ts)` per key (W4).
  *   - `merge`       — SCD1 upsert of a source batch into a target snapshot
  *     (J1/J2): full-outer on key, source wins when present, per-column
  *     coalesce carries target values forward for null source columns.
  *
  * Scale notes (100 TB): each call is a single hash shuffle on the key —
  * no driver-side state, no collect. The window frame is bounded by the
  * per-key row count of ONE micro-batch (reference pattern dedups inside
  * foreachBatch precisely to keep the merge input small). For a full-table
  * batch reduction over heavily-skewed keys, prefer `latestRowAgg` (below),
  * which is a partial-aggregable max_by and therefore does map-side combine
  * instead of materializing per-key partitions.
  */
object LatestWins {

  /** W1: newest row per key via row_number()=1. `tieBreak` must make the
    * ordering total (e.g. a unique event id) or replay convergence is lost.
    */
  def latestRow(df: DataFrame, key: Seq[String], orderCol: String, tieBreak: Seq[String]): DataFrame = {
    val w = Window
      .partitionBy(key.map(col): _*)
      .orderBy((col(orderCol) +: tieBreak.map(col)).map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Same semantics as [[latestRow]] but expressed as max_by aggregation —
    * partial-aggregable (map-side combine), the right shape for a whole-table
    * reduction at scale. Requires a totally-ordering struct.
    */
  def latestRowAgg(df: DataFrame, key: Seq[String], orderCol: String, tieBreak: Seq[String]): DataFrame = {
    val payload = df.columns.filterNot(key.contains)
    val ord     = struct((col(orderCol) +: tieBreak.map(col)): _*)
    val agg     = df
      .groupBy(key.map(col): _*)
      .agg(max_by(struct(payload.toIndexedSeq.map(col): _*), ord).as("__latest"))
    payload.foldLeft(agg)((d, c) => d.withColumn(c, col(s"__latest.$c"))).drop("__latest")
  }

  /** W1+W3+W4 combined: one row per key carrying
    *   - every `denseCols` column from the newest row,
    *   - every `sparseCols` column from the newest row where it was non-null
    *     (IGNORE NULLS carry-forward — update events omit these fields),
    *   - `maxOrderAlias` = max(orderCol) per key.
    *
    * Mirrors reference streaming_job.py:95-135 (the dedup'd MERGE source).
    * The explicit UNBOUNDED/UNBOUNDED frame is required: the default frame
    * stops at the current row and would miss later non-null values
    * (SURVEY.md §7.5 pitfall 6).
    */
  def latestState(
      df: DataFrame,
      key: Seq[String],
      orderCol: String,
      tieBreak: Seq[String],
      denseCols: Seq[String],
      sparseCols: Seq[String],
      maxOrderAlias: String = "last_seen"
  ): DataFrame = {
    val missing = (key ++ (orderCol +: tieBreak) ++ denseCols ++ sparseCols)
      .filterNot(df.columns.contains)
    require(missing.isEmpty, s"latestState: input is missing columns: ${missing.mkString(", ")}")
    require(!(denseCols ++ sparseCols).contains(maxOrderAlias),
      s"latestState: maxOrderAlias '$maxOrderAlias' collides with an output column")
    val desc  = (col(orderCol) +: tieBreak.map(col)).map(_.desc)
    val wOrd  = Window.partitionBy(key.map(col): _*).orderBy(desc: _*)
    val wFull = wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wAll  = Window.partitionBy(key.map(col): _*)

    val withState = df
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn(maxOrderAlias, max(col(orderCol)).over(wAll))
    val carried = sparseCols.foldLeft(withState) { (d, c) =>
      d.withColumn(c, first(col(c), ignoreNulls = true).over(wFull))
    }
    carried
      .filter(col("__rn") === 1)
      .select((key ++ denseCols ++ sparseCols :+ maxOrderAlias).map(col): _*)
  }

  /** J1/J2 MERGE semantics without a table format: SCD1 upsert of `source`
    * into `target` on `key`.
    *
    *   WHEN MATCHED  → source row wins, but each column in `coalesceCols`
    *                   falls back to the target value when the source is null
    *                   (reference streaming_job.py:139-146).
    *   WHEN NOT MATCHED → insert source row.
    *   Unmatched target rows are kept unchanged.
    *
    * `source` must already be reduced to one row per key ([[latestState]]).
    * Implemented as a full-outer equi-join — one shuffle, broadcastable when
    * the batch side is small; at scale the write path rewrites only changed
    * partitions (see graft.table.Maintenance).
    */
  def merge(target: DataFrame, source: DataFrame, key: Seq[String], coalesceCols: Seq[String]): DataFrame = {
    require(target.columns.sorted.sameElements(source.columns.sorted), "merge: schema mismatch")
    val t       = target.as("t")
    // Literal presence marker: the join is null-safe (<=>), so a null-key
    // source row CAN match — detecting "matched" via key nullness would
    // misclassify it and let stale target values win. The marker is non-null
    // exactly when a source row joined.
    val s       = source.withColumn("__s_present", lit(true)).as("s")
    val cond    = key.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val joined  = t.join(s, cond, "full_outer")
    val matched = col("s.__s_present").isNotNull
    val out = target.columns.toIndexedSeq.map { c =>
      val merged =
        if (key.contains(c)) coalesce(col(s"s.$c"), col(s"t.$c"))
        else if (coalesceCols.contains(c)) when(matched, coalesce(col(s"s.$c"), col(s"t.$c"))).otherwise(col(s"t.$c"))
        else when(matched, col(s"s.$c")).otherwise(col(s"t.$c"))
      merged.as(c)
    }
    joined.select(out: _*)
  }

  /** SCD TYPE 2 history builder — the dimension-history sibling of
    * [[merge]]'s SCD1 (Kimball's slowly-changing-dimension taxonomy; the
    * reference stops at SCD1, but a lakehouse serving "what did this
    * dimension look like at time T" needs the interval form): from a
    * change log `(key, orderCol, attrs...)`, emit one VERSION row per
    * change with its validity interval — `valid_from` = the change's
    * timestamp, `valid_to` = the NEXT change's timestamp (null while
    * current), `is_current` on the open row. Consecutive rows with
    * identical tracked attributes collapse first (a re-delivered
    * unchanged value must not open a new version — the idempotence rule
    * every SCD2 loader carries).
    *
    * Scale shape: one key-partitioned window pass ordered by
    * (orderCol, tieBreak) for the change-collapse lag and one more for
    * the lead — both on the same partitioning, so ONE exchange total;
    * no join, no global sort.
    *
    * Output: input columns + (valid_from, valid_to, is_current).
    */
  def scd2History(df: DataFrame, key: Seq[String], orderCol: String,
                  tracked: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    require(key.nonEmpty && tracked.nonEmpty, "need key and tracked columns")
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy((orderCol +: tieBreak).map(col): _*)
    val trackedStruct = struct(tracked.map(col): _*)
    val changes = df
      .withColumn("__prev", lag(trackedStruct, 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= trackedStruct)
      .drop("__prev")
    changes
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Point-in-time read over an [[scd2History]] table: the version of each
    * key valid AT `asOf` — `valid_from <= asOf < valid_to` (open rows
    * match everything from their valid_from on). A pure filter: at scale
    * this is the partition-prunable predicate the interval layout exists
    * for, and the reason SCD2 beats snapshot-per-day storage.
    */
  def scd2AsOf(history: DataFrame, asOf: Column): DataFrame =
    history.filter(col("valid_from") <= asOf &&
      (col("valid_to").isNull || asOf < col("valid_to")))
}
