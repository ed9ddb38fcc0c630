package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — reference design
  * design_doc/DataModel_SchemaDesign.md:48 ("join event to the dimension row
  * valid at event time"; SURVEY.md §2.3 J4).
  *
  * For each left row, attach the newest right row with the same key whose
  * time column is <= the left time column.
  *
  * Spark has no built-in as-of join, so this composes existing operators
  * (SURVEY.md §7.3): union-tag both sides, sort per key by time, and
  * carry the right side's columns forward with last(..., ignoreNulls) —
  * a single shuffle on the key, one window pass, no driver state, no
  * per-row lookups. This is the classic scalable as-of formulation (it is
  * also how the reference's "read-time join" would be phrased for SCD2).
  *
  * Right rows must be unique per (key, time) — pre-dedup with
  * [[LatestWins.latestRow]] otherwise the result is nondeterministic.
  *
  * Scale notes: shuffle is on the join key only; time-ordering happens
  * within key partitions (sort, no extra exchange). Skewed keys behave like
  * any window function — salt the key upstream if one key dominates.
  */
object AsOfJoin {

  /** @param left       probe side (e.g. events)
    * @param right      build side (e.g. dimension versions)
    * @param leftKey    join key column on left
    * @param rightKey   join key column on right
    * @param leftTime   event-time column on left
    * @param rightTime  validity-start column on right
    * @param rightCols  right columns to attach (must not collide with left)
    * @param tolerance  optional max staleness: attach only when
    *                   `leftTime - rightTime <= tolerance` (the pandas
    *                   merge_asof `tolerance` semantics). Pass an interval
    *                   for timestamps (`expr("INTERVAL 1 HOUR")`) or a
    *                   numeric for numeric time columns; a match older
    *                   than the tolerance yields NULL attached columns.
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      tolerance: Option[Column] = None
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightCols.nonEmpty, "AsOfJoin: rightCols must not be empty")
    val collisions = rightCols.filter(leftCols.contains)
    require(collisions.isEmpty,
      s"AsOfJoin: rightCols collide with left columns: ${collisions.mkString(", ")} — alias them first")
    require(left.columns.contains(leftKey) && left.columns.contains(leftTime),
      s"AsOfJoin: left is missing $leftKey/$leftTime")
    require(right.columns.contains(rightKey) && right.columns.contains(rightTime),
      s"AsOfJoin: right is missing $rightKey/$rightTime")
    require(rightCols.forall(right.columns.contains),
      s"AsOfJoin: right is missing some of ${rightCols.mkString(", ")}")
    require(!rightCols.contains("__rt"),
      "AsOfJoin: \"__rt\" is reserved for the carried right-time field — alias the column first")
    // Carry ONE struct of all rightCols, not each column independently:
    // per-column last(ignoreNulls) could mix columns from different right
    // rows and would resurrect the previous version's value when a newer
    // version's attribute is legitimately NULL. The struct itself is
    // non-null for every right row, so ignoreNulls only skips left rows.
    // The right row's own time rides along as __rt for the tolerance test.
    val rsType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)) :+
        org.apache.spark.sql.types.StructField("__rt", right.schema(rightTime).dataType))

    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1)) // probe sorts AFTER build rows at equal ts
      .select((leftCols.map(col) :+ lit(null).cast(rsType).as("__r")) ++
        Seq(col("__k"), col("__t"), col("__side")): _*)

    val r = right
      .withColumn("__k", col(rightKey))
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select((leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col) :+ col(rightTime).as("__rt"): _*).as("__r")) ++
        Seq(col("__k"), col("__t"), col("__side")): _*)

    val w = Window
      .partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))

    // tolerance: a carried match staler than the bound attaches nothing
    // (NULL when __r is null propagates through the comparison naturally)
    val attach: String => Column = tolerance match {
      case Some(tol) => c => when(col("__t") - col("__r.__rt") <= tol, col(s"__r.$c")).as(c)
      case None      => c => col(s"__r.$c").as(c)
    }
    carried
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightCols.map(attach): _*)
  }

  /** Nearest-event join (the pandas `merge_asof direction='nearest'`
    * semantics; public): for each left row, attach the right row with the
    * SMALLEST |leftTime − rightTime| within `tolerance` — backward wins
    * ties (the pandas convention). The sensor-alignment join: "the
    * reading closest to this event", where plain as-of silently prefers a
    * stale past reading over a fresher future one.
    *
    * Same scale shape as [[apply]]: ONE shuffle on the key, one sorted
    * window pass computing BOTH candidates — the backward carry
    * (`last(…, ignoreNulls)` over preceding rows) and the forward carry
    * (`first(…, ignoreNulls)` over following rows) share the (key, time)
    * partitioning, so the forward direction costs no extra exchange.
    *
    * `tolerance` is REQUIRED (an unbounded nearest join attaches
    * arbitrarily distant readings — at 100 TB that is a correctness bug,
    * not a convenience). Equal-timestamp right rows match through the
    * backward branch.
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      tolerance: Column
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightCols.nonEmpty, "AsOfJoin.nearest: rightCols must not be empty")
    val collisions = rightCols.filter(leftCols.contains)
    require(collisions.isEmpty,
      s"AsOfJoin.nearest: rightCols collide with left columns: ${collisions.mkString(", ")} — alias them first")
    val rsType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)) :+
        org.apache.spark.sql.types.StructField("__rt", right.schema(rightTime).dataType))
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select((leftCols.map(col) :+ lit(null).cast(rsType).as("__r")) ++
        Seq(col("__k"), col("__t"), col("__side")): _*)
    val r = right
      .withColumn("__k", col(rightKey))
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select((leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col) :+ col(rightTime).as("__rt"): _*).as("__r")) ++
        Seq(col("__k"), col("__t"), col("__side")): _*)
    val ord = Window.partitionBy(col("__k")).orderBy(col("__t").asc, col("__side").asc)
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = l.unionByName(r)
      .withColumn("__rb", last(col("__r"), ignoreNulls = true).over(wb))
      .withColumn("__rf", first(col("__r"), ignoreNulls = true).over(wf))
    // distances (NULL candidate → NULL distance → loses every comparison)
    val db = col("__t") - col("__rb.__rt")
    val df = col("__rf.__rt") - col("__t")
    val bOk = col("__rb").isNotNull && db <= tolerance
    val fOk = col("__rf").isNotNull && df <= tolerance
    val useB = bOk && (!fOk || db <= df) // backward wins ties
    val attach: String => Column = c =>
      when(useB, col(s"__rb.$c"))
        .otherwise(when(fOk, col(s"__rf.$c")).otherwise(lit(null)))
        .as(c)
    carried
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightCols.map(attach): _*)
  }
}
