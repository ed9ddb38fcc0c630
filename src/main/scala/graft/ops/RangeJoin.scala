package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join — the operator class Spark plans as a
  * BroadcastNestedLoopJoin/CartesianProduct when written naively
  * (`p.key = i.key AND p.ts >= i.start AND p.ts < i.end` has only a
  * non-equi time condition once keys collide).
  *
  * Scalable formulation: quantize time into fixed buckets; replicate each
  * interval to every bucket it overlaps; hash each point to its bucket;
  * equi-join on (key, bucket); exact range filter as the join residual.
  * The join becomes a plain shuffle/broadcast HASH join — at 100 TB the
  * work scales with (points + interval-span/bucketWidth), never points ×
  * intervals.
  *
  * `bucketWidth` trades replication (small buckets → more interval
  * copies) against residual filtering (large buckets → more non-matching
  * candidates); pick it near the typical interval length.
  */
object RangeJoin {

  /** Internal working-column names — rejected on inputs (they would be
    * silently clobbered by the replication projections otherwise). */
  private val Reserved = Set("__bkt", "__first", "__lfirst", "__rfirst")

  private def requireNoReserved(df: DataFrame, side: String): Unit = {
    val hit = df.columns.filter(Reserved.contains)
    require(hit.isEmpty,
      s"RangeJoin: $side columns ${hit.mkString(", ")} collide with internal names — alias them first")
  }

  /** One shared definition of the bucket math so both operators always
    * agree on boundaries: width in microseconds, bucket of an instant, and
    * the last bucket a half-open [start, end) interval touches.
    */
  private def microWidth(bucketWidthSeconds: Long): Long = bucketWidthSeconds * 1000000L
  private def bucketOf(c: Column, w: Long): Column = floor(unix_micros(c) / w).cast("long")
  private def lastBucket(end: Column, w: Long): Column =
    floor((unix_micros(end) - 1) / w).cast("long")

  /** @param points      probe side (events)
    * @param intervals   build side with [startCol, endCol) validity
    * @param pointKey    join key on points
    * @param intervalKey join key on intervals
    * @param pointTs     TimestampType column on points
    * @param startCol    TimestampType inclusive start on intervals
    * @param endCol      TimestampType exclusive end on intervals
    * @param rightCols   interval columns to attach (must not collide)
    * @param bucketWidthSeconds time-bucket width
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointKey: String, intervalKey: String,
      pointTs: String, startCol: String, endCol: String,
      rightCols: Seq[String],
      bucketWidthSeconds: Long
  ): DataFrame = {
    require(rightCols.nonEmpty, "RangeJoin: rightCols must not be empty")
    val collisions = rightCols.filter(points.columns.contains)
    require(collisions.isEmpty,
      s"RangeJoin: rightCols collide with point columns: ${collisions.mkString(", ")}")
    requireNoReserved(points, "point"); requireNoReserved(intervals, "interval")
    val w = microWidth(bucketWidthSeconds)

    val p = points
      .withColumn("__bkt", bucketOf(col(pointTs), w))
      .as("p")
    // replicate each interval to every bucket it overlaps; [start, end)
    // touches buckets floor(start/w) .. floor((end-1us)/w)
    val i = intervals
      .withColumn("__bkt", explode(sequence(
        bucketOf(col(startCol), w), lastBucket(col(endCol), w))))
      .as("i")
    p.join(
        i,
        col(s"p.$pointKey") === col(s"i.$intervalKey") &&
          col("p.__bkt") === col("i.__bkt") &&
          col(s"p.$pointTs") >= col(s"i.$startCol") &&
          col(s"p.$pointTs") < col(s"i.$endCol"))
      .select(points.columns.map(c => col(s"p.$c")).toIndexedSeq ++
        rightCols.map(c => col(s"i.$c")): _*)
  }

  /** Interval-overlap join: all (left, right) interval pairs with the same
    * key and `[lStart, lEnd) ∩ [rStart, rEnd) ≠ ∅` — sessions × campaigns,
    * downtime × deploys. Same bucket-replication idea as
    * [[pointInInterval]], with the standard dedup trick: a pair sharing
    * several buckets is emitted ONLY in the first bucket both sides
    * occupy (`max(bucket(lStart), bucket(rStart))`), so no distinct pass
    * and no duplicate rows — the join stays a pure hash equi-join with a
    * residual filter.
    *
    * Column names must be disjoint across the two sides.
    */
  def intervalOverlap(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidthSeconds: Long
  ): DataFrame = {
    val overlapCols = left.columns.toSet.intersect(right.columns.toSet)
    require(overlapCols.isEmpty,
      s"RangeJoin.intervalOverlap: column names must be disjoint, both sides have: ${overlapCols.mkString(", ")}")
    requireNoReserved(left, "left"); requireNoReserved(right, "right")
    val w = microWidth(bucketWidthSeconds)

    def replicate(df: DataFrame, s: String, e: String): DataFrame = df
      .withColumn("__first", bucketOf(col(s), w))
      .withColumn("__bkt", explode(sequence(
        bucketOf(col(s), w), lastBucket(col(e), w))))

    val l = replicate(left, lStart, lEnd)
      .withColumnRenamed("__first", "__lfirst").as("l")
    val r = replicate(right, rStart, rEnd)
      .withColumnRenamed("__first", "__rfirst").as("r")
    l.join(
        r,
        col(s"l.$leftKey") === col(s"r.$rightKey") &&
          col("l.__bkt") === col("r.__bkt") &&
          // emit only in the first shared bucket → exactly-once per pair
          col("l.__bkt") === greatest(col("l.__lfirst"), col("r.__rfirst")) &&
          // overlap residual for [start, end) intervals
          col(s"l.$lStart") < col(s"r.$rEnd") &&
          col(s"r.$rStart") < col(s"l.$lEnd"))
      .select(left.columns.map(c => col(s"l.$c")).toIndexedSeq ++
        right.columns.map(c => col(s"r.$c")): _*)
  }
}
