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
    val w = bucketWidthSeconds * 1000000L // microseconds

    def bucketOf(c: Column): Column = floor(unix_micros(c) / w).cast("long")

    val p = points
      .withColumn("__bkt", bucketOf(col(pointTs)))
      .as("p")
    // replicate each interval to every bucket it overlaps; [start, end)
    // touches buckets floor(start/w) .. floor((end-1us)/w)
    val i = intervals
      .withColumn("__bkt", explode(sequence(
        bucketOf(col(startCol)),
        floor((unix_micros(col(endCol)) - 1) / w).cast("long"))))
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
}
