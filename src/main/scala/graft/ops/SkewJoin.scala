package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §4.2 "salting for skew").
  *
  * When a handful of hot keys dominate the left side, a plain shuffle join
  * sends every hot-key row to ONE reducer. Salting spreads each left key
  * over `saltBuckets` sub-partitions (deterministically, by hashing a
  * high-cardinality spread column) and replicates the right side once per
  * bucket, so hot keys use `saltBuckets` reducers instead of one.
  *
  * Result is exactly the plain inner equi-join (each left row joins the
  * one replicated right copy matching its salt). AQE's skew-join handles
  * many cases at runtime; explicit salting remains the tool when a single
  * key exceeds what one task can hold, or for deterministic layout.
  */
object SkewJoin {

  /** @param left        skewed probe side
    * @param right       build side (replicated `saltBuckets`×)
    * @param key         equi-join key columns (same names both sides)
    * @param spreadCol   high-cardinality left column to derive the salt from
    * @param saltBuckets fan-out per key
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame,
      key: Seq[String], spreadCol: String, saltBuckets: Int
  ): DataFrame = {
    val l = left.withColumn("__salt", pmod(hash(col(spreadCol)), lit(saltBuckets)))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    val cond: Column = (key :+ "__salt").map(c => l(c) === r(c)).reduce(_ && _)
    val rightOnly = right.columns.filterNot(key.contains)
    l.join(r, cond)
      .select(left.columns.toIndexedSeq.map(l(_)) ++ rightOnly.toIndexedSeq.map(r(_)): _*)
  }
}
