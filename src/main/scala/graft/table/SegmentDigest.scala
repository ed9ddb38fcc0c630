package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Merkle-style segment digests for anti-entropy table sync (the
  * Dynamo/Cassandra repair pattern applied to lakehouse replicas): hash
  * every row's content to 32 bits, assign it to one of `nBuckets` keyed
  * segments, and fold each segment with BIT-XOR — an order-independent,
  * overflow-free, mergeable digest. Two table versions then reconcile by
  * comparing |buckets| digest rows instead of diffing row sets: only
  * mismatched segments need row-level transfer, the bandwidth win that
  * makes cross-region sync O(changed segments).
  *
  * XOR caveat (documented, standard for this pattern): a segment whose
  * changes XOR to zero (e.g. the same row added twice) digests clean —
  * the 32-bit content hash makes that a 2⁻³² event per changed segment,
  * and `n_rows` catches pure duplications.
  *
  * Scale shape: one hash-aggregate to |buckets| rows per side, then a
  * |buckets|-row join — the corpus shuffles once on the bucket id
  * (narrow rows: bucket, 2 longs).
  */
object SegmentDigest {

  /** Per-bucket digest frame: (bucket, n_rows, digest).
    *
    * bucket = 16-bit md5 of the key (string form) mod `nBuckets`; row
    * hash = first 8 md5 hex digits of the `|`-joined canonical string
    * of `contentCols`. Both replay exactly in any engine with md5.
    *
    * The canonical string is INJECTIVE per row: every cell encodes as
    * `n` for NULL or `v` + value with `\` doubled and `|` escaped, so
    * (x, NULL) vs (NULL, x), ('a|b', NULL) vs ('a', 'b'), and NULL vs
    * 'n' all digest differently — a plain concat_ws would silently skip
    * NULL cells and let an anti-entropy diff certify a divergent
    * segment as clean, the one failure a sync tool must never have.
    */
  def digests(df: DataFrame, keyCol: String, contentCols: Seq[String],
      nBuckets: Int): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    require(contentCols.nonEmpty, "need at least one content column")
    val bucket = pmod(
      conv(substring(md5(col(keyCol).cast("string").cast("binary")), 1, 4), 16, 10)
        .cast("long"),
      lit(nBuckets.toLong))
    val cells = contentCols.map { c =>
      val escaped = concat(lit("v"),
        replace(replace(col(c).cast("string"), lit("\\"), lit("\\\\")),
          lit("|"), lit("\\|")))
      when(col(c).isNull, lit("n")).otherwise(escaped)
    }
    val rowHash = conv(substring(
      md5(concat_ws("|", cells: _*).cast("binary")), 1, 8), 16, 10).cast("long")
    df.select(bucket.as("bucket"), rowHash.as("__h"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(__h)").as("digest"))
  }

  /** Reconciliation report: full-outer join of two digest frames, keeping
    * only segments that differ (digest mismatch, row-count drift, or a
    * bucket present on one side only). Output: (bucket, n_rows_a,
    * n_rows_b, digest_a, digest_b) — the transfer work-list.
    */
  def diff(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("bucket"), col("n_rows").as("n_rows_a"),
      col("digest").as("digest_a"))
    val r = b.select(col("bucket"), col("n_rows").as("n_rows_b"),
      col("digest").as("digest_b"))
    l.join(r, Seq("bucket"), "full_outer")
      .filter(
        col("digest_a").isNull || col("digest_b").isNull ||
        col("digest_a") =!= col("digest_b") ||
        col("n_rows_a") =!= col("n_rows_b"))
  }
}
