package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing (extension tier, SURVEY.md §7.4): lay documents'
  * token streams end-to-end and chunk the concatenation into fixed-length
  * context windows — the concat-and-chunk batching used to build LLM
  * training examples (each window is one training sequence; a document may
  * span several, and several short documents share one).
  *
  * The assignment is pure prefix-sum arithmetic: with documents in a fixed
  * order, a running token total `cum` gives each document the token span
  * [cum - n, cum), and its windows are floor((cum-n)/C) .. floor((cum-1)/C).
  *
  * Scale shape: a GLOBAL running sum would be a single-partition window —
  * the one Spark shape that cannot scale. Packing is therefore SHARDED, as
  * production pipelines do anyway (each output shard is packed
  * independently): documents are bucketed by a deterministic key hash
  * ([[Sampling.hashBucket16]] div 4096 → 16 shards here; at 100 TB the
  * shard count rises to O(partitions) and each shard's window still sorts
  * only its own slice after one hash shuffle). Order within a shard is by
  * document id, so the layout is reproducible across engines and reruns —
  * no `monotonically_increasing_id`, which is partitioning-dependent.
  *
  * Documents with zero tokens are excluded: they occupy no tokens in any
  * window, and their inclusion would only manufacture degenerate spans.
  */
object Packing {

  def packSequences(
      df: DataFrame, idCol: String, textCol: String, ctxLen: Int
  ): DataFrame = {
    require(ctxLen > 0, "ctxLen must be positive")
    val shard = (Sampling.hashBucket16(col(idCol)) / lit(4096L)).cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(
        col(idCol),
        shard.as("shard"),
        size(TextDedup.tokens(col(textCol))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .select(
        col(idCol),
        col("shard"),
        col("n_tokens"),
        (col("__cum") - col("n_tokens")).as("tok_start"),
        expr(s"(__cum - n_tokens) div ${ctxLen}L").as("seq_first"),
        expr(s"(__cum - 1L) div ${ctxLen}L").as("seq_last"),
        expr(s"(__cum - 1L) div ${ctxLen}L - (__cum - n_tokens) div ${ctxLen}L + 1L")
          .as("n_seqs"))
  }
}
