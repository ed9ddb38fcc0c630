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

  /** Document chunking for retrieval pipelines: split each document's
    * token stream into fixed-size windows advancing by `stride` tokens
    * (overlap = chunkTokens − stride), the RAG-ingest sibling of
    * [[packSequences]] — packing concatenates ACROSS documents for
    * training, chunking splits WITHIN a document for retrieval, and a
    * trailing partial window is kept (dropping it loses document ends).
    * Pure per-document work: one `posexplode` over the chunk-start
    * sequence, all offsets derived arithmetically — no shuffle, no state.
    *
    * Output: (id, chunk_id [0-based], tok_start, tok_end [exclusive],
    * n_chunk_tokens, chunk_text).
    */
  def chunkDocuments(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int
  ): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      "need 0 < stride <= chunkTokens")
    val n = size(TextDedup.tokens(col(textCol))).cast("long")
    df.select(col(idCol), col(textCol),
        TextDedup.tokens(col(textCol)).as("__toks"), n.as("__n"))
      .filter(col("__n") > 0)
      .withColumn("__nchunks", expr(s"(__n + ${stride - 1}L) div ${stride}L"))
      .select(col(idCol), col("__toks"), col("__n"),
        posexplode(sequence(lit(0L), col("__nchunks") - 1L)))
      .select(
        col(idCol),
        col("pos").cast("long").as("chunk_id"),
        (col("col") * stride).as("tok_start"),
        least(col("col") * stride + chunkTokens, col("__n")).as("tok_end"),
        (least(col("col") * stride + chunkTokens, col("__n")) - col("col") * stride)
          .as("n_chunk_tokens"),
        concat_ws(" ", slice(col("__toks"), (col("col") * stride + 1).cast("int"),
          least(lit(chunkTokens.toLong), col("__n") - col("col") * stride).cast("int")))
          .as("chunk_text"))
  }

  /** Self-supervised contrastive pairs from adjacent chunks: anchor =
    * chunk i, positive = chunk i+1 of the same document (with stride <
    * chunkTokens they overlap, making them near-paraphrases — the inverse
    * cloze / neighboring-span construction contrastive retrievers train
    * on). Negatives are whatever batching puts beside them downstream —
    * this operator only materializes the positives. One `lead` window per
    * document on top of the stateless chunking — a single shuffle on the
    * doc id, no self-join.
    *
    * Output: (id, anchor_chunk_id, positive_chunk_id, anchor_text,
    * positive_text); single-chunk documents contribute no pair.
    */
  def contrastivePairs(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int
  ): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("chunk_id"))
    chunkDocuments(df, idCol, textCol, chunkTokens, stride)
      .withColumn("positive_chunk_id", lead(col("chunk_id"), 1).over(w))
      .withColumn("positive_text", lead(col("chunk_text"), 1).over(w))
      .filter(col("positive_chunk_id").isNotNull)
      .select(col(idCol), col("chunk_id").as("anchor_chunk_id"),
        col("positive_chunk_id"), col("chunk_text").as("anchor_text"),
        col("positive_text"))
  }

  /** Deterministic epoch shuffle: a replayable pseudorandom training
    * order per epoch, realized as (shard, pos) — a reader streams shard 0
    * ascending pos, then shard 1, … and sees a different uncorrelated
    * permutation each epoch from the seed alone (no RNG state, no stored
    * permutation table; rerunning epoch e reproduces epoch e's order
    * bit-for-bit, the property data-loader audits need).
    *
    * shard = seeded 16-bit hash div 4096 (16 shards, the [[packSequences]]
    * constant); pos = rank within the shard by (hash, id). Scale shape:
    * the only wide ops are one hash shuffle on the shard key and a
    * shard-partitioned window sorting corpus/shards rows — never a global
    * sort. At 100 TB the divisor shrinks so shard count tracks partition
    * count and each window stays executor-sized.
    */
  def epochShuffle(df: DataFrame, idCol: String, epochs: Seq[Int]): DataFrame = {
    require(epochs.nonEmpty, "epochs must be non-empty")
    val spark = df.sparkSession
    import spark.implicits._
    val eps = broadcast(epochs.toDF("epoch"))
    val h = Sampling.hashBucket16(
      concat(col("epoch").cast("string"), lit("|"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("__h"), col(idCol))
    df.select(col(idCol)).crossJoin(eps)
      .withColumn("__h", h)
      .withColumn("shard", (col("__h") / lit(4096L)).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .select(col("epoch").cast("long").as("epoch"), col(idCol),
        col("shard"), col("pos"))
  }

  /** Size-balanced round-robin output sharding: rank every row by
    * (size desc, id) and deal rank r to shard r mod k — the static
    * balancing scheme whose worst shard exceeds the mean by at most one
    * max-size row (the LPT-style guarantee training-shard writers rely
    * on, vs hash sharding's √-law skew).
    *
    * The global rank is computed WITHOUT a global single-partition window:
    * a size histogram (one hash-agg) gets cumulative offsets over its
    * |distinct sizes|-row spine, each row adds its offset to a rank
    * WITHIN its size class (a per-size window — parallel across sizes),
    * exactly the histogram-first decomposition of q153/q160/q165. The
    * one caveat inherent to the scheme: a size class is one window
    * partition, so a corpus where half the rows share one exact size
    * sorts that class in one task — token counts at corpus scale are
    * spread enough that classes stay executor-sized.
    *
    * Output: one row per input row — (idCol, sizeCol, rank, shard).
    */
  def roundRobinShards(df: DataFrame, idCol: String, sizeCol: String,
                       k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val hist = df.groupBy(col(sizeCol)).agg(count(lit(1)).as("__n"))
    val wCum = Window.orderBy(col(sizeCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist
      .withColumn("__before", coalesce(sum(col("__n")).over(wCum), lit(0L)))
      .select(col(sizeCol), col("__before"))
    val wIn = Window.partitionBy(col(sizeCol)).orderBy(col(idCol))
    df.select(col(idCol), col(sizeCol))
      .join(offsets, Seq(sizeCol))
      .withColumn("rank",
        col("__before") + row_number().over(wIn).cast("long") - 1L)
      .withColumn("shard", pmod(col("rank"), lit(k.toLong)))
      .select(col(idCol), col(sizeCol), col("rank"), col("shard"))
  }

  /** Packing-yield telemetry over [[packSequences]] — the report a
    * training-data pipeline publishes beside its packed shards: how full
    * the context windows are and how badly documents fragment across
    * window boundaries (fragmented documents leak cross-document attention
    * unless the trainer masks them, so split rate is a tracked cost).
    *
    * Concat-and-chunk packing is gapless within a shard, so the only
    * waste is each shard's final partial window: n_windows =
    * ceil(total/ctx), tail_waste = n_windows·ctx − total. Fragmentation
    * is read off [[packSequences]]'s n_seqs (a document crossing k window
    * boundaries spans k+1 windows).
    *
    * Scale shape: one shard-keyed partial+final aggregate over the
    * packing output — the per-shard prefix-sum window is the only wide op
    * inherited, and the result is shard-count rows.
    *
    * Output per shard: (shard, n_docs, total_tokens, n_doc_segments,
    * n_split_docs, n_windows, tail_waste_tokens, fill_bp, split_bp).
    */
  def packEfficiency(
      df: DataFrame, idCol: String, textCol: String, ctxLen: Int
  ): DataFrame =
    packSequences(df, idCol, textCol, ctxLen)
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_seqs")).as("n_doc_segments"),
        sum(when(col("n_seqs") > 1L, 1L).otherwise(0L)).as("n_split_docs"))
      .withColumn("n_windows",
        expr(s"(total_tokens + ${ctxLen - 1}L) div ${ctxLen}L"))
      .withColumn("tail_waste_tokens",
        col("n_windows") * ctxLen - col("total_tokens"))
      .withColumn("fill_bp",
        expr(s"(total_tokens * 10000L) div (n_windows * ${ctxLen}L)"))
      .withColumn("split_bp", expr("(n_split_docs * 10000L) div n_docs"))

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

  /** Span-corruption mask statistics (T5, Raffel et al. 2020 §3.1.4 /
    * UL2 denoiser mixtures): each token position masks independently with
    * probability `maskBp`/10⁴ — SEEDED by md5(doc|position), so the mask
    * a trainer regenerates from the same seed is byte-identical — and
    * consecutive masked positions merge into spans (the sentinel-token
    * unit). Reports, per document: token count, masked count, span
    * count, longest span, and the realized corruption rate.
    *
    * Shape: one position explode, the island-grouping window and span
    * aggregate keyed by doc (no cross-doc state), and a doc-keyed join
    * back onto the projection-computed token counts — fully-unmasked
    * docs surface with zero spans via the left join. The window
    * partitions by document, so task state is one document's masked
    * positions.
    */
  def spanCorruptionStats(df: DataFrame, idCol: String, textCol: String,
      maskBp: Long): DataFrame = {
    require(maskBp > 0 && maskBp < 10000, "maskBp in (0, 10000)")
    val threshold = 65536L * maskBp / 10000L
    val toks = TextDedup.tokens(col(textCol))
    val base = df.select(col(idCol), size(toks).cast("long").as("n_tokens"),
      toks.as("__toks"))
    val masked = base
      .select(col(idCol), posexplode(col("__toks")).as(Seq("pos", "__t")))
      .filter(Sampling.hashBucket16(
        concat(col(idCol).cast("string"), lit("|"), col("pos").cast("string")))
        < threshold)
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val spans = masked
      .withColumn("__grp", col("pos") - row_number().over(w))
      .groupBy(col(idCol), col("__grp")).agg(count(lit(1)).as("__len"))
      .groupBy(col(idCol))
      .agg(sum(col("__len")).as("n_masked"), count(lit(1)).as("n_spans"),
        max(col("__len")).as("max_span"))
    base.drop("__toks")
      .join(spans, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("max_span"), lit(0L)).as("max_span"))
      .withColumn("corruption_bp",
        expr("CASE WHEN n_tokens > 0 THEN (n_masked * 10000L) div n_tokens ELSE 0 END"))
  }

  /** Padding-waste-vs-bucket-count curve for length-bucketed batching —
    * the calibration artifact behind "how many length buckets does my
    * batcher need": with documents grouped into B equal-frequency length
    * buckets and every sequence in a bucket padded to the bucket's max
    * length, what fraction of the padded tokens is padding? B = 1 is the
    * pad-everything-to-global-max anchor; waste falls monotonically as B
    * grows (the alternative to padding entirely is [[packSequences]];
    * real batchers pick B where this curve flattens — the technique
    * behind every bucketed-batching loader since Seq2Seq, e.g. the
    * bucketing in Vaswani et al. 2017's training setup).
    *
    * Everything is exact integers over the LENGTH HISTOGRAM: the corpus
    * enters one (len → n_docs) hash-aggregate, and bucket assignment is
    * closed-form rank arithmetic on histogram rows. A doc at sorted rank
    * r (0-based, ties broken by contiguity — same-length docs are
    * interchangeable) lands in bucket r·B div N; a length group occupying
    * ranks [s, s+c) therefore spans buckets s·B div N .. (s+c−1)·B div N,
    * and its row overlap with bucket b is
    * min(s+c, rend_b+1) − max(s, rstart_b) with
    * rstart_b = ceil(bN/B), rend_b = ceil((b+1)N/B) − 1.
    *
    * Scale shape: the only corpus-sized operator is the length histogram
    * (map-side-combinable; distinct lengths are bounded by the max
    * document length, a catalog-scale cardinality). The prefix-sum
    * window, tier explode (|tiers| per row) and bucket-span explode
    * (≤ B rows per straddling group) all run on histogram rows; the
    * doc-count/token totals attach as a broadcast 1-row frame.
    *
    * Output per tier: (n_buckets, n_docs, total_tokens, padded_tokens,
    * waste_bp = (padded − total)·10000 div padded).
    */
  def paddingWasteCurve(df: DataFrame, textCol: String,
                        tiers: Seq[Int]): DataFrame = {
    require(tiers.nonEmpty && tiers.forall(_ >= 1), "tiers must be >= 1")
    val W = Window.orderBy(col("len"))
    val hist = df
      .select(size(TextDedup.tokens(col(textCol))).cast("long").as("len"))
      .filter(col("len") > 0L)
      .groupBy(col("len")).agg(count(lit(1)).as("c"))
    val withStart = hist.withColumn("s",
      coalesce(sum(col("c")).over(W.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val tot = withStart.agg(sum(col("c")).as("n_docs"),
      sum(col("len") * col("c")).as("total_tokens"))
    val tierArr = array(tiers.distinct.sorted.map(b => lit(b.toLong)): _*)
    withStart.crossJoin(broadcast(tot))
      .select(col("len"), col("c"), col("s"), col("n_docs"), col("total_tokens"),
        explode(tierArr).as("n_buckets"))
      // buckets this length group touches (never empty: c >= 1)
      .select(col("*"), explode(sequence(
        expr("(s * n_buckets) div n_docs"),
        expr("((s + c - 1) * n_buckets) div n_docs"))).as("b"))
      .withColumn("__overlap",
        expr("""least(s + c, ((b + 1) * n_docs + n_buckets - 1) div n_buckets)
               - greatest(s, (b * n_docs + n_buckets - 1) div n_buckets)"""))
      .groupBy(col("n_buckets"), col("b"))
      .agg(max(col("len")).as("__maxlen"), sum(col("__overlap")).as("__nb"),
        first(col("n_docs")).as("n_docs"), first(col("total_tokens")).as("total_tokens"))
      .groupBy(col("n_buckets"))
      .agg(first(col("n_docs")).as("n_docs"),
        first(col("total_tokens")).as("total_tokens"),
        sum(col("__maxlen") * col("__nb")).as("padded_tokens"))
      .withColumn("waste_bp",
        expr("(padded_tokens - total_tokens) * 10000L div padded_tokens"))
  }
}
