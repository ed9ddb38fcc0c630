package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Paragraph-granularity dedup operators (extension tier, SURVEY.md §7.4).
  *
  * Web-scale curation pipelines dedup BELOW document granularity: CCNet
  * (Wenzek et al. 2020) and RefinedWeb (Penedo et al. 2023) hash-dedup
  * paragraphs/lines across the whole corpus, and Lee et al. 2022
  * ("Deduplicating Training Data Makes Language Models Better") showed
  * duplicated spans inside otherwise-unique documents are what inflate
  * memorization. The reference engine's only dedup-shaped logic is
  * record-granularity latest-wins (ref streaming_job.py:92-155, the
  * rn=1-over-key MERGE); these operators extend the same key-digest
  * discipline to sub-document units.
  *
  * The synthetic corpus has no newline structure (TESTDATA.md), so a
  * "paragraph" is a deterministic fixed-width token window — the unit is a
  * parameter, the dedup algebra is what's under test.
  *
  * Scale shape (the point at 100 TB):
  *   - [[paragraphDedup]] never joins on the paragraph hash. First-occurrence
  *     winners come from a `min(struct)` hash-aggregate — partial-aggregable,
  *     so a boilerplate paragraph shared by a billion documents collapses
  *     map-side instead of flooding one reducer. Everything after is keyed by
  *     doc id, whose group size is bounded by a single document's length.
  *   - [[dupShingleScore]] does join on the shingle digest (attribution back
  *     to documents needs it), but both sides carry digest-width rows and the
  *     doc-frequency side is pre-collapsed to one row per distinct shingle;
  *     a corpus-wide hot shingle is an AQE skew-join split, not a plan
  *     change.
  *   - [[boilerplateParagraphs]] is one two-phase distinct-count on
  *     (source, digest) — no join at all.
  */
object ParagraphDedup {

  /** Explode documents into fixed-width token paragraphs, carrying `keep`
    * columns through. Output: (idCol, keep..., idx, para); documents with
    * zero tokens contribute no rows. The trailing partial window is kept.
    * A pure projection + posexplode — no shuffle.
    */
  def paragraphs(df: DataFrame, idCol: String, textCol: String,
                 paraTokens: Int, keep: Seq[String] = Nil): DataFrame = {
    require(paraTokens > 0, "paraTokens must be positive")
    val keepCols = keep.map(col)
    df.select(col(idCol) +: keepCols :+ TextDedup.tokens(col(textCol)).as("__toks"): _*)
      .withColumn("__n", size(col("__toks")).cast("long"))
      .filter(col("__n") > 0)
      .select((col(idCol) +: keepCols) ++ Seq(col("__toks"),
        posexplode(sequence(lit(0L), expr(s"(__n + ${paraTokens - 1}) div $paraTokens") - 1L))): _*)
      .select((col(idCol) +: keepCols) ++ Seq(
        col("col").cast("long").as("idx"),
        concat_ws(" ", slice(col("__toks"), (col("col") * paraTokens + 1).cast("int"), lit(paraTokens)))
          .as("para")): _*)
  }

  /** Corpus-wide paragraph-level exact dedup, first occurrence wins
    * (CCNet/RefinedWeb line dedup; the reference's record-granularity
    * analogue is the rn=1 latest-wins MERGE, ref streaming_job.py:92-155).
    *
    * An occurrence (doc, idx) of a paragraph is KEPT iff it is the
    * lexicographically-smallest (doc, idx) holding that paragraph's digest
    * corpus-wide; every later occurrence — inside the same document or any
    * other — is removed. Output per document: `(idCol, n_paras, n_kept,
    * n_removed, kept_text)` where kept_text re-joins the surviving
    * paragraphs in document order ('' when every paragraph first appeared
    * elsewhere).
    *
    * Plan: winners = one hash-aggregate `min(struct(doc, idx, para))` per
    * digest (map-side combinable — the hot-paragraph-safe formulation; see
    * object doc), then two doc-keyed aggregates and one doc-keyed left join.
    * The paragraph hash is never a join key.
    */
  def paragraphDedup(df: DataFrame, idCol: String, textCol: String, paraTokens: Int): DataFrame = {
    val paras = paragraphs(df, idCol, textCol, paraTokens)

    val totals = paras.groupBy(col(idCol)).agg(count(lit(1)).as("n_paras"))

    val winners = paras
      .groupBy(md5(col("para").cast("binary")).as("__h"))
      .agg(min(struct(col(idCol), col("idx"), col("para"))).as("w"))
      .select(col(s"w.$idCol").as(idCol), col("w.idx").as("idx"), col("w.para").as("para"))

    val kept = winners.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(array_sort(collect_list(struct(col("idx"), col("para")))), p => p.getField("para")),
        " ").as("kept_text"))

    totals.join(kept, Seq(idCol), "left").select(
      col(idCol),
      col("n_paras"),
      coalesce(col("n_kept"), lit(0L)).as("n_kept"),
      (col("n_paras") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
      coalesce(col("kept_text"), lit("")).as("kept_text"))
  }

  /** Per-document duplicated-shingle fraction (Lee et al. 2022's signal:
    * how much of a document is made of spans that also occur elsewhere).
    *
    * A document's distinct word-`shingleN`-grams are scored against the
    * corpus shingle doc-frequency; output `(idCol, n_shingles, n_dup,
    * dup_permille)` where n_dup counts the document's distinct shingles
    * appearing in MORE than one document and dup_permille is the
    * exact-integer `n_dup * 1000 div n_shingles` (the repo-wide
    * engine-portable scoring convention — no doubles).
    *
    * Plan: distinct (doc, digest) → doc-frequency hash-aggregate (one row
    * per distinct shingle) → digest equi-join back → per-doc aggregate.
    * Rows crossing the wire are (id, 32-byte digest) — never shingle text.
    * Documents shorter than shingleN tokens have no shingles and are absent.
    */
  def dupShingleScore(df: DataFrame, idCol: String, textCol: String, shingleN: Int): DataFrame = {
    val sh = df
      .select(col(idCol),
        explode(TextDedup.wordShingles(TextDedup.tokens(col(textCol)), shingleN)).as("__s"))
      .select(col(idCol), md5(col("__s").cast("binary")).as("__h"))
      .distinct()

    val docFreq = sh.groupBy(col("__h")).agg(count(lit(1)).as("__n_docs"))

    sh.join(docFreq, "__h")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("__n_docs") > 1, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_permille", expr("n_dup * 1000 div n_shingles"))
  }

  /** The persistable paragraph-digest index of a corpus: one row per
    * distinct paragraph digest (`para_digest`). Build once over the
    * existing corpus, persist as a table, and probe every new ingest
    * batch with [[incrementalParagraphDedup]] — the batch-incremental
    * form of CCNet line dedup (same role as the LSH band index
    * [[TextDedup.incrementalDupCheck]] probes, one granularity down).
    */
  def paragraphIndex(df: DataFrame, idCol: String, textCol: String, paraTokens: Int): DataFrame =
    paragraphs(df, idCol, textCol, paraTokens)
      .select(md5(col("para").cast("binary")).as("para_digest"))
      .distinct()

  /** Incremental paragraph dedup: dedup a NEW batch against itself AND a
    * persisted corpus index, without touching the corpus text. A batch
    * occurrence survives iff it is the batch-wide first occurrence of its
    * digest ([[paragraphDedup]]'s min(struct) winner) and the digest is
    * absent from `index`. Output matches [[paragraphDedup]]:
    * `(idCol, n_paras, n_kept, n_removed, kept_text)`.
    *
    * Plan: the in-batch winner aggregate is the same map-side-combined
    * min(struct); the index probe is ONE left-anti equi-join on the digest
    * — batch-sized build against corpus-sized probe, digest-width rows
    * only. At 100 TB the index dwarfs the batch, which is exactly the
    * asymmetry an anti join wants (AQE broadcasts the batch side).
    */
  def incrementalParagraphDedup(batch: DataFrame, index: DataFrame,
                                idCol: String, textCol: String, paraTokens: Int): DataFrame = {
    val paras = paragraphs(batch, idCol, textCol, paraTokens)

    val totals = paras.groupBy(col(idCol)).agg(count(lit(1)).as("n_paras"))

    val winners = paras
      .groupBy(md5(col("para").cast("binary")).as("__h"))
      .agg(min(struct(col(idCol), col("idx"), col("para"))).as("w"))
      .join(index, col("__h") === index("para_digest"), "left_anti")
      .select(col(s"w.$idCol").as(idCol), col("w.idx").as("idx"), col("w.para").as("para"))

    val kept = winners.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(array_sort(collect_list(struct(col("idx"), col("para")))), p => p.getField("para")),
        " ").as("kept_text"))

    totals.join(kept, Seq(idCol), "left").select(
      col(idCol),
      col("n_paras"),
      coalesce(col("n_kept"), lit(0L)).as("n_kept"),
      (col("n_paras") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
      coalesce(col("kept_text"), lit("")).as("kept_text"))
  }

  /** Longest duplicated span per document (the contiguous form of
    * [[dupShingleScore]] — Lee et al. 2022's EXACTSUBSTR signal, which
    * their suffix-array pipeline computes globally; here approximated as
    * the longest run of consecutive word-`shingleN`-grams that each also
    * occur in at least one OTHER document, so a copied passage of L tokens
    * reports a span of exactly L while scattered single duplicated
    * shingles report `shingleN`).
    *
    * Output `(idCol, n_shingles, n_dup, max_run, max_span_tokens,
    * max_run_start_idx)`: `max_run` is the longest consecutive
    * duplicated-shingle run (0 when nothing is duplicated),
    * `max_span_tokens = max_run + shingleN - 1` (0 when max_run = 0) is
    * the token length of that span, and `max_run_start_idx` is the TOKEN
    * OFFSET where it starts (earliest such run on ties; −1 when no run) —
    * the cut position a remediation pass needs (Lee et al.'s pipeline
    * emits positions, not just lengths: the span to remove is
    * tokens [max_run_start_idx, max_run_start_idx + max_span_tokens)).
    *
    * Plan: positioned shingles → distinct (doc, digest) → doc-frequency
    * hash-aggregate (one row per distinct shingle, map-side combinable) →
    * digest equi-join back (same skew posture as [[dupShingleScore]]) →
    * gaps-and-islands over a DOC-keyed window (`idx - row_number`), whose
    * partition size is bounded by one document's length — never by corpus
    * duplication structure.
    */
  def longestDupRun(df: DataFrame, idCol: String, textCol: String, shingleN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = df
      .select(col(idCol), posexplode(TextDedup.wordShingles(TextDedup.tokens(col(textCol)), shingleN)))
      .select(col(idCol), col("pos").cast("long").as("idx"), md5(col("col").cast("binary")).as("__h"))

    val docFreq = sh.select(col(idCol), col("__h")).distinct()
      .groupBy(col("__h")).agg(count(lit(1)).as("__n_docs"))

    val marked = sh.join(docFreq, "__h")
      .select(col(idCol), col("idx"), (col("__n_docs") > 1).as("__dup"))

    val totals = marked.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_shingles"),
      sum(when(col("__dup"), 1L).otherwise(0L)).as("n_dup"))

    // islands: consecutive duplicated positions share (idx - rank) within a
    // doc; per island keep (length, start), then argmax by (length desc,
    // start asc) via the partial-aggregable min(struct) trick
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("idx"))
    val runs = marked.filter(col("__dup"))
      .withColumn("__grp", col("idx") - row_number().over(byDoc))
      .groupBy(col(idCol), col("__grp"))
      .agg(count(lit(1)).as("__run"), min(col("idx")).as("__start"))
      .groupBy(col(idCol))
      .agg(min(struct((-col("__run")).as("nr"), col("__start").as("st"))).as("__best"))
      .select(col(idCol), (-col("__best.nr")).as("max_run"),
        col("__best.st").as("__start"))

    totals.join(runs, Seq(idCol), "left").select(
      col(idCol),
      col("n_shingles"),
      col("n_dup"),
      coalesce(col("max_run"), lit(0L)).as("max_run"),
      when(coalesce(col("max_run"), lit(0L)) > 0L,
        coalesce(col("max_run"), lit(0L)) + lit(shingleN - 1).cast("long"))
        .otherwise(0L).as("max_span_tokens"),
      coalesce(col("__start"), lit(-1L)).as("max_run_start_idx"))
  }

  /** Duplicated-span REMEDIATION — the step after [[longestDupRun]]'s
    * attribution: documents whose longest corpus-duplicated span reaches
    * `minSpanTokens` get that span CUT (tokens
    * [max_run_start_idx, max_run_start_idx + max_span_tokens) removed,
    * prefix and suffix rejoined), everything else passes through
    * untouched — Lee et al. 2022's pipeline emits cut positions for
    * exactly this scrub, and this operator closes the loop from signal
    * to cleaned text.
    *
    * Scale shape: the run attribution is [[longestDupRun]]'s
    * doc-frequency join + doc-keyed islands window; the cut itself is a
    * pure per-row array-slice projection after ONE id-keyed equi-join of
    * the (id, start, span) stats back onto the token arrays.
    *
    * Output: (idCol, n_tokens, cut_start, cut_tokens, kept_text) with
    * cut_start = −1 / cut_tokens = 0 / kept_text = original tokens for
    * unremediated documents.
    */
  def cutDupSpans(df: DataFrame, idCol: String, textCol: String,
                  shingleN: Int, minSpanTokens: Int): DataFrame = {
    require(minSpanTokens >= shingleN,
      "a cut must be at least one shingle long")
    val runs = longestDupRun(df, idCol, textCol, shingleN)
      .select(col(idCol), col("max_span_tokens"), col("max_run_start_idx"))
    df.select(col(idCol), TextDedup.tokens(col(textCol)).as("__w"))
      .join(runs, Seq(idCol), "left")
      .withColumn("n_tokens", size(col("__w")).cast("long"))
      .withColumn("__cut",
        coalesce(col("max_span_tokens"), lit(0L)) >= minSpanTokens)
      .withColumn("cut_start",
        when(col("__cut"), col("max_run_start_idx")).otherwise(-1L))
      .withColumn("cut_tokens",
        when(col("__cut"), col("max_span_tokens")).otherwise(0L))
      .withColumn("kept_text",
        when(col("__cut"), array_join(concat(
            slice(col("__w"), lit(1), col("cut_start").cast("int")),
            slice(col("__w"),
              (col("cut_start") + col("cut_tokens") + 1L).cast("int"),
              size(col("__w")))), " "))
          .otherwise(array_join(col("__w"), " ")))
      .select(col(idCol), col("n_tokens"), col("cut_start"),
        col("cut_tokens"), col("kept_text"))
  }

  /** Per-source boilerplate paragraphs: the fixed-width paragraphs that
    * recur across at least `minDocs` DISTINCT documents of the same source
    * (CCNet's per-shard repeated-line scrub / RefinedWeb's site-template
    * removal, expressed source-locally so one site's nav bar doesn't need a
    * corpus-global threshold).
    *
    * Output: `(sourceCol, para, n_docs)` for qualifying paragraphs.
    *
    * Plan: one two-phase distinct-count keyed on (source, digest) — the
    * digest is the grouping key so the paragraph text shuffles once as
    * `min(para)` (all values under a digest are equal; min is just the
    * partial-aggregable way to carry one exemplar). No join anywhere.
    */
  def boilerplateParagraphs(df: DataFrame, idCol: String, textCol: String, sourceCol: String,
                            paraTokens: Int, minDocs: Int): DataFrame = {
    require(minDocs >= 2, "boilerplate needs a recurrence threshold >= 2")
    paragraphs(df, idCol, textCol, paraTokens, keep = Seq(sourceCol))
      .groupBy(col(sourceCol), md5(col("para").cast("binary")).as("__h"))
      .agg(
        countDistinct(col(idCol)).as("n_docs"),
        min(col("para")).as("para"))
      .filter(col("n_docs") >= minDocs)
      .select(col(sourceCol), col("para"), col("n_docs"))
  }

  /** Content-defined chunking at token granularity — the dedup unit that
    * survives INSERTIONS. Fixed-width windows ([[paragraphs]]) shift all
    * downstream chunk boundaries when one token is inserted, so an edited
    * near-copy shares no digests with its original; content-defined
    * boundaries re-synchronize at the next anchor (the rolling-hash CDC
    * idea behind rsync/LBFS — Muthitacharoen et al. SOSP 2001 — at token
    * grain, which keeps the anchor rule engine-portable: a token is an
    * anchor iff `hashBucket16(token) % anchorMod == 0`, expected chunk
    * length = anchorMod tokens).
    *
    * An anchor token STARTS a new chunk; tokens before the first anchor
    * form chunk 0. Output: (idCol, chunk_idx, n_tokens, digest,
    * is_shared) — is_shared marks digests appearing in ≥ 2 documents
    * (the cross-doc dup signal).
    *
    * Scale shape: tokenize + anchor-flag is a projection; the chunk
    * index is a doc-keyed running sum (each window partition holds ONE
    * document's tokens); chunk text re-assembles via sort_array inside a
    * doc-keyed aggregate; sharedness is the q100 shape — doc-frequency
    * pre-collapsed per distinct digest, joined back on the digest key,
    * both sides digest-width.
    */
  def contentDefinedChunks(df: DataFrame, idCol: String, textCol: String,
                           anchorMod: Int): DataFrame = {
    require(anchorMod >= 2, "anchorMod must be >= 2")
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol),
        posexplode(TextDedup.tokens(col(textCol))).as(Seq("pos", "tok")))
      .withColumn("__a",
        when(Sampling.hashBucket16(col("tok")) % anchorMod === 0, 1L).otherwise(0L))
      .withColumn("chunk_idx",
        sum(col("__a")).over(Window.partitionBy(col(idCol)).orderBy(col("pos"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val chunks = toks.groupBy(col(idCol), col("chunk_idx"))
      .agg(count(lit(1)).as("n_tokens"),
        md5(array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ").cast("binary")).as("digest"))
    val shared = chunks.groupBy(col("digest"))
      .agg(countDistinct(col(idCol)).as("__nd"))
    chunks.join(shared, "digest")
      .select(col(idCol), col("chunk_idx"), col("n_tokens"), col("digest"),
        (col("__nd") > 1L).as("is_shared"))
  }
}
