package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval scoring (extension tier, SURVEY.md §7.4): rank documents
  * against a query term set with BM25 (Robertson & Zaragoza, "The
  * Probabilistic Relevance Framework: BM25 and Beyond", 2009) — the
  * standard lexical retriever a RAG-style data pipeline runs beside the
  * embedding ANN operators (q26/q28/q38).
  *
  * Engine-exact arithmetic (house rule — no floats anywhere near a hash
  * compare): with k1 = 1.2 and b = 0.75 as exact rationals (6/5, 3/4) and
  * `avgdl` floored to an integer, the term score
  *
  *   idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *
  * multiplies out to the integer quotient
  *
  *   (idf_micro · tf · 44 · avgdl) div (20·avgdl·tf + 6·avgdl + 18·dl)
  *
  * where idf_micro is the exp-free rational idf surrogate
  * ((N − df + 1)·1e6) div (df + 1) — positive, monotone in the true
  * Robertson idf, so per-term rankings are BM25 rankings; the absolute
  * scale is a documented variant. All products stay < 2^63 for corpora to
  * ~10^9 docs × tf ≤ 10^4; past that the same formula moves to
  * DECIMAL(38,0) unchanged.
  *
  * Scale shape: per-doc tf for each query term is a PROJECTION
  * (`size(filter(tokens, = term))` — the query term list is a literal,
  * never a corpus-wide token explode); corpus stats (N, Σdl) are a 1-row
  * broadcast; per-term document frequencies are a |terms|-row broadcast.
  * One shuffle total: the per-term top-k rank window.
  */
object Retrieval {

  def bm25TopK(
      df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int
  ): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val toks = TextDedup.tokens(col(textCol))
    val perDoc = df.select(
      col(idCol),
      size(toks).cast("long").as("dl"),
      array(queryTerms.map { t =>
        struct(lit(t).as("term"),
          size(filter(toks, x => x === t)).cast("long").as("tf"))
      }: _*).as("__tfs"))

    val scored = perDoc
      .select(col(idCol), col("dl"), explode(col("__tfs")).as("__e"))
      .select(col(idCol), col("dl"),
        col("__e.term").as("term"), col("__e.tf").as("tf"))
      .filter(col("tf") > 0)

    val stats = perDoc
      .agg(count(lit(1)).as("__n"), sum(col("dl")).as("__sumdl"))
      .select(col("__n"), expr("__sumdl div __n").as("__avgdl"))
    val dfT = scored.groupBy(col("term")).agg(count(lit(1)).as("df_docs"))

    val w = Window.partitionBy(col("term"))
      .orderBy(col("score_micro").desc, col(idCol))
    scored
      .join(broadcast(dfT), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__idf_micro", expr("((__n - df_docs + 1L) * 1000000L) div (df_docs + 1L)"))
      .withColumn("score_micro",
        expr("(__idf_micro * tf * 44L * __avgdl) div (20L * __avgdl * tf + 6L * __avgdl + 18L * dl)"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("term"), col("rnk"), col(idCol), col("tf"),
        col("df_docs"), col("score_micro"))
  }

  /** Whole-query BM25 ranking: sum of per-term `score_micro` over the
    * per-term top-`perTermK` lists (BM25 of a multi-term query IS the sum
    * of its per-term scores; restricting to per-term top lists is the
    * standard WAND-style candidate pruning — a document outside every
    * term's top list cannot enter the fused top-k unless `perTermK` is
    * too small, which the caller sizes as k × |terms|).
    *
    * Scale shape: the global rank window runs over ≤ |terms|·perTermK
    * candidate rows — a bounded frame, so the unpartitioned window is a
    * deliberate single-task finisher, not a scale hazard. The corpus-wide
    * work is all inside [[bm25TopK]].
    */
  def bm25QueryTopK(
      df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], perTermK: Int, k: Int
  ): DataFrame = {
    val w = Window.orderBy(col("bm25_micro").desc, col(idCol))
    bm25TopK(df, idCol, textCol, queryTerms, perTermK)
      .groupBy(col(idCol))
      .agg(sum(col("score_micro")).as("bm25_micro"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Positional phrase match: per document, the number of token positions
    * where the full `phrase` token sequence starts — the inverted-index
    * phrase-query primitive, expressed as a pure HIGHER-ORDER-FUNCTION
    * projection (`filter` over the valid start offsets testing each
    * phrase term by `element_at`): no explode, no position self-joins, no
    * shuffle at all before the final match filter. Token-boundary exact,
    * unlike a LIKE scan (no substring false hits).
    *
    * Output: (phrase, idCol, carryCols..., n_matches) for documents with
    * ≥ `minMatches` matches (`carryCols` pass extra columns through —
    * e.g. the event time for the streaming telemetry twin, which also
    * sets `minMatches = 0`: in a stream, the match filter would push
    * BELOW the watermark node and non-matching events would stop
    * advancing the watermark, so the twin gates after its aggregate).
    */
  def phraseMatches(df: DataFrame, idCol: String, textCol: String,
      phrases: Seq[Seq[String]], carryCols: Seq[String] = Nil,
      minMatches: Long = 1L): DataFrame = {
    require(phrases.nonEmpty && phrases.forall(_.nonEmpty), "phrases must be non-empty")
    val toks = TextDedup.tokens(col(textCol))
    phrases.map { phrase =>
      val L = phrase.size
      val upper = size(toks) - (L - 1)
      // sequence(1, u) counts DOWN when u < 1 — guard short docs to zero
      val nMatches = when(upper >= 1,
        size(filter(sequence(lit(1), upper),
          i => phrase.zipWithIndex.map { case (term, off) =>
            element_at(toks, i + off) === term
          }.reduce(_ && _)))).otherwise(0).cast("long")
      df.select(lit(phrase.mkString(" ")).as("phrase") +: col(idCol) +:
          (carryCols.map(col) :+ nMatches.as("n_matches")): _*)
        .filter(col("n_matches") >= minMatches)
    }.reduce(_ unionByName _)
  }

  /** ColBERT-style late-interaction retrieval (Khattab & Zaharia, SIGIR
    * 2020): score(q, d) = Σ_{query chunks} max_{doc chunks} sim — the
    * MaxSim operator over per-chunk sparse vectors in TALL form
    * (doc, chunk, dim, weight), e.g. [[TextStats.featureHashing]] output.
    * Cosine is exact-integer until one final rounded division
    * (`sim_bp = round(dot·10⁴/√(n2_q·n2_c))`); chunk pairs sharing no
    * dimension have sim exactly 0, so MaxSim is RELU'd
    * (`greatest(max, 0)`) — absent pairs and negative affinities both
    * contribute nothing, keeping the sparse join complete.
    *
    * Scale shape: the query side is bounded (a query's chunks) and
    * BROADCASTS into the dimension-keyed join against the corpus side —
    * the corpus is scanned once, grouped by (query chunk, corpus chunk)
    * with map-side partial sums, then folded twice (MaxSim, Σ). No
    * corpus self-join, no dense vector materialization.
    *
    * Output: (qdoc, cdoc, li_score_bp, rnk ≤ k) per query document.
    */
  def lateInteractionTopK(qVecs: DataFrame, cVecs: DataFrame, k: Int): DataFrame = {
    val q = broadcast(qVecs.select(col("doc").as("qdoc"), col("chunk").as("qchunk"),
      col("dim"), col("weight").as("qw")))
    val c = cVecs.select(col("doc").as("cdoc"), col("chunk").as("cchunk"),
      col("dim"), col("weight").as("cw"))
    def norms(v: DataFrame, d: String, ch: String, w: String, as: String) =
      v.groupBy(col(d), col(ch)).agg(sum(col(w) * col(w)).as(as))
        .filter(col(as) > 0)
    val qn = broadcast(norms(q, "qdoc", "qchunk", "qw", "qn2"))
    val cn = norms(c, "cdoc", "cchunk", "cw", "cn2")
    val sims = q.join(c, "dim")
      .groupBy(col("qdoc"), col("qchunk"), col("cdoc"), col("cchunk"))
      .agg(sum(col("qw") * col("cw")).as("dot"))
      .join(qn, Seq("qdoc", "qchunk"))
      .join(cn, Seq("cdoc", "cchunk"))
      .withColumn("sim_bp",
        round(col("dot") * 10000.0 / sqrt(col("qn2") * col("cn2"))).cast("long"))
    val w = Window.partitionBy(col("qdoc"))
      .orderBy(col("li_score_bp").desc, col("cdoc"))
    sims.groupBy(col("qdoc"), col("qchunk"), col("cdoc"))
      .agg(greatest(max(col("sim_bp")), lit(0L)).as("ms"))
      .groupBy(col("qdoc"), col("cdoc")).agg(sum(col("ms")).as("li_score_bp"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    * fuse N retrieval systems' rank lists into one ranking by
    * `Σ_systems 1/(k0 + rank)` — the standard hybrid-retrieval merge (BM25
    * lexical + dense ANN) that "outperforms Condorcet and individual rank
    * learning methods" with no score calibration between systems, exactly
    * because it only consumes RANKS. House integer rule: the fused score is
    * `Σ 1000000 div (k0 + rnk)` in BIGINT micro-units, ties broken by id,
    * so the ranking replays bit-for-bit on any engine.
    *
    * Input: `(systemName, df)` pairs where each df carries `idCol` and a
    * rank column (1-based, ≤ its own top-k). Output: one row per candidate
    * id with per-system `rnk_<system>` columns (NULL when that system did
    * not rank the id), `rrf_micro`, and the fused `fused_rnk ≤ topK`.
    *
    * Scale shape: inputs are per-query BOUNDED rank lists (k rows each),
    * so the union + groupBy + global window all run over ≤ Σk rows — the
    * heavy corpus-side work lives in the upstream retrievers. For fusing
    * many queries at once, rank lists carry a query column and the same
    * fold runs with the window partitioned by it (the per-query frames
    * stay bounded either way).
    */
  def rrfFuse(
      systems: Seq[(String, DataFrame)], idCol: String, rankCol: String,
      k0: Int, topK: Int
  ): DataFrame = {
    require(systems.nonEmpty, "need at least one system")
    require(systems.map(_._1).distinct.size == systems.size, "duplicate system name")
    val tagged = systems.map { case (nm, df) =>
      df.select(col(idCol), col(rankCol).cast("long").as("__rnk"),
        lit(nm).as("__sys"))
    }.reduce(_ unionByName _)
    val perSys = systems.map { case (nm, _) =>
      min(when(col("__sys") === nm, col("__rnk"))).as(s"rnk_$nm")
    }
    val w = Window.orderBy(col("rrf_micro").desc, col(idCol))
    tagged.groupBy(col(idCol))
      .agg(sum(expr(s"1000000L div (${k0}L + __rnk)")).as("rrf_micro"), perSys: _*)
      .withColumn("fused_rnk", row_number().over(w).cast("long"))
      .filter(col("fused_rnk") <= topK)
  }

  /** Rank-agreement curve between two retrievers: for every cut depth in
    * `ks`, the size of top-k(a) ∩ top-k(b) and its exact permille of k —
    * the standard IR overlap@k audit (the set-agreement backbone of
    * rank-biased overlap, Webber et al. 2010; public) a pipeline reads
    * before swapping a lexical retriever for a dense one: high agreement
    * at small k means the cheap retriever can pre-filter for the
    * expensive one.
    *
    * Both inputs are already-ranked result lists (id, rank) — at most
    * their topK rows each. The id equi-join and the per-k conditional
    * counts therefore run on ≤ topK rows: the depth spine attaches with a
    * broadcast left join so every requested k emits a row even when the
    * retrievers share nothing (n_common = 0), and the whole audit is
    * driver-trivial at any corpus scale because the corpus never enters.
    *
    * Output: (k, n_common, overlap_permille), one row per distinct k.
    */
  def overlapAtK(a: DataFrame, b: DataFrame, idCol: String, rankCol: String,
                 ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), "cut depths must be >= 1")
    val j = a.select(col(idCol), col(rankCol).cast("long").as("__ra"))
      .join(b.select(col(idCol), col(rankCol).cast("long").as("__rb")),
        Seq(idCol))
    val spine = a.sparkSession.range(1)
      .select(explode(array(ks.distinct.sorted.map(k => lit(k.toLong)): _*))
        .as("k"))
    broadcast(spine).join(j, lit(true), "left")
      .groupBy(col("k"))
      .agg(sum(when(col("__ra") <= col("k") && col("__rb") <= col("k"), 1L)
        .otherwise(0L)).as("n_common"))
      .select(col("k"), col("n_common"),
        expr("n_common * 1000 div k").as("overlap_permille"))
  }
}
