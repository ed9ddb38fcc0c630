package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination (extension tier, SURVEY.md §7.4): flag
  * training documents that share any word n-gram with a holdout / eval
  * corpus, so evaluation data can be scrubbed from the training set before
  * a run. This is the published n-gram overlap filter (Brown et al.,
  * "Language Models are Few-Shot Learners", NeurIPS 2020, §C — 13-gram
  * collision against benchmark sets; the n is a parameter here).
  *
  * Scale shape (the only one that survives 100 TB of train text):
  *   - both sides shingle with the same [[TextDedup.wordShingles]]
  *     projection and hash each shingle to a 16-byte md5 digest, so
  *     nothing wider than a digest ever moves;
  *   - the HOLDOUT side is reduced to its distinct digest set — eval
  *     corpora are orders of magnitude smaller than train corpora, so this
  *     set broadcasts (a broadcast hash join builds one hash table per
  *     task, vs. re-scanning an array literal per row);
  *   - the TRAIN side stays partitioned where it is: explode distinct
  *     per-doc digests, broadcast-join, count hits per doc. One shuffle
  *     (the per-doc count), no all-pairs anything.
  *
  * Output: one row per train document — total distinct shingles, how many
  * collide with the holdout set, the collision fraction in basis points,
  * and the scrub verdict (any collision ⇒ contaminated). Documents too
  * short to have an n-gram are clean by definition (n_shingles = 0).
  */
object Decontaminate {

  def contamination(
      train: DataFrame, holdout: DataFrame,
      idCol: String, textCol: String, shingleN: Int
  ): DataFrame = {
    def digests(df: DataFrame): DataFrame = df.select(
      col(idCol),
      array_distinct(transform(
        TextDedup.wordShingles(TextDedup.tokens(col(textCol)), shingleN),
        s => md5(s.cast("binary")))).as("__ds"))

    val holdoutSet = digests(holdout)
      .select(explode(col("__ds")).as("__d")).distinct()
    val hits = digests(train)
      .select(col(idCol), explode(col("__ds")).as("__d"))
      .join(broadcast(holdoutSet), "__d")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__hits"))

    val nOverlap = coalesce(col("__hits"), lit(0L))
    digests(train)
      .select(col(idCol), size(col("__ds")).cast("long").as("n_shingles"))
      .join(hits, Seq(idCol), "left")
      .select(
        col(idCol),
        col("n_shingles"),
        nOverlap.as("n_overlap"),
        when(col("n_shingles") > 0,
          expr(s"(coalesce(__hits, 0L) * 10000L) div n_shingles"))
          .otherwise(0L).as("overlap_bp"),
        (nOverlap > 0).as("contaminated"))
  }

  /** Per-side distinct shingle digests (id, __ds: array<string>). */
  private def shingleDigests(df: DataFrame, idCol: String, textCol: String, shingleN: Int): DataFrame =
    df.select(
      col(idCol),
      array_distinct(transform(
        TextDedup.wordShingles(TextDedup.tokens(col(textCol)), shingleN),
        s => md5(s.cast("binary")))).as("__ds"))

  /** Build the holdout-side Bloom filter: distinct shingle digests folded
    * into a [[graft.functions.BloomAgg]] sketch, returned serialized.
    *
    * The one-row collect is the sketch itself (`numBits/8` bytes — e.g.
    * 256 KB at 2²¹ bits), the same bounded-localization contract as the
    * k×dims centroid collect in VectorSearch.kmeansFit: at 100 TB the
    * holdout scan and the filter fold are fully distributed (partials
    * OR-merge per partition), and only the finished bitset lands on the
    * driver for re-broadcast. This replaces [[contamination]]'s exact
    * broadcast digest SET when the holdout outgrows an executor hash table
    * (~10 bits/item vs ~50 bytes/entry).
    */
  def holdoutBloom(holdout: DataFrame, idCol: String, textCol: String, shingleN: Int,
                   numBits: Int, numHashes: Int): Array[Byte] =
    shingleDigests(holdout, idCol, textCol, shingleN)
      .select(explode(col("__ds")).as("__d")).distinct()
      .agg(graft.functions.GraftFunctions.bloomAgg(col("__d"), numBits, numHashes).as("bf"))
      .head().getAs[Array[Byte]]("bf")

  /** Decontamination verdicts against a serialized holdout Bloom filter:
    * per train document, how many distinct shingle digests the filter
    * flags, and whether any flag fired. ZERO joins and zero shuffles — the
    * probe runs inside the per-document projection (`numHashes` word reads
    * per digest, whole-stage codegen), so the train side never leaves its
    * input partitioning. No false negatives: every truly contaminated
    * shingle is flagged, so `flagged == false` is a SOUND clean verdict;
    * flagged docs carry a small deterministic false-positive tail bounded
    * by the filter's load factor — scrub on it directly, or exact-verify
    * only the flagged ε when precision matters.
    *
    * Output: (id, n_shingles, n_flagged, flagged).
    */
  def bloomContamination(train: DataFrame, bloomBytes: Array[Byte],
                         idCol: String, textCol: String, shingleN: Int): DataFrame = {
    val bf = lit(bloomBytes)
    shingleDigests(train, idCol, textCol, shingleN)
      .select(
        col(idCol),
        size(col("__ds")).cast("long").as("n_shingles"),
        size(filter(col("__ds"),
          d => graft.functions.GraftFunctions.bloomContains(bf, d))).cast("long").as("n_flagged"))
      .withColumn("flagged", col("n_flagged") > 0)
  }

  /** Corpus-overlap ESTIMATE by sketch composition — "how contaminated is
    * this train split, roughly?" answered in ONE pass with O(k) state and
    * no join at all: three KMV sketches (train, holdout, union — the
    * union sketch reads the same stream, and a shingle present on both
    * sides dedups by hash inside the buffer, so no `.distinct()` shuffle
    * is needed anywhere) and inclusion–exclusion
    * `|T∩H| ≈ est(T) + est(H) − est(T∪H)`. The exact-join answer
    * ([[contamination]]) is per-document and precise; this is the
    * corpus-level gauge you run FIRST at 100 TB to decide whether the
    * precise pass is worth scheduling — the same
    * telemetry-before-surgery split as q36 vs countDistinct. Per-side
    * relative error ~1/√k; the overlap estimate compounds all three, so
    * size k for the margin you need.
    *
    * Output (one row): est_train, est_holdout, est_union, est_overlap.
    */
  def overlapSketch(train: DataFrame, holdout: DataFrame,
                    textCol: String, shingleN: Int, k: Int): DataFrame = {
    require(graft.functions.GraftFunctions.installed(train.sparkSession),
      "overlapSketch needs the graft extension (KMV aggregate)")
    def sh(df: DataFrame, side: String) = df.select(lit(side).as("__side"),
      explode(TextDedup.wordShingles(TextDedup.tokens(col(textCol)), shingleN)).as("__s"))
    sh(train, "t").unionByName(sh(holdout, "h"))
      .agg(
        graft.functions.GraftFunctions
          .kmvDistinct(when(col("__side") === "t", col("__s")), k).as("est_train"),
        graft.functions.GraftFunctions
          .kmvDistinct(when(col("__side") === "h", col("__s")), k).as("est_holdout"),
        graft.functions.GraftFunctions.kmvDistinct(col("__s"), k).as("est_union"))
      .select(col("est_train"), col("est_holdout"), col("est_union"),
        (col("est_train") + col("est_holdout") - col("est_union")).as("est_overlap"))
  }

  /** Pairwise cross-source content overlap: for every unordered pair of
    * sources, how many distinct word-`shingleN`-grams they share, and the
    * exact-integer Jaccard in permille. The leakage MATRIX form of
    * [[contamination]] — where contamination asks "which train docs touch
    * the holdout", this asks "which corpus components are copies of each
    * other" (the mC4/Pile-style audit for aggregator sources that mirror
    * one another), so a mixture builder can collapse near-identical
    * sources before weighting them.
    *
    * Output: `(source_a, source_b, n_a, n_b, n_common, jaccard_permille)`
    * with source_a < source_b, one row per pair that shares at least one
    * shingle; `jaccard_permille = n_common * 1000 div (n_a + n_b -
    * n_common)`.
    *
    * Plan: distinct (source, digest) — the per-source shingle SETS — then
    * a digest self-equi-join producing at most |sources|² rows per
    * digest (source cardinality is a catalog constant: dozens at 100 TB,
    * never data-sized), then one hash-aggregate per pair and a broadcast
    * join of the per-source totals. Digest-width rows on every wire; the
    * all-pairs blowup the naive doc×doc formulation would hit is capped at
    * the source-count square.
    */
  def sourceOverlap(df: DataFrame, sourceCol: String, textCol: String,
                    shingleN: Int): DataFrame = {
    val sets = df.select(col(sourceCol).as("__src"),
        explode(TextDedup.wordShingles(TextDedup.tokens(col(textCol)), shingleN)).as("__s"))
      .select(col("__src"), md5(col("__s").cast("binary")).as("__h"))
      .distinct()

    val totals = sets.groupBy(col("__src")).agg(count(lit(1)).as("__n"))

    val pairs = sets.as("a")
      .join(sets.as("b"), col("a.__h") === col("b.__h") && col("a.__src") < col("b.__src"))
      .groupBy(col("a.__src").as("source_a"), col("b.__src").as("source_b"))
      .agg(count(lit(1)).as("n_common"))

    pairs
      .join(broadcast(totals.withColumnRenamed("__src", "source_a").withColumnRenamed("__n", "n_a")), "source_a")
      .join(broadcast(totals.withColumnRenamed("__src", "source_b").withColumnRenamed("__n", "n_b")), "source_b")
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"), col("n_common"),
        expr("n_common * 1000 div (n_a + n_b - n_common)").as("jaccard_permille"))
  }
}
