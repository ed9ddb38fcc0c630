package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation (extension tier,
  * SURVEY.md §7.4): token counting, quality scoring, language-ID heuristics.
  *
  * All pure column expressions over built-in string/regex functions — fully
  * codegen'd, embarrassingly parallel, no shuffle until the caller
  * aggregates. Ratios are computed in integer basis points (floor division)
  * so scores are exact and portable across engines.
  */
object TextStats {

  /** Subword-ish tokens: runs of letters, runs of digits, or single other
    * non-space chars — a deterministic BPE-shaped proxy for token counting.
    */
  val SubwordPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** Per-document token statistics.
    * Output: id, n_chars, n_tokens, n_distinct_tokens, n_subword_tokens.
    */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextDedup.tokens(col(textCol))
    df.select(
      col(idCol),
      length(col(textCol)).cast("long").as("n_chars"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
      size(regexp_extract_all(col(textCol), lit(SubwordPattern), lit(0))).cast("long").as("n_subword_tokens")
    )
  }

  /** Heuristic quality signals in exact integer basis points:
    *   - stop_bp: stopword share of tokens ×10000 (floor),
    *   - space_bp: whitespace share of chars ×10000 (floor),
    *   - ttr_bp: type-token ratio (distinct/total) ×10000 (floor),
    * plus a coarse `quality_bin` (good / short / low_diversity).
    */
  def qualityScore(df: DataFrame, idCol: String, textCol: String,
                   stopwords: Seq[String] = Seq("the", "a", "of", "to", "and")): DataFrame = {
    val toks    = TextDedup.tokens(col(textCol))
    val nTok    = size(toks).cast("long")
    val nStop   = size(filter(toks, t => t.isin(stopwords.map(lit): _*))).cast("long")
    val nChars  = length(col(textCol)).cast("long")
    val nSpace  = (nChars - length(regexp_replace(col(textCol), " ", ""))).cast("long")
    val nDist   = size(array_distinct(toks)).cast("long")
    // floor(a/b) on positive longs in this range is exact in double, and
    // matches DuckDB's integer `//`
    def intDiv(a: Column, b: Column): Column = floor(a / b).cast("long")
    val stopBp  = when(nTok > 0, intDiv(nStop * 10000L, nTok)).otherwise(0L).cast("long")
    val spaceBp = when(nChars > 0, intDiv(nSpace * 10000L, nChars)).otherwise(0L).cast("long")
    val ttrBp   = when(nTok > 0, intDiv(nDist * 10000L, nTok)).otherwise(0L).cast("long")
    df.select(
      col(idCol),
      nTok.as("n_tokens"),
      stopBp.as("stop_bp"),
      spaceBp.as("space_bp"),
      ttrBp.as("ttr_bp"),
      when(nTok < 10, "short")
        .when(ttrBp < 3000L, "low_diversity")
        .otherwise("good")
        .as("quality_bin")
    )
  }

  /** Marker-stopword language-ID heuristic: count hits per language's
    * marker set, predict the argmax (ties and zero-hits fall back to "und").
    * A real system would use char-n-gram profiles; the *shape* (per-language
    * conditional counts + argmax, no shuffle) is what matters at scale.
    */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of"),
      "de" -> Seq("der", "die", "und"),
      "fr" -> Seq("le", "la", "et"),
      "es" -> Seq("el", "los", "y")
    )
    val toks = TextDedup.tokens(col(textCol))
    val hitCols = markers.map { case (lang, ms) =>
      lang -> size(filter(toks, t => t.isin(ms.map(lit): _*))).cast("long")
    }
    // argmax with deterministic order: first language with the max count,
    // only if at least one marker hit
    val maxHits = hitCols.map(_._2).reduce((a, b) => greatest(a, b))
    val pred = hitCols.foldRight(lit("und"): Column) { case ((lang, c), acc) =>
      when(c === maxHits && maxHits > 0, lit(lang)).otherwise(acc)
    }
    df.select(col(idCol), pred.as("lang_pred"))
  }
}
