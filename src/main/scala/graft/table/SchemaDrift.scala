package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Header+body payload schema-drift audit — the operational check behind
  * the reference's schema-evolution strategy (SURVEY.md §1: strict typed
  * header columns + a flexible JSON-string body, so producers add fields
  * without breaking ingestion; design_doc/DataModel_SchemaDesign.md:126-129).
  * The flexibility that keeps ingestion alive also means NOBODY errors
  * when a producer renames or drops a payload field — the drift audit is
  * how the pipeline notices: per (producer group, top-level JSON key),
  * presence rates in the early vs late half of the observed time axis,
  * classified as `new` / `dropped` / `shifted` / `stable`.
  *
  * Deterministic and engine-replayable: the era boundary is the integer
  * midpoint of the observed epoch-second span, presence rates are exact
  * basis points, and key extraction is the engines' shared top-level
  * `json_object_keys` / `json_keys` (malformed payloads yield NULL key
  * arrays and drop out of both sides identically).
  *
  * Scale shape: one broadcast min/max span row, one explode of top-level
  * keys (bounded by payload width, not corpus size), two hash-aggregates
  * — (group, era) denominators and (group, key, era) presence — joined
  * on the group key. Nothing corpus-sized ever joins.
  */
object SchemaDrift {

  /** Output: (groupCol, key, n_early, n_late, early_bp, late_bp,
    * drift). `drift` = 'new' (absent early, present late), 'dropped'
    * (present early, absent late), 'shifted' (presence-rate change >
    * `shiftBp` basis points), else 'stable'.
    */
  def payloadDriftAudit(df: DataFrame, groupCol: String, tsCol: String,
                        payloadCol: String, shiftBp: Long = 500L): DataFrame = {
    require(shiftBp >= 0, "shiftBp must be non-negative")
    val secs = col(tsCol).cast("long")
    val span = broadcast(df.agg(
      min(secs).as("__mn"), max(secs).as("__mx")))
    val era = df.crossJoin(span)
      .withColumn("__era",
        when(secs * 2 < col("__mn") + col("__mx"), lit("early"))
          .otherwise(lit("late")))
      .select(col(groupCol), col("__era"), col(payloadCol))
    val denoms = era.groupBy(col(groupCol), col("__era"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(groupCol))
      .agg(
        sum(when(col("__era") === "early", col("__n")).otherwise(0L)).as("__ne"),
        sum(when(col("__era") === "late", col("__n")).otherwise(0L)).as("__nl"))
    val present = era
      .select(col(groupCol), col("__era"),
        explode(json_object_keys(col(payloadCol))).as("key"))
      .groupBy(col(groupCol), col("key"))
      .agg(
        sum(when(col("__era") === "early", 1L).otherwise(0L)).as("n_early"),
        sum(when(col("__era") === "late", 1L).otherwise(0L)).as("n_late"))
    present.join(denoms, Seq(groupCol))
      .withColumn("early_bp",
        when(col("__ne") > 0, expr("n_early * 10000 div __ne"))
          .otherwise(lit(0L)))
      .withColumn("late_bp",
        when(col("__nl") > 0, expr("n_late * 10000 div __nl"))
          .otherwise(lit(0L)))
      .withColumn("drift",
        when(col("n_early") === 0 && col("n_late") > 0, lit("new"))
          .when(col("n_early") > 0 && col("n_late") === 0, lit("dropped"))
          .when(abs(col("late_bp") - col("early_bp")) > shiftBp, lit("shifted"))
          .otherwise(lit("stable")))
      .select(col(groupCol), col("key"), col("n_early"), col("n_late"),
        col("early_bp"), col("late_bp"), col("drift"))
  }
}
