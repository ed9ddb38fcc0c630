package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differential-privacy release primitives (Dwork et al., "Calibrating
  * Noise to Sensitivity in Private Data Analysis", TCC 2006) — the
  * aggregate-release tier a data platform runs when publishing corpus
  * statistics (per-source counts, contributor tallies) outside the
  * trust boundary.
  *
  * House determinism rule: the Laplace draw is SEEDED — the uniform comes
  * from md5(salt|group-key), so a release is a pure function of the data
  * and the salt and replays bit-for-bit on any engine (and in the DuckDB
  * oracle). A production deployment would rotate the salt per release
  * epoch; determinism per (salt, key) is exactly the "one noise draw per
  * released cell" discipline that prevents averaging attacks across
  * re-runs of the same release.
  *
  * Scale shape: noise attaches as a PROJECTION on the aggregated frame
  * (one row per released group) — the corpus-side work is the one
  * hash-aggregate producing the counts; nothing here touches occurrence
  * rows.
  */
object Privacy {

  /** Seeded uniform u ∈ (0,1): the first 8 md5 hex digits of
    * `salt|key` as a 32-bit value v, mapped to (v + 0.5) / 2^32 — the
    * half-step offset keeps u strictly inside (0,1) so the Laplace
    * inverse CDF below never sees ln(0).
    */
  def seededUniform(key: Column, salt: String): Column = {
    val v = conv(substring(
      md5(concat_ws("|", lit(salt), key.cast("string")).cast("binary")),
      1, 8), 16, 10).cast("long")
    (v.cast("double") + lit(0.5)) / lit(4294967296.0)
  }

  /** Laplace(b = `bMicro`/10^6) noise in integer micro-units via the
    * inverse CDF: with w = u − ½, noise = −b·sgn(w)·ln(1 − 2|w|).
    * For a count query (sensitivity 1), b = 1/ε — so ε = 1 is
    * `bMicro = 1000000`. |noise| ≤ b·ln(2^33) ≈ 22.9·b (the u offset
    * bounds the tail), so micro-unit longs never overflow.
    */
  def laplaceNoiseMicro(key: Column, salt: String, bMicro: Long): Column = {
    require(bMicro > 0, "bMicro must be positive")
    val w = seededUniform(key, salt) - lit(0.5)
    round(lit(-bMicro.toDouble) * signum(w) * log(lit(1.0) - lit(2.0) * abs(w)))
      .cast("long")
  }

  /** Right-to-be-forgotten impact audit: for each (table, df, keyCol),
    * how many rows reference a subject on the deletion list, and how
    * many would survive the purge — the pre-deletion blast-radius report
    * plus the post-purge verification in one pass per table. The
    * deletion list broadcasts into a semi-join (count referenced) and an
    * anti-join (count surviving); each fact table scans once per count,
    * never shuffles on the subject key.
    *
    * Output: (table_name, n_rows, n_referencing, n_after_purge) — the
    * audit invariant n_rows = n_referencing + n_after_purge holds by
    * construction and a violation flags a non-deterministic source.
    */
  def deletionImpact(tables: Seq[(String, DataFrame, String)],
      deleted: DataFrame, delKeyCol: String): DataFrame = {
    require(tables.nonEmpty, "need at least one table")
    val del = broadcast(deleted.select(col(delKeyCol)).distinct())
    tables.map { case (name, df, keyCol) =>
      val refs = df.join(del, df(keyCol) === del(delKeyCol), "left_semi")
        .agg(count(lit(1)).as("n_referencing"))
      val kept = df.join(del, df(keyCol) === del(delKeyCol), "left_anti")
        .agg(count(lit(1)).as("n_after_purge"))
      val total = df.agg(count(lit(1)).as("n_rows"))
      total.crossJoin(refs).crossJoin(kept)
        .select(lit(name).as("table_name"), col("n_rows"),
          col("n_referencing"), col("n_after_purge"))
    }.reduce(_ unionByName _)
  }

  /** k-anonymity audit (Sweeney 2002): equivalence classes over the
    * quasi-identifier columns, the minimum class size, and the rows at
    * re-identification risk (in classes smaller than k). One
    * hash-aggregate to class granularity; the summary folds the
    * class-cardinality frame.
    *
    * Output (one row): n_classes, min_class_size, n_small_classes,
    * rows_at_risk, at_risk_bp.
    */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier")
    df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("__sz"))
      .agg(count(lit(1)).as("n_classes"),
        min(col("__sz")).as("min_class_size"),
        sum(when(col("__sz") < k, 1L).otherwise(0L)).as("n_small_classes"),
        sum(when(col("__sz") < k, col("__sz")).otherwise(0L)).as("rows_at_risk"),
        sum(col("__sz")).as("__n"))
      .withColumn("at_risk_bp", expr("(rows_at_risk * 10000L) div __n"))
      .drop("__n")
  }

  /** l-diversity audit (Machanavajjhala et al. 2007): per
    * quasi-identifier class, the number of DISTINCT sensitive values;
    * classes below `l` are vulnerable to homogeneity attacks even when
    * k-anonymous. Two chained aggregates (class+sensitive → class →
    * summary), all partial-aggregable.
    *
    * Output (one row): n_classes, min_diversity, n_low_classes,
    * rows_in_low_classes.
    */
  def lDiversityAudit(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier")
    val perClassValue = df
      .groupBy((qiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
    perClassValue
      .groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__div"), sum(col("__cnt")).as("__sz"))
      .agg(count(lit(1)).as("n_classes"),
        min(col("__div")).as("min_diversity"),
        sum(when(col("__div") < l, 1L).otherwise(0L)).as("n_low_classes"),
        sum(when(col("__div") < l, col("__sz")).otherwise(0L)).as("rows_in_low_classes"))
  }

  /** ε-DP noisy group counts: one Laplace(1/ε) draw per group, seeded by
    * the group key. `suppressBelow` additionally drops groups whose TRUE
    * count is under the floor (the k-anonymity-style small-cell rule
    * census-type releases layer on top of DP). The output keeps `true_n`
    * beside the release — this is the calibration AUDIT table (publishing
    * it would of course break the guarantee; the release view selects
    * only `released_micro`).
    *
    * Output: groupCols..., true_n, noise_micro,
    * released_micro = true_n·10^6 + noise_micro.
    */
  def noisyCounts(df: DataFrame, groupCols: Seq[String], salt: String,
      bMicro: Long, suppressBelow: Long): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    // The seed key must be INJECTIVE in the group tuple: concat_ws skips
    // NULL cells, so (NULL,'x') and ('x',NULL) would draw IDENTICAL,
    // correlated noise — breaking the one-independent-draw-per-cell
    // discipline. Encode each cell as `n` (NULL) or `v` + value with `\`
    // doubled and the `/` separator escaped, keeping adjacent keys
    // unambiguous (("a","bc") vs ("ab","c")) AND null-distinct.
    val key = concat_ws("/", groupCols.map { c =>
      val escaped = concat(lit("v"),
        replace(replace(col(c).cast("string"), lit("\\"), lit("\\\\")),
          lit("/"), lit("\\/")))
      when(col(c).isNull, lit("n")).otherwise(escaped)
    }: _*)
    df.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("true_n"))
      .filter(col("true_n") >= suppressBelow)
      .withColumn("noise_micro", laplaceNoiseMicro(key, salt, bMicro))
      .withColumn("released_micro",
        col("true_n") * lit(1000000L) + col("noise_micro"))
  }
  /** Crypto-shredding (the GDPR right-to-be-forgotten pattern every
    * lakehouse privacy design ends at: encrypt each subject's payload
    * under a per-subject key, store keys in a separate registry, and
    * "forget" a subject by deleting ONE key row — the immutable data
    * files never rewrite). The cipher here is the house deterministic
    * STUB for AES-CTR: an md5-chained keystream XORed per character
    * (byte-oriented — ASCII payload contract), so both engines replay
    * ciphertext and round-trip bit for bit; a real build swaps the
    * keystream for a cipher call and nothing else changes.
    *
    * Keystream byte i of subject u:
    * `block = md5(key_u || '/' || i div 16)`, take hex-pair i mod 16 —
    * one md5 per 16 payload chars, all inside a codegen'd HOF
    * projection (no shuffle on the payload path).
    */
  def shredKeys(subjects: DataFrame, subjectCol: String, secret: String): DataFrame =
    subjects.select(col(subjectCol).cast("string").as("subject")).distinct()
      .withColumn("ukey",
        md5(concat_ws("/", lit(secret), col("subject")).cast("binary")))

  private def xorStreamSql(inByte: String): String =
    s"""array_join(transform(sequence(1, length(__t)), i ->
       |  lpad(lower(hex(($inByte) ^ (CAST(conv(substr(
       |    md5(CAST(concat_ws('/', ukey, CAST((i - 1) div 16 AS STRING)) AS BINARY)),
       |    ((i - 1) % 16) * 2 + 1, 2), 16, 10) AS INT)))), 2, '0')), '')""".stripMargin

  /** Encrypt `payloadCol` under each row's subject key: ciphertext is a
    * hex string (2 chars per payload char). `keys` is a
    * [[shredKeys]]-shaped registry.
    */
  def shredEncrypt(df: DataFrame, subjectCol: String, payloadCol: String,
                   keys: DataFrame): DataFrame =
    df.withColumn("subject", col(subjectCol).cast("string"))
      .join(keys, "subject")
      .withColumn("__t", col(payloadCol).cast("string"))
      .withColumn("ciphertext", expr(xorStreamSql("ascii(substring(__t, i, 1))")))
      .drop("__t", "ukey")

  /** Decrypt ciphertext for every row whose subject still has a key in
    * the (post-forget) registry; rows without a key stay ciphertext-only
    * with `recoverable = false` — the shredding guarantee made visible.
    */
  def shredDecrypt(enc: DataFrame, cipherCol: String, keys: DataFrame): DataFrame = {
    val keyed = enc.join(keys, Seq("subject"), "left")
      .withColumn("recoverable", col("ukey").isNotNull)
    keyed
      .withColumn("plaintext",
        when(col("recoverable"),
          expr(s"""array_join(transform(sequence(1, length($cipherCol) div 2), i ->
            |  char((CAST(conv(substr($cipherCol, (i - 1) * 2 + 1, 2), 16, 10) AS INT)) ^
            |    (CAST(conv(substr(
            |      md5(CAST(concat_ws('/', ukey, CAST((i - 1) div 16 AS STRING)) AS BINARY)),
            |      ((i - 1) % 16) * 2 + 1, 2), 16, 10) AS INT)))), '')""".stripMargin))
          .otherwise(lit(null).cast("string")))
      .drop("ukey")
  }
}
