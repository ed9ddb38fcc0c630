package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (extension tier, SURVEY.md §7.4): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, and run decode/feature-extraction as a *batched per-partition*
  * stage — the shape a real pipeline needs at 100 TB (decoder state is
  * initialized once per partition, not per row; rows never leave executors).
  *
  * The decode itself is a clearly-marked STUB: no image/audio codecs exist
  * in this environment, so `fakeDecode` derives deterministic pseudo-features
  * from the payload bytes. The Spark-side plumbing — schema, binary column
  * handling, Dataset encoders, mapPartitions batch shape — is real and
  * tested; swapping `fakeDecode` for a JNI/codec call changes nothing else.
  */
object Multimodal {

  /** One media row in: opaque payload plus its id. */
  final case class MediaRow(id: Long, payload: Array[Byte])

  /** Extracted features out (what a real image decode would yield). */
  final case class MediaFeatures(id: Long, width: Int, height: Int, brightness: Double)

  /** Typed metadata over an opaque binary payload — pure built-in
    * expressions (codegen'd, no decode needed): size, content digest,
    * transport-safe head sample.
    */
  def meta(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol),
      octet_length(col(payloadCol)).cast("long").as("n_bytes"),
      md5(col(payloadCol)).as("content_hash"),
      substring(base64(col(payloadCol)), 1, 16).as("b64_head")
    )

  /** Batched per-partition "decode": the mapPartitions boundary is where a
    * real codec would be initialized once per partition and fed row batches.
    */
  def decodeFeatures(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).cast("binary").as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // STUB decoder: a real implementation opens the codec HERE, once.
        rows.map(fakeDecode)
      }
  }

  /** Frame sampling: `n` evenly-spaced fixed-size windows from the payload
    * (a real video pipeline samples n frames; byte windows stand in — the
    * partitioning/batching shape is identical). Pure column expressions.
    */
  def frameSample(df: DataFrame, idCol: String, payloadCol: String,
                  n: Int, frameBytes: Int = 16): DataFrame = {
    val len = octet_length(col(payloadCol))
    val frames = (0 until n).map { i =>
      // start of window i: 1 + floor(i * len / n), 1-indexed
      val start = (lit(i) * len.cast("long") / lit(n)).cast("int") + lit(1)
      col(payloadCol).substr(start, lit(frameBytes))
    }
    df.select(col(idCol), array(frames: _*).as("frames"))
      .withColumn("n_frames", size(col("frames")).cast("long"))
  }

  /** Sampled-frame fingerprint near-dup — the video-dedup shape: each
    * payload contributes `n` ALIGNED frame digests (md5 of the i-th
    * evenly-spaced window from [[frameSample]]), and two payloads are
    * near-dups when at least `minShared` of their n aligned frames are
    * byte-identical (frame voting). Robustness property of sampled-frame
    * fingerprints: an edit OUTSIDE the sampled windows — the overwhelming
    * majority of bytes — leaves the fingerprint unchanged; an edit inside
    * one window kills exactly that frame's vote.
    *
    * Scale shape: the pair join is blocked on (frame_idx, digest) — only
    * payloads sharing an identical frame at the SAME sample position ever
    * meet, so the join never degrades toward a cross product, and a
    * corpus-popular frame (a black intro frame, a template header) pools
    * only within its own (idx, digest) block. At 100 TB the standard
    * hot-block cap (count digests, drop blocks past a bound — the
    * [[TextDedup.jaccardPairs]] discipline) bolts on unchanged; a real
    * build would also swap md5-of-window for a perceptual frame hash at
    * the decode boundary, changing nothing downstream.
    *
    * Output: (id_a, id_b, n_shared_frames ≥ minShared, exact_fp_match).
    */
  def frameFingerprintNearDups(df: DataFrame, idCol: String, payloadCol: String,
                               n: Int, frameBytes: Int = 16,
                               minShared: Int = 3,
                               maxBlockSize: Int = Int.MaxValue): DataFrame = {
    require(minShared >= 1 && minShared <= n, "need 1 <= minShared <= n")
    val fpAll = frameSample(df, idCol, payloadCol, n, frameBytes)
      .select(col(idCol).as("__id"), posexplode(col("frames")).as(Seq("frame_idx", "__f")))
      .select(col("__id"), col("frame_idx"), md5(col("__f")).as("__d"))
    // hot-block cap (the [[TextDedup.jaccardPairs]] discipline): a frame
    // shared by more than maxBlockSize payloads is boilerplate — a black
    // intro frame, a template header — not dedup evidence, and its block
    // would pair quadratically. The count window runs on the same
    // (frame_idx, digest) key the self-join shuffles on, reusing the
    // exchange.
    val fp =
      if (maxBlockSize == Int.MaxValue) fpAll
      else fpAll
        .withColumn("__blk", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("frame_idx"), col("__d"))))
        .filter(col("__blk") <= maxBlockSize)
        .drop("__blk")
    val a = fp.select(col("__id").as("id_a"), col("frame_idx"), col("__d"))
    val b = fp.select(col("__id").as("id_b"), col("frame_idx"), col("__d"))
    a.join(b, Seq("frame_idx", "__d"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared_frames"))
      .filter(col("n_shared_frames") >= minShared)
      .withColumn("exact_fp_match", col("n_shared_frames") === n)
  }

  /** Resize STUB: a real implementation would decode → scale → re-encode
    * per partition; the deterministic stand-in truncates the payload to
    * `targetBytes` and records the original size — preserving the
    * (binary in → smaller binary out + metadata) contract.
    */
  def resizeStub(df: DataFrame, idCol: String, payloadCol: String, targetBytes: Int): DataFrame =
    df.select(
      col(idCol),
      col(payloadCol).substr(lit(1), lit(targetBytes)).as("resized"),
      octet_length(col(payloadCol)).cast("long").as("orig_bytes"))

  /** Integer decode stats out (the exact-comparison twin of
    * [[MediaFeatures]]: brightness as a num/den fraction, no floats).
    */
  final case class MediaStats(id: Long, width: Long, height: Long,
                              bright_num: Long, bright_den: Long)

  /** The decode path itself through the oracle gate: where q122/q123
    * exercise pure column expressions, this runs the REAL batched
    * mapPartitions boundary (Dataset encoder in → per-partition iterator →
    * typed rows out — a codec would initialize once per partition here)
    * with all-integer outputs, so the stub arithmetic replays exactly in
    * SQL: width/height from the first two payload bytes ([[fakeDecode]]'s
    * rule), brightness as the exact fraction (sum of the first 64 bytes,
    * denominator n·255).
    */
  def decodeStats(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).cast("binary").as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val b = r.payload
          val w = if (b.length > 0) 1L + (b(0) & 0x7f) else 0L
          val h = if (b.length > 1) 1L + (b(1) & 0x7f) else 0L
          val n = math.min(b.length, 64)
          val num = b.iterator.take(n).map(x => (x & 0xff).toLong).sum
          MediaStats(r.id, w, h, num, n * 255L)
        }
      }
  }

  /** Integer VAD output row: window tally, voiced tally/ratio, and the
    * silence-trim bounds (first/last voiced window index, −1 when the
    * payload never crosses the energy floor).
    */
  final case class VadStats(id: Long, n_windows: Long, n_voiced: Long,
                            voiced_bp: Long, first_voiced: Long, last_voiced: Long)

  /** Audio VAD-style energy windowing: treat the payload as 8-bit PCM
    * centered at 128, split into `windowBytes`-sample windows (tail
    * window partial), per-window energy = Σ(x−128)², voiced when energy
    * ≥ `threshold` — the classic energy-gate voice-activity detector
    * whose voiced span bounds drive silence trimming in an audio ingest
    * pipeline. A codec-equipped build would decode the audio container
    * to PCM at this same mapPartitions boundary ([[decodeStats]]'s
    * pattern); everything downstream of the byte array is
    * codec-independent and all-integer, so it replays exactly in SQL.
    */
  def vadStats(df: DataFrame, idCol: String, payloadCol: String,
      windowBytes: Int, threshold: Long): Dataset[VadStats] = {
    require(windowBytes > 0, "windowBytes must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).cast("binary").as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val energies = r.payload.grouped(windowBytes).map { w =>
            w.iterator.map { x => val d = (x & 0xff) - 128L; d * d }.sum
          }.toArray
          val voiced = energies.map(_ >= threshold)
          val n = energies.length.toLong
          val nv = voiced.count(identity).toLong
          VadStats(r.id, n, nv, if (n > 0) nv * 10000L / n else 0L,
            voiced.indexOf(true).toLong, voiced.lastIndexOf(true).toLong)
        }
      }
  }

  /** Perceptual gradient hash (dHash — Krawetz's difference hash, the
    * public 64-bit image near-dup fingerprint): pool the decoded
    * grayscale image to an 8×9 grid, then each of the 64 bits records
    * whether a cell is brighter than its right neighbor. Brightness
    * ORDER survives re-encoding, scaling, and brightness shifts, so
    * near-identical images land within a few bits — the image analogue
    * of text simhash, and like it banded into 16-bit quarters for the
    * pigeonhole join (any pair within hamming 3 shares a band
    * exactly).
    *
    * Decode is the house STUB: the payload's character codes stand in
    * for the luma plane, pooled into 72 proportional cells (cell j
    * covers codepoints (j·len div 72, (j+1)·len div 72]) — a real build
    * swaps the cell extraction for codec output and nothing downstream
    * changes. The fingerprint computes as the NATIVE
    * [[graft.functions.DhashFingerprint64]] codegen expression when the
    * graft extensions are on the session (one char scan per row — the
    * measured q294 floor fell 5.0 → 0.5 s) with [[DhashFpSql]] as the
    * value-identical no-extension fallback; either way: no explode, no
    * shuffle, one pass, and the fingerprint is carried as two signed
    * 32-bit halves (`fp_hi`, `fp_lo`) so both engines stay in exact
    * BIGINT arithmetic (the simhash64 convention).
    */
  // The HOF fallback: ONE expression over a string column named `__t`,
  // with lambda-bound intermediates (`transform(array(e), v -> ...)`
  // evaluates e once and binds it to v — SQL's missing let-binding):
  // with plain named columns, Catalyst's project collapse re-inlines the
  // cell/bit arrays at EVERY reference — 2 references per bit × 64 bits
  // re-derived the 72-cell array per row, measured 17 s vs 2 s on the
  // q294 bench cell. Even let-bound, the split('') allocates a
  // single-char string per character (~1 ms/doc) — the reason the
  // native expression is the default path.
  //
  // codes: char codes extracted once per payload via split (O(len);
  // ascii(substring(t, i, 1)) is O(len) PER CALL on UTF-8 = O(len²)).
  private[graft] val DhashFpSql: String = {
    val codes = "transform(split(__t, ''), c -> CAST(ascii(c) AS BIGINT))"
    def cells(cs: String) =
      s"""transform(sequence(0, 71), j -> CAST(
        |  CASE WHEN ((j + 1) * length(__t)) div 72 >= (j * length(__t)) div 72 + 1
        |    THEN aggregate(
        |      slice($cs, CAST((j * length(__t)) div 72 + 1 AS INT),
        |        CAST(((j + 1) * length(__t)) div 72 - (j * length(__t)) div 72 AS INT)),
        |      0L, (a, x) -> a + x)
        |      div (((j + 1) * length(__t)) div 72 - (j * length(__t)) div 72)
        |    ELSE 0L END AS BIGINT))""".stripMargin
    // bit k (row r = k div 8, col c = k % 8) compares grid cell (r, c)
    // with (r, c+1) on the row-major 8×9 grid
    def bits(ce: String) =
      s"""transform(sequence(0, 63), k ->
        |  CASE WHEN $ce[CAST((k div 8) * 9 + k % 8 AS INT)] >
        |            $ce[CAST((k div 8) * 9 + k % 8 + 1 AS INT)]
        |    THEN 1L ELSE 0L END)""".stripMargin
    s"""transform(array($codes), __cs ->
      |  transform(array(${cells("__cs")}), __ce ->
      |    transform(array(${bits("__ce")}), __bs -> named_struct(
      |      'hi', aggregate(slice(__bs, 1, 32), 0L, (a, b) -> a * 2L + b),
      |      'lo', aggregate(slice(__bs, 33, 32), 0L, (a, b) -> a * 2L + b)
      |    ))[0])[0])[0]""".stripMargin
  }

  def dhashFingerprints(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    // the native codegen'd expression (one char scan per row) when the
    // graft extensions are on the session — value-identical to the HOF
    // form (GraftExpressionsSpec proves bit equality), which remains the
    // no-extension fallback. The HOF's split('') allocates a single-char
    // string per character per evaluation: measured ~1 ms/doc, the
    // former q294 floor.
    val fp =
      if (graft.functions.GraftFunctions.installed(df.sparkSession))
        graft.functions.GraftFunctions.dhash64(col("__t"))
      else expr(DhashFpSql)
    df.select(col(idCol).as("id"), col(payloadCol).cast("string").as("__t"))
      .withColumn("__fp", fp)
      .select(col("id"), col("__fp.hi").as("fp_hi"), col("__fp.lo").as("fp_lo"))
  }

  /** The four 16-bit pigeonhole bands of a (fp_hi, fp_lo) fingerprint
    * frame, exploded: adds (band_idx, band_val) beside the carried
    * columns.
    */
  private def dhashBands(fps: DataFrame, carry: Seq[String]): DataFrame =
    fps.select(carry.map(col) :+ explode(expr(
        """array(named_struct('band_idx', 0, 'band_val', fp_hi div 65536),
          |      named_struct('band_idx', 1, 'band_val', fp_hi % 65536),
          |      named_struct('band_idx', 2, 'band_val', fp_lo div 65536),
          |      named_struct('band_idx', 3, 'band_val', fp_lo % 65536))""".stripMargin))
        .as("__b"): _*)
      .select(carry.map(col) :+ col("__b.band_idx").as("band_idx") :+
        col("__b.band_val").as("band_val"): _*)

  /** Banded dHash near-dup pairs: the four 16-bit fingerprint quarters
    * are the pigeonhole bands (maxHamming ≤ 3 ⇒ some band matches
    * exactly), candidates verify with an exact popcount hamming
    * distance, and hot bands above `maxBlockSize` are dropped as
    * boilerplate (the [[frameFingerprintNearDups]] discipline — an
    * all-dark fingerprint shared by thousands of payloads is not dedup
    * evidence but would pair quadratically).
    */
  def dhashNearDups(df: DataFrame, idCol: String, payloadCol: String,
                    maxHamming: Int, maxBlockSize: Int = 64): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "maxHamming must be in [0, 3] for the 4-band pigeonhole guarantee")
    val fps = dhashFingerprints(df, idCol, payloadCol)
    val bands = dhashBands(fps, Seq("id", "fp_hi", "fp_lo"))
      .withColumn("__blk", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("band_idx"), col("band_val"))))
      .filter(col("__blk") <= maxBlockSize)
    val a = bands.select(col("id").as("id_a"), col("fp_hi").as("__ha"),
      col("fp_lo").as("__la"), col("band_idx"), col("band_val"))
    val b = bands.select(col("id").as("id_b"), col("fp_hi").as("__hb"),
      col("fp_lo").as("__lb"), col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("CAST(bit_count(__ha ^ __hb) + bit_count(__la ^ __lb) AS BIGINT)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming.toLong)
  }

  /** Batch-incremental dHash near-dup detection — [[dhashNearDups]] under
    * the q283 ingest contract: `fresh` fingerprints (the micro-batch
    * after its id anti-join, layout (id, fp_hi, fp_lo)) probe
    * index ∪ fresh through the same 16-bit pigeonhole bands; candidates
    * verify with the exact popcount. The hot-band cut counts over the
    * CANDIDATE population (index ∪ fresh — the same population the batch
    * operator counts), so a boilerplate fingerprint shared by thousands
    * of stored images never pairs quadratically against a batch.
    * The probe side is batch-sized: per-batch cost is bounded by batch ×
    * band occupancy, not index history. Output: (id, nbr_id, hamming ≤
    * maxHamming) with `id` always the fresh side.
    */
  def dhashNearDupsFromFresh(fresh: DataFrame, index: DataFrame,
                             maxHamming: Int, maxBlockSize: Int = 64): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "maxHamming must be in [0, 3] for the 4-band pigeonhole guarantee")
    val cand = index.select(col("id"), col("fp_hi"), col("fp_lo"))
      .unionByName(fresh.select(col("id"), col("fp_hi"), col("fp_lo")))
    val blk = dhashBands(cand, Seq("id", "fp_hi", "fp_lo"))
      .groupBy(col("band_idx"), col("band_val"))
      .agg(count(lit(1)).as("__blk"))
      .filter(col("__blk") <= maxBlockSize)
      .select(col("band_idx"), col("band_val"))
    val cb = dhashBands(cand, Seq("id", "fp_hi", "fp_lo"))
      .join(blk, Seq("band_idx", "band_val"))
    val fb = dhashBands(fresh.select(col("id"), col("fp_hi"), col("fp_lo")),
        Seq("id", "fp_hi", "fp_lo"))
      .join(blk, Seq("band_idx", "band_val"))
    fb.as("x").join(cb.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.id") =!= col("y.id"))
      .select(col("x.id").as("id"), col("y.id").as("nbr_id"),
        expr("""CAST(bit_count(x.fp_hi ^ y.fp_hi) +
          |bit_count(x.fp_lo ^ y.fp_lo) AS BIGINT)""".stripMargin).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming.toLong)
  }

  /** Per-frame perceptual fingerprints — [[frameSample]]'s n aligned
    * windows each through the dHash ([[graft.functions.DhashFingerprint64]]
    * native when the extensions are on the session, the [[DhashFpSql]]
    * HOF otherwise). Output: (id, frame_idx, fp_hi, fp_lo) — the
    * persisted-index layout of the video ingest tier.
    */
  def videoFrameFingerprints(df: DataFrame, idCol: String, payloadCol: String,
                             n: Int, frameBytes: Int): DataFrame = {
    val fp =
      if (graft.functions.GraftFunctions.installed(df.sparkSession))
        graft.functions.GraftFunctions.dhash64(col("__t"))
      else expr(DhashFpSql)
    frameSample(df, idCol, payloadCol, n, frameBytes)
      .select(col(idCol).as("id"),
        posexplode(col("frames")).as(Seq("frame_idx", "__f")))
      .select(col("id"), col("frame_idx"), col("__f").cast("string").as("__t"))
      .withColumn("__fp", fp)
      .select(col("id"), col("frame_idx"),
        col("__fp.hi").as("fp_hi"), col("__fp.lo").as("fp_lo"))
  }

  /** Batch-incremental container near-dup — [[videoDhashNearDups]] under
    * the ingest contract: `fresh` per-frame fingerprints (the
    * micro-batch after its container-id anti-join,
    * [[videoFrameFingerprints]] layout) probe index ∪ fresh through the
    * (frame_idx, band) pigeonhole blocks, candidate frames verify with
    * the exact popcount, and a container pair is a near-dup when at
    * least `minShared` aligned frames match within `maxHamming` bits.
    * Hot blocks count over the CANDIDATE population on the join's own
    * key. The probe side is batch-sized: per-batch cost is batch ×
    * band occupancy, never index history. Output: (id, nbr_id,
    * n_matching_frames ≥ minShared) with `id` always the fresh side.
    */
  def videoDhashNearDupsFromFresh(fresh: DataFrame, index: DataFrame,
                                  maxHamming: Int, minShared: Int,
                                  maxBlockSize: Int = 64): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "maxHamming must be in [0, 3] for the 4-band pigeonhole guarantee")
    require(minShared >= 1, "minShared must be >= 1")
    val cols = Seq("id", "frame_idx", "fp_hi", "fp_lo")
    val cand = index.select(cols.map(col): _*)
      .unionByName(fresh.select(cols.map(col): _*))
    val blk = dhashBands(cand, cols)
      .groupBy(col("frame_idx"), col("band_idx"), col("band_val"))
      .agg(count(lit(1)).as("__blk"))
      .filter(col("__blk") <= maxBlockSize)
      .select(col("frame_idx"), col("band_idx"), col("band_val"))
    val cb = dhashBands(cand, cols)
      .join(blk, Seq("frame_idx", "band_idx", "band_val"))
    val fb = dhashBands(fresh.select(cols.map(col): _*), cols)
      .join(blk, Seq("frame_idx", "band_idx", "band_val"))
    fb.as("x").join(cb.as("y"),
        col("x.frame_idx") === col("y.frame_idx") &&
          col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.id") =!= col("y.id"))
      .select(col("x.id").as("id"), col("y.id").as("nbr_id"),
        col("x.frame_idx").as("frame_idx"),
        expr("""CAST(bit_count(x.fp_hi ^ y.fp_hi) +
          |bit_count(x.fp_lo ^ y.fp_lo) AS BIGINT)""".stripMargin).as("__ham"))
      .filter(col("__ham") <= maxHamming.toLong)
      .distinct()
      .groupBy(col("id"), col("nbr_id"))
      .agg(count(lit(1)).as("n_matching_frames"))
      .filter(col("n_matching_frames") >= minShared.toLong)
  }

  /** Container-level (video) perceptual near-dup — the composed
    * multimodal dedup: [[frameSample]]'s n ALIGNED evenly-spaced windows
    * each fingerprint with the PERCEPTUAL [[dhashFingerprints]] hash
    * (where q199/[[frameFingerprintNearDups]] uses exact md5 digests,
    * which any in-window re-encode kills), candidate frame pairs block
    * on (frame_idx, band_idx, band_val) — the pigeonhole join scoped to
    * the SAME sample position, never an all-pairs — verify with the
    * exact popcount, and a container pair is a near-dup when at least
    * `minShared` of its n aligned frames match within `maxHamming` bits
    * (frame voting). Hot (frame_idx, band) blocks above `maxBlockSize`
    * drop as boilerplate before pairing, on the join's own key.
    *
    * Output: (id_a, id_b, n_matching_frames ≥ minShared,
    * all_frames_match).
    */
  def videoDhashNearDups(df: DataFrame, idCol: String, payloadCol: String,
                         n: Int, frameBytes: Int, maxHamming: Int,
                         minShared: Int, maxBlockSize: Int = 64): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "maxHamming must be in [0, 3] for the 4-band pigeonhole guarantee")
    require(minShared >= 1 && minShared <= n, "need 1 <= minShared <= n")
    val fps = videoFrameFingerprints(df, idCol, payloadCol, n, frameBytes)
    val bands = dhashBands(fps, Seq("id", "frame_idx", "fp_hi", "fp_lo"))
      .withColumn("__blk", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("frame_idx"), col("band_idx"), col("band_val"))))
      .filter(col("__blk") <= maxBlockSize)
    val a = bands.select(col("id").as("id_a"), col("frame_idx"),
      col("fp_hi").as("__ha"), col("fp_lo").as("__la"),
      col("band_idx"), col("band_val"))
    val b = bands.select(col("id").as("id_b"), col("frame_idx"),
      col("fp_hi").as("__hb"), col("fp_lo").as("__lb"),
      col("band_idx"), col("band_val"))
    a.join(b, Seq("frame_idx", "band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("frame_idx"),
        expr("CAST(bit_count(__ha ^ __hb) + bit_count(__la ^ __lb) AS BIGINT)").as("__ham"))
      .filter(col("__ham") <= maxHamming.toLong)
      .distinct()
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_matching_frames"))
      .filter(col("n_matching_frames") >= minShared.toLong)
      .withColumn("all_frames_match", col("n_matching_frames") === n.toLong)
  }

  /** Shot-boundary detection over the sampled frames (the content-based
    * video-segmentation classic — Boreczky & Rowe 1996 compare
    * consecutive frame features; here the feature is the PERCEPTUAL
    * dHash, so a re-encode or brightness shift does not fake a cut the
    * way raw-byte deltas would): consecutive sampled frames compare by
    * exact popcount hamming on a CONTAINER-keyed lag window (never a
    * global sort), and a transition is a cut when the distance jumps to
    * `minHamming` or above. Rolled up per container.
    *
    * Shape: the [[videoFrameFingerprints]] scan (one explode + one
    * fingerprint projection per frame), one id-keyed window over
    * n-bounded partitions, one hash-aggregate — linear in containers.
    *
    * Output: (id, n_transitions, n_cuts, max_hamming,
    * mean_hamming_milli).
    */
  def videoShotBoundaries(df: DataFrame, idCol: String, payloadCol: String,
                          n: Int, frameBytes: Int,
                          minHamming: Int): DataFrame = {
    require(n >= 2, "need at least two frames to have a transition")
    require(minHamming >= 1 && minHamming <= 64, "minHamming must be in [1, 64]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("frame_idx"))
    videoFrameFingerprints(df, idCol, payloadCol, n, frameBytes)
      .withColumn("__ph", lag(col("fp_hi"), 1).over(w))
      .withColumn("__pl", lag(col("fp_lo"), 1).over(w))
      .filter(col("__ph").isNotNull)
      .select(col("id"), expr(
        "CAST(bit_count(fp_hi ^ __ph) + bit_count(fp_lo ^ __pl) AS BIGINT)")
        .as("__ham"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_transitions"),
        sum(when(col("__ham") >= minHamming.toLong, 1L).otherwise(0L)).as("n_cuts"),
        max(col("__ham")).as("max_hamming"),
        expr("sum(__ham) * 1000 div count(1)").as("mean_hamming_milli"))
  }

  /** Audio-style windowed-spectral fingerprint (the chromaprint shape —
    * Lalinský's public AcoustID fingerprint computes, per STFT frame, the
    * SIGN of the temporal delta of the spectral-band-energy gradient;
    * this tier reproduces exactly that bit rule over the house stub
    * decode): the payload's character codes stand in for PCM samples,
    * each container samples `n` fixed-width (128-unit) windows at
    * proportional offsets (window t starts at t·len div n — consecutive
    * windows OVERLAP like STFT frames whenever len < 128·n), each window
    * pools into 33 proportional band energies (floor-mean of codes — the
    * spectral proxy), and sub-fingerprint t (t in 1..n-1) sets bit k iff
    * the band-k spectral gradient GREW from window t-1 to window t:
    *
    *   bit k = (E[k][t] − E[k+1][t]) > (E[k][t−1] − E[k+1][t−1])
    *
    * Exact-integer throughout (floor-mean energies, strict compare), so
    * both engines compute the identical 32-bit word; carried as one
    * non-negative BIGINT `fp`. A codec-equipped build swaps the char-code
    * extraction for real PCM band energies and nothing downstream
    * changes — the q302 stub-decode contract.
    *
    * Why sign-of-delta and not the raw energies: like dHash's
    * brightness-order bits, gradient-direction bits survive global gain
    * and re-encode offsets that shift every band by the same amount —
    * the robustness that makes the HAMMING near-dup join meaningful.
    *
    * The HOF uses the [[DhashFpSql]] let-binding discipline
    * (`transform(array(e), v -> …)` — without it project collapse
    * re-derives the 33-energy array per bit reference).
    */
  private[graft] val ChromaFpSql: String = {
    def codes(s: String) = s"transform(split($s, ''), c -> CAST(ascii(c) AS BIGINT))"
    // window length comes from size(codes) — the let-bound array's O(1)
    // stored size — NOT length(__t): the un-bound substring would re-inline
    // at every one of its ~200 references per band table (measured 9.5 s →
    // the q294 project-collapse trap all over again)
    def energies(cs: String) =
      s"""transform(sequence(0, 32), b -> CAST(
        |  CASE WHEN ((b + 1) * size($cs)) div 33 >= (b * size($cs)) div 33 + 1
        |    THEN aggregate(
        |      slice($cs, CAST((b * size($cs)) div 33 + 1 AS INT),
        |        CAST(((b + 1) * size($cs)) div 33 - (b * size($cs)) div 33 AS INT)),
        |      0L, (a, x) -> a + x)
        |      div (((b + 1) * size($cs)) div 33 - (b * size($cs)) div 33)
        |    ELSE 0L END AS BIGINT))""".stripMargin
    s"""transform(array(${codes("__t")}), __ct ->
      |  transform(array(${codes("__p")}), __cp ->
      |    transform(array(${energies("__ct")}), __et ->
      |      transform(array(${energies("__cp")}), __ep ->
      |        aggregate(transform(sequence(0, 31), k ->
      |          CASE WHEN (__et[CAST(k AS INT)] - __et[CAST(k + 1 AS INT)]) >
      |                    (__ep[CAST(k AS INT)] - __ep[CAST(k + 1 AS INT)])
      |            THEN 1L ELSE 0L END),
      |          0L, (a, b) -> a * 2L + b)
      |      )[0])[0])[0])[0]""".stripMargin
  }

  /** Per-window chroma sub-fingerprints — the persisted-index layout of
    * the audio ingest tier: (id, window_idx in 1..n-1, fp). One substring
    * projection per window pair + the [[ChromaFpSql]] HOF; no explode of
    * the payload itself, no shuffle, one pass.
    */
  def audioWindowFingerprints(df: DataFrame, idCol: String, payloadCol: String,
                              n: Int, windowChars: Int = 128): DataFrame = {
    require(n >= 2, "need at least two windows for a temporal delta")
    val fp =
      if (graft.functions.GraftFunctions.installed(df.sparkSession))
        graft.functions.GraftFunctions.chroma32(col("__t"), col("__p"))
      else expr(ChromaFpSql)
    df.select(col(idCol).as("id"), col(payloadCol).cast("string").as("__pay"))
      .select(col("id"), col("__pay"),
        explode(expr(s"sequence(1L, ${n - 1}L)")).as("window_idx"))
      .select(col("id"), col("window_idx"),
        expr(s"substring(__pay, CAST((window_idx * length(__pay)) div $n + 1 AS INT), $windowChars)").as("__t"),
        expr(s"substring(__pay, CAST(((window_idx - 1) * length(__pay)) div $n + 1 AS INT), $windowChars)").as("__p"))
      .withColumn("fp", fp)
      .select(col("id"), col("window_idx"), col("fp"))
  }

  /** 8-bit pigeonhole bands of the 32-bit chroma word: any pair within
    * hamming 3 agrees exactly on at least one of the 4 bands.
    */
  private def chromaBands(fps: DataFrame, carry: Seq[String]): DataFrame =
    fps.select(carry.map(col) :+
        explode(expr("sequence(0, 3)")).as("band_idx"): _*)
      .withColumn("band_val",
        expr("shiftright(fp, CAST((3 - band_idx) * 8 AS INT)) & 255"))

  /** Container-level (audio) perceptual near-dup — the q302 contract on
    * the second perceptual modality: [[audioWindowFingerprints]]'s n−1
    * ALIGNED sub-fingerprints, candidate window pairs block on
    * (window_idx, band_idx, band_val) — the pigeonhole join scoped to the
    * SAME window position, never an all-pairs — verify with the exact
    * popcount, and a container pair is a near-dup when at least
    * `minShared` of its aligned windows match within `maxHamming` bits
    * (window voting). Hot (window_idx, band) blocks above `maxBlockSize`
    * drop as boilerplate BEFORE pairing, on the join's own key — and the
    * fully-degenerate word is excluded EXPLICITLY: a window whose gradient
    * deltas carry no structure (short/empty payload slices, constant
    * energy) collapses to fp = 0, and two structureless windows matching
    * at hamming 0 is not perceptual similarity, so fp = 0 rows never
    * enter the pairing regardless of `maxBlockSize` (they used to rely on
    * pooling into a dropped hot block, which a raised cap would un-drop).
    *
    * Output: (id_a, id_b, n_matching_windows ≥ minShared,
    * all_windows_match).
    */
  def audioChromaNearDups(df: DataFrame, idCol: String, payloadCol: String,
                          n: Int, windowChars: Int = 128, maxHamming: Int = 3,
                          minShared: Int = 3, maxBlockSize: Int = 64): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "maxHamming must be in [0, 3] for the 4-band pigeonhole guarantee")
    require(minShared >= 1 && minShared <= n - 1, "need 1 <= minShared <= n-1")
    val fps = audioWindowFingerprints(df, idCol, payloadCol, n, windowChars)
      .filter(col("fp") =!= 0L)
    val bands = chromaBands(fps, Seq("id", "window_idx", "fp"))
      .withColumn("__blk", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("window_idx"), col("band_idx"), col("band_val"))))
      .filter(col("__blk") <= maxBlockSize)
    val a = bands.select(col("id").as("id_a"), col("window_idx"),
      col("fp").as("__fa"), col("band_idx"), col("band_val"))
    val b = bands.select(col("id").as("id_b"), col("window_idx"),
      col("fp").as("__fb"), col("band_idx"), col("band_val"))
    a.join(b, Seq("window_idx", "band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("window_idx"),
        expr("CAST(bit_count(__fa ^ __fb) AS BIGINT)").as("__ham"))
      .filter(col("__ham") <= maxHamming.toLong)
      .distinct()
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_matching_windows"))
      .filter(col("n_matching_windows") >= minShared.toLong)
      .withColumn("all_windows_match", col("n_matching_windows") === (n - 1).toLong)
  }

  /** Batch-incremental audio near-dup — [[audioChromaNearDups]] under the
    * ingest contract ([[videoDhashNearDupsFromFresh]] transplanted):
    * `fresh` per-window fingerprints (the micro-batch after its
    * container-id anti-join, [[audioWindowFingerprints]] layout) probe
    * index ∪ fresh through the (window_idx, band) pigeonhole blocks,
    * candidate windows verify with the exact popcount, and a container
    * pair is a near-dup when at least `minShared` aligned windows match
    * within `maxHamming` bits. Hot blocks count over the CANDIDATE
    * population on the join's own key; the degenerate fp = 0 word is
    * excluded explicitly (the [[audioChromaNearDups]] rule — never
    * cap-dependent). The probe side is batch-sized:
    * per-batch cost is batch × band occupancy, never index history.
    * Output: (id, nbr_id, n_matching_windows ≥ minShared) with `id`
    * always the fresh side.
    */
  def audioChromaNearDupsFromFresh(fresh: DataFrame, index: DataFrame,
                                   maxHamming: Int, minShared: Int,
                                   maxBlockSize: Int = 64): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "maxHamming must be in [0, 3] for the 4-band pigeonhole guarantee")
    require(minShared >= 1, "minShared must be >= 1")
    val cols = Seq("id", "window_idx", "fp")
    val cand = index.select(cols.map(col): _*)
      .unionByName(fresh.select(cols.map(col): _*))
      .filter(col("fp") =!= 0L)
    val blk = chromaBands(cand, cols)
      .groupBy(col("window_idx"), col("band_idx"), col("band_val"))
      .agg(count(lit(1)).as("__blk"))
      .filter(col("__blk") <= maxBlockSize)
      .select(col("window_idx"), col("band_idx"), col("band_val"))
    val cb = chromaBands(cand, cols)
      .join(blk, Seq("window_idx", "band_idx", "band_val"))
    val fb = chromaBands(
        fresh.select(cols.map(col): _*).filter(col("fp") =!= 0L), cols)
      .join(blk, Seq("window_idx", "band_idx", "band_val"))
    fb.as("x").join(cb.as("y"),
        col("x.window_idx") === col("y.window_idx") &&
          col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.id") =!= col("y.id"))
      .select(col("x.id").as("id"), col("y.id").as("nbr_id"),
        col("x.window_idx").as("window_idx"),
        expr("CAST(bit_count(x.fp ^ y.fp) AS BIGINT)").as("__ham"))
      .filter(col("__ham") <= maxHamming.toLong)
      .distinct()
      .groupBy(col("id"), col("nbr_id"))
      .agg(count(lit(1)).as("n_matching_windows"))
      .filter(col("n_matching_windows") >= minShared.toLong)
  }

  /** Audio novelty segmentation (Foote 2000, "Automatic audio
    * segmentation using a measure of audio novelty" — boundaries where
    * consecutive feature frames diverge; here the feature is the
    * chromaprint-shaped [[audioWindowFingerprints]] word, so the novelty
    * measure is the exact popcount hamming between consecutive
    * sub-fingerprints and a uniform gain shift cannot fake a boundary
    * the way raw energy deltas would — the [[videoShotBoundaries]]
    * contract on the second perceptual modality): consecutive windows
    * compare on a CONTAINER-keyed lag window (never a global sort), a
    * transition is a boundary when the distance reaches `minHamming`
    * bits, rolled up per container.
    *
    * Shape: the fingerprint scan (one window explode + the native
    * chroma projection), one id-keyed window over (n−1)-bounded
    * partitions, one hash-aggregate — linear in containers.
    *
    * Output: (id, n_transitions, n_boundaries, max_hamming,
    * mean_hamming_milli).
    */
  def audioChromaSegments(df: DataFrame, idCol: String, payloadCol: String,
                          n: Int, windowChars: Int = 128,
                          minHamming: Int = 12): DataFrame = {
    require(n >= 3, "need at least three windows to have a transition")
    require(minHamming >= 1 && minHamming <= 32, "minHamming must be in [1, 32]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("window_idx"))
    audioWindowFingerprints(df, idCol, payloadCol, n, windowChars)
      .withColumn("__pf", lag(col("fp"), 1).over(w))
      .filter(col("__pf").isNotNull)
      .select(col("id"),
        expr("CAST(bit_count(fp ^ __pf) AS BIGINT)").as("__ham"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_transitions"),
        sum(when(col("__ham") >= minHamming.toLong, 1L).otherwise(0L)).as("n_boundaries"),
        max(col("__ham")).as("max_hamming"),
        expr("sum(__ham) * 1000 div count(1)").as("mean_hamming_milli"))
  }

  /** STUB — deterministic pseudo-decode from payload bytes. A real decoder
    * (??? in a codec-equipped build) would parse the container header for
    * dimensions and average the luma plane for brightness.
    */
  private[ext] def fakeDecode(r: MediaRow): MediaFeatures = {
    val b = r.payload
    val w = if (b.length > 0) 1 + (b(0) & 0x7f) else 0
    val h = if (b.length > 1) 1 + (b(1) & 0x7f) else 0
    val n = math.min(b.length, 64)
    val brightness =
      if (n == 0) 0.0
      else b.iterator.take(n).map(x => (x & 0xff).toDouble).sum / (n * 255.0)
    MediaFeatures(r.id, w, h, brightness)
  }
}
