package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal table-format commit log over plain parquet — the engine-native
  * analog of Iceberg's snapshot machinery that the reference relies on
  * (SURVEY.md §2.10: expire_snapshots M2, remove_orphan_files M3, and the
  * time-travel reads Iceberg gives for free).
  *
  * Layout:
  * {{{
  *   <table>/data/<segment>/part-*.parquet   immutable data segments
  *   <table>/_log/v000000001.json            one manifest per version
  * }}}
  *
  * A commit writes a NEW segment dir, then publishes the manifest with an
  * ATOMIC CLAIM on the final manifest path, per filesystem:
  * on HDFS-like stores, a create-exclusive open (atomic at the NameNode);
  * on local filesystems, a fully-flushed temp file HARD-LINKED into place
  * (link(2) fails with EEXIST atomically — Hadoop's LocalFileSystem
  * create(overwrite=false) is check-then-act and CAN double-claim under
  * concurrency, and a rename-onto-target silently overwrites, POSIX
  * rename(2) semantics). Concurrent committers race on the claim; the
  * loser gets FileAlreadyExists and retries against the winner's version
  * (optimistic concurrency). On the HDFS path there is a loser-visible
  * window where a manifest exists but its bytes are not yet flushed;
  * the READ side re-reads a manifest that does not parse yet briefly
  * before failing (the link path never exposes partial bytes). A real
  * deployment would serialize commits through a catalog; the protocol here
  * is the strongest a bare filesystem offers.
  *
  * Scale notes: manifests hold segment DIRECTORY names, not file lists —
  * a commit is O(1) metadata regardless of data size; reads hand Spark the
  * segment dirs and let the parquet source list/prune in parallel. Expiry
  * is manifest deletion + mark-and-sweep segment GC guarded by an age
  * cutoff (exactly remove_orphan_files(older_than): a fresh segment may
  * belong to an in-flight commit whose manifest is not published yet, so
  * only segments older than the cutoff are eligible).
  */
object SnapshotLog {

  private val LogDir  = "_log"
  private val DataDir = "data"

  /** Merge-on-read spec recorded in a delta manifest: how readers fold the
    * segment list back into table state.
    *   - `key`: the merge key.
    *   - `carryCols`: sparse columns — the fold takes the newest NON-NULL
    *     value per key (the MERGE coalesce carry); all other columns come
    *     from the newest row outright.
    *   - `deleteCol`: optional boolean column marking delete rows; a key
    *     whose newest row is a delete disappears, and values from before
    *     the delete never carry into a later re-insert.
    *   - `orderCol`: optional event-order column; the fold ranks rows by
    *     (orderCol, segment position) so a stale row in a later batch does
    *     not beat newer state (ts-ordered CDC apply). Without it, segment
    *     position alone orders (batch-ordered upsert).
    */
  final case class MergeSpec(key: Seq[String], carryCols: Seq[String] = Nil,
                             deleteCol: Option[String] = None, orderCol: Option[String] = None)

  private final case class Manifest(op: String, segments: Seq[String],
                                    committedAtMs: Long, tag: Option[String],
                                    merge: Option[MergeSpec] = None)

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestName(v: Int) = f"v$v%09d.json"

  /** All committed versions, ascending. */
  def versions(spark: SparkSession, path: String): Seq[Int] = {
    val log = new Path(path, LogDir)
    val f   = fs(spark, path)
    if (!f.exists(log)) Nil
    else f.listStatus(log).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toInt)
      .sorted
  }

  def latestVersion(spark: SparkSession, path: String): Option[Int] =
    versions(spark, path).lastOption

  /** The `tag` recorded with the latest committed version (used by
    * streaming sinks for replay idempotence — see
    * [[graft.streaming.StreamPipelines.upsertSinkVersioned]]).
    */
  def latestTag(spark: SparkSession, path: String): Option[String] =
    latestVersion(spark, path).flatMap(v => readManifest(spark, path, v).tag)

  /** Tags of ALL retained manifests. Replay-idempotence checks must scan
    * this, not [[latestTag]]: a maintenance commit (compaction tags
    * `compact-vN`) can land between a batch's commit and the checkpoint
    * offset write, so on crash-replay the batch's tag is no longer the
    * latest one — but it is still present in the log.
    */
  def tags(spark: SparkSession, path: String): Set[String] =
    versions(spark, path).flatMap(v => readManifest(spark, path, v).tag).toSet

  /** Commit `df` as a full replacement of the table state. */
  def commitReplace(df: DataFrame, path: String, tag: Option[String] = None): Int =
    commit(df, path, "replace", tag)

  /** Commit `df` as an append: the new version references the previous
    * version's segments plus the new one.
    */
  def commitAppend(df: DataFrame, path: String, tag: Option[String] = None): Int =
    commit(df, path, "append", tag)

  /** Merge-on-read commit (the reference's `write.merge.mode=merge-on-read`
    * choice for gold/dims — streaming_job.py:55-60, stream_dims.py:26-29;
    * rationale design_doc/PipelineArchitecture.md:235-238): write ONLY this
    * batch's rows as a new delta segment and record `spec` in the manifest;
    * [[read]] folds deltas over the base at scan time. A commit's write
    * cost is O(batch), not O(table) — the difference copy-on-write exists
    * to avoid at scale, where CoW rewrites the whole gold table every
    * micro-batch. [[compactLatest]] folds the accumulated deltas back into
    * a plain base version.
    *
    * Precondition: each delta segment holds at most one row per key
    * (reduce the batch first — [[graft.ops.LatestWins.latestState]]).
    */
  def commitDelta(df: DataFrame, path: String, spec: MergeSpec,
                  tag: Option[String] = None): Int = {
    require(spec.key.nonEmpty, "commitDelta: merge key required")
    (spec.key ++ spec.carryCols ++ spec.deleteCol ++ spec.orderCol).foreach(c =>
      require(ColPattern.matches(c), s"column name must match [A-Za-z0-9_]+, got: '$c'"))
    val reserved = Seq("__seq", "__mor_ord", "__mor_del", "__mor_lastdel", "__mor_rn")
    require(!df.columns.exists(reserved.contains),
      s"commitDelta: input must not use reserved columns ${reserved.mkString(", ")}")
    commit(df, path, "delta", tag, Some(spec))
  }

  private val TagPattern = "[A-Za-z0-9._-]+".r
  private val ColPattern = "[A-Za-z0-9_]+".r

  private def commit(df: DataFrame, path: String, op: String, tag: Option[String],
                     merge: Option[MergeSpec] = None): Int = {
    // the manifest is interpolated JSON parsed by regex: an unescaped
    // quote/backslash/']' in a tag would corrupt it silently, so the public
    // tag parameter is restricted to a safe charset instead of escaped
    tag.foreach(t => require(TagPattern.matches(t),
      s"tag must match [A-Za-z0-9._-]+, got: '$t'"))
    val spark = df.sparkSession
    val f     = fs(spark, path)
    val seg   = s"$DataDir/seg-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode("overwrite").parquet(s"$path/$seg")
    f.mkdirs(new Path(path, LogDir))
    var attempts = 0
    while (attempts < 20) {
      attempts += 1
      val base = latestVersion(spark, path)
      val prev =
        if (op == "append" || op == "delta")
          base.map(readManifest(spark, path, _).segments).getOrElse(Nil)
        else Nil
      val v    = base.getOrElse(0) + 1
      val tagField = tag.map(t => s""","tag":"$t"""").getOrElse("")
      def strArr(xs: Seq[String]) = xs.map(s => "\"" + s + "\"").mkString(",")
      val mergeField = merge.map { m =>
        s""","mergeKey":[${strArr(m.key)}],"carryCols":[${strArr(m.carryCols)}]""" +
          m.deleteCol.map(c => s""","deleteCol":"$c"""").getOrElse("") +
          m.orderCol.map(c => s""","orderCol":"$c"""").getOrElse("")
      }.getOrElse("")
      val body =
        s"""{"version":$v,"committedAtMs":${System.currentTimeMillis()},"op":"$op"$tagField$mergeField,"segments":[${strArr(prev :+ seg)}]}"""
      // create-exclusive IS the atomic publish: exactly one committer can
      // create vN.json; anyone else lands in the catch and retries on vN+1.
      // ONLY already-exists retries — a create that succeeded but whose
      // write/close failed (disk full, interrupt) must not be mistaken for
      // a lost race: that would leave a truncated vN.json that readers spin
      // on forever. Such partial manifests are deleted and the error
      // propagates.
      val manifestPath = new Path(path, s"$LogDir/${manifestName(v)}")
      if (f.getScheme == "file") {
        // Hadoop's LocalFileSystem create(overwrite=false) is CHECK-then-
        // act, not atomic — two racers can both pass the exists check and
        // both "claim" vN (observed as duplicate version numbers under
        // concurrency). The local-filesystem atomic publish is the hard
        // link: write the fully-flushed manifest to a temp name, then
        // createLink(vN.json ← temp) — link(2) fails with EEXIST
        // atomically, and readers can never observe a partial manifest.
        val logDirLocal = java.nio.file.Paths.get(
          new Path(path, LogDir).toUri.getPath)
        val tmpFile = logDirLocal.resolve(
          s".commit-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
        java.nio.file.Files.write(tmpFile, body.getBytes("UTF-8"))
        val target = logDirLocal.resolve(manifestName(v))
        try {
          java.nio.file.Files.createLink(target, tmpFile)
          java.nio.file.Files.deleteIfExists(tmpFile)
          return v
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            // version claimed by a racer; retry against the winner's version
            java.nio.file.Files.deleteIfExists(tmpFile)
          case e: Throwable =>
            java.nio.file.Files.deleteIfExists(tmpFile)
            throw e
        }
      } else {
        // HDFS-like stores: create-exclusive is atomic at the NameNode
        var created = false
        try {
          val out = f.create(manifestPath, false)
          created = true
          out.write(body.getBytes("UTF-8")); out.close()
          return v
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException if !created =>
            // version claimed by a racer; retry against the winner's version
          case e: java.io.FileNotFoundException if !created =>
            throw e // log dir vanished — not a race
          case e: java.io.IOException =>
            if (created) { try f.delete(manifestPath, false) catch { case _: java.io.IOException => () } }
            if (created) throw e
            // some stores surface the exists-race as a plain IOException
            // from create(); retry only in that (pre-create) case
        }
      }
    }
    throw new IllegalStateException(s"snapshot commit lost the race $attempts times: $path")
  }

  /** Parse a version's manifest; a just-created manifest whose bytes are
    * not flushed yet is retried briefly (see commit protocol note above).
    */
  private def readManifest(spark: SparkSession, path: String, v: Int): Manifest = {
    val p = new Path(path, s"$LogDir/${manifestName(v)}")
    var attempts = 0
    while (true) {
      attempts += 1
      val in   = fs(spark, path).open(p)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      val verOk = body.contains("\"version\":") && body.trim.endsWith("}")
      if (verOk) {
        val op   = "\"op\":\"([a-z]+)\"".r.findFirstMatchIn(body).map(_.group(1)).getOrElse("replace")
        val ts   = "\"committedAtMs\":(\\d+)".r.findFirstMatchIn(body).map(_.group(1).toLong).getOrElse(0L)
        val tag  = "\"tag\":\"([^\"]*)\"".r.findFirstMatchIn(body).map(_.group(1))
        def arr(field: String): Seq[String] =
          s""""$field":\\[([^\\]]*)\\]""".r.findFirstMatchIn(body).map(_.group(1)).getOrElse("")
            .split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
        val segs = arr("segments")
        val merge =
          if (op == "delta") Some(MergeSpec(
            arr("mergeKey"), arr("carryCols"),
            "\"deleteCol\":\"([^\"]*)\"".r.findFirstMatchIn(body).map(_.group(1)),
            "\"orderCol\":\"([^\"]*)\"".r.findFirstMatchIn(body).map(_.group(1))))
          else None
        return Manifest(op, segs, ts, tag, merge)
      }
      // 80 × 25 ms = 2 s of patience: a manifest that exists but is empty
      // is usually a LIVE writer between create() and write() — a loser
      // spinning here must outlast the winner's worst GC pause (a 500 ms
      // window flaked under full-suite load), while a crash-truncated
      // manifest still surfaces as an error rather than a hang.
      if (attempts >= 80)
        throw new IllegalStateException(s"manifest $p unreadable after $attempts attempts")
      Thread.sleep(25L)
    }
    throw new IllegalStateException("unreachable")
  }

  /** Read the table at `version` (time travel), or at the latest version.
    * A merge-on-read version folds its delta segments over the base at
    * scan time (see [[commitDelta]]); readers always see merged state.
    */
  def read(spark: SparkSession, path: String, version: Option[Int] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, path))
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $path"))
    val m = readManifest(spark, path, v)
    m.merge match {
      case None       => spark.read.parquet(m.segments.map(s => s"$path/$s"): _*)
      case Some(spec) => foldDeltas(spark, path, m.segments, spec)
    }
  }

  /** The merge-on-read fold: one hash shuffle on the merge key, then
    * windowed latest-wins. Rows rank by (orderCol, segment position) so a
    * later segment wins ties and, with an orderCol, stale late arrivals
    * lose to newer state. Delete-marked rows cut history: nothing at or
    * before a key's newest delete survives or carries forward. Carry
    * columns take the newest non-null value (MERGE coalesce); everything
    * else comes from the newest surviving row.
    *
    * Scale: the fold is exactly the read-side cost merge-on-read trades
    * for O(batch) commits — bounded by segment count between compactions,
    * which [[compactLatest]] resets by folding into a plain base.
    */
  private def foldDeltas(spark: SparkSession, path: String,
                         segments: Seq[String], spec: MergeSpec): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val parts = segments.zipWithIndex.map { case (s, i) =>
      spark.read.parquet(s"$path/$s").withColumn("__seq", lit(i))
    }
    val all = parts.reduce(_.unionByName(_, allowMissingColumns = true))
    val keyCols = spec.key.map(col)
    val ord  = struct(spec.orderCol.map(col).getOrElse(lit(0)).as("o"), col("__seq").as("s"))
    val del  = spec.deleteCol.map(c => coalesce(col(c).cast("boolean"), lit(false))).getOrElse(lit(false))
    val wAll  = Window.partitionBy(keyCols: _*)
    val wDesc = Window.partitionBy(keyCols: _*).orderBy(col("__mor_ord").desc)
    val wFull = wDesc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cut = all
      .withColumn("__mor_ord", ord)
      .withColumn("__mor_lastdel", max(when(del, col("__mor_ord"))).over(wAll))
      .filter(col("__mor_lastdel").isNull || col("__mor_ord") > col("__mor_lastdel"))
    val carried = spec.carryCols.foldLeft(cut.withColumn("__mor_rn", row_number().over(wDesc))) {
      (d, c) => d.withColumn(c, first(col(c), ignoreNulls = true).over(wFull))
    }
    val internal = Seq("__seq", "__mor_ord", "__mor_lastdel", "__mor_rn") ++ spec.deleteCol
    carried.filter(col("__mor_rn") === 1).drop(internal: _*)
  }

  /** Row-level diff between two committed versions (time-travel changelog
    * — the read-side companion of Iceberg's `create_changelog_view` /
    * Delta CDF, derivable from any pair of snapshots with no change
    * tracking at write time): one row per key whose state differs between
    * `fromVersion` and `toVersion`, tagged `change` ∈ 'added' | 'removed'
    * | 'changed'. Keys with identical non-key state drop out.
    *
    * Scale shape: each side reads ONLY its snapshot's segment list (cost ∝
    * the two snapshots, never the table history), then one full-outer hash
    * join on the key — the single shuffle a keyed diff needs. Value
    * comparison is a null-safe struct equality, so sparse columns diff
    * correctly.
    *
    * Output: keyCols ++ (change: string).
    */
  def diff(spark: SparkSession, path: String, fromVersion: Int, toVersion: Int,
           keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val a = read(spark, path, Some(fromVersion))
    val b = read(spark, path, Some(toVersion))
    require(keyCols.nonEmpty && keyCols.forall(a.columns.contains),
      s"diff: key columns ${keyCols.mkString(",")} must exist in the table")
    require(a.columns.sorted.sameElements(b.columns.sorted),
      s"diff: schemas differ between v$fromVersion and v$toVersion")
    val valCols = a.columns.filterNot(keyCols.contains).toSeq
    def packed(df: DataFrame, as: String): DataFrame =
      df.select(keyCols.map(col) :+ struct(valCols.map(col): _*).as(as): _*)
    packed(a, "__va").join(packed(b, "__vb"), keyCols, "full_outer")
      .withColumn("change",
        when(col("__va").isNull, lit("added"))
          .when(col("__vb").isNull, lit("removed"))
          .when(!(col("__va") <=> col("__vb")), lit("changed")))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change"): _*)
  }

  /** The `$snapshots` metadata view: (version, committed_at_ms, op,
    * n_segments) per retained manifest.
    */
  def snapshots(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    versions(spark, path).map { v =>
      val m = readManifest(spark, path, v)
      (v, m.committedAtMs, m.op, m.segments.size)
    }.toDF("version", "committed_at_ms", "op", "n_segments")
  }

  /** M1 on the versioned path — compaction as a COMMIT: rewrite the
    * latest version's data into ~`targetFileBytes` files and publish the
    * result as a new version (exactly Iceberg's rewrite_data_files, which
    * commits a snapshot rather than mutating files in place). Readers of
    * older versions are untouched; [[expireSnapshots]] reclaims the
    * pre-compaction segments once they age out.
    * Returns the committed version.
    */
  def compactLatest(spark: SparkSession, path: String,
                    targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val v = latestVersion(spark, path)
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $path"))
    val m = readManifest(spark, path, v)
    val f = fs(spark, path)
    val bytes = m.segments.map { s =>
      val it = f.listFiles(new Path(path, s), true)
      var n = 0L
      while (it.hasNext) { val st = it.next(); if (st.getPath.getName.endsWith(".parquet")) n += st.getLen }
      n
    }.sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    commitReplace(read(spark, path, Some(v)).coalesce(nFiles), path, Some(s"compact-v$v"))
  }

  /** M2 + M3 — expire old snapshots and GC unreferenced segments: keep the
    * newest `retainLast` manifests, delete the rest, then remove every
    * segment that (a) no retained manifest references AND (b) is older
    * than `orphanOlderThanMs` — the age guard that keeps an in-flight
    * commit's freshly-written segment (manifest not yet published) safe,
    * exactly Iceberg's remove_orphan_files(older_than).
    * Returns (expired versions, deleted segment dirs).
    */
  def expireSnapshots(spark: SparkSession, path: String, retainLast: Int,
                      orphanOlderThanMs: Long = 60L * 60 * 1000): (Seq[Int], Seq[String]) = {
    require(retainLast >= 1, "retainLast must be >= 1")
    val f   = fs(spark, path)
    val all = versions(spark, path)
    val (expire, retain) = all.splitAt(math.max(0, all.size - retainLast))
    expire.foreach(v => f.delete(new Path(path, s"$LogDir/${manifestName(v)}"), false))
    val live = retain.flatMap(v => readManifest(spark, path, v).segments).toSet
    val dataRoot = new Path(path, DataDir)
    val cutoff   = System.currentTimeMillis() - orphanOlderThanMs
    val orphans =
      if (!f.exists(dataRoot)) Nil
      else f.listStatus(dataRoot).toSeq
        .filter(_.getModificationTime < cutoff)
        .map(s => s"$DataDir/${s.getPath.getName}")
        .filterNot(live.contains)
    orphans.foreach(s => f.delete(new Path(path, s), true))
    (expire, orphans)
  }
}
