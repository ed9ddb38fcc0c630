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
  * A commit writes a NEW segment dir, then publishes a manifest listing the
  * segment set for that version via create-exclusive rename — readers see
  * either the old or the new version, never a partial write (the same
  * commit protocol as a real table format, minus the catalog). Concurrent
  * committers race on the manifest rename; the loser retries against the
  * winner's version (optimistic concurrency).
  *
  * Scale notes: manifests hold segment DIRECTORY names, not file lists —
  * a commit is O(1) metadata regardless of data size; reads hand Spark the
  * segment dirs and let the parquet source list/prune in parallel. Expiry
  * is manifest deletion + mark-and-sweep segment GC (exactly
  * remove_orphan_files semantics: a segment survives iff some retained
  * manifest references it).
  */
object SnapshotLog {

  private val LogDir  = "_log"
  private val DataDir = "data"

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

  /** Commit `df` as a full replacement of the table state. */
  def commitReplace(df: DataFrame, path: String): Int = commit(df, path, "replace")

  /** Commit `df` as an append: the new version references the previous
    * version's segments plus the new one.
    */
  def commitAppend(df: DataFrame, path: String): Int = commit(df, path, "append")

  private def commit(df: DataFrame, path: String, op: String): Int = {
    val spark = df.sparkSession
    val f     = fs(spark, path)
    val seg   = s"$DataDir/seg-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode("overwrite").parquet(s"$path/$seg")
    f.mkdirs(new Path(path, LogDir))
    var attempts = 0
    while (attempts < 20) {
      attempts += 1
      val base = latestVersion(spark, path)
      val prev = if (op == "append") base.map(readManifest(spark, path, _)._2).getOrElse(Nil) else Nil
      val v    = base.getOrElse(0) + 1
      val body =
        s"""{"version":$v,"committedAtMs":${System.currentTimeMillis()},"op":"$op","segments":[${(prev :+ seg).map(s => "\"" + s + "\"").mkString(",")}]}"""
      val tmp   = new Path(path, s"$LogDir/.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      val out   = f.create(tmp, false)
      out.write(body.getBytes("UTF-8")); out.close()
      // rename is the atomic publish: it fails if the target exists (a
      // concurrent committer won) → re-read the log and retry on top
      if (f.rename(tmp, new Path(path, s"$LogDir/${manifestName(v)}"))) return v
      f.delete(tmp, false)
    }
    throw new IllegalStateException(s"snapshot commit lost the race $attempts times: $path")
  }

  /** (op, segments) of a version's manifest. */
  private def readManifest(spark: SparkSession, path: String, v: Int): (String, Seq[String]) = {
    val p    = new Path(path, s"$LogDir/${manifestName(v)}")
    val in   = fs(spark, path).open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val op   = "\"op\":\"([a-z]+)\"".r.findFirstMatchIn(body).map(_.group(1)).getOrElse("replace")
    val segs = "\"segments\":\\[([^\\]]*)\\]".r.findFirstMatchIn(body).map(_.group(1)).getOrElse("")
      .split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
    (op, segs)
  }

  /** Read the table at `version` (time travel), or at the latest version. */
  def read(spark: SparkSession, path: String, version: Option[Int] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, path))
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $path"))
    val (_, segs) = readManifest(spark, path, v)
    spark.read.parquet(segs.map(s => s"$path/$s"): _*)
  }

  /** The `$snapshots` metadata view: (version, committed_at_ms, op,
    * n_segments) per retained manifest.
    */
  def snapshots(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    versions(spark, path).map { v =>
      val p    = new Path(path, s"$LogDir/${manifestName(v)}")
      val in   = fs(spark, path).open(p)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      val ts   = "\"committedAtMs\":(\\d+)".r.findFirstMatchIn(body).map(_.group(1).toLong).getOrElse(0L)
      val (op, segs) = readManifest(spark, path, v)
      (v, ts, op, segs.size)
    }.toDF("version", "committed_at_ms", "op", "n_segments")
  }

  /** M2 + M3 — expire old snapshots and GC unreferenced segments: keep the
    * newest `retainLast` manifests, delete the rest, then remove every
    * segment no retained manifest references (mark-and-sweep; exactly
    * expire_snapshots(retain_last=N) + remove_orphan_files).
    * Returns (expired versions, deleted segment dirs).
    */
  def expireSnapshots(spark: SparkSession, path: String, retainLast: Int): (Seq[Int], Seq[String]) = {
    require(retainLast >= 1, "retainLast must be >= 1")
    val f   = fs(spark, path)
    val all = versions(spark, path)
    val (expire, retain) = all.splitAt(math.max(0, all.size - retainLast))
    expire.foreach(v => f.delete(new Path(path, s"$LogDir/${manifestName(v)}"), false))
    val live = retain.flatMap(v => readManifest(spark, path, v)._2).toSet
    val dataRoot = new Path(path, DataDir)
    val orphans =
      if (!f.exists(dataRoot)) Nil
      else f.listStatus(dataRoot).toSeq
        .map(s => s"$DataDir/${s.getPath.getName}")
        .filterNot(live.contains)
    orphans.foreach(s => f.delete(new Path(path, s), true))
    (expire, orphans)
  }
}
