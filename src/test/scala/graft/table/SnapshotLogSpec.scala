package graft.table

import graft.SparkFunSuite
import java.nio.file.Files

class SnapshotLogSpec extends SparkFunSuite {
  import spark.implicits._

  private def tmp(): String = graft.TestTmp.dir("snaplog") + "/t"

  test("commit/read round-trip with replace and append semantics") {
    val path = tmp()
    val v1 = SnapshotLog.commitReplace(Seq((1, "a"), (2, "b")).toDF("id", "v"), path)
    val v2 = SnapshotLog.commitAppend(Seq((3, "c")).toDF("id", "v"), path)
    assert((v1, v2) == (1, 2))
    assert(SnapshotLog.read(spark, path).count() == 3)
    val v3 = SnapshotLog.commitReplace(Seq((9, "z")).toDF("id", "v"), path)
    assert(v3 == 3)
    assert(SnapshotLog.read(spark, path).collect().map(_.getInt(0)).toSeq == Seq(9))
  }

  test("time travel reads any retained version") {
    val path = tmp()
    SnapshotLog.commitReplace(Seq((1, "a")).toDF("id", "v"), path)
    SnapshotLog.commitAppend(Seq((2, "b")).toDF("id", "v"), path)
    SnapshotLog.commitReplace(Seq((3, "c")).toDF("id", "v"), path)
    assert(SnapshotLog.read(spark, path, Some(1)).collect().map(_.getInt(0)).toSeq == Seq(1))
    assert(SnapshotLog.read(spark, path, Some(2)).collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    assert(SnapshotLog.read(spark, path, Some(3)).collect().map(_.getInt(0)).toSeq == Seq(3))
    val snaps = SnapshotLog.snapshots(spark, path).collect()
    assert(snaps.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(snaps.map(_.getString(2)).toSeq == Seq("replace", "append", "replace"))
    assert(snaps.map(_.getInt(3)).toSeq == Seq(1, 2, 1))
  }

  test("expireSnapshots age guard protects a fresh unreferenced segment (in-flight commit)") {
    val path = tmp()
    SnapshotLog.commitReplace(Seq((1, "a")).toDF("id", "v"), path)
    SnapshotLog.commitReplace(Seq((2, "b")).toDF("id", "v"), path)
    // default cutoff (1h): v1's segment is unreferenced but too fresh to GC
    val (expired, deleted) = SnapshotLog.expireSnapshots(spark, path, retainLast = 1)
    assert(expired == Seq(1) && deleted.isEmpty)
  }

  test("expireSnapshots retains last N, GCs exactly the unreferenced segments") {
    val path = tmp()
    SnapshotLog.commitReplace(Seq((1, "a")).toDF("id", "v"), path) // seg A
    SnapshotLog.commitReplace(Seq((2, "b")).toDF("id", "v"), path) // seg B
    SnapshotLog.commitAppend(Seq((3, "c")).toDF("id", "v"), path)  // segs B,C
    // orphanOlderThanMs=0: in tests everything is "old enough" to sweep
    val (expired, deleted) = SnapshotLog.expireSnapshots(spark, path, retainLast = 2, orphanOlderThanMs = 0L)
    assert(expired == Seq(1))
    assert(deleted.size == 1) // only v1's segment is unreferenced (B is shared)
    // surviving versions still read correctly after GC
    assert(SnapshotLog.versions(spark, path) == Seq(2, 3))
    assert(SnapshotLog.read(spark, path, Some(2)).count() == 1)
    assert(SnapshotLog.read(spark, path, Some(3)).count() == 2)
    intercept[Exception](SnapshotLog.read(spark, path, Some(1)).count())
  }

  test("commitDelta: read folds latest-wins with carry, deletes cut history, time travel works") {
    val path = tmp()
    // base: two users
    SnapshotLog.commitReplace(
      Seq(("u1", 1L, "created", Some(10.0), false), ("u2", 2L, "created", Some(20.0), false))
        .toDF("id", "ts", "status", "amount", "del"), path)
    val spec = SnapshotLog.MergeSpec(Seq("id"), carryCols = Seq("amount"),
      deleteCol = Some("del"), orderCol = Some("ts"))
    // delta 1: u1 pays (sparse amount null → carried), u2 deleted at ts=5
    SnapshotLog.commitDelta(
      Seq(("u1", 3L, "paid", None: Option[Double], false), ("u2", 5L, null, None: Option[Double], true))
        .toDF("id", "ts", "status", "amount", "del"), path, spec)
    val v2 = SnapshotLog.read(spark, path).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2), Option(r.get(3)))).toMap
    assert(v2 == Map("u1" -> ((3L, "paid", Some(10.0)))))
    // delta 2: stale delete (ts=0) must NOT beat u1's newer state;
    // u2 re-inserted AFTER its delete — pre-delete amount must not carry
    SnapshotLog.commitDelta(
      Seq(("u1", 0L, null, None: Option[Double], true), ("u2", 7L, "created", None: Option[Double], false))
        .toDF("id", "ts", "status", "amount", "del"), path, spec)
    val v3 = SnapshotLog.read(spark, path).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2), Option(r.get(3)))).toMap
    assert(v3 == Map(
      "u1" -> ((3L, "paid", Some(10.0))),
      "u2" -> ((7L, "created", None)))) // 20.0 from before the delete does not resurrect
    // time travel folds each version's own segment list
    assert(SnapshotLog.read(spark, path, Some(1)).count() == 2)
    assert(SnapshotLog.read(spark, path, Some(2)).collect().map(_.getString(0)).toSeq == Seq("u1"))
    // compaction folds the deltas into a plain base version with same data
    val cv = SnapshotLog.compactLatest(spark, path)
    assert(cv == 4)
    val v4 = SnapshotLog.read(spark, path).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2), Option(r.get(3)))).toMap
    assert(v4 == v3)
    // post-compaction the manifest is a single plain segment (no fold)
    val snaps = SnapshotLog.snapshots(spark, path).collect().map(r => r.getInt(0) -> r.getInt(3)).toMap
    assert(snaps(4) == 1)
  }

  test("merge-on-read read path: one key exchange; fold width tracks segments and resets on compaction") {
    val path = tmp()
    val spec = SnapshotLog.MergeSpec(Seq("id"), orderCol = Some("ts"))
    SnapshotLog.commitReplace(
      (1 to 50).map(i => (s"u$i", 0L, i)).toDF("id", "ts", "x"), path)
    (1L to 3L).foreach { d =>
      SnapshotLog.commitDelta(
        (1 to 10).map(i => (s"u$i", d, i * 100)).toDF("id", "ts", "x"), path, spec)
    }
    def plan = SnapshotLog.read(spark, path).queryExecution.executedPlan.toString
    // the entire fold (delete cut + carry + latest-wins rank, three windows
    // all partitioned on the merge key) must cost exactly ONE exchange on
    // that key — a second exchange means a window stopped sharing the
    // key partitioning and the read path re-shuffles the table per scan
    val p1 = plan
    assert(p1.split("Exchange hashpartitioning\\(").length - 1 == 1,
      s"fold must be a single key shuffle:\n$p1")
    assert(p1.split("Exchange hashpartitioning\\(")(1).startsWith("id"),
      s"the one exchange must be on the merge key:\n$p1")
    // read-side cost is the fold width: base + 3 deltas = 4 scanned segments
    assert(p1.split("FileScan parquet").length - 1 == 4,
      s"expected base+3 delta scans:\n$p1")
    // compaction folds the deltas into a plain base: the read plan collapses
    // to one scan and needs no exchange at all (nothing left to fold)
    SnapshotLog.compactLatest(spark, path)
    val p2 = plan
    assert(p2.split("FileScan parquet").length - 1 == 1,
      s"post-compaction read must scan a single base segment:\n$p2")
    assert(!p2.contains("Exchange hashpartitioning"),
      s"post-compaction read must not shuffle:\n$p2")
    assert(SnapshotLog.read(spark, path).count() == 50)
  }

  test("commitDelta writes O(batch) bytes, not O(table)") {
    val path = tmp()
    val base = spark.range(100000).selectExpr("id", "repeat('x', 64) AS pad")
    SnapshotLog.commitReplace(base, path)
    def dataBytes(seg: String): Long = {
      val dir = new java.io.File(s"$path/$seg")
      dir.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    val before = new java.io.File(s"$path/data").listFiles().map(_.getName).toSet
    SnapshotLog.commitDelta(
      spark.range(10).selectExpr("id", "repeat('y', 64) AS pad"),
      path, SnapshotLog.MergeSpec(Seq("id")))
    val after = new java.io.File(s"$path/data").listFiles().map(_.getName).toSet
    val newSegs = after -- before
    assert(newSegs.size == 1) // the delta commit wrote exactly one new segment
    val baseBytes  = before.map(s => dataBytes(s"data/$s")).sum
    val deltaBytes = newSegs.map(s => dataBytes(s"data/$s")).sum
    // 10 rows vs 100k rows: the delta is a sliver of the base, not a rewrite
    assert(deltaBytes < baseBytes / 20, s"delta $deltaBytes vs base $baseBytes")
    assert(SnapshotLog.read(spark, path).count() == 100000) // 10 upserts folded in
  }

  test("commitDelta validates merge-spec column names and reserved columns") {
    val path = tmp()
    SnapshotLog.commitReplace(Seq((1, "a")).toDF("id", "v"), path)
    val df = Seq((1, "b")).toDF("id", "v")
    intercept[IllegalArgumentException](
      SnapshotLog.commitDelta(df, path, SnapshotLog.MergeSpec(Seq("bad\"col"))))
    intercept[IllegalArgumentException](
      SnapshotLog.commitDelta(df.withColumn("__seq", org.apache.spark.sql.functions.lit(1)),
        path, SnapshotLog.MergeSpec(Seq("id"))))
  }

  test("tags scans every retained manifest, not just the latest") {
    val path = tmp()
    SnapshotLog.commitReplace(Seq((1, "a")).toDF("id", "v"), path, Some("batch-0"))
    SnapshotLog.compactLatest(spark, path) // tags "compact-v1", now the latest
    assert(SnapshotLog.latestTag(spark, path).contains("compact-v1"))
    assert(SnapshotLog.tags(spark, path) == Set("batch-0", "compact-v1"))
  }

  test("commit rejects tags outside the manifest-safe charset") {
    val path = tmp()
    val df = Seq((1, "a")).toDF("id", "v")
    intercept[IllegalArgumentException](SnapshotLog.commitReplace(df, path, Some("""bad"tag""")))
    intercept[IllegalArgumentException](SnapshotLog.commitReplace(df, path, Some("bad]tag")))
    intercept[IllegalArgumentException](SnapshotLog.commitReplace(df, path, Some("")))
    // the log is untouched by the rejected commits
    assert(SnapshotLog.versions(spark, path).isEmpty)
    assert(SnapshotLog.commitReplace(df, path, Some("ok.tag-1_x")) == 1)
  }

  test("diff between versions: added/removed/changed, unchanged keys drop out") {
    val path = tmp()
    SnapshotLog.commitReplace(
      Seq((1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)).toDF("id", "v", "x"),
      path)
    // delta: change key 2, delete key 3, add key 5; keys 1/4 untouched
    SnapshotLog.commitDelta(
      Seq((2, Some("B"), Some(21), false), (3, None, None, true), (5, Some("e"), Some(50), false))
        .toDF("id", "v", "x", "is_del"),
      path, SnapshotLog.MergeSpec(key = Seq("id"), deleteCol = Some("is_del")))
    val d = SnapshotLog.diff(spark, path, 1, 2, Seq("id"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(d == Map(2 -> "changed", 3 -> "removed", 5 -> "added"))
    // schemas must line up
    intercept[IllegalArgumentException](SnapshotLog.diff(spark, path, 1, 2, Seq("nope")))
    // a self-diff is empty
    assert(SnapshotLog.diff(spark, path, 2, 2, Seq("id")).count() == 0L)
  }

  test("concurrent committers both land, versions stay distinct") {
    val path = tmp()
    SnapshotLog.commitReplace(Seq((0, "z")).toDF("id", "v"), path)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val fs = (1 to 4).map(i => Future {
      SnapshotLog.commitAppend(Seq((i, s"w$i")).toDF("id", "v"), path)
    })
    val got = Await.result(Future.sequence(fs), 120.seconds)
    assert(got.sorted == Seq(2, 3, 4, 5))
    // every append survived into the final state
    assert(SnapshotLog.read(spark, path).count() == 5)
  }
}
