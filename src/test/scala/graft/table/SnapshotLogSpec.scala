package graft.table

import graft.SparkFunSuite
import java.nio.file.Files

class SnapshotLogSpec extends SparkFunSuite {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-snaplog").toString + "/t"

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
