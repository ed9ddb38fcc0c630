package graft.table

import graft.SparkFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

class TableLayoutSpec extends SparkFunSuite {
  import spark.implicits._

  private def tmp(tag: String): String = graft.TestTmp.dir(tag)

  private lazy val rows = Seq(
    ("2024-01-01 10:00:00", "a", 1.0), ("2024-01-01 11:00:00", "b", 2.0),
    ("2024-01-02 10:00:00", "c", 3.0), ("2024-01-03 10:00:00", "d", 4.0)
  ).toDF("ts_s", "k", "v").withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

  test("partitionedWrite lays out day partitions and round-trips") {
    val path = tmp("layout") + "/t"
    TableLayout.partitionedWrite(rows, path,
      partitions = Seq("day" -> TableLayout.daysOf(col("ts"))), sortCols = Seq("ts"))
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("day=2024-01-01", "day=2024-01-02", "day=2024-01-03"))
    val back = spark.read.parquet(path)
    assert(back.count() == 4)
    // day filter prunes to one partition's files
    assert(back.filter(col("day") === "2024-01-02").count() == 1)
  }

  test("bucketOf is stable and in range") {
    val b = rows.select(TableLayout.bucketOf(16, col("k")).as("b")).collect().map(_.getInt(0))
    assert(b.forall(x => x >= 0 && x < 16))
    val again = rows.select(TableLayout.bucketOf(16, col("k")).as("b")).collect().map(_.getInt(0))
    assert(b.sameElements(again))
  }

  test("compact bin-packs only the selected cold partitions") {
    val path = tmp("compact") + "/t"
    // many small files per day partition: write WITHOUT the clustering
    // repartition (this is exactly the fan-out partitionedWrite prevents)
    rows.union(rows).union(rows)
      .withColumn("day", TableLayout.daysOf(col("ts")))
      .repartition(6)
      .write.partitionBy("day").parquet(path)
    def nFiles(day: String) =
      new java.io.File(s"$path/day=$day").listFiles().count(_.getName.endsWith(".parquet"))
    val before = nFiles("2024-01-01")
    assert(before >= 2)
    val total = spark.read.parquet(path).count()
    val n = TableLayout.compact(spark, path, "day", col("day") < "2024-01-02")
    assert(n == 1) // only the cold day rewritten
    assert(nFiles("2024-01-01") == 1)
    assert(spark.read.parquet(path).count() == total) // data preserved
  }

  test("ttlDropPartitions removes only expired partitions") {
    val path = tmp("ttl") + "/t"
    TableLayout.partitionedWrite(rows, path, Seq("day" -> TableLayout.daysOf(col("ts"))))
    val dropped = TableLayout.ttlDropPartitions(spark, path, "day", _ < "2024-01-02")
    assert(dropped == Seq("2024-01-01"))
    val left = spark.read.parquet(path).select("day").distinct().collect().map(_.get(0).toString).sorted
    assert(left.toSeq == Seq("2024-01-02", "2024-01-03"))
  }

  test("fileStats reports per-partition file health without reading data") {
    val path = tmp("stats") + "/t"
    TableLayout.partitionedWrite(rows, path, Seq("day" -> TableLayout.daysOf(col("ts"))))
    val stats = TableLayout.fileStats(spark, path).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(stats.keySet == Set("day=2024-01-01", "day=2024-01-02", "day=2024-01-03"))
    stats.values.foreach { case (n, avg) => assert(n >= 1 && avg > 0) }
  }

  test("zValue interleaves bits; z-sort bounds per-chunk ranges in BOTH dimensions") {
    import spark.implicits._
    // known Morton codes: z(1,0)=1, z(0,1)=2, z(1,1)=3, z(2,2)=12, z(3,5)=39
    val z = Seq((1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L), (3L, 5L)).toDF("a", "b")
      .select(TableLayout.zValue(col("a"), col("b"))).collect().map(_.getLong(0)).toSeq
    assert(z == Seq(1L, 2L, 3L, 12L, 39L))
    // sign-bit safety: out-of-domain values clamp, z stays non-negative
    val big = Seq((0L, 1L << 31), (0L, (1L << 31) - 1), ((1L << 31) - 1, (1L << 31) - 1))
      .toDF("a", "b")
      .select(TableLayout.zValue(col("a"), col("b"))).collect().map(_.getLong(0)).toSeq
    assert(big.forall(_ >= 0L))
    assert(big(0) == big(1)) // 2^31 clamps to the max in-domain value

    // locality: 64×64 grid, 16 chunks. Lexicographic sort on (a,b) gives
    // chunks spanning b's FULL range; z-sort bounds both spans.
    val grid = (for { a <- 0L until 64L; b <- 0L until 64L } yield (a, b)).toSeq
    def chunkSpans(sorted: Seq[(Long, Long)]): Seq[(Long, Long)] =
      sorted.grouped(sorted.size / 16).map { c =>
        (c.map(_._1).max - c.map(_._1).min, c.map(_._2).max - c.map(_._2).min)
      }.toSeq
    def morton(a: Long, b: Long): Long =
      (0 until 32).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    val lexSpans = chunkSpans(grid.sortBy(identity))
    val zSpans   = chunkSpans(grid.sortBy { case (a, b) => morton(a, b) })
    assert(lexSpans.forall(_._2 == 63L))        // lexicographic: b unbounded everywhere
    assert(zSpans.forall { case (sa, sb) => sa <= 16L && sb <= 16L }) // z: both tight
  }

  test("zOrderedWrite produces files with tight min/max ranges on both columns") {
    import spark.implicits._
    val path = tmp("zorder") + "/t"
    val grid = (for { a <- 0L until 64L; b <- 0L until 64L } yield (a, b)).toDF("a", "b")
    TableLayout.zOrderedWrite(grid, path, "a", "b", nFiles = 16)
    val fs = new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(fs.length == 16)
    // per-file spans are bounded in BOTH dims (the data-skipping property)
    fs.foreach { f =>
      val d = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("a")), max(col("a")), min(col("b")), max(col("b"))).collect().head
      assert(d.getLong(1) - d.getLong(0) <= 16L, s"a-span too wide in ${f.getName}")
      assert(d.getLong(3) - d.getLong(2) <= 16L, s"b-span too wide in ${f.getName}")
    }
    assert(spark.read.parquet(path).count() == 64L * 64L)
  }

  test("schema drift: upstream adds a column; mergeSchema read + header+body bronze both absorb it") {
    import spark.implicits._
    val path = tmp("drift") + "/bronze"
    // generation 1: 3 columns
    Seq((1L, "u1", 10.0)).toDF("event_id", "user_id", "value")
      .write.mode("append").parquet(path)
    // generation 2: upstream added a column
    Seq((2L, "u2", 20.0, "ios")).toDF("event_id", "user_id", "value", "os")
      .write.mode("append").parquet(path)
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert(merged.columns.toSet == Set("event_id", "user_id", "value", "os"))
    val rows = merged.collect().map(r => r.getLong(0) -> Option(r.getAs[String]("os"))).toMap
    assert(rows == Map(1L -> None, 2L -> Some("ios"))) // old rows read as NULL
    // the header+body projection absorbs the same drift with NO schema
    // change at all: the new column lands inside the JSON payload
    val hb1 = graft.streaming.StreamPipelines.headerBody(
      Seq((1L, "u1", 10.0)).toDF("event_id", "user_id", "value"), Seq("event_id", "user_id"))
    val hb2 = graft.streaming.StreamPipelines.headerBody(
      Seq((2L, "u2", 20.0, "ios")).toDF("event_id", "user_id", "value", "os"),
      Seq("event_id", "user_id"))
    assert(hb1.columns.toSeq == hb2.columns.toSeq)
    assert(hb2.collect().head.getString(2).contains("\"os\":\"ios\""))
  }

  test("removeOrphans clears stray temp dirs only") {
    val path = tmp("orphan") + "/t"
    TableLayout.partitionedWrite(rows, path, Seq("day" -> TableLayout.daysOf(col("ts"))))
    new java.io.File(s"$path/.compact-tmp-zzz").mkdirs()
    val removed = TableLayout.removeOrphans(spark, path)
    assert(removed.exists(_.contains(".compact-tmp-zzz")))
    assert(spark.read.parquet(path).count() == 4)
  }

  test("zValue interleaves bits exactly (x even positions, y odd)") {
    val rows = Seq((3L, 5L)).toDF("x", "y")
    // x=0b011, y=0b101 at bits=3: z = x0<<0 + y0<<1 + x1<<2 + y1<<3 + x2<<4 + y2<<5
    //   = 1 + 2 + 4 + 0 + 0 + 32 = 39
    val z = rows.select(TableLayout.zValue(col("x"), col("y"), bits = 3)).head.getLong(0)
    assert(z == 39L)
  }

  test("zValue buckets bound BOTH dimensions (the pruning property)") {
    // exhaustive 64×64 grid at bits=6 → 12-bit z; 16 buckets of 256 keys.
    // Each bucket fixes the top 2 bits of x AND y → spans ≤ 15 in both,
    // where a plain x-sort would leave y's span at the full 63.
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val spans = grid
      .select(col("x"), col("y"), TableLayout.zValue(col("x"), col("y"), 6).as("z"))
      .groupBy(expr("z div 256L")).agg(
        (max(col("x")) - min(col("x"))).as("xs"),
        (max(col("y")) - min(col("y"))).as("ys"))
      .collect()
    assert(spans.length == 16)
    assert(spans.forall(r => r.getLong(1) <= 15L && r.getLong(2) <= 15L))
  }
  test("clusteringDepth: disjoint files depth 1, overlap counted, gaps excluded") {
    import org.apache.spark.sql.functions._
    val zones = Seq(
      ("tight", 0L, 0L, 9L), ("tight", 1L, 10L, 19L),
      ("overlap", 0L, 0L, 9L), ("overlap", 1L, 5L, 14L),
      ("gapped", 0L, 0L, 4L), ("gapped", 1L, 10L, 14L)
    ).toDF("layout", "f", "lo", "hi")
    val out = TableLayout.clusteringDepth(zones).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_files"), r.getAs[Long]("max_depth"),
          r.getAs[Long]("avg_depth_milli")))).toMap
    assert(out("tight") == ((2L, 1L, 1000L)))
    // [0,5) d1 + [5,10) d2 + [10,15) d1 -> (5+10+5)*1000/15 = 1333
    assert(out("overlap") == ((2L, 2L, 1333L)))
    // the uncovered [5,10) gap is not part of the average
    assert(out("gapped") == ((2L, 1L, 1000L)))
  }
}
