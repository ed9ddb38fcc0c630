package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer for iterating on hot spots: times only the
  * query names given as args (all queries when none), same session config
  * and warmup protocol as [[Bench]].
  *
  * Usage: sbt "runMain graft.BenchOne q24_ngram_jaccard q38_ann_ivf"
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // sized past the query suite so repeated passes never recompile
      // generated classes (see Bench.scala)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wanted = args.toSet
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted.contains(n) }
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.01")
    queries.foreach { case (_, fn) => fn(spark, warmDir).count() }
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    queries.foreach { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n  = fn(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = times.map(_._1).min
      println(f"$name%-24s min=$best%8.3f s  rows=${times.head._2}  all=${times.map(t => f"${t._1}%.3f").mkString(",")}")
    }
    graft.queries.QueryCaches.clear(spark)
    spark.stop()
  }
}
