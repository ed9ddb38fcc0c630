package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temporary profiling main (deleted before commit). */
object ProbeScratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label%-26s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    def runPath(label: String, g: DataFrame): Unit = {
      val nodes = g.select(col("src").as("node")).union(g.select(col("dst").as("node")))
        .distinct().persist()
      nodes.count()
      val outEdges = g.join(g.groupBy("src").agg(count(lit(1)).as("odeg")), "src").persist()
      outEdges.count()
      val base = (15L * 1000000L) / 100L
      var rank = nodes.withColumn("rank_mu", lit(1000000L))
      for (_ <- 1 to 3)
        rank = graft.ext.Graphs.iteration(outEdges, nodes, rank, base, 85)
      val out = t(s"$label final localCkpt") { rank.localCheckpoint(true) }
      t(s"$label count") { out.count() }
      nodes.unpersist(); outEdges.unpersist()
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val edges = {
        val e = graft.queries.ExtensionQueries.pagerankEdges(spark, dir)
          .select(col("src").cast("string").as("src"), col("dst").cast("string").as("dst"))
          .filter(col("src").isNotNull && col("dst").isNotNull).distinct().persist()
        e.count(); e
      }
      runPath("STRING", edges)
      val dict = graft.ext.Graphs.idDictionary(
        edges.select(col("src").as("node")).union(edges.select(col("dst").as("node"))), "node").persist()
      dict.count()
      val enc = edges
        .join(dict.select(col("node").as("src"), col("node_id").as("__sid")), "src")
        .join(dict.select(col("node").as("dst"), col("node_id").as("__did")), "dst")
        .select(col("__sid").as("src"), col("__did").as("dst")).persist()
      enc.count()
      runPath("ENCODED", enc)
      Seq(edges, dict, enc).foreach(_.unpersist())
    }
    spark.stop()
  }
}
