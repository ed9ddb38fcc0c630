package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query oracle dump for iterating on a new query without
  * paying for the full [[Verify]] sweep: writes `outDir/<name>` parquet
  * and `outDir/oracle_sql.json` for ONLY the query names given (all when
  * none) — the same artifact shape the driver's DuckDB compare consumes.
  *
  * Usage: sbt "runMain graft.VerifyOne /root/testdata/sf0.01 /tmp/v1 q87_pagerank"
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, names) = (args(0), args(1), args.drop(2).toSet)
    val unknown = names.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")} — " +
        s"known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // sized past the query suite so repeated passes never recompile
      // generated classes (see Bench.scala)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val picked = SparkEntry.queries.filter { case (n, _) => names.isEmpty || names(n) }
    picked.foreach { case (name, fn) =>
      fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val sqls = SparkEntry.oracleSql.filter { case (n, _) => names.isEmpty || names(n) }
    val json = sqls.toSeq.sortBy(_._1)
      .map { case (n, s) => s"${q(n)}: ${q(s)}" }.mkString("{", ", ", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    graft.queries.QueryCaches.clear(spark)
    spark.stop()
  }
}
