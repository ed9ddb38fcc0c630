package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // The generated-class cache defaults to 100 entries; a 326-query
      // pass evicts every compiled stage, so each interleaved pass paid
      // full Janino recompiles for every query — measured 4.3-13.0 s for
      // q168 in-sweep at the default vs 2.8-3.5 s (its isolated time)
      // with the cache sized past the suite. Same tuning applies on a
      // real cluster running a many-query workload per executor.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    // Warmup at a smaller scale factor: pays JIT + whole-stage-codegen
    // compilation once, so the timed pass below measures steady-state query
    // execution rather than first-run compilation (queries are identical
    // plans over the same schemas, so codegen caches hit). sf0.01 gives the
    // interpreted hot loops (array intersects, HOF folds) enough iterations
    // to reach JIT steady state — sf0.001 measurably does not.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.01")
    queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => }
    }
    // Timed reps, report the min per query: the VM-level noise on this host
    // can triple a single rep. Reps are INTERLEAVED (pass-major, not
    // query-major): each pass visits every query once, so a sustained
    // host-contention window inflates at most one rep of many queries —
    // min-of-reps then discards it — instead of all reps of the queries
    // that happen to sit in the alphabetical tail (BENCH_r05 showed 2-5×
    // phantom regressions on unchanged tail queries from exactly that).
    // A query that throws reports -1.0 (NOT its time-to-exception — a fast
    // failure must never read as a fast success) and is listed in "failed".
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val timed: Seq[Seq[(String, Double)]] = (1 to reps).map { _ =>
      queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        name -> (try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
                 catch { case _: Throwable => -1.0 })
      }
    }
    val results = queries.map { case (name, _) =>
      val times = timed.map(_.find(_._1 == name).get._2)
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val ok = results.filter(_._2 >= 0)
    val failed = results.collect { case (k, v) if v < 0 => s"\"$k\"" }.mkString("[", ",", "]")
    val total = if (ok.nonEmpty) ok.map(_._2).sum else 0.0
    // the completed sweep prints BEFORE the isolated re-measure below: a
    // hang or kill during the extra re-timing (up to 10 × reps more full
    // executions — possibly on exactly the contention window being
    // adjudicated) must not discard 40 minutes of finished measurements
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir","warmup_sf":"$warmDir","reps":$reps,"estimator":"min-interleaved"}""")
    // Isolated re-measure of the slowest 10: the interleaved sweep's cell
    // for a slow query can absorb a host-contention window that min-of-reps
    // cannot discard when the window outlasts a full pass (BENCH_r10/r11
    // both needed a manual BenchOne session to adjudicate exactly this).
    // Re-timing each slow query back-to-back (query-major, min-of-reps) at
    // the END of the run gives the adjudication number in the SAME artifact:
    // sweep cell >> isolated cell ⇒ contention during the sweep, not a
    // regression; both cells elevated ⇒ look at the code.
    val byName = queries.toMap
    val slowestIso = ok.sortBy(-_._2).take(10).map { case (name, _) =>
      val fn = byName(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      }
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    val slowestIsoJson = slowestIso
      .map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    println(s"""{"metric":"slowest_isolated","unit":"sec","queries":$slowestIsoJson,"reps":$reps,"estimator":"min-query-major"}""")
    // Cache growth stays observable as the suite grows (the bench JVM
    // holds every QueryCaches entry simultaneously by the end of a pass)
    println(graft.queries.QueryCaches.footprint(spark))
    // Compact headline AFTER the full JSON: tail-capture windows have
    // truncated the per-query map before (BENCH_r06 lost q01-q34), so the
    // numbers that matter most go LAST, where any tail keeps them.
    val slowest = ok.sortBy(-_._2).take(5)
      .map { case (k, v) => f""""$k":${v}%.3f""" }.mkString("{", ",", "}")
    println(f"""{"metric":"total_compact","value":$total%.3f,"unit":"sec","n_queries":${results.size},"n_failed":${results.size - ok.size},"mean_sec":${if (ok.nonEmpty) total / ok.size else 0.0}%.4f,"slowest5":$slowest,"slowest_isolated":$slowestIsoJson}""")
    graft.queries.QueryCaches.clear(spark)
    spark.stop()
  }
}
