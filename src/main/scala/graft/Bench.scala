package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Measurement rules (round-1 verdict "What's wrong" #3; round-3 #1):
  *  - one untimed warm-up action first, so no query eats JVM/codegen
  *    startup;
  *  - queries run in sorted-name order (Map iteration order is not a
  *    benchmark axis);
  *  - a failed query is recorded as -1, never as a fast success;
  *  - timing materializes every row via a noop datasource write — a bare
  *    count() lets Catalyst drop sorts/projects and under-measures;
  *  - each query is timed Repeats times and the MIN is recorded: round 3
  *    proved a loaded machine can fake a 10× "regression" on unchanged
  *    code (committed BENCH_r03 total 205 s vs 36.6 s on an idle rerun).
  *    The min of k runs estimates intrinsic plan cost under contention —
  *    transient load inflates some runs, never deflates one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Boolean =
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        true
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      }

    val names = SparkEntry.queries.keys.toSeq.sorted
    // Warm-up: one untimed query PER INPUT TABLE (round-2 advice: warming
    // only the first sorted query left every other table's first-touch
    // parquet scan/footer cost inside a timed run). Covers session,
    // codegen, and each table's footer/scan caches.
    Seq("approx_2hop", "text_stats", "embed_knn", "events_hourly")
      .filter(SparkEntry.queries.contains).foreach(run)
    // clamp: a zero/negative override would silently record every query
    // as failed (-1) with total 0 instead of measuring anything
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "3").toInt.max(1)
    val results = names.map { name =>
      val times = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        val ok = run(name)
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      // any successful run counts; all-failed stays -1
      val good = times.filter(_ >= 0)
      name -> (if (good.nonEmpty) good.min else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
