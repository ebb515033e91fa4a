package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time one SparkEntry query N times in a single JVM and report
  * every trial plus the min — the only defensible number on a noisy box.
  * Usage: sbt "Test/runMain graft.tools.MicroBench <query> [sfDir] [trials]"
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val trials = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm-up
    val ts = (1 to trials).map(_ => once())
    println(f"[microbench] $name trials=${ts.map(t => f"$t%.2f").mkString(",")} min=${ts.min}%.2f")
    spark.stop()
  }
}
