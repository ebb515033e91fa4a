package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time a LIST of SparkEntry queries (min of N trials each,
  * one warm-up) under optional extra session confs — for A/B-ing a
  * config against the bench session's defaults in one JVM.
  * Usage: sbt "Test/runMain graft.tools.ConfBench <q1,q2,...> [sfDir] [trials]"
  * Extra confs via SPARK_GRAFT_EXTRA_CONF="k=v;k=v".
  */
object ConfBench {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val trials = if (args.length > 2) args(2).toInt else 3
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    sys.env.getOrElse("SPARK_GRAFT_EXTRA_CONF", "").split(";")
      .map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        println(s"[confbench] conf $k=$v")
        builder.config(k, v)
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(once) // warm-up pass (JIT + scan caches)
    val mins = names.map { n =>
      val ts = (1 to trials).map(_ => once(n))
      println(f"[confbench] $n min=${ts.min}%.2f trials=${ts.map(t => f"$t%.2f").mkString(",")}")
      ts.min
    }
    println(f"[confbench] TOTAL(min) ${mins.sum}%.2f over ${names.size} queries")
    spark.stop()
  }
}
