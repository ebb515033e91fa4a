package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: split media_features cost into DataFrame CONSTRUCTION
  * (analysis + the eager localCheckpoints it triggers) vs execution. */
object MediaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.wholeStage", sys.env.getOrElse("PROBE_WSCG", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to 3) {
      val s0 = System.nanoTime()
      val ct = graft.multimodal.Media.asContainerTable(
        graft.Tables.widen(graft.Tables.documents(spark, sfDir)))
      val s1 = System.nanoTime()
      println(f"[probe] trial $i synth_checkpoint=${(s1-s0)/1e9}%.2f")
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries("media_features")(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimization
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"[probe] trial $i construct=${(t1-t0)/1e9}%.2f plan=${(t2-t1)/1e9}%.2f exec=${(t3-t2)/1e9}%.2f")
    }
    spark.stop()
  }
}
