package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the canonicalized physical plans of one query's SQL
  * spelling and its DataFrame twin side by side — the feedback loop for
  * extending the plan-equality-pinned SQL surface (GraphSqlSpec's
  * assert shows a unified string diff; this prints both plans whole,
  * which reads better when the divergence is structural).
  *
  * Usage: sbt "Test/runMain graft.tools.PlanDiff <query> [sfDir]"
  */
object PlanDiff {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: PlanDiff <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mask = (s: String) => s.replaceAll("plan_id=\\d+", "plan_id=*")
    val sp = mask(graft.SparkEntry.sqlQueries(name)(spark, sfDir)
      .queryExecution.executedPlan.canonicalized.toString)
    val dp = mask(graft.SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.canonicalized.toString)
    println("===== SQL ====="); println(sp)
    println("===== DF ====="); println(dp)
    println(if (sp == dp) "PLANS MATCH" else "PLANS DIFFER")
    spark.stop()
  }
}
