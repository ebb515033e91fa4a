package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool: dump ONE query's sorted result + its oracle SQL, exactly the
  * artifacts graft.Verify produces for the driver's DuckDB compare — so a
  * new operator's oracle can be cross-checked locally (with the
  * driver-side duckdb) before the round gate runs.
  *
  * Usage: sbt "Test/runMain graft.tools.OracleCheck <query> [sfDir] [outDir]"
  */
object OracleCheck {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: OracleCheck <query> [sfDir] [outDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(2).getOrElse("/tmp/oraclecheck")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.orderBy(df.columns.map(c =>
        org.apache.spark.sql.functions.col(c).asc_nulls_last).toSeq: _*)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    Files.writeString(Paths.get(s"$outDir/$name.sql"),
      graft.SparkEntry.oracleSql(name))
    spark.stop()
  }
}
