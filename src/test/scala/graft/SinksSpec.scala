package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sinks

class SinksSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("partitioned write produces a scan with real partition pruning") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val path = java.nio.file.Files.createTempDirectory("graft_part").toString
    Sinks.writePartitioned(docs, path, Seq("lang"))

    val read = spark.read.parquet(path).filter(org.apache.spark.sql.functions.col("lang") === "en")
    val plan = read.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*lang[^\\]]*\\]".r.findFirstIn(plan).isDefined,
      s"lang filter not applied as a partition filter:\n$plan")
    // round-trip correctness on the pruned read — collect() executes
    // THIS Dataset's own QueryExecution (count() would build a new one
    // whose scan metrics we could not read afterwards)
    val expected = docs.filter(org.apache.spark.sql.functions.col("lang") === "en").count()
    assert(read.collect().length.toLong === expected)
    // pruning is real: after execution the scan's numFiles metric shows
    // strictly fewer files than the unfiltered layout contains
    val allFiles = spark.read.parquet(path).inputFiles.length
    val scan = read.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val pruned = scan.metrics("numFiles").value
    assert(pruned > 0, "scan metric never populated — assertion would be vacuous")
    assert(pruned < allFiles, s"no files pruned ($pruned of $allFiles)")
  }
}
