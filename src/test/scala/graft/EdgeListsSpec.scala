package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.{EdgeLists, GraphPatterns}

/** Covers the reference's native ingestion path: a CSV edge list
  * `src,dst` one pair per line (reference README.md:145-157 sample;
  * parse loop at exact/Exact2HopCount.java:53-59). Golden values from
  * FIXTURES.md §A must hold end-to-end through fromCsv, and malformed
  * rows must be a hard error exactly like the reference's
  * Integer.parseInt crash (countedges/CountEdgesAfterMax.java:52-53).
  */
class EdgeListsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def writeCsv(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-csv").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "edges.csv")
    val w = new java.io.PrintWriter(f)
    try lines.foreach(w.println) finally w.close()
    f.getAbsolutePath
  }

  val sampleLines: Seq[String] = Seq(
    "1,2", "2,3", "3,1", "1,4", "4,5", "5,6", "6,4", "3,6", "2,5", "5,3")

  test("golden 10/16/6 through the CSV ingestion path") {
    val edges = EdgeLists.fromCsv(spark, writeCsv(sampleLines))
    assert(GraphPatterns.edgeCount(edges, Some(11316812L)).first().getLong(0) === 10L)
    assert(GraphPatterns.twoHopCountDegrees(edges).first().getLong(0) === 16L)
    assert(GraphPatterns.triangleCounter(edges, Some(12500L)).first().getLong(0) === 6L)
  }

  test("malformed row with missing id is a hard error (reference strictness)") {
    val edges = EdgeLists.fromCsv(spark, writeCsv(sampleLines :+ "1,"))
    // NOTE: a bare count() would NOT trip this — Spark's CSV count
    // optimization prunes all columns and skips parsing. Every real query
    // reads the ids, which is where the guard lives.
    val e = intercept[Exception] { edges.collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("malformed edge row")))
  }

  test("non-numeric row is a hard error (FAILFAST)") {
    val edges = EdgeLists.fromCsv(spark, writeCsv(sampleLines :+ "a,b"))
    intercept[Exception] { edges.collect() }
  }
}
