package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Guards the Verify ↔ oracle determinism contract (round-2 advice):
  * Verify sorts every result by ALL columns in schema order before the
  * dump, so every multi-row oracle SQL must end with an ORDER BY listing
  * ALL its output columns in that same order — then both engines apply
  * the identical total order and the hash-compare cannot flake, with no
  * hidden uniqueness assumption on any leading key.
  */
class OracleContractSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  /** Queries whose result is a single aggregate row — ordering irrelevant. */
  val scalarQueries: Set[String] = Set(
    "edge_count", "edge_count_csv", "exact_2hop", "exact_2hop_join",
    "approx_2hop", "rsjoin_triangles", "repjoin_triangles",
    "triangles_oriented",
    "mutual_follows", "graph_summary", "corpus_card", "media_card",
    "incremental_media_card",
    "bloom_prefilter",
    "zone_skip", "join_skew", "edge_census_quarantine", "bloom_auto",
    "bloom_sized", "bloom_sized_audit", "bloom_size_verdict")

  test("every query has an oracle entry") {
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet)
  }

  test("every multi-row oracle ends with ORDER BY over all columns in schema order") {
    val norm = (s: String) => s.toLowerCase.replaceAll("\\s+", " ").trim
    for ((name, fn) <- SparkEntry.queries if !scalarQueries.contains(name)) {
      // NB: not free for every query — the iterative operators
      // (dedup_clusters, corpus_keep) and the checkpointing ones run real
      // jobs during DataFrame CONSTRUCTION, so .columns costs wall-clock
      // there; acceptable at the sf0.001 fixture this spec reads.
      val cols = fn(spark, sfDir).columns
      val expected = "order by " + cols.mkString(", ").toLowerCase
      val sql = norm(SparkEntry.oracleSql(name))
      assert(sql.endsWith(expected),
        s"$name: oracle must end with '$expected' (got '...${sql.takeRight(expected.length + 20)}')")
    }
  }

  test("scalar queries really are scalar (exactly one row on fixtures)") {
    for (name <- scalarQueries) {
      assert(SparkEntry.queries(name)(spark, sfDir).count() === 1L, name)
    }
  }
}
