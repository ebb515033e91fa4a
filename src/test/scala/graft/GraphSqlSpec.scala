package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL entry surface's contract (round-8 directive #8): every
  * `spark.sql` spelling of a reference query plans IDENTICALLY to its
  * DataFrame twin — not merely "same result", the same canonicalized
  * physical plan, so SQL users inherit the weighted distinct-edge
  * rewrite, the semi-join closure, and the broadcast variant with no
  * second plan to maintain.
  */
class GraphSqlSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  test("each SQL spelling plans identically to its DataFrame twin and agrees on the result") {
    assert(SparkEntry.sqlQueries.nonEmpty)
    for ((name, fn) <- SparkEntry.sqlQueries.toSeq.sortBy(_._1)) {
      val sqlDf = fn(spark, sfDir)
      val dfDf = SparkEntry.queries(name)(spark, sfDir)
      // compare the canonicalized plans as STRINGS: structurally equal
      // trees print identically (exprIds normalized), and on a mismatch
      // scalatest can diff strings where its reflective object differ
      // crashes invoking lazy plan internals
      // plan_id is a per-plan-construction counter stamped into the
      // Exchange toString that canonicalization does NOT normalize —
      // mask it (structure, partitioning, and expressions stay strict)
      val mask = (s: String) => s.replaceAll("plan_id=\\d+", "plan_id=*")
      val sp = mask(sqlDf.queryExecution.executedPlan.canonicalized.toString)
      val dp = mask(dfDf.queryExecution.executedPlan.canonicalized.toString)
      assert(sp === dp,
        s"$name: SQL plan differs from the DataFrame plan\n--- sql ---\n$sp\n--- df ---\n$dp")
      assert(sqlDf.collect().toSeq === dfDf.collect().toSeq,
        s"$name: results disagree")
    }
  }

  test("the broadcast spelling really plans a broadcast semi join") {
    val df = SparkEntry.sqlQueries("repjoin_triangles")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }
}
