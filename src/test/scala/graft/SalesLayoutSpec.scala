package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The relational layout claim from [[graft.relational.Sales]]'s
  * Scaladocs, proven the GraphSkewSpec way: at 100 TB the fact⋈fact
  * joins (lineitem⋈orders on the order key) run CO-PARTITIONED — both
  * tables written bucketed by the join key — and then neither side
  * shuffles; and a per-order rollup over the same layout reuses the
  * bucket distribution, so the whole "join + aggregate on the bucket
  * key" pipeline is exchange-free. AQE and auto-broadcast are off so
  * the corpus-scale plan shape is the one inspected.
  */
class SalesLayoutSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("orderkey-bucketed fact tables: join AND per-order rollup plan zero exchanges") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // a previous JVM's aborted run can leave the managed location on
    // disk with no catalog entry — clear both sides before creating
    for (t <- Seq("li_bkt", "ord_bkt")) {
      s2.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        s2.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists())
        org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    try {
    graft.Tables.lineitem(s2, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bkt")
    graft.Tables.table(s2, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bkt")
    val rollup = s2.table("li_bkt")
      .join(s2.table("ord_bkt").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * lit(100.0) + lit(0.5)).cast("long")).as("order_cents"))
    val plan = rollup.queryExecution.executedPlan
    assert(plan.collectFirst { case j: SortMergeJoinExec => j }.isDefined,
      s"expected a sort-merge join:\n$plan")
    val shuffles = plan.collect { case _: ShuffleExchangeExec => 1 }.sum
    assert(shuffles === 0,
      s"co-partitioned join + bucket-key rollup still shuffles:\n$plan")
    // and the exchange-free plan computes the real thing
    val viaLayout = rollup.collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("order_cents")).toMap
    val direct = graft.relational.Sales
      .orderSizes(graft.Tables.lineitem(s2, dir)) // row counts per order
      .collect().map(r => r.getAs[Long]("n_lines") -> r.getAs[Long]("n_orders"))
    assert(viaLayout.nonEmpty && direct.nonEmpty)
    assert(viaLayout.size ===
      graft.Tables.table(s2, dir, "orders")
        .join(graft.Tables.lineitem(s2, dir),
          col("o_orderkey") === col("l_orderkey"), "left_semi").count())
    } finally {
      s2.sql("DROP TABLE IF EXISTS li_bkt")
      s2.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }
}
