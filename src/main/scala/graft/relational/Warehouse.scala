package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Warehouse-maintenance operators over the star schema: the
  * referential-integrity audit every ingest gate runs before
  * publishing a snapshot, and the incremental rollup that keeps a
  * materialized aggregate current without re-scanning the base fact —
  * the relational member of the engine's incremental family
  * (`incremental_cms` / `incremental_kmv` / `incremental_dedup` /
  * `incremental_mix_plan`: stored ⊕ batch must hash-match the
  * whole-corpus recompute).
  */
object Warehouse {

  /** One foreign-key audit edge: child rows, orphans (child keys with
    * no parent row), and the exact orphan rate in millionths. The
    * parent key projection is DISTINCT — the probe is membership, so
    * a parent snapshot with duplicate keys must not multiply child
    * rows; and the rate divisor is `greatest(n_rows, 1)` so an empty
    * child snapshot reports 0, not NULL-here/error-in-DuckDB (the
    * Mixture/Timeline guarded-division discipline). */
  private def orphanEdge(rel: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey)).distinct(),
        col(childKey) === col(parentKey), "left")
      .agg(count(lit(1)).as("n_rows"),
        count(when(col(parentKey).isNull, lit(1))).as("n_orphans"))
      .select(lit(rel).as("rel"), col("n_rows"), col("n_orphans"),
        expr("(n_orphans * 1000000L) div greatest(n_rows, 1L)")
          .as("orphan_millionths"))

  /** Referential-integrity audit across the fact→dimension edges
    * (lineitem→orders, lineitem→part, orders→customer): per edge, the
    * child row count, the orphan count, and the exact orphan rate.
    * A healthy snapshot reports zero orphans on every edge; a non-zero
    * row is the signal to quarantine the batch before any star join
    * silently drops (inner) or null-extends (outer) the orphans.
    *
    * Scale shape: each edge is ONE key-partitioned left join (the
    * parent side pre-projects to its bare 8-byte key — a membership
    * probe never needs payload; small dims broadcast automatically)
    * feeding a scalar partial agg; the three one-row results union on
    * the driver side of the plan with no joins between them (no
    * constant-key scalar attach, so no BroadcastNestedLoop risk). At
    * 100 TB each edge's join co-partitions child and parent on the
    * key — the same shuffle the downstream star join pays anyway, so
    * the audit is never the new bottleneck. */
  def referentialAudit(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, part: DataFrame): DataFrame =
    orphanEdge("lineitem->orders", lineitem, "l_orderkey",
        orders, "o_orderkey")
      .unionByName(orphanEdge("lineitem->part", lineitem, "l_partkey",
        part, "p_partkey"))
      .unionByName(orphanEdge("orders->customer", orders, "o_custkey",
        customer, "c_custkey"))

  /** Oracle twin of [[referentialAudit]]. */
  def referentialAuditSql: String = {
    def edge(rel: String, childT: String, childK: String, parentT: String,
        parentK: String) =
      s"""SELECT '$rel' AS rel,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(CASE WHEN $parentK IS NULL THEN 1 END) AS BIGINT)
         |    AS n_orphans,
         |  CAST((count(CASE WHEN $parentK IS NULL THEN 1 END) * 1000000)
         |    // greatest(count(*), 1) AS BIGINT) AS orphan_millionths
         |FROM (SELECT $childK FROM $childT)
         |LEFT JOIN (SELECT DISTINCT $parentK FROM $parentT) ON $childK = $parentK""".stripMargin
    s"""${edge("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey")}
       |UNION ALL
       |${edge("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey")}
       |UNION ALL
       |${edge("orders->customer", "orders", "o_custkey", "customer", "c_custkey")}
       |ORDER BY rel, n_rows, n_orphans, orphan_millionths""".stripMargin
  }

  /** The STREAM face of [[referentialAudit]]: an ingest-time orphan
    * gate — each arriving child row is flagged `ref_ok` by probing the
    * static parent-key relation (stream-static LEFT join, stateless:
    * no watermark, no state store — the parent side is a batch
    * relation snapshotted per micro-batch, exactly how a nightly dim
    * snapshot behaves). The batch audit reports rates after the fact;
    * this gate quarantines rows BEFORE they land (filter on `ref_ok`,
    * or route the complement to a dead-letter sink). Batch-equivalence
    * is spec-pinned; the probe side pre-projects to the bare DISTINCT
    * key (membership semantics — a duplicate-keyed parent snapshot
    * must not duplicate gated rows) and broadcasts when small.
    *
    * Scale shape: per micro-batch, one stream-static equi-join against
    * the key projection — the same join the batch audit pays, amortized
    * over arrival. */
  def orphanGate(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey)).distinct(),
        col(childKey) === col(parentKey), "left")
      .withColumn("ref_ok", col(parentKey).isNotNull)
      .drop(parentKey)

  /** Incremental star rollup — the [[Sales.salesRollup]] cells kept
    * current by MERGING a stored rollup with a new batch's rollup
    * instead of re-scanning the whole fact: every measure in the cell
    * (count, sum) is additive, so re-aggregating the unioned cell
    * relations by (r_name, n_name, lvl) is exact — the grouping-sets
    * instance of the engine's incremental merge theorem. The
    * oracle-gated contract: stored ⊕ batch hash-matches the
    * whole-corpus rollup (the oracle recomputes from scratch; this
    * plan never reads the stored fact again).
    *
    * Scale shape: the nightly path re-scans ONLY the batch (one
    * broadcast-dim star join + one partial agg over it); the merge
    * then aggregates two cell relations bounded by
    * |regions|·|nations|·3 levels — constant-size at any corpus. NULL
    * grouping keys from the subtotal rows group identically in both
    * engines (GROUP BY treats NULLs as one group). */
  def incrementalRollup(storedLineitem: DataFrame, batchLineitem: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    Sales.salesRollup(storedLineitem, supplier, nation, region)
      .unionByName(Sales.salesRollup(batchLineitem, supplier, nation, region))
      .groupBy(col("r_name"), col("n_name"), col("lvl"))
      .agg(sum(col("n_items")).as("n_items"),
        sum(col("revenue_cents")).as("revenue_cents"))
      .select(col("r_name"), col("n_name"), col("lvl"), col("n_items"),
        col("revenue_cents"))
}
