package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference engine's five graph capabilities (SURVEY.md §2.6),
  * re-expressed as declarative Spark plans. Every function is a pure
  * `DataFrame => DataFrame` over `edges(src LONG, dst LONG)` so Catalyst
  * gets the whole plan (pushdown, partial aggregation, join selection,
  * AQE skew handling all apply).
  *
  * Scale design (100 TB / celebrity-node skew):
  *
  * The naive 2-hop self-join `edges ⋈ edges ON e1.dst = e2.src`
  * (reference `approx/Approx2HopCount.java:94-120`, an in-reducer
  * nested loop) is quadratic per hot key — the reference dodges this
  * with a compiled-in MAX node-id filter. We instead rewrite through the
  * *weighted distinct-edge* relation `w(src,dst) = multiplicity`:
  * path multiplicities become products of weights, so every downstream
  * join runs on |distinct edges| rows instead of |edges| rows, and all
  * counts stay exact. For counting (not materialization) the degree
  * identity Σ_y indeg(y)·outdeg(y) (reference
  * `exact/Exact2HopCount.java:102-105`) avoids the join entirely — one
  * shuffle, partial-aggregated map-side.
  *
  * Counter-exact semantics preserved from the reference:
  *  - 2-hop counts INCLUDE degenerate X→Y→X paths (EX/AP do not filter
  *    them; no check at `exact/Exact2HopCount.java:83-106`).
  *  - Triangle paths EXCLUDE X=Z (`rsjoin/RSJoinTriangleCount.java:102`).
  *  - The closing edge of a triangle is existence-only (the reducer's
  *    boolean `hasEdge`, `rsjoin/RSJoinTriangleCount.java:170-185`) →
  *    LEFT SEMI join.
  *  - The triangle counter is the RAW ×3 rotation count (the reference
  *    never divides by 3 — `rsjoin/RSJoinTriangleCount.java:228-230`);
  *    `triangles_distinct = floor(counter/3)` is a derived column.
  */
object GraphPatterns {

  /** `src < max AND dst < max` — the reference's MAX-threshold subgraph
    * filter (`approx/Approx2HopCount.java:41,68`). Applied before any
    * shuffle, exactly as the reference applies it in the map phase;
    * Catalyst additionally pushes it into the parquet scan.
    */
  def maxFilter(edges: DataFrame, max: Option[Long]): DataFrame =
    max.fold(edges)(m => edges.filter(col("src") < lit(m) && col("dst") < lit(m)))

  /** Distinct edges with multiplicities: `w(src,dst) = count(*)`.
    * One shuffle with map-side partial aggregation; output cardinality is
    * bounded by the distinct-pair count, which is what makes the
    * path/triangle joins below scale-safe.
    */
  def weightedEdges(edges: DataFrame): DataFrame =
    edges.groupBy("src", "dst").agg(count(lit(1)).as("w"))

  /** countedges.CountEdgesAfterMax (`countedges/CountEdgesAfterMax.java:56-59`):
    * `COUNT(*) WHERE src < max AND dst < max`. Map-only in the reference;
    * here a partial-aggregated count with the filter pushed to the scan.
    */
  def edgeCount(edges: DataFrame, max: Option[Long]): DataFrame =
    maxFilter(edges, max).agg(count(lit(1)).as("edge_count"))

  /** exact.Exact2HopCount (`exact/Exact2HopCount.java:83-105`): number of
    * 2-hop paths X→Y→Z (X=Z included) via the degree identity
    * Σ_y indeg(y)·outdeg(y). Two partial-aggregated shuffles on the node
    * id + one join on the (small) node domain — never materializes paths.
    */
  def twoHopCountDegrees(edges: DataFrame, max: Option[Long] = None): DataFrame = {
    val f = maxFilter(edges, max)
    val indeg = f.groupBy(col("dst").as("y")).agg(count(lit(1)).as("indeg"))
    val outdeg = f.groupBy(col("src").as("y")).agg(count(lit(1)).as("outdeg"))
    indeg.join(outdeg, "y")
      .agg(coalesce(sum(col("indeg") * col("outdeg")), lit(0L)).as("two_hop_count"))
  }

  /** Same count through the explicit self-join plan (reference J1,
    * `approx/Approx2HopCount.java:94-120`) on the weighted distinct-edge
    * relation: count = Σ w(x,y)·w(y,z). Exists so tests can assert the
    * two plans agree (SURVEY §5 property a); the degree plan is the one
    * to run at scale.
    */
  def twoHopCountJoin(edges: DataFrame, max: Option[Long] = None): DataFrame = {
    val w = weightedEdges(maxFilter(edges, max))
    val e1 = w.as("e1")
    val e2 = w.as("e2")
    e1.join(e2, col("e1.dst") === col("e2.src"))
      .agg(coalesce(sum(col("e1.w") * col("e2.w")), lit(0L)).as("two_hop_count"))
  }

  /** approx.Approx2HopCount's materialized output (SURVEY §2.1 S3): the
    * 2-hop path triples (x,y,z), X=Z included, grouped with their
    * multiplicity `path_count` (the reference emits one text line per
    * path instance; the grouped form carries identical information with
    * |distinct triples| rows instead of |paths| rows — the only
    * representation that survives a 100× scale-up).
    */
  def twoHopPaths(edges: DataFrame, max: Option[Long] = None): DataFrame = {
    val w = weightedEdges(maxFilter(edges, max))
    val e1 = w.as("e1")
    val e2 = w.as("e2")
    e1.join(e2, col("e1.dst") === col("e2.src"))
      .select(col("e1.src").as("x"), col("e1.dst").as("y"), col("e2.dst").as("z"),
        (col("e1.w") * col("e2.w")).as("path_count"))
  }

  /** rsjoin.RSJoinTriangleCount / repjoin (SURVEY §2.3 J2+J3+J4): the raw
    * ×3 directed-triangle counter. Plan:
    *   weighted self-join (x≠z) → group paths to (x,z,pathcnt)
    *   → LEFT SEMI join against distinct closing edges (z→x)
    *   → global sum.
    * `broadcastClosing=true` is the repjoin (replicated/map-side join)
    * variant (`README.md:81` — documented in the reference but never
    * implemented there): the closing-edge set is broadcast instead of
    * shuffled. At scale the distinct-edge relation of a filtered subgraph
    * is often small enough to broadcast even when the raw edge list is
    * not.
    */
  def triangleCounter(edges: DataFrame, max: Option[Long] = None,
      broadcastClosing: Boolean = false): DataFrame = {
    val f = maxFilter(edges, max)
    val w = weightedEdges(f)
    val e1 = w.as("e1")
    val e2 = w.as("e2")
    val pathsByXZ = e1
      .join(e2, col("e1.dst") === col("e2.src") && col("e1.src") =!= col("e2.dst"))
      .groupBy(col("e1.src").as("x"), col("e2.dst").as("z"))
      .agg(sum(col("e1.w") * col("e2.w")).as("pathcnt"))
    // closing edge z→x, existence-only (left_semi collapses multiplicity
    // exactly like the reference's hasEdge boolean). The broadcast variant
    // ships the DISTINCT pair set: only existence matters under left_semi,
    // and on a multigraph the distinct relation is the small one — the
    // whole point of the replicated-join variant at scale.
    val closing0 = f.select(col("dst").as("x"), col("src").as("z"))
    val closing = if (broadcastClosing) broadcast(closing0.distinct()) else closing0
    pathsByXZ.join(closing, Seq("x", "z"), "left_semi")
      .agg(coalesce(sum(col("pathcnt")), lit(0L)).as("triangle_counter"))
      .withColumn("triangles_distinct",
        floor(col("triangle_counter") / lit(3.0)).cast("long"))
  }
}
