package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.{EdgeLists, GraphPatterns}

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // events.parquet is TIMESTAMP(NANOS) — see graft.Tables.events
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

/** Golden fixture: the reference's own 10-edge smoke-test graph
  * (reference README.md:145-157; hand-derived expected values in
  * FIXTURES.md §A) plus brute-force property checks on random digraphs
  * (SURVEY.md §5).
  */
class GraphPatternsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  val sample: Seq[(Long, Long)] = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (4L, 5L),
    (5L, 6L), (6L, 4L), (3L, 6L), (2L, 5L), (5L, 3L))

  def df(edges: Seq[(Long, Long)]) = EdgeLists.fromSeq(spark, edges)

  test("golden: edge_count = 10 (CountEdgesAfterMax semantics)") {
    assert(GraphPatterns.edgeCount(df(sample), Some(11316812L))
      .first().getLong(0) === 10L)
  }

  test("golden: exact 2-hop = 16, both plans") {
    assert(GraphPatterns.twoHopCountDegrees(df(sample)).first().getLong(0) === 16L)
    assert(GraphPatterns.twoHopCountJoin(df(sample)).first().getLong(0) === 16L)
  }

  test("golden: approx 2-hop (MAX=12500) = 16") {
    assert(GraphPatterns.twoHopCountDegrees(df(sample), Some(12500L))
      .first().getLong(0) === 16L)
  }

  test("golden: 2-hop paths materialize 16 path instances") {
    val paths = GraphPatterns.twoHopPaths(df(sample), Some(12500L))
    assert(paths.agg(org.apache.spark.sql.functions.sum("path_count"))
      .first().getLong(0) === 16L)
    assert(paths.count() === 16L) // no multi-edges in the sample
  }

  test("golden: raw triangle counter = 6, shuffle and broadcast variants") {
    val row = GraphPatterns.triangleCounter(df(sample), Some(12500L)).first()
    assert(row.getLong(0) === 6L)
    assert(row.getLong(1) === 2L) // distinct directed triangles
    val bcast = GraphPatterns
      .triangleCounter(df(sample), Some(12500L), broadcastClosing = true).first()
    assert(bcast.getLong(0) === 6L)
  }

  test("trianglesOriented golden: sample graph has 2 directed 3-cycles") {
    assert(GraphPatterns.trianglesOriented(df(sample), Some(12500L))
      .first().getLong(0) === 2L)
  }

  test("trianglesOriented ≡ triangleCounter.triangles_distinct on distinct graphs") {
    // the oriented enumeration finds each directed 3-cycle once from
    // its minimum-(degree, id)-rank corner; the counter finds all 3
    // rotations and divides — identical on self-loop-free distinct
    // graphs (randomGraph drops self-loops; distinct drops dups)
    for (seed <- 1 to 5) {
      val g = randomGraph(seed, n = 12, m = 80, allowDup = false)
      val counter = GraphPatterns.triangleCounter(df(g)).first().getLong(1)
      val oriented = GraphPatterns.trianglesOriented(df(g)).first().getLong(0)
      assert(oriented === counter, s"seed=$seed")
    }
  }

  test("broadcast variant actually plans a broadcast join") {
    val plan = GraphPatterns
      .triangleCounter(df(sample), Some(12500L), broadcastClosing = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  // ---- brute-force property checks --------------------------------------

  def brute2Hop(edges: Seq[(Long, Long)]): Long =
    (for ((a, b) <- edges; (c, d) <- edges if b == c) yield 1L).sum

  def bruteTriangleCounter(edges: Seq[(Long, Long)]): Long = {
    val set = edges.toSet
    (for ((a, b) <- edges; (c, d) <- edges
          if b == c && a != d && set.contains((d, a))) yield 1L).sum
  }

  def randomGraph(seed: Int, n: Int, m: Int,
      allowDup: Boolean): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val raw = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b } // no self-loops (SURVEY §5 property c)
    if (allowDup) raw else raw.distinct
  }

  test("property: both 2-hop plans match brute force on random multigraphs") {
    for (seed <- 1 to 5) {
      val g = randomGraph(seed, n = 8, m = 40, allowDup = true)
      val expected = brute2Hop(g)
      assert(GraphPatterns.twoHopCountDegrees(df(g)).first().getLong(0) === expected,
        s"degree plan, seed=$seed")
      assert(GraphPatterns.twoHopCountJoin(df(g)).first().getLong(0) === expected,
        s"join plan, seed=$seed")
    }
  }

  test("property: triangle counter matches brute force; shuffle == broadcast") {
    for (seed <- 1 to 5) {
      val g = randomGraph(seed, n = 8, m = 40, allowDup = true)
      val expected = bruteTriangleCounter(g)
      val shuffle = GraphPatterns.triangleCounter(df(g)).first().getLong(0)
      val bcast = GraphPatterns
        .triangleCounter(df(g), broadcastClosing = true).first().getLong(0)
      assert(shuffle === expected, s"seed=$seed")
      assert(bcast === expected, s"seed=$seed")
    }
  }

  test("property: distinct-edge graphs have counter divisible by 3") {
    for (seed <- 10 to 13) {
      val g = randomGraph(seed, n = 10, m = 60, allowDup = false)
      val raw = GraphPatterns.triangleCounter(df(g)).first().getLong(0)
      assert(raw % 3 === 0, s"seed=$seed raw=$raw")
    }
  }

  test("property: edge_count is monotonic in MAX") {
    val g = randomGraph(42, n = 50, m = 200, allowDup = true)
    val counts = Seq(10L, 25L, 50L).map(m =>
      GraphPatterns.edgeCount(df(g), Some(m)).first().getLong(0))
    assert(counts === counts.sorted)
  }

  // ---- graph extensions ---------------------------------------------------

  def ranksOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphPatterns.pageRank(df(edges)).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank_millionths")).toMap

  test("pageRank: a 2-cycle is a fixpoint at exactly 1.0 per node") {
    // each node hands its whole rank to the other; 150000 + 850000·1.0
    // = 1000000 every round, in exact millionths
    assert(ranksOf(Seq((1L, 2L), (2L, 1L))) === Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("pageRank: star sinks converge to hand-computed millionths") {
    // 1→2 and 3→2; nodes 1,3 are pure sources (rank = teleport 150000
    // from round 1 on), node 2 settles at 150000 + 0.85·(2·150000) =
    // 405000 from round 2 on — all integer-exact
    assert(ranksOf(Seq((1L, 2L), (3L, 2L))) ===
      Map(1L -> 150000L, 2L -> 405000L, 3L -> 150000L))
  }

  test("pageRank: parallel edges carry mass in proportion to multiplicity") {
    // 1 sends 2/3 of its mass to 2 and 1/3 to 3 (integer div on the
    // weighted relation): round 1 contribs 666666 and 333333
    val r = ranksOf(Seq((1L, 2L), (1L, 2L), (1L, 3L)))
    assert(r(2L) > r(3L), s"multiplicity must rank 2 above 3: $r")
    assert(r(1L) === 150000L)
    // total mass never exceeds the initial endowment (dangling drops)
    assert(r.values.sum <= 3L * 1000000L)
  }

  test("pageRankConserving: equals the drop variant on dangling-free graphs") {
    // the golden sample graph has an out-edge on every node, so the
    // dangling mass D is 0 every round and the two spellings must agree
    // bit-for-bit; same for random graphs closed so every node emits
    val drop = ranksOf(sample)
    val cons = GraphPatterns.pageRankConserving(df(sample)).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank_millionths")).toMap
    assert(cons === drop)
    for (seed <- 1 to 3) {
      val g0 = randomGraph(seed, n = 8, m = 30, allowDup = true)
      val nodes = (g0.map(_._1) ++ g0.map(_._2)).distinct
      val srcs = g0.map(_._1).toSet
      // close the graph: every sink gets one out-edge back to the min node
      val g = g0 ++ nodes.filterNot(srcs).filterNot(_ == nodes.min)
        .map(v => (v, nodes.min))
      val d = ranksOf(g)
      val c = GraphPatterns.pageRankConserving(df(g)).collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank_millionths")).toMap
      assert(c === d, s"seed=$seed")
    }
  }

  test("pageRankConserving: golden 2-round hand computation on 1→2") {
    // node 2 is dangling (N=2). Round 1: contrib(2)=10⁶, D=10⁶,
    // dshare=500000 → r=(575000, 1425000). Round 2: contrib(2)=575000,
    // D=1425000, dshare=712500 → r=(755625, 1244375). Mass is exactly
    // conserved (2·10⁶) both rounds — no floor remainder on this fixture.
    val out = GraphPatterns.pageRankConserving(df(Seq((1L, 2L))), iters = 2)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank_millionths"))
      .toMap
    assert(out === Map(1L -> 755625L, 2L -> 1244375L))
    // the drop variant loses the dangling mass: strictly less total rank
    val dropTotal = GraphPatterns.pageRank(df(Seq((1L, 2L))), iters = 2)
      .agg(org.apache.spark.sql.functions.sum("rank_millionths"))
      .first().getLong(0)
    assert(dropTotal < 2000000L)
    // 5 rounds (the query-entry depth), verified against the DuckDB
    // oracle CTE chain AND an independent integer simulation
    val out5 = GraphPatterns.pageRankConserving(df(Seq((1L, 2L))))
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank_millionths"))
      .toMap
    assert(out5 === Map(1L -> 697617L, 2L -> 1302379L))
  }

  test("pageRankPersonalized: seeded 2-cycle golden; all-seeds equals base pageRank") {
    import org.apache.spark.sql.functions.col
    // 1⇄2 with seed {1}: mass oscillates from the seed — hand-unrolled
    // 5 rounds of r'(v) = [seed]·150000 + (850000·contrib) div 10⁶:
    // (150000, 850000) → (872500, 127500) → (258375, 741625)
    // → (780381, 219618) → (336675, 663323)
    val cyc = df(Seq((1L, 2L), (2L, 1L)))
    val seeds1 = cyc.select(col("src").as("node")).filter(col("node") === 1L)
    val out = GraphPatterns.pageRankPersonalized(cyc, seeds1)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank_millionths"))
      .toMap
    assert(out === Map(1L -> 336675L, 2L -> 663323L))
    // off-graph seeds are ignored: adding seed 99 changes nothing
    val seedsExtra = seeds1.union(
      cyc.sparkSession.range(99, 100).select(col("id").as("node")))
    val out2 = GraphPatterns.pageRankPersonalized(cyc, seedsExtra)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank_millionths"))
      .toMap
    assert(out2 === out)
    // with S = every node, the formula IS the base drop-variant pageRank
    val e = df(sample)
    val allSeeds = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
    val ppr = GraphPatterns.pageRankPersonalized(e, allSeeds)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank_millionths"))
      .toMap
    assert(ppr === ranksOf(sample))
  }

  test("mutualFollows: none in the sample; planted pair counted once; self-loop excluded") {
    assert(GraphPatterns.mutualFollows(df(sample)).first().getLong(0) === 0L)
    // (1,2)+(2,1) is ONE mutual pair (duplicate edge collapsed); the
    // (7,7) self-loop is its own reverse but never a pair
    val g = Seq((1L, 2L), (2L, 1L), (2L, 1L), (7L, 7L), (3L, 4L))
    assert(GraphPatterns.mutualFollows(df(g)).first().getLong(0) === 1L)
  }

  test("followSuggestions golden: common-middlemen pairs without a direct edge") {
    // hand-derived on the sample graph: (1,5) via {2,4}, (2,6) via
    // {3,5}, (3,4) via {1,6} are the only >= 2-middlemen open pairs
    val out = GraphPatterns.followSuggestions(df(sample))
      .collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("z")) ->
        r.getAs[Long]("common")).toMap
    assert(out === Map((1L, 5L) -> 2L, (2L, 6L) -> 2L, (3L, 4L) -> 2L))
    // minCommon = 1 widens the set but existing edges never suggest
    val all = GraphPatterns.followSuggestions(df(sample), minCommon = 1L)
      .collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("z"))).toSet
    assert(!all.contains((2L, 3L)) && !all.contains((5L, 6L)), "direct edges leaked")
    assert(all.contains((4L, 6L)) && all.contains((5L, 1L)))
  }

  test("triangleParticipation: per-middle histogram sums to the raw counter") {
    import org.apache.spark.sql.functions.sum
    // sample graph: triangles 1→2→3→1 and 4→5→6→4, one rotation per
    // middle — every node sits in the middle of exactly one closed path
    val out = GraphPatterns.triangleParticipation(df(sample))
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("triangle_count"))
      .toMap
    assert(out === (1L to 6L).map(_ -> 1L).toMap)
    // identity on random multigraphs: Σ participation = raw ×3 counter
    for (seed <- 1 to 3) {
      val g = randomGraph(seed, n = 8, m = 40, allowDup = true)
      val total = GraphPatterns.triangleParticipation(df(g))
        .agg(sum("triangle_count")).first().getLong(0)
      assert(total === GraphPatterns.triangleCounter(df(g)).first().getLong(0),
        s"seed=$seed")
    }
  }

  test("graphSummary golden: counts, loops, reciprocity, degree maxima") {
    val row = GraphPatterns.graphSummary(
      df(Seq((1L, 2L), (1L, 2L), (2L, 1L), (3L, 3L)))).first()
    assert(row.getAs[Long]("n_nodes") === 3L)
    assert(row.getAs[Long]("n_edges") === 4L)
    assert(row.getAs[Long]("n_distinct_edges") === 3L)
    assert(row.getAs[Long]("n_self_loops") === 1L)
    assert(row.getAs[Long]("mutual_pairs") === 1L)
    assert(row.getAs[Long]("max_in_deg") === 2L)  // node 2 via the dup edge
    assert(row.getAs[Long]("max_out_deg") === 2L) // node 1 via the dup edge
  }

  test("connectedComponents: two components and direction-blindness") {
    val out = GraphPatterns.connectedComponents(
        df(Seq((2L, 1L), (2L, 3L), (11L, 10L))))
      .collect().map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("component_id"), r.getAs[Boolean]("is_root"))).toMap
    assert(out === Map(
      1L -> (1L, true), 2L -> (1L, false), 3L -> (1L, false),
      10L -> (10L, true), 11L -> (10L, false)))
  }

  test("SCC goldens: path, cycle, bridged cycles, self-loop, pivot-outside-SCC round") {
    def scc(es: Seq[(Long, Long)]): Map[Long, (Long, Boolean)] =
      GraphPatterns.stronglyConnectedComponents(df(es))
        .collect().map(r => r.getAs[Long]("node") ->
          ((r.getAs[Long]("scc_id"), r.getAs[Boolean]("is_root")))).toMap
    // a path is all singletons
    assert(scc(Seq((1L, 2L), (2L, 3L))) ===
      Map(1L -> ((1L, true)), 2L -> ((2L, true)), 3L -> ((3L, true))))
    // a cycle is one SCC rooted at its min
    assert(scc(Seq((1L, 2L), (2L, 3L), (3L, 1L))) ===
      Map(1L -> ((1L, true)), 2L -> ((1L, false)), 3L -> ((1L, false))))
    // two 2-cycles joined by a one-way bridge stay separate SCCs
    assert(scc(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 3L))) ===
      Map(1L -> ((1L, true)), 2L -> ((1L, false)),
        3L -> ((3L, true)), 4L -> ((3L, false))))
    // a self-loop node is a singleton; duplicate edges are harmless
    assert(scc(Seq((7L, 7L), (7L, 7L))) === Map(7L -> ((7L, true))))
    // pivot OUTSIDE the SCC: 0 colors {0,5,6} but only {0} extracts in
    // round 1; {5,6} must still come out as one SCC in round 2
    assert(scc(Seq((0L, 5L), (5L, 6L), (6L, 5L))) ===
      Map(0L -> ((0L, true)), 5L -> ((5L, true)), 6L -> ((5L, false))))
  }

  test("property: SCCs refine the weak components; mutual follows share an SCC") {
    val rnd = new scala.util.Random(83)
    val es = Seq.fill(60)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
    val scc = GraphPatterns.stronglyConnectedComponents(df(es))
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("scc_id")).toMap
    val cc = GraphPatterns.connectedComponents(df(es))
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("component_id")).toMap
    // same SCC ⇒ same weak component (refinement)
    for ((a, sa) <- scc; (b, sb) <- scc if sa == sb)
      assert(cc(a) === cc(b), s"$a,$b share an SCC but not a component")
    // scc_id is a member of its own class, and the class min
    scc.groupBy(_._2).foreach { case (id, members) =>
      assert(members.keySet.min === id)
    }
    // both directed edges present ⇒ same SCC
    val eset = es.toSet
    for ((a, b) <- eset if a != b && eset((b, a)))
      assert(scc(a) === scc(b), s"mutual pair ($a,$b) split across SCCs")
    // brute-force ground truth: mutual reachability closure
    def closure(edges: Set[(Long, Long)]): Set[(Long, Long)] = {
      var r = edges
      var grown = true
      while (grown) {
        val next = r ++ (for ((a, b) <- r; (c, d) <- r if b == c) yield (a, d))
        grown = next.size > r.size; r = next
      }
      r
    }
    val reach = closure(eset.filter(e => e._1 != e._2))
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSet
    val truth = nodes.map { v =>
      val mutual = nodes.filter(u => reach(v -> u) && reach(u -> v))
      v -> (mutual + v).min
    }.toMap
    assert(scc === truth)
  }

  test("degreeReport: multiplicities vs distinct neighbors, zero-filled sides") {
    val out = GraphPatterns.degreeReport(
        df(Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 3L))))
      .collect().map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("in_deg"), r.getAs[Long]("out_deg"),
          r.getAs[Long]("in_nbrs"), r.getAs[Long]("out_nbrs"))).toMap
    assert(out(1L) === ((0L, 3L, 0L, 2L)))
    assert(out(2L) === ((2L, 1L, 1L, 1L)))
    assert(out(3L) === ((2L, 0L, 2L, 0L)))
  }

  test("degreeReport ties to the 2-hop degree identity on the golden graph") {
    import org.apache.spark.sql.functions.{col, sum}
    val viaReport = GraphPatterns.degreeReport(df(sample))
      .agg(sum(col("in_deg") * col("out_deg"))).first().getLong(0)
    assert(viaReport === 16L)
  }

  def hitsOf(edges: Seq[(Long, Long)], iters: Int = GraphPatterns.HitsIters)
      : Map[Long, (Long, Long)] =
    GraphPatterns.hitsScores(df(edges), iters).collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("auth_millionths"), r.getAs[Long]("hub_millionths"))).toMap

  test("hitsScores: star separates the hub from the authorities exactly") {
    // 0→1,0→2,0→3: leaves are pure authorities (a=10⁶ after max-norm),
    // 0 the pure hub (h=10⁶); cross-scores are exactly 0 — a fixpoint
    // from round 1, so any iteration depth gives the same answer
    val out = hitsOf(Seq((0L, 1L), (0L, 2L), (0L, 3L)))
    assert(out(0L) === ((0L, 1000000L)))
    assert(out(1L) === ((1000000L, 0L)))
    assert(out(2L) === ((1000000L, 0L)))
    assert(out(3L) === ((1000000L, 0L)))
  }

  test("hitsScores: a 2-cycle is uniform at the max (both roles)") {
    // each node is the other's only hub and only authority; max-norm
    // pins every score to exactly 10⁶ every round
    val out = hitsOf(Seq((1L, 2L), (2L, 1L)))
    assert(out === Map(1L -> ((1000000L, 1000000L)),
      2L -> ((1000000L, 1000000L))))
  }

  test("hitsScores: parallel edges weight authority by multiplicity") {
    // 0→1 twice, 0→2 once: a_raw = (2·10⁶, 10⁶) → after max-norm
    // a(1)=10⁶, a(2)=500000, stable across rounds; 0 is the only hub
    val out = hitsOf(Seq((0L, 1L), (0L, 1L), (0L, 2L)))
    assert(out(1L) === ((1000000L, 0L)))
    assert(out(2L) === ((500000L, 0L)))
    assert(out(0L) === ((0L, 1000000L)))
  }

  test("kCore golden: the sample graph IS its own 3-core; 4-core is empty") {
    // undirected distinct degrees on the sample: 1,2,4,6 → 3; 3,5 → 4 —
    // nothing peels at k=3 and the in-core degrees are the degrees
    val out = GraphPatterns.kCore(df(sample)).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("core_deg")).toMap
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 4L, 4L -> 3L, 5L -> 4L, 6L -> 3L))
    // k=4: only 3 and 5 survive round 1, their mutual degree-1 edge dies
    // in round 2, and the core is empty
    assert(GraphPatterns.kCore(df(sample), k = 4L).count() === 0L)
  }

  test("kCore: the round budget has converged (one more round is a no-op)") {
    for (seed <- 1 to 3) {
      val g = randomGraph(seed, n = 20, m = 60, allowDup = true)
      val at8 = GraphPatterns.kCore(df(g)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val at9 = GraphPatterns.kCore(df(g), rounds = 9).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(at8 === at9, s"seed=$seed")
    }
  }

  test("followerJaccard golden: shared-follower pairs on the sample graph") {
    // follower sets: 1←{3} 2←{1} 3←{2,5} 4←{1,6} 5←{4,2} 6←{5,3};
    // single-follower overlaps only, so minCommon=1 exposes them and the
    // default (2) returns nothing
    val out = GraphPatterns.followerJaccard(df(sample), minCommon = 1L)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        (r.getAs[Long]("common"), r.getAs[Long]("deg_a"),
          r.getAs[Long]("deg_b"), r.getAs[Long]("jaccard_millionths"))).toMap
    assert(out === Map(
      (2L, 4L) -> ((1L, 1L, 2L, 500000L)),
      (1L, 6L) -> ((1L, 1L, 2L, 500000L)),
      (3L, 5L) -> ((1L, 2L, 2L, 333333L)),
      (3L, 6L) -> ((1L, 2L, 2L, 333333L))))
    assert(GraphPatterns.followerJaccard(df(sample)).count() === 0L)
  }

  test("followerJaccardCapped ≡ followerJaccard when no follower exceeds the cap") {
    // sample's max distinct out-degree is 2; a cap of 3 excludes
    // nobody, so capped must equal exact plus the constant
    // cap_applied column.
    val exact = GraphPatterns.followerJaccard(df(sample), minCommon = 1L)
      .collect().map(_.toSeq).toSet
    val capped = GraphPatterns.followerJaccardCapped(
        df(sample), minCommon = 1L, cap = 3L)
      .collect().map(_.toSeq).toSet
    assert(capped.map(_.dropRight(1)) === exact)
    assert(capped.forall(_.last === 3L))
  }

  test("followerJaccardCapped golden: a super-spreader follower is excluded") {
    // follower 1 follows 2,3,4 (out-degree 3 > cap 2) and is the ONLY
    // common follower of (2,3): with cap=2 the pair disappears and the
    // surviving degrees count sub-cap followers only.
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 2L), (5L, 3L), (6L, 2L))
    val exact = GraphPatterns.followerJaccard(df(g), minCommon = 1L)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        (r.getAs[Long]("common"), r.getAs[Long]("deg_a"),
          r.getAs[Long]("deg_b"), r.getAs[Long]("jaccard_millionths"))).toMap
    // exact: (2,3) common {1,5}, (2,4)/(3,4) common {1}
    assert(exact((2L, 3L)) === ((2L, 3L, 2L, 666666L)))
    assert(exact.contains((2L, 4L)) && exact.contains((3L, 4L)))
    val capped = GraphPatterns.followerJaccardCapped(df(g), minCommon = 1L, cap = 2L)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        (r.getAs[Long]("common"), r.getAs[Long]("deg_a"),
          r.getAs[Long]("deg_b"), r.getAs[Long]("jaccard_millionths"))).toMap
    // follower 1 gone: only 5 (out-degree 2) and 6 (1) pair; (2,3)
    // keeps common {5}; capped degrees: 2←{5,6}=2, 3←{5}=1
    assert(capped === Map((2L, 3L) -> ((1L, 2L, 1L, 500000L))))
  }

  test("followerJaccard: duplicate follows don't inflate overlap") {
    val once = GraphPatterns.followerJaccard(
      df(Seq((1L, 2L), (1L, 3L))), minCommon = 1L).collect()
    val duped = GraphPatterns.followerJaccard(
      df(Seq((1L, 2L), (1L, 2L), (1L, 3L), (1L, 3L))), minCommon = 1L).collect()
    assert(once.map(_.toSeq).toSet === duped.map(_.toSeq).toSet)
    assert(once.head.getAs[Long]("jaccard_millionths") === 1000000L)
  }

  test("degreeHistogram golden: power-of-two bands on the sample graph") {
    // total multiplicity degrees: nodes 1,2,4,6 → 3 (band 2); 3,5 → 4
    // (band 4)
    val out = GraphPatterns.degreeHistogram(df(sample)).collect()
      .map(r => r.getAs[Long]("band_lo") -> r.getAs[Long]("n_nodes")).toMap
    assert(out === Map(2L -> 4L, 4L -> 2L))
  }

  test("degreeHistogram: band totals cover every node exactly once") {
    import org.apache.spark.sql.functions.sum
    for (seed <- 1 to 3) {
      val g = randomGraph(seed, n = 30, m = 120, allowDup = true)
      val total = GraphPatterns.degreeHistogram(df(g))
        .agg(sum("n_nodes")).first().getLong(0)
      val nodes = (g.map(_._1) ++ g.map(_._2)).distinct.size.toLong
      assert(total === nodes, s"seed=$seed")
    }
  }

  def communitiesOf(edges: Seq[(Long, Long)],
      rounds: Int = GraphPatterns.LpaRounds): Map[Long, Long] =
    GraphPatterns.labelCommunities(df(edges), rounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** All directed edges of a clique over `ids` (one direction per pair —
    * LPA is direction-blind, so one suffices). */
  def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for (a <- ids; b <- ids if a < b) yield (a, b)

  test("labelCommunities golden: two bridged 4-cliques split at the bridge") {
    // hand-unrolled: clique {1..4} converges to label 1 by round 2;
    // clique {5..8} flirts with the bridge label (node 5 ties to 4 in
    // round 1) but its triangle majority pulls it back to 5 by round 2;
    // both stable thereafter — one community per clique, bridge intact
    val g = clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(5L, 6L, 7L, 8L)) :+
      ((4L, 5L))
    val out = communitiesOf(g)
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L))
  }

  test("labelCommunities: multiplicity outvotes degree; self-loops ignored") {
    // node 3's single neighbor-by-distinct-edge count ties 1 vs 2, but
    // the doubled edge to 2 carries weight 2 — multiplicity decides
    val g = Seq((1L, 3L), (2L, 3L), (2L, 3L), (3L, 3L))
    val out = communitiesOf(g, rounds = 1)
    assert(out(3L) === 2L)
  }

  test("labelCommunities: the documented synchronous oscillation on a bare edge") {
    // an isolated edge swaps labels every round (the synchronous-LPA
    // artifact the docstring documents): even rounds return identity,
    // odd rounds the swap — deterministic either way, which is the
    // contract; any triangle breaks the symmetry
    assert(communitiesOf(Seq((1L, 2L)), rounds = 4) === Map(1L -> 1L, 2L -> 2L))
    assert(communitiesOf(Seq((1L, 2L)), rounds = 3) === Map(1L -> 2L, 2L -> 1L))
    assert(communitiesOf(clique(Seq(1L, 2L, 3L)), rounds = 4) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("labelCommunities: disconnected cliques never share a label") {
    val g = clique(Seq(1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L))
    val out = communitiesOf(g)
    assert(Set(out(1L), out(2L), out(3L)).size === 1)
    assert(Set(out(10L), out(11L), out(12L)).size === 1)
    assert(out(1L) !== out(10L))
  }

  def distancesOf(edges: Seq[(Long, Long)], seeds: Seq[Long],
      rounds: Int = GraphPatterns.BfsRounds): Map[Long, Long] = {
    import spark.implicits._
    GraphPatterns.graphDistances(df(edges), seeds.toDF("node"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("graphDistances golden: directed chain, unreached absent") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 1L))
    // from {1}: forward hops only — 9 is upstream and must be absent
    assert(distancesOf(chain, Seq(1L)) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // from the sink {4}: nothing reachable but itself
    assert(distancesOf(chain, Seq(4L)) === Map(4L -> 0L))
    // multi-source: the min over seeds wins per node
    assert(distancesOf(chain, Seq(9L, 3L)) ===
      Map(9L -> 0L, 3L -> 0L, 1L -> 1L, 2L -> 2L, 4L -> 1L))
  }

  test("graphDistances: multiplicity can't shorten paths; off-graph seeds ignored") {
    val g = Seq((1L, 2L), (1L, 2L), (1L, 2L), (2L, 3L))
    assert(distancesOf(g, Seq(1L, 777L)) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("graphDistances: the hop budget has converged on the sample graph") {
    // sample diameter < 6, so round 7 changes nothing
    val at6 = distancesOf(sample, Seq(1L))
    val at7 = distancesOf(sample, Seq(1L), rounds = 7)
    assert(at6 === at7)
    assert(at6.values.max <= 6L)
  }

  test("nodeReciprocity golden: rates, zero-fill, and the mutual-census identity") {
    // 1↔2 mutual; 1→3 unreturned; 3→3 self-loop (excluded); 4→1
    // unreturned: out_nbrs (1: {2,3}, 2: {1}, 3: ∅ after loop drop,
    // 4: {1})
    val g = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 3L), (4L, 1L))
    val out = GraphPatterns.nodeReciprocity(df(g)).collect()
      .map(r => r.getAs[Long]("node") -> (r.getAs[Long]("out_nbrs"),
        r.getAs[Long]("mutual_nbrs"), r.getAs[Long]("reciprocity_millionths")))
      .toMap
    assert(out === Map(
      1L -> ((2L, 1L, 500000L)),
      2L -> ((1L, 1L, 1000000L)),
      4L -> ((1L, 0L, 0L))))
    // Σ mutual_nbrs = 2 · mutual_pairs (each unordered pair counted
    // from both ends), on the golden and on random multigraphs
    for (seed <- 1 to 3) {
      val rg = randomGraph(seed, n = 12, m = 60, allowDup = true)
      val sumMutual = GraphPatterns.nodeReciprocity(df(rg))
        .agg(org.apache.spark.sql.functions.sum("mutual_nbrs"))
        .first().getLong(0)
      val pairs = GraphPatterns.mutualFollows(df(rg)).first().getLong(0)
      assert(sumMutual === 2L * pairs, s"seed=$seed")
    }
  }

  test("degreeMixing golden: star puts every follow in the (hub-out, leaf-in) cell") {
    // 0→1,0→2,0→3: follower out-deg 3 (band 2) on every edge, followed
    // in-deg 1 (band 1) — one cell, three observations
    val out = GraphPatterns.degreeMixing(df(Seq((0L, 1L), (0L, 2L), (0L, 3L))))
      .collect().map(r => (r.getAs[Long]("src_out_band"),
        r.getAs[Long]("dst_in_band")) -> r.getAs[Long]("n_edges")).toMap
    assert(out === Map((2L, 1L) -> 3L))
  }

  test("degreeMixing: cell totals cover every edge exactly once") {
    import org.apache.spark.sql.functions.sum
    for (seed <- 1 to 3) {
      val g = randomGraph(seed, n = 20, m = 80, allowDup = true)
      val total = GraphPatterns.degreeMixing(df(g))
        .agg(sum("n_edges")).first().getLong(0)
      assert(total === g.size.toLong, s"seed=$seed")
    }
  }

  /** Exact r-hop reach closure (self included) by repeated squaring-free
    * BFS — the brute-force twin of [[GraphPatterns.reachEstimate]]. */
  def exactReach(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val adj = edges.distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map { v =>
      var reach = Set(v)
      for (_ <- 1 to rounds)
        reach = reach ++ reach.flatMap(w => adj.getOrElse(w, Set.empty))
      v -> reach.size.toLong
    }.toMap
  }

  def reachMap(g: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    GraphPatterns.reachEstimate(df(g), rounds).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("est_reach")).toMap

  test("reachEstimate golden: path, cycle, star (sparse regime is exact)") {
    // path a→b→c→d at r=3: 4,3,2,1
    assert(reachMap(Seq((1L, 2L), (2L, 3L), (3L, 4L)), 3) ===
      Map(1L -> 4L, 2L -> 3L, 3L -> 2L, 4L -> 1L))
    // same path at r=1: 2,2,2,1
    assert(reachMap(Seq((1L, 2L), (2L, 3L), (3L, 4L)), 1) ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
    // 3-cycle saturates at the whole cycle by r=2
    assert(reachMap(Seq((1L, 2L), (2L, 3L), (3L, 1L)), 2) ===
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L))
    // star hub → 5 leaves, duplicate edges don't inflate the estimate
    val star = (2L to 6L).map(l => (1L, l)) ++ Seq((1L, 2L), (1L, 2L))
    assert(reachMap(star, 2) ===
      ((2L to 6L).map(_ -> 1L).toMap + (1L -> 6L)))
  }

  test("property: reachEstimate = exact BFS closure on random digraphs (sparse)") {
    for (seed <- 1 to 3; rounds <- Seq(1, 3)) {
      val g = randomGraph(seed, n = 25, m = 100, allowDup = true)
      assert(reachMap(g, rounds) === exactReach(g, rounds),
        s"seed=$seed rounds=$rounds")
    }
  }

  test("widestPaths golden: bottleneck narrows along the chain, seeds NULL, unreached absent") {
    import org.apache.spark.sql.functions.col
    // 1→2 ×3, 2→3 ×1, 3→4 ×5; seed {1} (plus isolated 10→11 unreached)
    val edges = df(Seq.fill(3)((1L, 2L)) ++ Seq((2L, 3L)) ++
      Seq.fill(5)((3L, 4L)) ++ Seq((10L, 11L)))
    val m = GraphPatterns.widestPaths(edges,
        df(Seq((1L, 1L))).select(col("src").as("node")))
      .collect().map(r => r.getAs[Long]("node") ->
        Option(r.getAs[java.lang.Long]("bottleneck"))).toMap
    assert(m(1L) === None)               // seed: no bottleneck to itself
    assert(m(2L) === Some(3L))
    assert(m(3L) === Some(1L))           // min(3, 1)
    assert(m(4L) === Some(1L))           // min(1, 5)
    assert(!m.contains(10L) && !m.contains(11L), "unreached must be absent")
  }

  test("widestPaths: a longer wider route beats a shorter narrow one (re-relaxation)") {
    import org.apache.spark.sql.functions.col
    // 1→4 direct ×1 vs 1→2→3→4 all ×7: the 3-hop route carries 7
    val edges = df(Seq((1L, 4L)) ++
      Seq.fill(7)((1L, 2L)) ++ Seq.fill(7)((2L, 3L)) ++ Seq.fill(7)((3L, 4L)))
    val m = GraphPatterns.widestPaths(edges,
        df(Seq((1L, 1L))).select(col("src").as("node")))
      .collect().map(r => r.getAs[Long]("node") ->
        Option(r.getAs[java.lang.Long]("bottleneck"))).toMap
    assert(m(4L) === Some(7L))
    // with rounds = 1 only the direct edge is visible
    val one = GraphPatterns.widestPaths(edges,
        df(Seq((1L, 1L))).select(col("src").as("node")), rounds = 1)
      .collect().map(r => r.getAs[Long]("node") ->
        Option(r.getAs[java.lang.Long]("bottleneck"))).toMap
    assert(one(4L) === Some(1L))
  }

  test("neighborhoodFunction: exact ANF curve on the path graph, monotone everywhere") {
    // path 1→2→3→4: N(0)=4, N(1)=4+3=7, N(2)=9, N(3)=10 (saturated)
    val curve = GraphPatterns.neighborhoodFunction(
        df(Seq((1L, 2L), (2L, 3L), (3L, 4L))), rounds = 3)
      .collect().map(r => r.getAs[Long]("hops") -> r.getAs[Long]("est_pairs"))
      .toMap
    assert(curve === Map(0L -> 4L, 1L -> 7L, 2L -> 9L, 3L -> 10L))
    // monotone nondecreasing on a random digraph (register max-folds)
    for (seed <- 1 to 2) {
      val c = GraphPatterns.neighborhoodFunction(
          df(randomGraph(seed, n = 25, m = 100, allowDup = true)), rounds = 4)
        .collect().map(r => (r.getAs[Long]("hops"), r.getAs[Long]("est_pairs")))
        .sortBy(_._1).map(_._2)
      assert(c.zip(c.tail).forall { case (a, b) => a <= b }, s"seed=$seed: $c")
    }
  }
}
