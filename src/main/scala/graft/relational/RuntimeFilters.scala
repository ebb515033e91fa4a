package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Bloom-filter runtime pre-filtering — the join-pruning primitive a
  * 100 TB fact-table join lives by, as a first-class operator plus its
  * oracle-gated acceptance audit (the occupancy-family discipline: the
  * engine PREDICTS and MEASURES a filter's worth before anyone trusts
  * it).
  *
  * The production shape: a selective predicate lands on the dimension
  * side (build) of a join; instead of shuffling the full fact side
  * (probe), the build side's join keys are folded into a Bloom filter —
  * here [[NumBits]] bit positions set by [[NumHashes]] portable hashes —
  * and the probe side drops every row whose key misses ANY position,
  * map-side, before the shuffle. No false negatives (every true match
  * passes — the Bloom guarantee); false positives cost only wasted
  * probe rows, quantified by [[bloomAudit]].
  *
  * Engine-portability: the bitmap is modeled as the DISTINCT SET of set
  * positions (≤ [[NumBits]] rows — identical information to the bitmap),
  * and membership as k broadcast LEFT SEMI equi-joins on the position —
  * all map-side on the probe, zero probe-side exchange (plan-asserted
  * in RuntimeFiltersSpec). The hashes are the pure-arithmetic
  * [[PortableHash.permHash]] family, bit-identical in DuckDB, so the
  * audit's pass/false-positive counts are hash-exact cross-engine —
  * unlike Spark's native `bloom_filter_agg`/murmur runtime filters,
  * which no oracle can reproduce.
  *
  * Scale shape: build scan + tiny distinct (≤ NumBits rows, broadcast);
  * probe scan stays ONE pass with k in-memory hash probes per row, no
  * shuffle added. Sizing is the standard Bloom calculus (k=3,
  * m=65536: ~0.2% FPR at 3k keys, degrading to ~40% by 30k keys — the
  * audit is exactly the tool that catches an undersized filter; a
  * production build picks m from the build-side count the same way the
  * LSH families pick band width). */
object RuntimeFilters {

  val NumHashes = 3
  val NumBits = 65536L

  /** Hash parameters, seed-split from the minhash (42) and hyperplane
    * (7) families so the three portable-hash streams are independent. */
  val hashParams: Seq[(Long, Long)] =
    PortableHash.minhashPerms(NumHashes, seed = 13L)

  private def posOf(key: org.apache.spark.sql.Column, i: Int) = {
    val (a, b) = hashParams(i)
    PortableHash.permHash(key, a, b) % NumBits
  }

  private def posOfSql(key: String, i: Int): String = {
    val (a, b) = hashParams(i)
    s"(${PortableHash.permHashSql(key, a, b)} % $NumBits)"
  }

  /** `(pos)` — the Bloom filter of `build`'s `key` column as the
    * distinct set of set bit positions (≤ [[NumBits]] rows). This tiny
    * relation is what a deployment persists/broadcasts per join. */
  def bloomBuild(build: DataFrame, key: String): DataFrame =
    build.select(explode(array((0 until NumHashes)
        .map(i => posOf(col(key), i)): _*)).as("pos"))
      .distinct()

  /** The probe rows surviving the filter: k broadcast LEFT SEMI joins,
    * one per hash — each is a map-side BroadcastHashJoin, so the probe
    * side flows through with ZERO added exchange (the plan property the
    * spec pins). A row passes iff ALL k of its positions are set. */
  def bloomPrefilter(probe: DataFrame, key: String, bits: DataFrame): DataFrame =
    (0 until NumHashes).foldLeft(probe) { (df, i) =>
      df.join(broadcast(bits), posOf(col(key), i) === bits("pos"), "left_semi")
    }

  /** The acceptance audit, one row: over the urgent-orders → lineitem
    * shape, how many probe rows exist, how many pass the Bloom filter,
    * how many truly match, and the false-positive overshoot — with the
    * pass share and the classic FPR (false positives over true
    * negatives) in exact millionths. ONE probe scan: the three position
    * joins and the exact-key join all attach as broadcast LEFT OUTER
    * flags (build side ≤ |build keys|), then a single partial
    * aggregate. `n_false_pos` rows are pure wasted shuffle in the real
    * join — the number this report exists to bound. */
  def bloomAudit(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val bkeys = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("bkey")).distinct()
    auditOver(bkeys, lineitem, bloomBuild(bkeys, "bkey"))
  }

  /** The audit body shared by [[bloomAudit]] and [[bloomSizedAudit]]
    * (one definition — the two reports must never drift): probe rows
    * flagged by the k position joins + the exact-key join, one partial
    * aggregate, exact-millionths rates. */
  private def auditOver(bkeys: DataFrame, lineitem: DataFrame,
      bits: DataFrame): DataFrame = {
    val flagged = (0 until NumHashes).foldLeft(
        lineitem.select(col("l_orderkey"))) { (df, i) =>
        df.join(broadcast(bits.select(col("pos").as(s"pos$i"))),
          posOf(col("l_orderkey"), i) === col(s"pos$i"), "left_outer")
      }
      .join(broadcast(bkeys), col("l_orderkey") === col("bkey"), "left_outer")
      .select(
        (0 until NumHashes).map(i => col(s"pos$i").isNotNull)
          .reduce(_ && _).as("pass"),
        col("bkey").isNotNull.as("is_match"))
    flagged.agg(
        count(lit(1)).as("n_probe"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"),
        sum(when(col("is_match"), 1L).otherwise(0L)).as("n_match"),
        sum(when(col("pass") && !col("is_match"), 1L).otherwise(0L))
          .as("n_false_pos"))
      .select(col("n_probe"), col("n_pass"), col("n_match"), col("n_false_pos"),
        expr("(n_pass * 1000000L) div n_probe").as("pass_millionths"),
        expr("CASE WHEN n_probe = n_match THEN 0L ELSE (n_false_pos * 1000000L) div (n_probe - n_match) END")
          .as("fpr_millionths"))
  }

  /** The SQL half of the shared audit body — the flagged/agg/rates
    * chain over CTEs `bkeys` and `bits`. */
  private def auditTailSql: String = {
    val joins = (0 until NumHashes)
      .map(i => s"LEFT JOIN bits b$i ON ${posOfSql("p.l_orderkey", i)} = b$i.pos")
      .mkString("\n  ")
    val passExpr = (0 until NumHashes)
      .map(i => s"b$i.pos IS NOT NULL").mkString(" AND ")
    s"""flagged AS (
       |  SELECT ($passExpr) AS pass, (bk.bkey IS NOT NULL) AS is_match
       |  FROM lineitem p
       |  $joins
       |  LEFT JOIN bkeys bk ON p.l_orderkey = bk.bkey
       |),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_probe,
       |    CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       |    CAST(sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
       |    CAST(sum(CASE WHEN pass AND NOT is_match THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
       |  FROM flagged
       |)
       |SELECT n_probe, n_pass, n_match, n_false_pos,
       |  CAST((n_pass * 1000000) // n_probe AS BIGINT) AS pass_millionths,
       |  CAST(CASE WHEN n_probe = n_match THEN 0
       |    ELSE (n_false_pos * 1000000) // (n_probe - n_match) END AS BIGINT)
       |    AS fpr_millionths
       |FROM agg""".stripMargin
  }

  /** Occupancy ceiling for [[routedBits]], in millionths of
    * [[NumBits]]: a Bloom filter past ~50% occupancy passes most probe
    * rows ((occupancy)^k ≈ 12% FPR at k = 3 and climbing fast), so the
    * per-row probe cost stops buying shuffle reduction. */
  val MaxOccupancyMillionths: Long = 500000L

  /** AUDIT-DRIVEN Bloom routing — the [[graft.relational.SkewJoin]]
    * `salted_auto` discipline applied to the runtime-filter loop:
    * nobody decides whether the prefilter applies; the FILTER'S OWN
    * occupancy does. The decision lives entirely on the tiny build
    * side: when occupancy stays under the ceiling, the routed relation
    * IS the bit set (the prefilter prunes); when the filter is
    * saturated, the routed relation becomes the FULL position domain,
    * and the same probe plan passes every row (each position is
    * present). One static plan, the decision as DATA — the salted dim
    * replication trick — so the 100 TB probe side never pays a scalar
    * attach, never re-plans, and never risks the constant-key
    * BroadcastNestedLoopJoin.
    *
    * Cost note: the disabled path still pays k broadcast hash probes
    * per row (constant, map-side). A cost-based planner would drop the
    * operator entirely; this spelling keeps the decision inside the
    * declarative plan, which is what makes it self-serve — and the
    * bits relation is ≤ [[NumBits]] rows in EITHER branch, always a
    * broadcast. */
  def routedBits(bits: DataFrame,
      maxOccupancyMillionths: Long = MaxOccupancyMillionths): DataFrame = {
    // bits is ≤ NumBits rows — checkpointing it is free at any corpus
    // scale, and it makes `k` real on both sides (the mixPlan idiom)
    val b = bits.withColumn("k", lit(1)).localCheckpoint()
    val verdict = b.groupBy("k").agg(count(lit(1)).as("n_set"))
      .select(col("k"),
        (expr(s"(n_set * 1000000L) div $NumBits") < maxOccupancyMillionths)
          .as("enabled"))
      .localCheckpoint()
    b.join(broadcast(verdict), Seq("k"))
      .filter(col("enabled")).select(col("pos"))
      .unionByName(verdict.filter(!col("enabled"))
        .select(explode(sequence(lit(0L), lit(NumBits - 1))).as("pos")))
  }

  /** Bits a sized filter grants each build key — the classic Bloom
    * calculus at k = 3: 16 bits/key puts per-hash occupancy ≤ 3/16,
    * FPR ≈ (3n/m)³ ≈ 0.7% — before the power-of-two rounding buys
    * more.
    *
    * Why `m` is data but `k` stays static: each hash is one physical
    * semi-join in the probe plan, so a data-driven k would change the
    * PLAN — exactly what the decision-as-data discipline exists to
    * avoid on the 100 TB probe side. The textbook optimum k = ln2·m/n
    * ≈ 11 at 16 bits/key buys FPR the sized m already bounds, at 8
    * more per-row probes; k = 3 is the deliberate cheap-probe point,
    * and the sizing ladder (not k) absorbs build-count variance. */
  val BitsPerKey: Long = 16L

  /** Smallest ladder rung — below this the filter is cheaper than the
    * rows it could ever prune. Must divide [[NumBits]] (both are
    * powers of two), which is what makes the lift exact. */
  val MinSizedBits: Long = 64L

  /** The sizing ladder, ONE definition per engine (consumed by
    * [[bloomSizeVerdict]] AND [[sizedBits]]' inline verdict — a drift
    * between the reported m and the built m would be invisible until
    * the audit oracle diverged): next power of two ≥ BitsPerKey·n,
    * clamped to [MinSizedBits, NumBits], with the n = 0 guard spelled
    * explicitly (bin(-1) is a 64-digit two's-complement string in
    * Spark and engine-defined in DuckDB — the guard keeps the empty
    * build on the floor rung in BOTH, instead of on that seam). */
  private def sizeLadderSpark(n: String): String =
    s"CASE WHEN ($n) = 0 THEN ${MinSizedBits}L ELSE " +
      s"least(${NumBits}L, greatest(${MinSizedBits}L, " +
      s"shiftleft(1L, CAST(length(bin($BitsPerKey * ($n) - 1)) AS INT)))) END"

  private def sizeLadderDuck(n: String): String =
    s"CASE WHEN ($n) = 0 THEN $MinSizedBits ELSE " +
      s"least($NumBits, greatest($MinSizedBits, " +
      s"(1::BIGINT << length(bin($BitsPerKey * ($n) - 1))))) END"

  /** DATA-DRIVEN filter sizing, one row ALWAYS (a global aggregate —
    * an empty build side reports n_keys = 0 on the floor rung, exactly
    * as the oracle's global aggregate does): the build side's distinct
    * key count and the chosen filter width `m` — the next power of two
    * ≥ [[BitsPerKey]]·n_keys, clamped to [[MinSizedBits]]..[[NumBits]]
    * (the degree-histogram CASE discipline: an exact integer ladder,
    * `⌈log2⌉` via the binary digit count, no floats to disagree
    * across engines). The verdict is the sizing decision AS DATA —
    * [[sizedBits]] joins it back onto the tiny build side, so the
    * probe plan never sees `m`. */
  def bloomSizeVerdict(build: DataFrame, key: String): DataFrame =
    keyedBuild(build, key)
      .agg(count(lit(1)).as("n_keys"))
      .select(col("n_keys"),
        expr(sizeLadderSpark("n_keys")).as("m"))

  /** Oracle twin of [[bloomSizeVerdict]] over the urgent-orders build
    * side — same digit-count ladder, bit-identical. */
  def bloomSizeVerdictSql: String =
    s"""WITH bkeys AS (
       |  SELECT DISTINCT o_orderkey FROM orders
       |  WHERE o_orderpriority = '1-URGENT'
       |), nk AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_keys FROM bkeys
       |)
       |SELECT n_keys,
       |  CAST(${sizeLadderDuck("n_keys")} AS BIGINT) AS m
       |FROM nk""".stripMargin

  private def keyedBuild(build: DataFrame, key: String): DataFrame =
    build.select(col(key).as("bkey")).distinct()
      .withColumn("k", lit(1)).localCheckpoint()

  /** SIZED Bloom build: positions are taken mod the DATA-CHOSEN `m`
    * ([[bloomSizeVerdict]]) and then LIFTED into the static
    * [[NumBits]] domain — position p at width m becomes every q in
    * [0, NumBits) with q ≡ p (mod m), which is exactly the coarse
    * filter's information re-expressed so that the probe side keeps
    * ONE static plan (`hash % NumBits`, the same probe
    * [[bloomPrefilter]] always ran): m | NumBits ⇒
    * (hash % NumBits) % m = hash % m, so membership in the lifted set
    * IS membership in the width-m filter. The 100 TB probe side never
    * learns m existed — the `routedBits` decision-as-data discipline
    * applied to SIZING, so an undersized filter re-sizes instead of
    * merely disabling.
    *
    * Scale shape: build scan + tiny distinct; the lifted relation has
    * |S_m|·(NumBits/m) ≤ 3·BitsPerKey⁻¹·NumBits rows — bounded by a
    * constant fraction of [[NumBits]] whatever the build count, always
    * a broadcast. Occupancy is invariant under the lift
    * (|lifted|/NumBits = |S_m|/m), so [[routedBits]] composes on top
    * unchanged and still measures the TRUE filter quality. */
  def sizedBits(build: DataFrame, key: String): DataFrame = {
    val keyed = keyedBuild(build, key)
    val verdict = keyed.groupBy("k").agg(count(lit(1)).as("n_keys"))
      .select(col("k"), expr(sizeLadderSpark("n_keys")).as("m"))
      .localCheckpoint()
    keyed.join(broadcast(verdict), Seq("k"))
      .select(explode(array((0 until NumHashes).map { i =>
          val (a, b) = hashParams(i)
          PortableHash.permHash(col("bkey"), a, b) % col("m")
        }: _*)).as("posm"), col("m"))
      .distinct()
      .select(col("posm"), col("m"),
        explode(expr(s"sequence(0L, ${NumBits}L div m - 1)")).as("j"))
      .select((col("posm") + col("j") * col("m")).as("pos"))
  }

  /** DuckDB spelling of [[sizedBits]]' lifted position set over a
    * `bkeys(bkey)` CTE — the sizing verdict inlined as a scalar
    * subquery (DuckDB evaluates it once). */
  private def sizedBitsSql: String = {
    val posUnion = (0 until NumHashes)
      .map { i =>
        val (a, b) = hashParams(i)
        s"SELECT (${PortableHash.permHashSql("bkey", a, b)} % (SELECT m FROM sz)) AS posm FROM bkeys"
      }
      .mkString("\n    UNION ALL\n    ")
    s"""sz AS MATERIALIZED (
       |  SELECT CAST(${sizeLadderDuck("count(*)")} AS BIGINT) AS m
       |  FROM bkeys
       |),
       |bitsm AS MATERIALIZED (
       |  SELECT DISTINCT posm FROM (
       |    $posUnion
       |  )
       |),
       |bits AS MATERIALIZED (
       |  SELECT posm + j * (SELECT m FROM sz) AS pos
       |  FROM bitsm, UNNEST(range(0, $NumBits // (SELECT m FROM sz))) u(j)
       |)""".stripMargin
  }

  /** High-priority-order revenue THROUGH the sized + routed prefilter —
    * the oracle-gated face of [[sizedBits]] composed under
    * [[routedBits]]: the filter picks its OWN width from the build
    * count, the router prices the resulting occupancy, and the probe
    * runs the identical static k-semi-join plan whatever either
    * decision was. The oracle is the UNFILTERED join (the
    * [[bloomAutoRevenue]] contract: no false negatives + the exact
    * join discards false positives ⇒ result identity at every m and
    * either route). */
  def bloomSizedRevenue(orders: DataFrame, lineitem: DataFrame,
      maxOccupancyMillionths: Long = MaxOccupancyMillionths): DataFrame = {
    val bkeys = orders.filter(col("o_orderpriority") === "2-HIGH")
      .select(col("o_orderkey").as("bkey")).distinct()
    val bits = routedBits(sizedBits(bkeys, "bkey"), maxOccupancyMillionths)
    val cents =
      floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * lit(100.0) + lit(0.5)).cast("long")
    val probe = lineitem.select(col("l_orderkey"), cents.as("cents"))
    bloomPrefilter(probe, "l_orderkey", bits)
      .join(bkeys, col("l_orderkey") === col("bkey"))
      .agg(count(lit(1)).as("n_items"), sum("cents").as("revenue_cents"))
  }

  /** The acceptance audit for the SIZED filter — [[bloomAudit]]'s
    * one-row report run over the width-m lifted bit set (un-routed:
    * this audits the filter itself, not the router). Unlike the
    * revenue gate (whose oracle is the unfiltered join), THIS oracle
    * reproduces the sizing ladder, the mod-m positions, and the lift
    * bit-for-bit in DuckDB — the cross-engine pin that the
    * decision-as-data sizing arithmetic is exact, not merely
    * result-neutral. */
  def bloomSizedAudit(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val bkeys = orders.filter(col("o_orderpriority") === "2-HIGH")
      .select(col("o_orderkey").as("bkey")).distinct()
    auditOver(bkeys, lineitem, sizedBits(bkeys, "bkey"))
  }

  /** Oracle twin of [[bloomSizedAudit]] — same ladder, same mod-m
    * positions, same lift, same flag joins. */
  def bloomSizedAuditSql: String =
    s"""WITH bkeys AS MATERIALIZED (
       |  SELECT DISTINCT o_orderkey AS bkey FROM orders
       |  WHERE o_orderpriority = '2-HIGH'
       |),
       |$sizedBitsSql,
       |$auditTailSql""".stripMargin

  /** Oracle twin of [[bloomSizedRevenue]] — deliberately UNFILTERED. */
  def bloomSizedRevenueSql: String =
    s"""SELECT CAST(count(*) AS BIGINT) AS n_items,
       |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0
       |    + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
       |FROM lineitem
       |JOIN (SELECT DISTINCT o_orderkey FROM orders
       |      WHERE o_orderpriority = '2-HIGH') o
       |  ON l_orderkey = o.o_orderkey""".stripMargin

  /** Urgent-order revenue THROUGH the audit-routed prefilter — the
    * oracle-gated face of [[routedBits]]: probe rows flow through the
    * k semi-joins against the ROUTED bit relation, then the exact join
    * discards any false positives, so the result is identical to the
    * plain join whichever way the occupancy verdict went (no false
    * negatives is the Bloom guarantee; the oracle IS the unfiltered
    * join). On the fixture the build side is small, occupancy is low,
    * and the filter applies — the spec additionally pins the saturated
    * case routing to pass-through. */
  def bloomAutoRevenue(orders: DataFrame, lineitem: DataFrame,
      maxOccupancyMillionths: Long = MaxOccupancyMillionths): DataFrame = {
    val bkeys = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("bkey")).distinct()
    val bits = routedBits(bloomBuild(bkeys, "bkey"), maxOccupancyMillionths)
    val cents =
      floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * lit(100.0) + lit(0.5)).cast("long")
    val probe = lineitem.select(col("l_orderkey"), cents.as("cents"))
    bloomPrefilter(probe, "l_orderkey", bits)
      .join(bkeys, col("l_orderkey") === col("bkey"))
      .agg(count(lit(1)).as("n_items"), sum("cents").as("revenue_cents"))
  }

  /** Oracle twin of [[bloomAutoRevenue]] — deliberately UNFILTERED. */
  def bloomAutoRevenueSql: String =
    s"""SELECT CAST(count(*) AS BIGINT) AS n_items,
       |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0
       |    + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
       |FROM lineitem
       |JOIN (SELECT DISTINCT o_orderkey FROM orders
       |      WHERE o_orderpriority = '1-URGENT') o
       |  ON l_orderkey = o.o_orderkey""".stripMargin

  /** Join-skew audit, one row — the SALTING decision input: before a
    * 100 TB shuffle join on `key`, this prices how lopsided the key
    * distribution is. `skew_ratio_millionths` = (heaviest key's rows /
    * mean rows per key) in exact millionths — the factor by which the
    * hottest reduce partition can exceed the average even under a
    * perfect hash; `top1_share_millionths` bounds what one salt split
    * must absorb. AQE's skew-join handles moderate cases at runtime;
    * a ratio in the hundreds says pre-salt (the GraphSkewSpec celebrity
    * recipe) or pre-aggregate instead. Cost: ONE scan + a key-partial
    * agg + a scalar rollup — strictly cheaper than the join it guards.
    * Exact-int discipline: both rates floor via `div`; the ratio's
    * max_key_rows·10⁶·n_keys triple product widens through
    * decimal(38,0) (the lmScore/pageRank headroom rule — HUGEINT on
    * the DuckDB side) because at the 100 TB design point ~10¹⁰
    * distinct keys times a hot key's rows exceeds int64 and under
    * ANSI mode would kill the very job this audit exists to protect. */
  def joinSkew(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .agg(sum("cnt").as("n_rows"), count(lit(1)).as("n_keys"),
        max("cnt").as("max_key_rows"))
      .select(col("n_rows"), col("n_keys"), col("max_key_rows"),
        expr("(max_key_rows * 1000000L) div n_rows").as("top1_share_millionths"),
        expr("cast((cast(max_key_rows as decimal(38,0)) * 1000000L * n_keys) div n_rows as bigint)")
          .as("skew_ratio_millionths"))

  /** Oracle twin of [[joinSkew]]. */
  def joinSkewSql(table: String = "lineitem", key: String = "l_orderkey"): String =
    s"""WITH per_key AS (
       |  SELECT $key, CAST(count(*) AS BIGINT) AS cnt FROM $table GROUP BY $key
       |)
       |SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
       |  CAST(count(*) AS BIGINT) AS n_keys,
       |  CAST(max(cnt) AS BIGINT) AS max_key_rows,
       |  CAST((max(cnt) * 1000000) // sum(cnt) AS BIGINT) AS top1_share_millionths,
       |  CAST((CAST(max(cnt) AS HUGEINT) * 1000000 * count(*)) // sum(cnt) AS BIGINT) AS skew_ratio_millionths
       |FROM per_key""".stripMargin

  /** Oracle twin of [[bloomAudit]] — same hash arithmetic, same flag
    * joins, same integer rates. */
  def bloomAuditSql(): String = {
    val posUnion = (0 until NumHashes)
      .map(i => s"SELECT ${posOfSql("bkey", i)} AS pos FROM bkeys")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH bkeys AS (
       |  SELECT DISTINCT o_orderkey AS bkey FROM orders
       |  WHERE o_orderpriority = '1-URGENT'
       |),
       |bits AS (
       |  SELECT DISTINCT pos FROM (
       |  $posUnion
       |  )
       |),
       |$auditTailSql""".stripMargin
  }
}
