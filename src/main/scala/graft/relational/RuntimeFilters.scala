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
    val bits = bloomBuild(bkeys, "bkey")
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
    val joins = (0 until NumHashes)
      .map(i => s"LEFT JOIN bits b$i ON ${posOfSql("p.l_orderkey", i)} = b$i.pos")
      .mkString("\n  ")
    val passExpr = (0 until NumHashes)
      .map(i => s"b$i.pos IS NOT NULL").mkString(" AND ")
    s"""WITH bkeys AS (
       |  SELECT DISTINCT o_orderkey AS bkey FROM orders
       |  WHERE o_orderpriority = '1-URGENT'
       |),
       |bits AS (
       |  SELECT DISTINCT pos FROM (
       |  $posUnion
       |  )
       |),
       |flagged AS (
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
}
