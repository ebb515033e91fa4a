package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting rewrites for skewed shuffles — the manual spreading
  * tool for the hot keys [[RuntimeFilters.joinSkew]] detects, for the
  * cases AQE's runtime skew-split cannot reach (AQE splits a skewed
  * SORT-MERGE partition at query time, but only for join shapes it
  * recognizes, only after the skewed map output exists, and never for
  * the reduce side of an aggregation whose hot key lands whole in one
  * task). Salting moves the spread BEFORE the shuffle: the fact side
  * scatters each hot key across `salts` sub-keys, the dimension side
  * replicates to meet it (joins) or a second aggregation re-collapses
  * (rollups). Both rewrites are EXACT — the oracle twins run the
  * UNSALTED query, so the driver gate proves result-identity, which is
  * the rewrite's whole contract.
  *
  * The default salt is `pmod(xxhash64(<fact row>), salts)` —
  * deterministic per row (re-runs and retries land identically; no
  * `rand()`), uniform in expectation over distinct rows, and never
  * visible in any output, so cross-engine hash portability is NOT
  * required (contrast [[graft.functions.PortableHash]], which exists
  * precisely for hashes that reach results). See [[rowSalt]] for the
  * duplicate-rows caveat and the caller-supplied escape hatch.
  */
object SkewJoin {

  /** Number of sub-keys a hot key scatters across. 8 turns a
    * 10⁹-row key into 8 × 1.25·10⁸ tasks; size to the observed
    * `joinSkew.skew_ratio_millionths`. */
  val Salts: Int = 8

  /** Default salt: the whole-row hash. Deterministic and uniform over
    * DISTINCT rows — but BYTE-IDENTICAL duplicate rows of a hot key
    * all hash to the same salt and do NOT spread. Fine for keyed facts
    * (TPC-H rows carry a unique line identity); a duplicate-heavy fact
    * must pass its own `salt` expression keyed on something that does
    * vary (a monotonically-varying payload column, a file/offset
    * identity) to [[saltedJoin]]/[[saltedRollup]]. */
  def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salts))

  /** Salted fact⋈dimension equi-join: the fact side carries a
    * deterministic per-row salt, the dimension side replicates
    * `salts`× (dimensions are the small side by definition — the
    * replication is `salts` copies of something already far smaller
    * than the fact), and the join key becomes (key, salt) — a hot
    * fact key now hash-partitions into `salts` tasks instead of one.
    * Output = exactly the unsalted join's rows (salt columns dropped).
    * `salt` defaults to [[rowSalt]] (see its duplicate-rows caveat);
    * any deterministic expression in [0, salts) works — correctness
    * never depends on the salt's distribution, only the spread does.
    *
    * Scale shape: same single shuffle as the plain join, but the
    * reduce-side maximum task is divided by `salts`; use when the
    * skew audit shows a head key AQE cannot split (or a broadcast
    * the dimension has outgrown). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, salts: Int = Salts,
      salt: (DataFrame, Int) => Column = rowSalt): DataFrame = {
    val f = fact.withColumn("_salt", salt(fact, salts))
    val d = dim.withColumn("_dsalt",
      explode(typedLit((0 until salts).toArray)))
    f.join(d, f("_salt") === d("_dsalt") &&
        col(factKey) === col(dimKey))
      .drop("_salt", "_dsalt")
  }

  /** [[Sales.brandRevenue]] computed THROUGH the salted join — the
    * oracle runs the unsalted SQL, so the gate proves the rewrite
    * changes nothing but the shuffle layout. (At fixture scale the
    * planner may still broadcast the replicated dim — harmless; the
    * SMJ spread the salt exists for is plan-proven with broadcast
    * disabled in SkewJoinSpec.) */
  def saltedBrandRevenue(lineitem: DataFrame, part: DataFrame,
      salts: Int = Salts): DataFrame = {
    val factCents =
      floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * lit(100.0) + lit(0.5)).cast("long")
    val fact = lineitem.select(col("l_partkey"), factCents.as("cents"),
      floor(col("l_quantity") + lit(0.5)).cast("long").as("qty"))
    saltedJoin(fact, part.select(col("p_partkey"), col("p_brand")),
        "l_partkey", "p_partkey", salts)
      .groupBy(col("p_brand"))
      .agg(sum("cents").as("revenue_cents"),
        sum("qty").as("sum_qty"),
        count(lit(1)).as("n_items"))
  }

  /** Salted two-phase aggregation: additive measures grouped first by
    * (key, salt) — the hot key's rows combine inside `salts` separate
    * tasks — then re-aggregated by the key alone over the already
    * collapsed cells (≤ `salts` rows per key reach the second
    * shuffle). Exact for counts and sums (associativity), which is
    * why the oracle can be the direct single-phase SQL.
    *
    * This is the rewrite for REDUCE-side aggregation skew, where
    * AQE's skew handling does not apply at all: Spark's map-side
    * partial aggregation already bounds each task's contribution, but
    * one hot key still collects (partitions × 1) partials into a
    * single final task — irrelevant for a count, crippling when the
    * per-group state is wide (collect-style aggregates, sketches).
    * `salt` defaults to [[rowSalt]] — same duplicate-rows caveat. */
  def saltedOrderRollup(lineitem: DataFrame, salts: Int = Salts,
      salt: (DataFrame, Int) => Column = rowSalt): DataFrame = {
    val cents =
      floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * lit(100.0) + lit(0.5)).cast("long")
    val fact = lineitem.select(col("l_orderkey"), cents.as("cents"))
    fact.withColumn("_salt", salt(fact, salts))
      .groupBy(col("l_orderkey"), col("_salt"))
      .agg(count(lit(1)).as("pn"), sum("cents").as("pc"))
      .groupBy(col("l_orderkey"))
      .agg(sum("pn").as("n_lines"), sum("pc").as("order_cents"))
  }

  /** Hot-key threshold for [[autoSaltedJoin]], in millionths of the
    * mean rows-per-key: a key is hot when its row count STRICTLY
    * exceeds (threshold/10⁶)×mean. Default = `Salts`× the mean — a key
    * under that splits into sub-tasks already smaller than an average
    * key's task, so salting it buys nothing and the plain path keeps
    * its single lookup. */
  def hotThresholdMillionths(salts: Int): Long = salts * 1000000L

  /** The keys [[RuntimeFilters.joinSkew]]'s verdict would flag, as a
    * relation — the per-key face of that audit, closing the loop from
    * "the audit prices the hot key" to "the plan routes around it"
    * without a human in between. One fact scan + one key-partial agg
    * builds the per-key counts (checkpointed — it is ALSO the 1-row
    * verdict's input, so the audit pays one pass, not two; a production
    * nightly persists this ≤|keys|-row artifact next to its zone maps);
    * the 1-row verdict attaches back by the constant-key broadcast
    * (the mixPlan idiom — both `k` columns come from the checkpoint, so
    * neither is foldable and the attach cannot constant-fold into the
    * BroadcastNestedLoopJoin the plan audit forbids). The strict `>`
    * makes the exactly-uniform relation produce ZERO hot keys at
    * threshold 10⁶ (spec-pinned). Widening discipline: cnt·10⁶·n_keys
    * rides decimal(38,0) — at 100 TB the triple product clears int64
    * (the joinSkew rule). The result is tiny BY CONSTRUCTION: at most
    * 10⁶/threshold × n_keys keys can sit above threshold×mean, so it
    * broadcasts. */
  def hotKeys(fact: DataFrame, key: String,
      hotMillionths: Long): DataFrame =
    hotFromCounts(keyCounts(fact, key), key, hotMillionths)

  /** The per-key count relation `(key, cnt)` — the ≤|keys|-row artifact
    * a production nightly PERSISTS next to its zone maps, and the exact
    * input [[hotFromCounts]]' verdict reads. Additive by construction
    * (counts sum), which is what gives the hot audit its incremental
    * maintenance story ([[incrementalHotKeys]]). */
  def keyCounts(fact: DataFrame, key: String): DataFrame =
    fact.groupBy(col(key)).agg(count(lit(1)).as("cnt"))

  /** The hot verdict over an explicit `(key, cnt)` relation — shared by
    * the self-audited path and the incremental merge. */
  private def hotFromCounts(counts: DataFrame, key: String,
      hotMillionths: Long): DataFrame = {
    val perKey = counts.withColumn("_ak", lit(1)).localCheckpoint()
    val verdict = perKey.groupBy("_ak")
      .agg(sum("cnt").as("n_rows"), count(lit(1)).as("n_keys"))
    perKey.join(broadcast(verdict), Seq("_ak"))
      .filter(expr(s"cast(cnt as decimal(38,0)) * 1000000 * n_keys" +
        s" > cast($hotMillionths as decimal(38,0)) * n_rows"))
      .select(col(key))
  }

  /** Incremental hot-key audit — the merge discipline the zone-map /
    * CMS / KMV / rollup family follows, closing [[hotKeys]]' "nightly
    * materializes the artifact" amortization without the full-fact
    * re-scan it implied: per-key counts are ADDITIVE, so the persisted
    * corpus `(key, cnt)` artifact ([[keyCounts]]) merged with the new
    * shard's counts and re-aggregated is EXACTLY the whole-fact count
    * relation — hot(corpus ⊕ shard) hash-matches the whole-fact audit
    * (the oracle-gated contract), including keys that cross the
    * threshold only in the union (each side's count is under the bar,
    * the sum is not — spec-pinned). The verdict's mean moves with the
    * merged totals, so a shard that ADDS uniform rows can also demote
    * a borderline key: the merge is the audit, not an approximation.
    *
    * Scale shape: the shard pays its own key-partial agg; the corpus
    * contributes only its ≤|keys|-row artifact (never re-scanned); the
    * merge is one agg over (|artifact| + |shard keys|) rows, and the
    * refreshed artifact is the same relation ready to persist back. */
  def incrementalHotKeys(corpusCounts: DataFrame, shard: DataFrame,
      key: String, hotMillionths: Long): DataFrame =
    hotFromCounts(
      corpusCounts.select(col(key), col("cnt"))
        .unionByName(keyCounts(shard, key))
        .groupBy(col(key)).agg(sum("cnt").as("cnt")),
      key, hotMillionths)

  /** Audit-DRIVEN salted join: [[hotKeys]] decides, per key, whether
    * the row takes the salted path (hot: fact scatters across `salts`
    * sub-keys, dim replicates `salts`×) or the plain one (cold: salt 0,
    * ONE dim replica — no replication tax on the long uniform tail).
    * The hot set broadcasts to both sides as a LEFT-join flag; the join
    * itself is the same (key, salt) equi-join as [[saltedJoin]], so a
    * relation with no skew pays only the audit pass and joins exactly
    * as the plain spelling would. Output = exactly the unsalted join's
    * rows — the oracle twin IS the unsalted query, so the driver gate
    * proves the routing changes nothing but the shuffle layout.
    *
    * `hotMillionths` < 0 (the default) derives the threshold from THIS
    * call's `salts` ([[hotThresholdMillionths]]) — a caller-supplied
    * salt count keeps the documented "salts × the mean" contract
    * without re-stating it. `salt` is the same caller-supplied escape
    * hatch [[saltedJoin]] takes (the [[rowSalt]] duplicate-rows
    * caveat): it salts the HOT branch; the cold branch stays salt 0.
    *
    * Scale shape: one extra fact pass for the audit — amortized by the
    * [[autoSaltedJoinWithHot]] overload, which accepts the persisted
    * ≤|keys|-row hot artifact a production nightly maintains — then
    * the plain join's single shuffle with the hottest reduce task
    * divided by `salts` and the dim side grown by only
    * |hot|·(salts−1) rows. */
  def autoSaltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, salts: Int = Salts,
      hotMillionths: Long = -1L,
      salt: (DataFrame, Int) => Column = rowSalt): DataFrame = {
    val hm = if (hotMillionths < 0L) hotThresholdMillionths(salts)
      else hotMillionths
    autoSaltedJoinWithHot(fact, dim, factKey, dimKey,
      hotKeys(fact, factKey, hm), salts, salt)
  }

  /** [[autoSaltedJoin]] against a PERSISTED hot-key relation (one
    * column: the fact key) — the amortized production path: a nightly
    * materializes [[hotKeys]] next to its zone maps once, and every
    * join that day routes off the artifact without re-paying the audit
    * pass. Result identity is unconditional — a stale hot set only
    * mis-ROUTES (an un-listed hot key lands whole in one task, a
    * no-longer-hot key pays pointless replication); it can never
    * change the output rows (spec-pinned: persisted-hot ≡ self-audited
    * ≡ unsalted). */
  def autoSaltedJoinWithHot(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, hot: DataFrame,
      salts: Int = Salts,
      salt: (DataFrame, Int) => Column = rowSalt): DataFrame = {
    // distinct() is what makes the unconditional-identity contract TRUE
    // for a caller-supplied artifact: a hot set appended twice (or a
    // union of two audits) carries duplicate key rows, and a LEFT join
    // against them would MULTIPLY fact rows — a wrong answer, not a
    // mis-route. The self-audited path's groupBy dedups incidentally;
    // the overload must not depend on the caller's hygiene.
    val f = fact.join(broadcast(hot.select(col(factKey).as("_hotf")).distinct()),
        col(factKey) === col("_hotf"), "left")
      .withColumn("_salt", when(col("_hotf").isNotNull, salt(fact, salts))
        .otherwise(lit(0)).cast("int"))
      .drop("_hotf")
    val d = dim.join(broadcast(hot.select(col(factKey).as("_hotd")).distinct()),
        col(dimKey) === col("_hotd"), "left")
      .withColumn("_dsalt", explode(when(col("_hotd").isNotNull,
          typedLit((0 until salts).toArray))
        .otherwise(typedLit(Array(0)))))
      .drop("_hotd")
    f.join(d, f("_salt") === d("_dsalt") &&
        col(factKey) === col(dimKey))
      .drop("_salt", "_dsalt")
  }

  /** Audit-DRIVEN salted ROLLUP — the aggregation-skew symmetry of
    * [[autoSaltedJoin]] (the loop [[saltedOrderRollup]] left open: it
    * salts unconditionally, paying the two-phase tax on every key):
    * [[hotKeys]] routes, per key, between the (key, salt) pre-agg
    * (hot: the wide per-group state splits across `salts` tasks) and
    * the straight single-phase agg (cold: the uniform tail pays
    * nothing). A key is entirely hot or entirely cold, so the two
    * branches partition the input and their union is exact — the
    * oracle twin is the UNSALTED rollup, same as the manual spelling's.
    * With zero hot keys (the exactly-uniform case, [[hotKeys]]' strict
    * `>`) the hot branch is empty and the whole rollup IS the plain
    * single-phase plan's work (spec-pinned).
    *
    * Scale shape: the audit's key-partial agg (amortizable exactly as
    * the join's), then one fact shuffle's worth of rows split across
    * the two branches — hot rows into salts× more, smaller tasks; cold
    * rows into the plain agg Spark's map-side partials already bound.
    * Scan accounting, stated honestly: the two branches are separate
    * plan legs, so the (key, measure)-pruned fact scan runs once per
    * branch; the alternative single-scan spelling (salt 0 for cold
    * rows into one unconditional two-phase plan —
    * [[saltedOrderRollup]]'s shape with the audit choosing the salt)
    * trades the second scan for a second ≤|keys|-row shuffle of
    * already-collapsed cells. This operator keeps the branches because
    * the routing is then STRUCTURAL — the zero-hot case provably runs
    * zero rows through the pre-agg — and the pruned double scan is
    * column-store-cheap next to the shuffle it shapes. */
  def saltedRollupAuto(lineitem: DataFrame, salts: Int = Salts,
      hotMillionths: Long = -1L,
      salt: (DataFrame, Int) => Column = rowSalt): DataFrame = {
    val hm = if (hotMillionths < 0L) hotThresholdMillionths(salts)
      else hotMillionths
    val fact = rollupFact(lineitem)
    saltedRollupAutoWithHot(lineitem, hotKeys(fact, "l_orderkey", hm),
      salts, salt)
  }

  private def rollupFact(lineitem: DataFrame): DataFrame = {
    val cents =
      floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * lit(100.0) + lit(0.5)).cast("long")
    lineitem.select(col("l_orderkey"), cents.as("cents"))
  }

  /** [[saltedRollupAuto]] against a PERSISTED hot-key relation — the
    * [[autoSaltedJoinWithHot]] amortization for the rollup side: route
    * off the nightly's artifact, pay zero audit passes; a stale set
    * only mis-routes (result identity is unconditional — the branches
    * partition keys whatever the artifact says). */
  def saltedRollupAutoWithHot(lineitem: DataFrame, hot: DataFrame,
      salts: Int = Salts,
      salt: (DataFrame, Int) => Column = rowSalt): DataFrame = {
    val fact = rollupFact(lineitem)
    // distinct() for the same reason as autoSaltedJoinWithHot's: a
    // duplicate-row artifact must not multiply fact rows
    val flagged = fact.join(
      broadcast(hot.select(col("l_orderkey").as("_hot")).distinct()),
      col("l_orderkey") === col("_hot"), "left")
    val hotAgg = flagged.filter(col("_hot").isNotNull)
      .withColumn("_salt", salt(fact, salts))
      .groupBy(col("l_orderkey"), col("_salt"))
      .agg(count(lit(1)).as("pn"), sum("cents").as("pc"))
      .groupBy(col("l_orderkey"))
      .agg(sum("pn").as("n_lines"), sum("pc").as("order_cents"))
    val coldAgg = flagged.filter(col("_hot").isNull)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"), sum("cents").as("order_cents"))
    hotAgg.unionByName(coldAgg)
  }

  /** [[Sales.brandRevenue]] through the audit-driven join — the
    * self-serve spelling of [[saltedBrandRevenue]]: nobody decided to
    * salt; the fact's own key distribution did. Oracle = the unsalted
    * SQL (result identity is the contract, whatever the audit found). */
  def autoSaltedBrandRevenue(lineitem: DataFrame, part: DataFrame,
      salts: Int = Salts): DataFrame = {
    val factCents =
      floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * lit(100.0) + lit(0.5)).cast("long")
    val fact = lineitem.select(col("l_partkey"), factCents.as("cents"),
      floor(col("l_quantity") + lit(0.5)).cast("long").as("qty"))
    autoSaltedJoin(fact, part.select(col("p_partkey"), col("p_brand")),
        "l_partkey", "p_partkey", salts)
      .groupBy(col("p_brand"))
      .agg(sum("cents").as("revenue_cents"),
        sum("qty").as("sum_qty"),
        count(lit(1)).as("n_items"))
  }

  /** Oracle twin of [[incrementalHotKeys]] over the lineitem order key
    * — deliberately the WHOLE-FACT audit (the merge theorem is what the
    * hash match proves). HUGEINT keeps the triple product exact, the
    * [[hotKeys]] decimal(38,0) widening in DuckDB spelling. */
  def incrementalHotKeysSql(hotMillionths: Long): String =
    s"""WITH pk AS (
       |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS cnt
       |  FROM lineitem GROUP BY l_orderkey
       |), v AS (
       |  SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
       |    CAST(count(*) AS BIGINT) AS n_keys
       |  FROM pk
       |)
       |SELECT l_orderkey FROM pk, v
       |WHERE CAST(cnt AS HUGEINT) * 1000000 * n_keys
       |  > CAST($hotMillionths AS HUGEINT) * n_rows
       |ORDER BY l_orderkey""".stripMargin

  /** Oracle twin of [[saltedOrderRollup]] — deliberately UNSALTED. */
  def saltedOrderRollupSql: String =
    s"""SELECT l_orderkey,
       |  CAST(count(*) AS BIGINT) AS n_lines,
       |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0
       |    + 0.5) AS BIGINT)) AS BIGINT) AS order_cents
       |FROM lineitem
       |GROUP BY l_orderkey
       |ORDER BY l_orderkey, n_lines, order_cents""".stripMargin
}
