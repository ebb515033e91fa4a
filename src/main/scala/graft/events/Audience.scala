package graft.events

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** The KMV buffer: ≤K distinct hash values, ascending. */
case class KmvBuf(hs: Seq[Long])

/** Bounded-state DISTINCT min-K aggregate — the KMV sketch builder as
  * ONE aggregation (no upstream `distinct()` shuffle: set semantics
  * live in the buffer, so each partition reduces to ≤K values before
  * any data moves — and a streaming query can maintain the sketch as a
  * single stateful operator in complete mode, where a distinct+agg
  * chain would be two). The buffer is kept normalized (distinct,
  * ascending, ≤K), so most values in the map-side hot loop fail the
  * `last` bound check without touching the sequence. Min-of-set is
  * commutative/associative/idempotent — reduce/merge order and
  * duplicate arrivals cannot affect the result. */
class KmvAgg(k: Int) extends Aggregator[Long, KmvBuf, KmvBuf] {
  private def norm(s: Seq[Long]): Seq[Long] = s.distinct.sorted.take(k)
  def zero: KmvBuf = KmvBuf(Seq.empty)
  def reduce(b: KmvBuf, a: Long): KmvBuf =
    if (b.hs.size >= k && a >= b.hs.last) b
    else if (b.hs.contains(a)) b
    else KmvBuf(norm(b.hs :+ a))
  def merge(b1: KmvBuf, b2: KmvBuf): KmvBuf = KmvBuf(norm(b1.hs ++ b2.hs))
  def finish(r: KmvBuf): KmvBuf = r
  def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  def outputEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
}

/** KMV (K-minimum-values) distinct sketches with SET-OPERATION
  * estimates — the audience-overlap face of the mergeable-sketch family
  * (Beyer et al., "On Synopses for Distinct-Value Estimation Under
  * Multiset Operations", SIGMOD 2007). The HLL rollups answer "how many
  * distinct users per cell, union-merged upward"; HLL cannot intersect.
  * KMV can: keep the K smallest hash values per set; the K-th value
  * estimates cardinality ((K−1)·H/v_K for hash space H), the K-min of a
  * UNION of sketches is the union's sketch, and the fraction of the
  * union sketch present in both inputs estimates Jaccard — giving
  * "users who did A ∧ B" from two tiny synopses, no re-scan.
  *
  * Determinism: user ids hash through the portable permHash family (a
  * dedicated seed), so sketch CONTENTS are bit-identical cross-engine —
  * this engine's sketches are exact relations, not probabilistic blobs,
  * which is what makes an oracle-gated sketch audit possible at all.
  * When a set has < K distinct hashes the sketch IS the set and every
  * estimate degenerates to exact — the same formulas, no branches in
  * the semantics (just the saturation CASE).
  *
  * [[audienceOverlap]] reports estimate AND exact per pair — the
  * acceptance audit a sketch deployment runs once at full scale before
  * trusting the synopses (the ann_recall discipline); production then
  * reads sketches only.
  */
object Audience {

  /** Sketch size: 64 values ⇒ ~1/√(K−2) ≈ 13% standard error — audit
    * scale; production would run 1024+. */
  val KmvK = 64

  /** Dedicated hash seed (the engine-wide seed-split discipline: 42
    * minhash, 7 planes/CMS, 99 SimHash, 13 Bloom). */
  private val (hA, hB) = PortableHash.minhashPerms(1, seed = 173L).head

  private[graft] def userHash(u: Column): Column =
    PortableHash.permHash(u, hA, hB)

  private def userHashSql(u: String): String = PortableHash.permHashSql(u, hA, hB)

  /** `(event_type, hs)` — the per-type KMV sketch: the K smallest
    * DISTINCT user-id hashes, ascending, via ONE bounded-state
    * [[KmvAgg]] pass (set semantics live in the ≤K-value buffer, so no
    * upstream distinct shuffle exists and ≤K values per partition reach
    * the one shuffle). Runs unchanged on a stream in complete mode —
    * a single stateful operator whose state is |types|·K values
    * (spec-pinned against this batch build). THIS tiny relation is
    * what a deployment persists per dimension cell. */
  def kmvSketches(events: DataFrame, k: Int = KmvK): DataFrame = {
    val kmv = udaf(new KmvAgg(k), Encoders.scalaLong)
    events.select(col("event_type"), userHash(col("user_id")).as("h"))
      .groupBy("event_type")
      .agg(kmv(col("h")).as("s"))
      .select(col("event_type"), col("s.hs").as("hs"))
  }

  /** n̂ from a sketch array COLUMN (by name — the saturation branch
    * needs SQL `div`, exact int64; a double divide could round the
    * floor differently than the oracle's integer `//`): exact size when
    * unsaturated, else (K−1)·P div v_K. */
  private def estOf(hsName: String, k: Int): Column =
    when(size(col(hsName)) < k, size(col(hsName)).cast("long"))
      .otherwise(expr(s"${(k - 1).toLong * PortableHash.P}L div element_at($hsName, $k)"))

  /** KMV merge — the min-K merge theorem (Beyer et al. 2007, §3:
    * minK(minK(A) ∪ minK(B)) = minK(A ∪ B), because any value in the
    * union's K smallest is necessarily in its own input's K smallest):
    * per event type, union the two hash arrays, sort, keep K. FULL
    * OUTER on type so a type present in only one shard survives with
    * its own sketch. The merged relation is bit-identical to the
    * whole-corpus sketch — an EXACT incremental gate, the
    * incremental_cms/incremental_zone_map discipline verbatim. */
  def kmvMerge(a: DataFrame, b: DataFrame, k: Int = KmvK): DataFrame = {
    val empty = lit(Array.empty[Long])
    a.select(col("event_type"), col("hs").as("hs_a"))
      .join(b.select(col("event_type"), col("hs").as("hs_b")),
        Seq("event_type"), "full_outer")
      .select(col("event_type"),
        slice(array_sort(array_union(
          coalesce(col("hs_a"), empty), coalesce(col("hs_b"), empty))),
          1, k).as("hs"))
  }

  /** Re-roll FINER-grain sketches (per-window shards a stream emitted —
    * [[graft.streaming.EventStream.windowedKmvSketches]]) up to the
    * per-type sketch: explode the hash arrays and run ONE more
    * [[KmvAgg]] pass. Exact by the same merge theorem [[kmvMerge]]
    * rides — minK(∪ᵢ minK(Wᵢ)) = minK(∪ᵢ Wᵢ), for any number of
    * shards, because a hash in the union's K smallest is in its own
    * window's K smallest. This is the stream→batch handoff: the stream
    * persists ≤K values per closed (window, type); the nightly re-roll
    * touches only those tiny shards — never the raw events — and its
    * output merges into [[incrementalKmv]] like any batch-built shard.
    *
    * Scale shape: input is |windows|·|types| rows of ≤K longs; the agg
    * reduces each partition to ≤K values before the one shuffle. */
  def kmvFromWindowSketches(windowSketches: DataFrame,
      k: Int = KmvK): DataFrame = {
    val kmv = udaf(new KmvAgg(k), Encoders.scalaLong)
    windowSketches.select(col("event_type"), explode(col("hs")).as("h"))
      .groupBy("event_type").agg(kmv(col("h")).as("s"))
      .select(col("event_type"), col("s.hs").as("hs"))
  }

  /** A sketch relation exploded to `(event_type, rn, h)` scalar rows —
    * the oracle-comparable face (the driver hash-compare takes no
    * array columns); rn is the 1-based rank of h within its sketch. */
  def kmvExploded(sketches: DataFrame): DataFrame =
    sketches.select(col("event_type"),
        posexplode(col("hs")).as(Seq("rn0", "h")))
      .select(col("event_type"), (col("rn0") + 1).cast("long").as("rn"),
        col("h"))

  /** Incremental face: sketch(shard A) ⊕ sketch(shard B), exploded —
    * must hash-match the oracle's whole-corpus min-K relation. */
  def incrementalKmv(shardA: DataFrame, shardB: DataFrame,
      k: Int = KmvK): DataFrame =
    kmvExploded(kmvMerge(kmvSketches(shardA, k), kmvSketches(shardB, k), k))

  /** Oracle twin of [[incrementalKmv]] — the WHOLE-corpus sketch
    * (row_number min-K over distinct user hashes); equality with the
    * shard-merged build IS the merge theorem. */
  def incrementalKmvSql(k: Int = KmvK): String =
    s"""WITH uh AS (
       |  SELECT DISTINCT event_type, ${userHashSql("user_id")} AS h FROM events
       |)
       |SELECT event_type, CAST(rn AS BIGINT) AS rn, h FROM (
       |  SELECT event_type, h,
       |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |  FROM uh
       |) WHERE rn <= $k
       |ORDER BY event_type, rn, h""".stripMargin

  /** Per pair of event types: estimated audience sizes, union and
    * INTERSECTION estimates from the sketches alone, and the exact
    * intersection — the estimator-quality audit. All pair arithmetic
    * runs on the ≤|types|-row sketch relation via the checkpointed
    * constant-key broadcast self-join (the bpeMerges idiom — a bare
    * `<` self-join would plan the nested loop the plan audit forbids);
    * the exact side is one (type, user) distinct relation self-joined
    * on user — the only corpus-priced step, and exactly the cost the
    * sketches exist to avoid after this audit passes. */
  def audienceOverlap(events: DataFrame, k: Int = KmvK): DataFrame = {
    val sk = kmvSketches(events, k).withColumn("kk", lit(1)).localCheckpoint()
    val pairs = sk.select(col("kk"), col("event_type").as("type_a"),
        col("hs").as("hs_a"))
      .join(broadcast(sk.select(col("kk"), col("event_type").as("type_b"),
        col("hs").as("hs_b"))), Seq("kk"))
      .filter(col("type_a") < col("type_b"))
      .withColumn("uk", slice(array_sort(array_union(col("hs_a"), col("hs_b"))),
        1, k))
      .withColumn("usz", size(col("uk")).cast("long"))
      .withColumn("est_union", estOf("uk", k))
      .withColumn("icnt", size(filter(col("uk"), h =>
        array_contains(col("hs_a"), h) && array_contains(col("hs_b"), h)))
        .cast("long"))
      .select(col("type_a"), col("type_b"),
        estOf("hs_a", k).as("est_a"),
        estOf("hs_b", k).as("est_b"),
        col("est_union"),
        expr("(icnt * est_union) div usz").as("est_inter"))
    val tu = events.select(col("event_type"), col("user_id")).distinct()
    val exact = tu.select(col("event_type").as("type_a"), col("user_id"))
      .join(tu.select(col("event_type").as("type_b"), col("user_id")),
        Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("exact_inter"))
    pairs.join(exact, Seq("type_a", "type_b"), "left")
      .select(col("type_a"), col("type_b"), col("est_a"), col("est_b"),
        col("est_union"), col("est_inter"),
        coalesce(col("exact_inter"), lit(0L)).as("exact_inter"))
  }

  /** Oracle twin of [[audienceOverlap]] — the same sketches spelled
    * relationally (row_number min-K, the union re-rank, membership via
    * LEFT joins). */
  def audienceOverlapSql(k: Int = KmvK): String = {
    val p = PortableHash.P
    s"""WITH uh AS (
       |  SELECT DISTINCT event_type, ${userHashSql("user_id")} AS h FROM events
       |),
       |kmv AS (
       |  SELECT event_type, h FROM (
       |    SELECT event_type, h,
       |      row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |    FROM uh
       |  ) WHERE rn <= $k
       |),
       |est AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS sz,
       |    CAST(CASE WHEN count(*) < $k THEN count(*)
       |      ELSE ${(k - 1).toLong * p} // max(h) END AS BIGINT) AS est_n
       |  FROM kmv GROUP BY event_type
       |),
       |pr AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b,
       |    a.est_n AS est_a, b.est_n AS est_b
       |  FROM est a JOIN est b ON a.event_type < b.event_type
       |),
       |uni AS (
       |  SELECT type_a, type_b, h,
       |    row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
       |  FROM (
       |    SELECT p.type_a, p.type_b, m.h
       |    FROM pr p JOIN kmv m ON m.event_type = p.type_a
       |    UNION
       |    SELECT p.type_a, p.type_b, m.h
       |    FROM pr p JOIN kmv m ON m.event_type = p.type_b
       |  )
       |),
       |uk AS (
       |  SELECT u.type_a, u.type_b, u.h,
       |    (ka.h IS NOT NULL AND kb.h IS NOT NULL) AS in_both
       |  FROM uni u
       |  LEFT JOIN kmv ka ON ka.event_type = u.type_a AND ka.h = u.h
       |  LEFT JOIN kmv kb ON kb.event_type = u.type_b AND kb.h = u.h
       |  WHERE u.rn <= $k
       |),
       |ust AS (
       |  SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS usz,
       |    CAST(CASE WHEN count(*) < $k THEN count(*)
       |      ELSE ${(k - 1).toLong * p} // max(h) END AS BIGINT) AS est_union,
       |    CAST(sum(CASE WHEN in_both THEN 1 ELSE 0 END) AS BIGINT) AS icnt
       |  FROM uk GROUP BY type_a, type_b
       |),
       |tu AS (SELECT DISTINCT event_type, user_id FROM events),
       |ex AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b,
       |    CAST(count(*) AS BIGINT) AS exact_inter
       |  FROM tu a JOIN tu b ON a.user_id = b.user_id
       |    AND a.event_type < b.event_type
       |  GROUP BY 1, 2
       |)
       |SELECT p.type_a AS type_a, p.type_b AS type_b,
       |  p.est_a AS est_a, p.est_b AS est_b, u.est_union AS est_union,
       |  CAST((u.icnt * u.est_union) // u.usz AS BIGINT) AS est_inter,
       |  coalesce(ex.exact_inter, 0) AS exact_inter
       |FROM pr p
       |JOIN ust u ON u.type_a = p.type_a AND u.type_b = p.type_b
       |LEFT JOIN ex ON ex.type_a = p.type_a AND ex.type_b = p.type_b
       |ORDER BY type_a, type_b, est_a, est_b, est_union, est_inter, exact_inter""".stripMargin
  }
}
