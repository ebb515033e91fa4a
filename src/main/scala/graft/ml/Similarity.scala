package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** One (neighbor, similarity) candidate flowing into the top-k aggregate. */
case class Scored(neighbor_id: Long, cos_sim: Double)

/** Product-encodable top-k buffer (Encoders.product handles the Seq field;
  * keeps the Aggregator on the public Encoders API — no catalyst imports).
  */
case class TopKBuf(items: Seq[Scored])

/** Bounded-state top-k: the buffer never holds more than k rows, so the
  * partial (map-side) aggregation reduces each input partition to ≤k
  * candidates per query BEFORE the shuffle. That is the property that makes
  * distributed top-k scale: the alternative — a row_number window over all
  * scored rows — shuffles |corpus|·|queries| rows into |queries| partitions,
  * which at 100 TB is both a full-corpus shuffle and a skew bomb. Order of
  * reduce/merge calls cannot affect the result: selection uses the total
  * order (cos_sim desc, neighbor_id asc), so the aggregate is commutative
  * and associative.
  */
class TopKAgg(k: Int) extends Aggregator[Scored, TopKBuf, TopKBuf] {
  private def best(s: Seq[Scored]): Seq[Scored] =
    s.sortBy(x => (-x.cos_sim, x.neighbor_id)).take(k)
  def zero: TopKBuf = TopKBuf(Seq.empty)
  // `best` keeps items sorted, so a full buffer's last element is its
  // worst — most rows in the map-side hot loop fail that bound check and
  // return the buffer untouched instead of paying a per-row sort.
  def reduce(b: TopKBuf, a: Scored): TopKBuf =
    if (b.items.size >= k && {
      val w = b.items.last
      a.cos_sim < w.cos_sim ||
        (a.cos_sim == w.cos_sim && a.neighbor_id >= w.neighbor_id)
    }) b
    else TopKBuf(best(b.items :+ a))
  def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = TopKBuf(best(b1.items ++ b2.items))
  def finish(r: TopKBuf): TopKBuf = r
  def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}

/** Similarity search over `embeddings(vec_id, embedding array<float>, label)`.
  *
  * Cross-engine determinism: float cosine sums are order-sensitive, so the
  * engine quantizes each coordinate to int64 (`floor(x·1e6)` — float→double
  * is exact, one IEEE multiply, floor) and computes dot products and squared
  * norms in EXACT integer arithmetic (|x|≤2 ⇒ coords ≤ 2e6 ⇒ a 4096-dim dot
  * ≤ 1.6e16 < 2^62 — no overflow at any realistic dimension). The only
  * floating-point steps are the final sqrt/divide, identical expression
  * shape in Spark and DuckDB ⇒ bit-identical doubles. This mirrors what
  * production ANN systems do anyway (int8 quantization) — determinism and
  * speed come from the same design choice.
  *
  * Two plans, the same pair every ANN system ships:
  *  - [[embedKnn]]: exact brute-force top-k for a small query set —
  *    broadcast the queries, scan the corpus once, bounded-state top-k
  *    aggregate ([[TopKAgg]]). The baseline that defines ground truth.
  *  - [[embedAnnPairs]]: sign-random-projection LSH — bucket by the sign
  *    pattern of H pseudo-random hyperplane projections, score pairs only
  *    within buckets. Equi-join on the bucket id ⇒ per-bucket quadratic,
  *    never corpus-quadratic; the scale path for all-pairs similarity.
  */
object Similarity {

  /** Quantization scale: 1e6 ≈ 20 bits per coordinate. */
  private val QScale = 1000000.0

  /** Hyperplane count for sign-random-projection (2^H buckets). */
  val NumPlanes = 8
  /** Deterministic hyperplane coefficient parameters, seed-split from the
    * minhash family so the two operators' hash streams are independent. */
  val planeParams: Seq[(Long, Long)] = PortableHash.minhashPerms(NumPlanes, seed = 7L)

  private def quantize(e: Column): Column =
    transform(e, x => floor(x.cast("double") * lit(QScale)))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), _ + _)

  /** `(vec_id, qv array<long>, nrm double)` — quantized vectors + L2
    * norm. Zero-norm vectors (all coordinates quantize to 0) are
    * excluded: they carry no direction, cosine against them is 0/0, and
    * a NULL cos_sim would crash the non-nullable [[Scored]] encoder —
    * the exclusion is mirrored in the oracle CTE so both engines see the
    * same corpus. */
  def vectors(embeds: DataFrame): DataFrame = {
    val qv = quantize(col("embedding"))
    graft.Tables.widen(embeds).select(col("vec_id"), qv.as("qv"))
      .withColumn("nrm", sqrt(dot(col("qv"), col("qv")).cast("double")))
      .filter(col("nrm") > 0.0)
  }

  /** NULL-element guard mirrored from the Spark side: Spark's dot/nrm
    * aggregate NULL-propagates, so a vector containing a NULL coordinate
    * gets nrm = NULL and fails `nrm > 0`; DuckDB's list_sum would instead
    * SKIP the NULL and keep the vector with a partial norm — the WHERE
    * below makes the oracle drop exactly the same vectors. */
  private def vectorsCte: String =
    s"""qvecs AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * ${QScale}e0) AS BIGINT)) AS qv
       |  FROM embeddings
       |  WHERE len(list_filter(embedding, x -> x IS NULL)) = 0
       |), vecs AS (
       |  SELECT * FROM (
       |    SELECT vec_id, qv,
       |      sqrt(CAST(list_sum(list_transform(qv, x -> x * x)) AS DOUBLE)) AS nrm
       |    FROM qvecs
       |  ) WHERE nrm > 0
       |)""".stripMargin

  /** Exact k-nearest-neighbors by cosine for the query set
    * `vec_id < nQueries`: broadcast the (small) query side, score every
    * corpus vector against every query in one scan, reduce with the
    * bounded top-k aggregate. Self-matches excluded. The dimensionality
    * guard (`size(qqv) === size(qv)`) doubles as an equi-key, so the
    * physical plan is a BroadcastHashJoin over the ≤nQueries broadcast
    * rows — one corpus scan, no shuffle of corpus vectors; PlanAuditSpec
    * pins the plan shape and the query-side parquet pushdown.
    */
  def embedKnn(embeds: DataFrame, nQueries: Long = 10L, k: Int = 5): DataFrame = {
    val v = vectors(embeds)
    val q = v.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"), col("nrm").as("qnrm"))
    // Length guard: Spark's zip_with null-pads ragged pairs (→ NULL dot)
    // while DuckDB's list_sum silently drops the null products (→ partial
    // sum) — requiring equal dimensionality on BOTH sides keeps the
    // engines agreeing instead of diverging quietly on malformed input.
    val scored = v.join(broadcast(q),
        col("vec_id") =!= col("query_id") && size(col("qqv")) === size(col("qv")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("qqv"), col("qv")).cast("double") / (col("qnrm") * col("nrm"))).as("cos_sim"))
    val topk = udaf(new TopKAgg(k), Encoders.product[Scored])
    scored.groupBy("query_id")
      .agg(topk(col("neighbor_id"), col("cos_sim")).as("tk"))
      .select(col("query_id"), posexplode(col("tk.items")).as(Seq("r0", "s")))
      .select(col("query_id"), (col("r0") + 1L).as("rank"),
        col("s.neighbor_id").as("neighbor_id"), col("s.cos_sim").as("cos_sim"))
  }

  def embedKnnSql(nQueries: Long = 10L, k: Int = 5): String =
    s"""WITH $vectorsCte,
       |queries AS (
       |  SELECT vec_id AS query_id, qv AS qqv, nrm AS qnrm FROM vecs WHERE vec_id < $nQueries
       |),
       |scored AS (
       |  SELECT query_id, vec_id AS neighbor_id,
       |    CAST(list_sum(list_transform(range(1, len(qv) + 1), i -> qqv[i] * qv[i])) AS DOUBLE)
       |      / (qnrm * nrm) AS cos_sim
       |  FROM vecs CROSS JOIN queries
       |  WHERE vec_id <> query_id AND len(qqv) = len(qv)
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos_sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
       |  FROM scored
       |)
       |SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id, cos_sim
       |FROM ranked WHERE rnk <= $k
       |ORDER BY query_id, rank, neighbor_id, cos_sim""".stripMargin

  /** Pseudo-random hyperplane coefficient for plane h, coordinate i
    * (1-based): ((a_h·i + b_h) mod 997) − 498 ∈ [−498, 498]. Pure
    * arithmetic (no literal weight tables), identical in both engines.
    */
  private def planeCoef(h: Int, i: Column): Column = {
    val (a, b) = planeParams(h)
    (lit(a) * i + lit(b)) % 997L - 498L
  }

  private def planeCoefSql(h: Int, i: String): String = {
    val (a, b) = planeParams(h)
    s"(($a * $i + $b) % 997 - 498)"
  }

  /** Sign-random-projection bucket id: bit h = sign(qv · plane_h). */
  private def bucketCol(qv: Column): Column =
    (0 until NumPlanes).map { h =>
      val proj = aggregate(
        transform(sequence(lit(1), size(qv)), i => element_at(qv, i) * planeCoef(h, i)),
        lit(0L), _ + _)
      when(proj >= 0L, lit(1L << h)).otherwise(lit(0L))
    }.reduce(_ + _)

  private def bucketSql: String =
    (0 until NumPlanes).map { h =>
      s"""CAST(CASE WHEN list_sum(list_transform(range(1, len(qv) + 1),
         |      i -> qv[i] * ${planeCoefSql(h, "i")})) >= 0
         |    THEN ${1L << h} ELSE 0 END AS BIGINT)""".stripMargin
    }.mkString("(", "\n  + ", ")")

  /** LSH-bucketed all-pairs similarity: candidate pairs share a full
    * sign-pattern bucket; cosine computed only within buckets and kept
    * when ≥ simThreshold. One pass quantizes + buckets each vector and
    * ONE shuffle (the bucket groupBy) feeds intra-bucket pair expansion —
    * the self-join formulation would run the quantize/project pipeline
    * once per side. Per-bucket pair count is quadratic by design (the
    * LSH contract: sign-pattern buckets are small); cosine is symmetric,
    * so (least, greatest) id ordering makes the output independent of
    * collect_list order. No cartesian anywhere in the plan.
    */
  def embedAnnPairs(embeds: DataFrame, simThreshold: Double = 0.1): DataFrame = {
    val v = vectors(embeds).withColumn("bucket", bucketCol(col("qv")))
    val buckets = v.groupBy("bucket")
      .agg(collect_list(struct(col("vec_id"), col("qv"), col("nrm"))).as("vs"))
      .filter(size(col("vs")) >= 2)
    val pairList = graft.functions.Pairing.intraBucketPairs(col("vs"))
    buckets.select(col("bucket"), explode(pairList).as("p"))
      // same ragged-length guard as embedKnn: keep the engines' dot
      // products identical instead of NULL-vs-partial-sum divergent
      .filter(size(col("p.x.qv")) === size(col("p.y.qv")))
      .select(
        least(col("p.x.vec_id"), col("p.y.vec_id")).as("vec_a"),
        greatest(col("p.x.vec_id"), col("p.y.vec_id")).as("vec_b"),
        col("bucket"),
        (dot(col("p.x.qv"), col("p.y.qv")).cast("double")
          / (col("p.x.nrm") * col("p.y.nrm"))).as("cos_sim"))
      .filter(col("cos_sim") >= lit(simThreshold))
  }

  def embedAnnPairsSql(simThreshold: Double = 0.1): String =
    s"""WITH $vectorsCte,
       |bucketed AS (
       |  SELECT vec_id, qv, nrm,
       |  $bucketSql AS bucket
       |  FROM vecs
       |),
       |pairs AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket AS bucket,
       |    CAST(list_sum(list_transform(range(1, len(a.qv) + 1), i -> a.qv[i] * b.qv[i])) AS DOUBLE)
       |      / (a.nrm * b.nrm) AS cos_sim
       |  FROM bucketed a JOIN bucketed b
       |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |      AND len(a.qv) = len(b.qv)
       |)
       |SELECT vec_a, vec_b, bucket, cos_sim FROM pairs
       |WHERE cos_sim >= ${simThreshold}e0
       |ORDER BY vec_a, vec_b, bucket, cos_sim""".stripMargin
}
