package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ml.Similarity

/** Structured Streaming twin of the incremental embedding-ANN operator
  * ([[graft.ml.Similarity.incrementalAnnPairs]]): an incoming embedding
  * stream matched against the PERSISTED corpus sketches as it arrives —
  * the real-time face of the nightly ingest path, the way
  * [[DocStream.dedupAgainstCorpus]] is the real-time face of the
  * fingerprint anti-join.
  *
  * Scale/state discipline (the design point, same as [[DocStream]]):
  * every per-row stage is stateless map work (quantize → norm → L bucket
  * ids, the SAME expressions batch uses via
  * [[graft.ml.Similarity.bucketsExpr]]/`dotExpr`, so a vector admitted
  * here and re-scored in batch gets bit-identical numbers), and both
  * joins are STREAM-STATIC — the corpus band relation and vector
  * relation are parquet-backed relations probed per micro-batch (at
  * scale: bucketed by (tbl, bucket) / vec_id, so the probe prunes), and
  * corpus history never enters streaming state. The only stateful
  * operator is the multi-table collision dedup, bounded by the
  * watermark horizon. Stream-vs-stream pairs WITHIN that horizon are
  * [[annMatchesIntraStream]]'s job (a bucket-keyed stream-stream
  * self-join whose state the event-time range predicate bounds);
  * pairs across a longer span stay the batch operator's job on the
  * accumulated shard — the same history-belongs-to-batch line
  * [[DocStream]] draws.
  */
object EmbedStream {

  /** Event-time from an epoch-ns BIGINT `ts` — the same shared ns→µs
    * floor as every other time consumer ([[EventStream.eventTime]]). */
  private val eventTime: Column = EventStream.eventTime

  /** `(vec_id, neighbor_id, cos_sim, event_time)` — for each streamed
    * embedding, its above-threshold cosine matches among the bucket
    * co-residents in the persisted corpus sketches. One output row per
    * (stream vector, corpus neighbor) pair within the watermark horizon
    * (multi-table collisions collapse via
    * `dropDuplicatesWithinWatermark`, the streaming analog of the batch
    * operator's `distinct`).
    */
  def annMatchesAgainstCorpus(embeds: DataFrame, corpusVecs: DataFrame,
      corpusBands: DataFrame, simThreshold: Double = 0.1,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val v = embeds
      .select(col("vec_id"), Similarity.quantizeExpr(col("embedding")).as("qv"),
        eventTime.as("event_time"))
      .withColumn("nrm",
        sqrt(Similarity.dotExpr(embeds, col("qv"), col("qv")).cast("double")))
      .filter(col("nrm") > 0.0)
      .withWatermark("event_time", watermarkDelay)
    // bands inline (posexplode of the L bucket ids) rather than through
    // annBands + a join back to the stream — re-joining a stream with a
    // projection of itself would be a stateful stream-stream join
    val banded = v.select(col("vec_id"), col("qv"), col("nrm"), col("event_time"),
        posexplode(Similarity.bucketsExpr(v, col("qv"))).as(Seq("tbl", "bucket")))
      .select(col("vec_id"), col("qv"), col("nrm"), col("event_time"),
        col("tbl").cast("long").as("tbl"), col("bucket"))
    val cand = banded.join(
        corpusBands.select(col("vec_id").as("neighbor_id"), col("tbl"), col("bucket")),
        Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("neighbor_id"))
    val cv = corpusVecs.select(col("vec_id").as("neighbor_id"),
      col("qv").as("cqv"), col("nrm").as("cnrm"))
    cand.join(cv, "neighbor_id")
      // same ragged-dimension guard as every batch scorer
      .filter(size(col("qv")) === size(col("cqv")))
      .select(col("vec_id"), col("neighbor_id"),
        (Similarity.dotExpr(embeds, col("qv"), col("cqv")).cast("double")
          / (col("nrm") * col("cnrm"))).as("cos_sim"),
        col("event_time"))
      .filter(col("cos_sim") >= lit(simThreshold))
      .dropDuplicatesWithinWatermark("vec_id", "neighbor_id")
  }

  /** Intra-stream ANN pairs WITHIN the watermark horizon — the embedding
    * face of [[DocStream.nearDupIntraStream]], completing the
    * stream-vs-stream contract this file used to defer wholesale: two
    * embeddings arriving within `horizon` of each other that the batch
    * [[graft.ml.Similarity.embedAnnPairs]] sweep would pair are paired
    * at ingest, with bit-identical quantization/buckets/cosine (same
    * expressions), so the emitted `cos_sim` equals batch's.
    *
    * Same join-condition discipline as the text twin (learned there the
    * hard way): ONLY the (tbl, bucket) equi-keys, the event-time range,
    * a `=!=` self-pair guard, and the ragged-dimension `===` guard may
    * sit in the condition — order predicates on non-time columns crash
    * the state-watermark extractor, so direction collapses structurally
    * (least/greatest) and the threshold filter sits downstream of the
    * multi-bucket pair dedup, out of pushdown's reach. Join state =
    * the last `horizon` of banded rows, evicted by the range predicate;
    * older pairs are batch's job by contract. */
  def annMatchesIntraStream(embeds: DataFrame, simThreshold: Double = 0.1,
      horizon: String = "1 hour"): DataFrame = {
    val v = embeds
      .select(col("vec_id"), Similarity.quantizeExpr(col("embedding")).as("qv"),
        eventTime.as("event_time"))
    val vn = v.withColumn("nrm",
        sqrt(Similarity.dotExpr(v, col("qv"), col("qv")).cast("double")))
      .filter(col("nrm") > 0.0)
    val banded = vn.select(col("vec_id"), col("qv"), col("nrm"), col("event_time"),
        posexplode(Similarity.bucketsExpr(vn, col("qv"))).as(Seq("tbl", "bucket")))
    val a = banded.select(col("vec_id").as("vid_a"), col("qv").as("qa"),
        col("nrm").as("na"), col("tbl").as("tbl_a"), col("bucket").as("bkt_a"),
        col("event_time").as("t_a"))
      .withWatermark("t_a", horizon)
    val b = banded.select(col("vec_id").as("vid_b"), col("qv").as("qb"),
        col("nrm").as("nb"), col("tbl").as("tbl_b"), col("bucket").as("bkt_b"),
        col("event_time").as("t_b"))
      .withWatermark("t_b", horizon)
    // one-sided range (t_b >= t_a): the later arrival always sits on the
    // b side, so event_time below is deterministically max(arrivals) —
    // see DocStream.nearDupIntraStream for the race the symmetric
    // spelling had (round-8 advice)
    val paired = a.join(b,
      col("tbl_a") === col("tbl_b") && col("bkt_a") === col("bkt_b") &&
        col("vid_a") =!= col("vid_b") &&
        size(col("qa")) === size(col("qb")) &&
        col("t_b") >= col("t_a") &&
        col("t_b") <= col("t_a") + expr(s"INTERVAL '$horizon'"))
    // cos_sim is symmetric in (a, b), so scoring before the structural
    // direction collapse is order-independent; t_b rides through as the
    // event-time column (alias keeps the propagated watermark)
    paired.select(
        least(col("vid_a"), col("vid_b")).as("vec_a"),
        greatest(col("vid_a"), col("vid_b")).as("vec_b"),
        (Similarity.dotExpr(paired, col("qa"), col("qb")).cast("double")
          / (col("na") * col("nb"))).as("cos_sim"),
        col("t_b").as("event_time"))
      .dropDuplicatesWithinWatermark("vec_a", "vec_b")
      .filter(col("cos_sim") >= lit(simThreshold))
  }

  /** Streaming PQ encode — the stream face of
    * [[Similarity.pqEncode]]: each arriving embedding is sliced into
    * subspaces and coded against the FROZEN corpus-trained codebooks
    * ([[Similarity.pqCodebookArrays]] — an M-row static relation that
    * broadcasts into the stream-static join). The argmin folds INSIDE
    * the row over the cid-sorted candidate array (strict-less keeps the
    * smallest cid on ties — the [[Similarity]] `pqArgmin` tie-break),
    * so the whole query is STATELESS map work: no watermark, no state
    * store, nothing to evict. A vector coded on ingest and re-coded in
    * a batch sweep gets the bit-identical (code, qerr) — the
    * persisted-sketch discipline every incremental twin here follows
    * (EventStreamSpec pins parity against the batch encode). */
  def pqEncodeStream(embeds: DataFrame, cbArr: DataFrame): DataFrame = {
    val v = embeds
      .select(col("vec_id"), Similarity.quantizeExpr(col("embedding")).as("qv"),
        eventTime.as("event_time"))
      .withColumn("nrm2", Similarity.dotExpr(embeds, col("qv"), col("qv")))
      .filter(col("nrm2") > 0L)
    // slice inline with event_time carried on the projection — joining
    // the stream back to a projection of itself would be stateful
    val sliced = v.select(col("vec_id"), col("event_time"),
        posexplode(array((0 until Similarity.PqSubspaces).map { m =>
          val ds = floor(size(col("qv")) / lit(Similarity.PqSubspaces)).cast("int")
          slice(col("qv"), lit(m) * ds + 1, ds)
        }: _*)).as(Seq("m", "sqv")))
      .filter(size(col("sqv")) > 0)
      .select(col("vec_id"), col("m").cast("long").as("m"), col("sqv"),
        col("event_time"))
    val worst = Long.MaxValue
    sliced.join(broadcast(cbArr), Seq("m"))
      .select(col("vec_id"), col("m"), col("event_time"),
        aggregate(
          filter(col("cands"), c => size(c.getField("cqv")) === size(col("sqv"))),
          struct(lit(worst).as("sqd"), lit(-1L).as("cid")),
          (acc, c) => {
            val d = aggregate(
              zip_with(col("sqv"), c.getField("cqv"), (x, y) => (x - y) * (x - y)),
              lit(0L), _ + _)
            when(d < acc.getField("sqd"),
              struct(d.as("sqd"), c.getField("cid").as("cid"))).otherwise(acc)
          }).as("best"))
      .filter(col("best.cid") >= 0L)
      .select(col("vec_id"), col("m"), col("best.cid").as("code"),
        col("best.sqd").as("qerr"), col("event_time"))
  }
}
