package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Similarity
import graft.streaming.EmbedStream

/** Drives the streaming ANN-ingest operator with an in-memory source
  * against a small static corpus and checks it against the batch
  * operator's semantics (same buckets, same cosines, corpus-side only).
  */
class EmbedStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  val T: Long = 1704067200L * 1000000000L // 2024-01-01T00:00:00Z in ns

  def corpusDf(rows: (Long, Seq[Float])*) =
    rows.toSeq.map { case (id, v) => (id, v, 0) }.toDF("vec_id", "embedding", "label")

  test("streamed embeddings match the persisted corpus sketches exactly as batch would") {
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(97)
    val base = (0L until 20L).map(i => i -> Seq.fill(12)(rnd.nextFloat() - 0.5f))
    val corpusV = Similarity.vectors(corpusDf(base: _*)).localCheckpoint()
    val corpusB = Similarity.annBands(corpusV).localCheckpoint()

    // stream: a near-copy of corpus vector 0 (must match it), the same
    // row sent twice (multi-arrival must collapse within the watermark),
    // and a zero vector (must be dropped by the norm filter, not crash)
    val nearCopy = base(0)._2.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f)
    val src = MemoryStream[(Long, Long, Seq[Float])]
    src.addData(
      (100L, T, nearCopy),
      (100L, T + 1000L, nearCopy),
      (101L, T, Seq.fill(12)(0f)))
    val embeds = src.toDF().toDF("vec_id", "ts", "embedding")
    val name = s"embed_stream_${System.nanoTime()}"
    val q = EmbedStream.annMatchesAgainstCorpus(embeds, corpusV, corpusB,
        simThreshold = -1.0) // keep every collision: the property is the set
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table(name).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cos_sim")).toMap

    // ground truth: the batch incremental operator on the same shard
    // (corpus-side pairs only — the stream has no intra-stream pairing)
    val batch = Similarity.incrementalAnnPairs(
        corpusDf(100L -> nearCopy), corpusV, corpusB, simThreshold = -1.0)
      .collect()
      .filter(r => r.getAs[Long]("vec_b") == 100L) // (corpus, stream) pairs
      .map(r => (100L, r.getAs[Long]("vec_a")) -> r.getAs[Double]("cos_sim")).toMap
    assert(got === batch)
    // the planted near-copy is matched to its original, at cosine ≈ 1,
    // exactly once despite the double send and the multi-table collision
    assert(got.contains((100L, 0L)))
    assert(got((100L, 0L)) > 0.99)
    assert(!got.keys.exists(_._1 == 101L), "zero vector must be norm-filtered")
  }

  test("collision-dedup state stays bounded by the watermark horizon across batches") {
    // Round-5 verdict #7 (the ANN face): the only stateful operator is
    // the multi-table collision dedup, and its state must track the
    // watermark horizon, not the stream's history — 21 matched pairs
    // stream through, state ends at 2. Streamed vectors reuse exact
    // corpus coordinates (identical quantization ⇒ collides in every
    // table ⇒ deterministic one pair per streamed vector).
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(31)
    val base = (0L until 3L).map(i => i -> Seq.fill(12)(rnd.nextFloat() - 0.5f))
    val corpusV = Similarity.vectors(corpusDf(base: _*)).localCheckpoint()
    val corpusB = Similarity.annBands(corpusV).localCheckpoint()
    val H = 3600L * 1000000000L
    val src = MemoryStream[(Long, Long, Seq[Float])]
    val name = s"embed_state_${System.nanoTime()}"
    val q = EmbedStream.annMatchesAgainstCorpus(src.toDF()
        .toDF("vec_id", "ts", "embedding"), corpusV, corpusB,
        simThreshold = 0.99) // keep only the planted identical-vector pair
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // batch 1: 10 copies of corpus vec 0 at T; batch 2: 10 copies of
      // vec 1 at T+3h (batch-1 pairs still in state — watermark trails);
      // batches 3/4 advance the watermark past each earlier population
      src.addData((100 until 110).map(i => (i.toLong, T, base(0)._2)): _*)
      q.processAllAvailable()
      src.addData((110 until 120).map(i => (i.toLong, T + 3 * H, base(1)._2)): _*)
      q.processAllAvailable()
      src.addData((120L, T + 6 * H, base(2)._2))
      q.processAllAvailable()
      src.addData((121L, T + 9 * H, base(2)._2))
      q.processAllAvailable()
      val state = q.recentProgress.toSeq
        .filter(_.stateOperators.nonEmpty).map(_.stateOperators.head.numRowsTotal)
      assert(state.max >= 20L,
        s"state must actually have held both 10-pair batches: $state")
      assert(state.last <= 2L,
        s"state must end at the pairs inside the horizon: $state")
      // every pair reached the sink exactly once (10+10+1+1)
      assert(spark.table(name).count() === 22L)
    } finally q.stop()
  }

  test("intra-stream ANN pairs within the horizon = the batch pairing") {
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(53)
    val v0 = Seq.fill(12)(rnd.nextFloat() - 0.5f)
    val nearCopy = v0.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f)
    val unrelated = Seq.fill(12)(rnd.nextFloat() - 0.5f)
    // vectors 1 and 2 are near-copies arriving 1 s apart; 3 is unrelated;
    // 4 is a zero vector (norm-filtered, must not crash the self-join)
    val streamRows = Seq(
      (1L, T, v0),
      (2L, T + 1000000000L, nearCopy),
      (3L, T + 2000000000L, unrelated),
      (4L, T + 3000000000L, Seq.fill(12)(0f)))
    val src = MemoryStream[(Long, Long, Seq[Float])]
    src.addData(streamRows: _*)
    val name = s"embed_intra_${System.nanoTime()}"
    val q = EmbedStream.annMatchesIntraStream(
        src.toDF().toDF("vec_id", "ts", "embedding"), simThreshold = 0.9)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(name).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")) ->
        r.getAs[Double]("cos_sim")).toMap
    // batch ground truth on the same rows, same threshold
    val batch = Similarity.embedAnnPairs(
        corpusDf(streamRows.map { case (id, _, e) => (id, e) }: _*),
        simThreshold = 0.9)
      .collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")) ->
        r.getAs[Double]("cos_sim")).toMap
    assert(streamed === batch)
    assert(streamed.keySet === Set((1L, 2L)),
      s"only the planted near-copy pair may emit: $streamed")
    assert(streamed((1L, 2L)) > 0.99)
  }

  test("streaming PQ encode is bit-identical to the batch encode (stateless, no watermark)") {
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(61)
    val corpus = (0L until 40L).map(i => i -> Seq.fill(8)(rnd.nextFloat() - 0.5f))
    val cbArr = Similarity.pqCodebookArrays(
      Similarity.pqCodebooksOf(corpusDf(corpus: _*))).localCheckpoint()

    // shard: two fresh vectors, one exact corpus copy (must code like its
    // original), and a zero vector (norm-filtered, not crashed)
    val shard = Seq(
      100L -> Seq.fill(8)(rnd.nextFloat() - 0.5f),
      101L -> Seq.fill(8)(rnd.nextFloat() - 0.5f),
      102L -> corpus(5)._2)
    val src = MemoryStream[(Long, Long, Seq[Float])]
    src.addData(shard.map { case (id, v) => (id, T, v) } :+
      ((103L, T, Seq.fill(8)(0f))): _*)
    val name = s"pq_stream_${System.nanoTime()}"
    val q = EmbedStream.pqEncodeStream(
        src.toDF().toDF("vec_id", "ts", "embedding"), cbArr)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table(name).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("m")) ->
        ((r.getAs[Long]("code"), r.getAs[Long]("qerr")))).toMap

    val cb = Similarity.pqCodebooksOf(corpusDf(corpus: _*))
    val batch = Similarity.pqEncode(corpusDf(shard: _*), cb).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("m")) ->
        ((r.getAs[Long]("code"), r.getAs[Long]("qerr")))).toMap
    assert(got === batch)
    val corpusCodes = Similarity.pqEncode(corpusDf(corpus: _*), cb).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("m")) ->
        ((r.getAs[Long]("code"), r.getAs[Long]("qerr")))).toMap
    for (m <- 0L until Similarity.PqSubspaces.toLong)
      assert(got((102L, m)) === corpusCodes((5L, m)))
    assert(!got.keys.exists(_._1 == 103L), "zero vector must be norm-filtered")
    // no state: the query plan carries no stateful operator
    assert(q.lastProgress.stateOperators.isEmpty, "PQ encode must be stateless")
  }
}
