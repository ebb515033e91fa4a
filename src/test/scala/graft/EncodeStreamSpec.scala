package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EncodeStream
import graft.text.{TextAnalysis, Unigram}

/** Pins the streaming frozen-tokenizer encode to the nightly batch
  * path bit-for-bit: same persisted vocabulary, same segmentation,
  * same ids — including unseen words and a never-seen BYTE taking the
  * deterministic miss path to id 0. */
class EncodeStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  val T: Long = 1704067200L * 1000000000L // 2024-01-01T00:00:00Z in ns

  def docs(rows: (Long, String)*) =
    rows.toSeq.map { case (id, tx) => (id, tx, "en", "src0", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("stream encode under the reloaded vocab is bit-identical to batch") {
    implicit val ctx = spark.sqlContext
    // induce once on an ASCII-only corpus, persist the (piece, cnt)
    // artifact — the frozen side reloads THIS relation, never the learner
    val corpus = docs(
      0L -> "the cat sat on the mat", 1L -> "the dog sat on the log",
      2L -> "cats and dogs and mats", 3L -> "the the the cat cat log",
      4L -> "dog mat log cat sat on")
    val vocab = Unigram.unigramVocab(corpus)
      .select("piece", "cnt").localCheckpoint()

    // the arriving shard: seen words, an unseen word made of seen bytes, an
    // unseen BYTE (ÿ = C3 BF — the corpus is pure ASCII), an empty doc,
    // and a NULL doc
    val shard = Seq(
      100L -> "the cat sat on log", 101L -> "dogcatmat nÿq",
      102L -> "", 103L -> null.asInstanceOf[String])

    val src = MemoryStream[(Long, String, Long)]
    src.addData(shard.map { case (id, tx) => (id, tx, T) }: _*)
    val name = s"encode_stream_${System.nanoTime()}"
    val q = EncodeStream.unigramEncodeStream(
        src.toDF().toDF("doc_id", "text", "ts"), vocab)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table(name).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](r.fieldIndex("ids")).toList).toMap

    // ground truth: the batch frozen apply over the same (doc_id, toks)
    val t = shard.toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    val batch = Unigram.unigramDocIdsWith(t, vocab).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](r.fieldIndex("ids")).toList).toMap

    assert(got === batch)
    assert(got(100L).nonEmpty && got(100L).forall(_ > 0L),
      "seen-vocab words must encode to real ids")
    assert(got(101L).contains(0L),
      "a never-seen byte must take the reserved unk id 0, not vanish")
    assert(got(102L) === List.empty && got(103L) === List.empty)
  }

  test("re-sending a doc re-encodes identically (stateless — no dedup, no state)") {
    implicit val ctx = spark.sqlContext
    val corpus = docs(0L -> "alpha beta gamma", 1L -> "beta gamma delta")
    val vocab = Unigram.unigramVocab(corpus)
      .select("piece", "cnt").localCheckpoint()
    val src = MemoryStream[(Long, String, Long)]
    val name = s"encode_stream_re_${System.nanoTime()}"
    val q = EncodeStream.unigramEncodeStream(
        src.toDF().toDF("doc_id", "text", "ts"), vocab)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      src.addData((7L, "alpha delta", T))
      q.processAllAvailable()
      src.addData((7L, "alpha delta", T + 1000L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name).collect()
      .map(r => r.getSeq[Long](r.fieldIndex("ids")).toList).toSeq
    assert(rows.size === 2, "stateless: both arrivals pass through")
    assert(rows.distinct.size === 1, "identical input → identical ids")
  }

  test("BPE stream encode under the reloaded merge table is bit-identical to batch") {
    implicit val ctx = spark.sqlContext
    val corpus = docs(
      0L -> "the cat sat on the mat", 1L -> "the dog sat on the log",
      2L -> "cats and dogs and mats", 3L -> "the the the cat cat log")
    val merges = TextAnalysis.bpeMerges(corpus).localCheckpoint()

    val shard = Seq(
      100L -> "the cat sat on log", 101L -> "dogcatmat n\u00ffq",
      102L -> "", 103L -> null.asInstanceOf[String])
    val src = MemoryStream[(Long, String, Long)]
    src.addData(shard.map { case (id, tx) => (id, tx, T) }: _*)
    val name = s"bpe_encode_stream_${System.nanoTime()}"
    val q = EncodeStream.bpeEncodeStream(
        src.toDF().toDF("doc_id", "text", "ts"), merges)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table(name).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[Long](r.fieldIndex("ids")).toList).toMap

    val t = shard.toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    val batch = TextAnalysis.bpeDocIdsFromToksUnderRounds(t,
        TextAnalysis.bpeRoundsFromMergeTable(merges)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[Long](r.fieldIndex("ids")).toList).toMap

    assert(got === batch)
    assert(got(100L).exists(_ >= 256L),
      "induction-corpus words must use at least one learned merge")
    assert(got(101L).nonEmpty, "unseen text encodes deterministically")
    assert(got(102L) === List.empty && got(103L) === List.empty)
  }
}
