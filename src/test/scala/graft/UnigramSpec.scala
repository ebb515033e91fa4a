package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.text.{TextAnalysis, Unigram}

class UnigramSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  def docs(rows: (Long, String, String, String, Long)*) =
    rows.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")

  def hexOf(s: String): String =
    s.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString

  test("a dominant repeated word is learned as one piece and encodes to one id") {
    // "chair" dominates; rare words keep byte mass alive. After EM +
    // prune, 'chair' (5 bytes <= MaxPieceBytes) must be in the vocab,
    // and a doc of k repetitions must encode to exactly k ids.
    val d = docs(
      (1L, ("chair " * 30).trim, "en", "s", 0L),
      (2L, "chair chair chair", "en", "s", 0L),
      (3L, "zq xv chair", "en", "s", 0L))
    val vocab = Unigram.unigramVocab(d).collect()
      .map(r => r.getAs[String]("piece") ->
        (r.getAs[Long]("n_bytes"), r.getAs[Long]("cnt"))).toMap
    assert(vocab.contains(hexOf("chair")), s"vocab=${vocab.keys.toSeq.sorted}")
    // 34 occurrences of 'chair' across the corpus, each one piece
    assert(vocab(hexOf("chair"))._2 === 34L)
    val enc = Unigram.unigramEncode(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_unigram_tokens")).toMap
    assert(enc(2L) === 3L)
    assert(enc(1L) === 30L)
  }

  test("byte closure: every corpus byte stays in the vocabulary, unused ones at count 0") {
    // every word is fully absorbed by a multi-byte piece, so the raw
    // bytes go unused in the final segmentation — they must SURVIVE at
    // cnt 0 (else an incremental re-encode of unseen text has no path)
    val d = docs((1L, "dog dog dog dog", "en", "s", 0L))
    val vocab = Unigram.unigramVocab(d).collect()
      .map(r => r.getAs[String]("piece") ->
        (r.getAs[Long]("cnt"), r.getAs[Long]("cost_q20"))).toMap
    for (b <- "dog") {
      val p = hexOf(b.toString)
      assert(vocab.contains(p), s"byte $b ($p) missing from vocab")
      assert(vocab(p)._1 === 0L, s"byte $b should be unused (count 0)")
      // smoothing keeps the unused byte's cost FINITE
      assert(vocab(p)._2 < Unigram.InfCost)
    }
    assert(vocab(hexOf("dog"))._1 === 4L)
  }

  test("empty and NULL-text docs encode to 0, not errors") {
    val d = Seq[(Long, String, String, String, Long)](
      (1L, "word word", "en", "s", 0L), (2L, "", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .unionByName(Seq((3L, "en", "s", 0L)).toDF("doc_id", "lang", "source", "n_chars")
        .withColumn("text", org.apache.spark.sql.functions.lit(null: String))
        .select("doc_id", "text", "lang", "source", "n_chars"))
    val enc = Unigram.unigramEncode(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_unigram_tokens")).toMap
    assert(enc === Map(1L -> 2L, 2L -> 0L, 3L -> 0L))
  }

  test("fertility compares column-for-column with BPE on the same corpus") {
    val d = docs(
      (1L, "alpha beta alpha gamma", "en", "s", 0L),
      (2L, "beta beta delta", "fr", "s", 0L),
      (3L, "alpha", "en", "s", 0L))
    val uni = Unigram.unigramFertility(d)
    val bpe = TextAnalysis.bpeFertility(d)
    // same schema — the comparison face the two families share
    assert(uni.columns.toSeq === bpe.columns.toSeq)
    val u = uni.collect().map(r => r.getAs[String]("lang") ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("ids_per_token_millionths"))).toMap
    val b = bpe.collect().map(r => r.getAs[String]("lang") ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("ids_per_token_millionths"))).toMap
    // both count the SAME whitespace tokens; only the ids differ
    assert(u.keySet === b.keySet)
    for (l <- u.keySet) {
      assert(u(l)._1 === b(l)._1 && u(l)._2 === b(l)._2)
      // fertility >= 1: a word is at least one piece in either family
      assert(u(l)._3 >= 1000000L)
    }
    // every repeated word here fits MaxPieceBytes, so the unigram vocab
    // absorbs them whole: fertility is exactly 1.0 per language
    assert(u.values.forall(_._3 == 1000000L))
  }

  test("viterbi picks the cheaper segmentation, not the greedy-longest one") {
    // corpus where 'ab' is very frequent but 'abc' exists once: the
    // word 'abc' should segment through the cheap 'ab' + 'c' pieces
    // only if that beats 'abc' as a piece — under hard-EM counts the
    // 1-count 'abc' piece still wins its own word (PMI positive), so
    // pin the invariant that total encode cost is minimal by checking
    // n_unigram_tokens for 'abcabc' (6 bytes = one piece if learned,
    // else pieces of 'ab'/'c')
    val d = docs(
      (1L, "ab ab ab ab ab ab ab ab", "en", "s", 0L),
      (2L, "abcabc", "en", "s", 0L))
    val enc = Unigram.unigramEncode(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_unigram_tokens")).toMap
    // 'abcabc' is 6 bytes <= MaxPieceBytes: the whole word is a seed
    // candidate with count 1; whichever way EM lands, the encode must
    // be at most the byte spelling (6) and at least 1
    assert(enc(2L) >= 1L && enc(2L) <= 6L)
    assert(enc(1L) === 8L)
  }

  test("unigramTokenize: per-doc position counts tile unigramEncode; ids are vocab ranks") {
    val d = docs(
      (1L, "chair chair chair table", "en", "s", 0L),
      (2L, "chair table chair", "en", "s", 0L),
      (3L, "", "en", "s", 0L),
      (4L, null.asInstanceOf[String], "en", "s", 0L))
    val toks = Unigram.unigramTokenize(d).collect()
    // tiling: the sequence face has exactly unigramEncode's count per doc
    val counts = toks.groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) => id -> rs.length.toLong }
    val enc = Unigram.unigramEncode(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_unigram_tokens"))
      .toMap
    assert(counts.getOrElse(1L, 0L) === enc(1L))
    assert(counts.getOrElse(2L, 0L) === enc(2L))
    // empty/NULL docs emit NO rows (encode reports their 0 instead)
    assert(!counts.contains(3L) && !counts.contains(4L))
    // positions are 0-based and gapless per doc
    for ((id, rs) <- toks.groupBy(_.getAs[Long]("doc_id")))
      assert(rs.map(_.getAs[Long]("pos")).sorted.toSeq
        === (0L until rs.length.toLong).toSeq, s"doc $id positions")
    // ids are 1-based vocab ranks: all within [1, |vocab|] (0 is the
    // reserved unk for never-seen bytes, impossible on the induction
    // corpus under byte closure)
    val vocabN = Unigram.unigramVocab(d).count()
    assert(toks.forall { r =>
      val id = r.getAs[Long]("token_id"); id >= 1L && id <= vocabN })
  }

  test("frozen encode under the persisted vocab ≡ induced encode; novel bytes survive") {
    val d = docs(
      (1L, ("chair " * 20).trim, "en", "s", 0L),
      (2L, "chair table chair", "en", "s", 0L),
      (3L, "zq xv chair", "en", "s", 0L),
      (4L, "", "en", "s", 0L))
    val vocab = Unigram.unigramVocab(d)
    val induced = Unigram.unigramEncode(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val frozen = Unigram.unigramEncodeWith(d, vocab).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(frozen === induced,
      "the frozen path must reproduce the learner's final segmentation")
    // a LATER batch with words (and one byte, 'é') never seen at
    // induction still encodes deterministically — the byte closure
    // keeps a path alive for known bytes and a map miss only prices,
    // never kills, the unseen byte
    val batch = docs(
      (10L, "chair chair novel", "en", "s", 0L),
      (11L, "café", "fr", "s", 0L))
    val out = Unigram.unigramEncodeWith(batch, vocab).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(10L) >= 3L, s"got ${out(10L)}") // 2 chair pieces + ≥1 for 'novel'
    assert(out(11L) >= 1L)                     // the é byte segments, no error
    // determinism: a second run under the same artifact is identical
    val again = Unigram.unigramEncodeWith(batch, vocab).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === out)
    // adversarial corner: a 12000-byte word made ENTIRELY of a byte the
    // induction never saw accumulates per-byte miss costs — uncapped
    // that sum crosses int64 (ANSI error in both engines); the cost cap
    // saturates the ordering instead, and the word still segments
    val hostile = docs((20L, "j" * 12000, "en", "s", 0L))
    val h = Unigram.unigramEncodeWith(hostile, vocab).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(20L) >= 1L, s"hostile word vanished: ${h(20L)}")
  }
}
