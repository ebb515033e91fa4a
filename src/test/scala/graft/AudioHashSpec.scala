package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.AudioHash

/** Pins the audio amplitude-hash family: bit-parity with a plain-Scala
  * reference, the walked-layout metadata invariance (a LIST chunk in
  * front of `data` must not change the content hash), eligibility, and
  * the planted one-sample-edit pairing contract. */
class AudioHashSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def le(v: Long, n: Int): Array[Byte] =
    (0 until n).map(k => ((v >> (8 * k)) & 0xff).toByte).toArray

  /** Canonical 44-byte-header mono 8-bit WAV around the samples. */
  private def wav(rate: Int, samples: Array[Byte]): Array[Byte] =
    "RIFF".getBytes("US-ASCII") ++ le(36L + samples.length, 4) ++
      "WAVE".getBytes("US-ASCII") ++ "fmt ".getBytes("US-ASCII") ++
      le(16, 4) ++ le(1, 2) ++ le(1, 2) ++ le(rate, 4) ++ le(rate, 4) ++
      le(1, 2) ++ le(8, 2) ++
      "data".getBytes("US-ASCII") ++ le(samples.length, 4) ++ samples

  /** Same samples behind a LIST chunk between fmt and data — the
    * non-canonical layout only the chunk walk parses. */
  private def wavList(rate: Int, samples: Array[Byte]): Array[Byte] =
    "RIFF".getBytes("US-ASCII") ++ le(54L + samples.length, 4) ++
      "WAVE".getBytes("US-ASCII") ++ "fmt ".getBytes("US-ASCII") ++
      le(16, 4) ++ le(1, 2) ++ le(1, 2) ++ le(rate, 4) ++ le(rate, 4) ++
      le(1, 2) ++ le(8, 2) ++
      "LIST".getBytes("US-ASCII") ++ le(9, 4) ++
      "INFOGRAFX".getBytes("US-ASCII") ++ Array[Byte](0) ++ // odd + pad
      "data".getBytes("US-ASCII") ++ le(samples.length, 4) ++ samples

  /** Canonical-header mono 16-BIT little-endian WAV: each frame is a
    * (low, high) byte pair. */
  private def wav16(rate: Int, frames: Array[(Byte, Byte)]): Array[Byte] = {
    val data = frames.flatMap { case (lo, hi) => Array(lo, hi) }
    "RIFF".getBytes("US-ASCII") ++ le(36L + data.length, 4) ++
      "WAVE".getBytes("US-ASCII") ++ "fmt ".getBytes("US-ASCII") ++
      le(16, 4) ++ le(1, 2) ++ le(1, 2) ++ le(rate, 4) ++
      le(rate.toLong * 2, 4) ++ le(2, 2) ++ le(16, 2) ++
      "data".getBytes("US-ASCII") ++ le(data.length, 4) ++ data
  }

  private def fill(n: Int, seed: Long): Array[Byte] = {
    var s = seed
    Array.fill(n) { s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33).toByte }
  }

  /** Plain Scala reference of the amplitude-hash arithmetic (mono
    * 8-bit: frame = 1 byte). */
  private def refAhash(samples: Array[Byte]): Option[Long] = {
    val n = samples.length.toLong
    if (n < 64) return None
    val as = (0 until 64).map(k => samples(((k * n) / 64).toInt) & 0xffL)
    val tot = as.sum
    Some(as.zipWithIndex.map { case (a, k) =>
      if (64 * a > tot) 1L << k else 0L }.sum)
  }

  private def payloads(rows: (Long, Array[Byte])*) =
    rows.toSeq.toDF("media_id", "payload")

  test("amplitude hash matches the plain-Scala reference bit-for-bit") {
    val cases = Seq(
      1L -> fill(64, 5L), 2L -> fill(200, 7L), 3L -> fill(1000, 11L))
    val got = AudioHash.ahashOfPayloads(
        payloads(cases.map { case (id, s) => id -> wav(8000, s) }: _*))
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_frames"), r.getAs[Long]("ahash"))).toMap
    cases.foreach { case (id, s) =>
      assert(got(id) === ((s.length.toLong, refAhash(s).get)), s"clip $id")
    }
  }

  test("metadata-only difference (LIST chunk) is invisible to the content hash") {
    val s = fill(300, 17L)
    val out = AudioHash.ahashOfPayloads(payloads(
        1L -> wav(8000, s), 2L -> wavList(8000, s)))
      .collect().map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("ahash"))
      .toMap
    assert(out(1L) === out(2L),
      "same samples behind a LIST chunk must hash identically")
  }

  test("eligibility: < 64 frames, truncation clamp") {
    val s = fill(100, 23L)
    val full = wav(8000, s)
    val out = AudioHash.ahashOfPayloads(payloads(
        1L -> wav(8000, fill(63, 3L)), // too short
        2L -> full,
        3L -> full.take(44 + 80))) // declared 100, 80 present → clamps
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_frames"), r.getAs[Long]("ahash"))).toMap
    assert(!out.contains(1L))
    assert(out(2L)._1 === 100L)
    assert(out(3L)._1 === 80L)
    assert(out(3L)._2 === refAhash(s.take(80)).get,
      "the clamped hash votes over the frames actually present")
  }

  test("16-bit PCM probes the amplitude byte, not the noise-like low byte") {
    // envelope lives in the HIGH byte; the low byte is independent noise
    // — the r13 verdict nit: a low-byte probe would see two unrelated
    // streams here, the amplitude-byte probe sees the same clip twice
    val env = fill(200, 41L)
    val a = wav16(8000, fill(200, 43L).zip(env))
    val b = wav16(8000, fill(200, 47L).zip(env))
    val out = AudioHash.ahashOfPayloads(payloads(1L -> a, 2L -> b))
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_frames"), r.getAs[Long]("ahash"))).toMap
    assert(out(1L)._1 === 200L && out(2L)._1 === 200L)
    assert(out(1L)._2 === out(2L)._2,
      "same envelope over different low-byte noise must hash identically")
    assert(out(1L)._2 === refAhash(env).get,
      "the 16-bit hash is the 8-bit reference over the amplitude bytes")
  }

  test("best-copy survivor: the longest clip wins over the min id") {
    // constant samples: every probe reads the same amplitude whatever
    // the clip length, so the 320-frame clip and its 256-frame cut
    // hash EQUAL (Hamming 0) and pair — but their durations differ
    val long = wav(8000, Array.fill[Byte](320)(100))
    val short = wav(8000, Array.fill[Byte](256)(100))
    val other = wav(8000, fill(300, 555L))
    val got = AudioHash.dupClustersBestOfPayloads(payloads(
        1L -> short, 2L -> long, 3L -> other))
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("is_canonical"))).toMap
    assert(got(1L) === ((1L, false)),
      "cluster_id stays the component min, but the shorter copy loses")
    assert(got(2L) === ((1L, true)),
      "the longer larger-id clip is canonical under the duration policy")
    assert(got(3L) === ((3L, true)), "singleton stays its own canonical")
  }

  test("best-copy survivor: a zero-sample-rate clone never outranks a healthy copy") {
    // r14 advice: under `div greatest(rate, 1)` a clone whose header
    // declares sample_rate = 0 read duration n_frames·10⁶ and was
    // CROWNED canonical over every healthy member; the metric now
    // reads 0 for rate ≤ 0, so the corrupt copy always loses
    val healthy = wav(8000, Array.fill[Byte](256)(100))
    val corrupt = wav(0, Array.fill[Byte](256)(100))
    val got = AudioHash.dupClustersBestOfPayloads(payloads(
        1L -> corrupt, 2L -> healthy))
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("is_canonical"))).toMap
    assert(got(1L) === ((1L, false)),
      "the zero-rate clone must not be crowned canonical")
    assert(got(2L) === ((1L, true)),
      "the healthy copy wins despite the larger media_id")
  }

  test("planted one-sample edits pair; distinct clips do not") {
    val base = fill(400, 31L)
    val oneEdit = base.clone(); oneEdit(123) = 99
    val other = fill(400, 3131L)
    val pairs = AudioHash.dupPairsOfPayloads(payloads(
        1L -> wav(8000, base), 2L -> wav(8000, oneEdit),
        3L -> wavList(8000, base), 4L -> wav(8000, other)))
      .collect().map(r => (r.getAs[Long]("clip_a"), r.getAs[Long]("clip_b")))
      .toSet
    assert(pairs.contains((1L, 2L)), "one-sample edit must pair")
    assert(pairs.contains((1L, 3L)),
      "metadata re-wrap pairs at Hamming 0 through the walk")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "a distinct clip must not pair")
  }
}
