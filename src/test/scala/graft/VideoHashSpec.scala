package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.VideoHash

/** Pins the video content-hash family: bit-parity with a plain-Scala
  * reference, container-metadata invariance (an edited `moov` — new
  * mvhd duration, new tkhd dimensions — must not change the content
  * hash), the truncation clamp, eligibility, and the planted
  * one-byte-edit pairing contract. */
class VideoHashSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def be(v: Long, n: Int): Array[Byte] =
    (0 until n).map(k => ((v >> (8 * (n - 1 - k))) & 0xff).toByte).toArray

  private val matrix: Array[Byte] =
    be(0x00010000L, 4) ++ be(0, 4) ++ be(0, 4) ++
      be(0, 4) ++ be(0x00010000L, 4) ++ be(0, 4) ++
      be(0, 4) ++ be(0, 4) ++ be(0x40000000L, 4)

  /** Real `ftyp · moov(mvhd v0 · trak(tkhd v0)) · mdat` MP4 around the
    * coded content — the [[graft.multimodal.Media.containerHexSql]]
    * box sizes; `mdur`/`w`/`h` are the editable container metadata. */
  private def mp4(content: Array[Byte], mdur: Long = 1000L,
      w: Int = 640, h: Int = 480,
      declaredLen: Option[Int] = None): Array[Byte] = {
    val mvhd = be(108, 4) ++ "mvhd".getBytes("US-ASCII") ++
      be(0, 4) ++ be(0, 4) ++ be(0, 4) ++ be(600, 4) ++ be(mdur, 4) ++
      be(0x00010000L, 4) ++ be(0x0100L, 2) ++ Array.fill[Byte](10)(0) ++
      matrix ++ Array.fill[Byte](24)(0) ++ be(2, 4)
    val tkhd = be(92, 4) ++ "tkhd".getBytes("US-ASCII") ++
      be(7, 4) ++ be(0, 4) ++ be(0, 4) ++ be(1, 4) ++ be(0, 4) ++
      be(0, 4) ++ Array.fill[Byte](16)(0) ++ matrix ++
      be(w.toLong << 16, 4) ++ be(h.toLong << 16, 4)
    val trak = be(100, 4) ++ "trak".getBytes("US-ASCII") ++ tkhd
    val moov = be(216, 4) ++ "moov".getBytes("US-ASCII") ++ mvhd ++ trak
    val mdat = be(8L + declaredLen.getOrElse(content.length), 4) ++
      "mdat".getBytes("US-ASCII") ++ content
    be(16, 4) ++ "ftyp".getBytes("US-ASCII") ++
      "isom".getBytes("US-ASCII") ++ be(0, 4) ++ moov ++ mdat
  }

  private def fill(n: Int, seed: Long): Array[Byte] = {
    var s = seed
    Array.fill(n) { s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33).toByte }
  }

  /** Plain Scala reference of the content-hash arithmetic. */
  private def refAhash(content: Array[Byte]): Option[Long] = {
    val n = content.length.toLong
    if (n < 64) return None
    val bs = (0 until 64).map(k => content(((k * n) / 64).toInt) & 0xffL)
    val tot = bs.sum
    Some(bs.zipWithIndex.map { case (b, k) =>
      if (64 * b > tot) 1L << k else 0L }.sum)
  }

  private def payloads(rows: (Long, Array[Byte])*) =
    rows.toSeq.toDF("media_id", "payload")

  test("content hash matches the plain-Scala reference bit-for-bit") {
    val cases = Seq(
      1L -> fill(64, 5L), 2L -> fill(333, 7L), 3L -> fill(2000, 11L))
    val got = VideoHash.ahashOfPayloads(
        payloads(cases.map { case (id, c) => id -> mp4(c) }: _*))
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_units"), r.getAs[Long]("ahash"))).toMap
    cases.foreach { case (id, c) =>
      assert(got(id) === ((c.length.toLong, refAhash(c).get)), s"video $id")
    }
  }

  test("container-metadata edits (moov churn) are invisible to the content hash") {
    val c = fill(500, 17L)
    val out = VideoHash.ahashOfPayloads(payloads(
        1L -> mp4(c, mdur = 1000L, w = 640, h = 480),
        2L -> mp4(c, mdur = 77777L, w = 1920, h = 1080)))
      .collect().map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("ahash"))
      .toMap
    assert(out(1L) === out(2L),
      "same mdat behind an edited moov must hash identically")
  }

  test("eligibility: < 64 content bytes, no mdat, non-mp4; truncation clamp") {
    val c = fill(100, 23L)
    val noMdat = mp4(Array.emptyByteArray).take(16 + 216) // ftyp + moov only
    val out = VideoHash.ahashOfPayloads(payloads(
        1L -> mp4(fill(63, 3L)), // too short
        2L -> mp4(c),
        // declared 100 content bytes, 80 actually present → clamps
        3L -> mp4(c.take(80), declaredLen = Some(100)),
        4L -> noMdat,
        5L -> "not a video".getBytes("UTF-8")))
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_units"), r.getAs[Long]("ahash"))).toMap
    assert(!out.contains(1L) && !out.contains(4L) && !out.contains(5L))
    assert(out(2L)._1 === 100L)
    assert(out(3L)._1 === 80L)
    assert(out(3L)._2 === refAhash(c.take(80)).get,
      "the clamped hash votes over the content bytes actually present")
  }

  test("best-copy survivor: the most-content member wins over the min id") {
    // constant content bytes: every probe reads the same value whatever
    // the stream length, so the 300-byte video and its 240-byte cut
    // hash EQUAL (Hamming 0) and pair — but their content lengths differ
    val full = mp4(Array.fill[Byte](300)(7))
    val cut = mp4(Array.fill[Byte](240)(7))
    val other = mp4(fill(300, 555L))
    val got = VideoHash.dupClustersBestOfPayloads(payloads(
        1L -> cut, 2L -> full, 3L -> other))
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("is_canonical"))).toMap
    assert(got(1L) === ((1L, false)),
      "cluster_id stays the component min, but the cut copy loses")
    assert(got(2L) === ((1L, true)),
      "the intact larger-id copy is canonical under the content policy")
    assert(got(3L) === ((3L, true)), "singleton stays its own canonical")
  }

  test("planted one-byte edits pair; metadata re-uploads pair at Hamming 0; distinct content does not") {
    val base = fill(400, 31L)
    val oneEdit = base.clone(); oneEdit(123) = 99
    val other = fill(400, 3131L)
    val rows = VideoHash.ahashOfPayloads(payloads(
        1L -> mp4(base), 2L -> mp4(oneEdit),
        3L -> mp4(base, mdur = 5555L, w = 320, h = 240),
        4L -> mp4(other)))
    val pairs = graft.multimodal.Hamming64.pairsOfSketch(
        rows.select("media_id", "ahash"), "vid_a", "vid_b", 3)
      .collect().map(r => (r.getAs[Long]("vid_a"), r.getAs[Long]("vid_b")) ->
        r.getAs[Long]("hamming")).toMap
    assert(pairs.contains((1L, 2L)), "one-byte edit must pair")
    assert(pairs.get((1L, 3L)) === Some(0L),
      "a metadata-edited re-upload pairs at Hamming 0")
    assert(!pairs.keys.exists(p => p._1 == 4L || p._2 == 4L),
      "distinct content must not pair")
  }
}
