package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.MediaKeep

/** Pins the composed media-lake keep verdict: kind sniff, decode
  * eligibility, exact payload dup, per-modality content clusters with
  * copy→keeper edges, and keep as the conjunction. */
class MediaKeepSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def le(v: Long, n: Int): Array[Byte] =
    (0 until n).map(k => ((v >> (8 * k)) & 0xff).toByte).toArray
  private def be(v: Long, n: Int): Array[Byte] =
    (0 until n).map(k => ((v >> (8 * (n - 1 - k))) & 0xff).toByte).toArray

  private def bmp(w: Int, h: Int, pix: Array[Byte]): Array[Byte] =
    "BM".getBytes("US-ASCII") ++ le(54L + pix.length, 4) ++ le(0, 4) ++
      le(54, 4) ++ le(40, 4) ++ le(w, 4) ++ le(h, 4) ++ le(1, 2) ++
      le(24, 2) ++ Array.fill[Byte](24)(0) ++ pix
  private def rowBytes(w: Int): Int = ((24 * w + 31) / 32) * 4

  private def wav(rate: Int, samples: Array[Byte]): Array[Byte] =
    "RIFF".getBytes("US-ASCII") ++ le(36L + samples.length, 4) ++
      "WAVE".getBytes("US-ASCII") ++ "fmt ".getBytes("US-ASCII") ++
      le(16, 4) ++ le(1, 2) ++ le(1, 2) ++ le(rate, 4) ++ le(rate, 4) ++
      le(1, 2) ++ le(8, 2) ++
      "data".getBytes("US-ASCII") ++ le(samples.length, 4) ++ samples

  private val matrix: Array[Byte] =
    be(0x00010000L, 4) ++ be(0, 4) ++ be(0, 4) ++ be(0, 4) ++
      be(0x00010000L, 4) ++ be(0, 4) ++ be(0, 4) ++ be(0, 4) ++
      be(0x40000000L, 4)
  private def mp4(content: Array[Byte], mdur: Long): Array[Byte] = {
    val mvhd = be(108, 4) ++ "mvhd".getBytes("US-ASCII") ++ be(0, 4) ++
      be(0, 4) ++ be(0, 4) ++ be(600, 4) ++ be(mdur, 4) ++
      be(0x00010000L, 4) ++ be(0x0100L, 2) ++ Array.fill[Byte](10)(0) ++
      matrix ++ Array.fill[Byte](24)(0) ++ be(2, 4)
    val tkhd = be(92, 4) ++ "tkhd".getBytes("US-ASCII") ++ be(7, 4) ++
      be(0, 4) ++ be(0, 4) ++ be(1, 4) ++ be(0, 4) ++ be(0, 4) ++
      Array.fill[Byte](16)(0) ++ matrix ++ be(640L << 16, 4) ++
      be(480L << 16, 4)
    be(16, 4) ++ "ftyp".getBytes("US-ASCII") ++
      "isom".getBytes("US-ASCII") ++ be(0, 4) ++
      be(216, 4) ++ "moov".getBytes("US-ASCII") ++ mvhd ++
      be(100, 4) ++ "trak".getBytes("US-ASCII") ++ tkhd ++
      be(8L + content.length, 4) ++ "mdat".getBytes("US-ASCII") ++ content
  }

  private def fill(n: Int, seed: Long): Array[Byte] = {
    var s = seed
    Array.fill(n) { s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33).toByte }
  }

  test("kind, eligibility, exact dup, content dup, keep — all gates on one lake") {
    val w = 16; val h = 16; val rb = rowBytes(w)
    val pixA = fill(rb * h, 3L)
    val pixEdit = pixA.clone(); pixEdit(rb * 4 + 9) = 55
    val vidContent = fill(500, 17L)
    val rows = Seq[(Long, Array[Byte])](
      1L -> bmp(w, h, pixA), // keeper of the exact pair + cluster root
      2L -> bmp(w, h, pixA), // byte-identical copy → exact dup
      3L -> bmp(w, h, pixEdit), // one-pixel edit → content dup of 1
      4L -> wav(8000, fill(400, 7L)), // distinct clip → clean keep
      5L -> "just some text, no container".getBytes("UTF-8"), // raw
      7L -> mp4(vidContent, 1000L), // keeper of the video pair
      8L -> mp4(vidContent, 99999L), // metadata-edited → EXACT differs,
        // content identical → content dup of 7
      9L -> wav(8000, fill(20, 9L))) // wav magic but < 64 frames
    val withNull = rows.toDF("media_id", "payload")
      .unionByName(Seq((6L, null.asInstanceOf[Array[Byte]]))
        .toDF("media_id", "payload"))
    val got = MediaKeep.mediaKeepOfPayloads(withNull).collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[String]("kind"), r.getAs[Boolean]("eligible"),
          r.getAs[Boolean]("is_exact_dup"), r.getAs[Boolean]("is_content_dup"),
          r.getAs[Boolean]("keep")))).toMap
    assert(got(1L) === (("bmp", true, false, false, true)),
      "the exact keeper / cluster root is the one kept copy")
    assert(got(2L) === (("bmp", true, true, true, false)),
      "a byte-identical copy is an exact dup AND a content-cluster member")
    assert(got(3L) === (("bmp", true, false, true, false)),
      "a one-pixel edit is a content dup without being an exact dup")
    assert(got(4L) === (("wav", true, false, false, true)))
    assert(got(5L) === (("raw", false, false, false, false)),
      "a raw payload is ineligible but not any kind of dup")
    assert(got(6L)._1 === null)
    assert(got(6L) === ((null, false, false, false, false)))
    assert(got(7L) === (("mp4", true, false, false, true)))
    assert(got(8L) === (("mp4", true, false, true, false)),
      "a metadata-edited re-upload is a CONTENT dup (exact fp differs)")
    assert(got(9L) === (("wav", false, false, false, false)),
      "a sniffable but too-short clip is ineligible")
  }
}
