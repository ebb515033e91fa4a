package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Media

class MediaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  def docs(rows: (Long, String, String, String, Long)*) =
    rows.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")

  val sample = Seq(
    (1L, "hello", "en", "src0", 5L),
    (2L, "héllo", "fr", "src1", 5L),   // é = 2 UTF-8 bytes, both ≥ 0x80
    (3L, "", "en", "src2", 0L))

  test("golden: byte features of known payloads") {
    val out = Media.mediaFeatures(docs(sample: _*))
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_bytes"), r.getAs[String]("header_hex"),
          r.getAs[Long]("byte_sum"), r.getAs[Long]("n_hi_bytes"))).toMap
    // "hello" = 68 65 6C 6C 6F
    assert(out(1L) === (5L, "68656C6C6F", 0x68L + 0x65 + 0x6c + 0x6c + 0x6f, 0L))
    // "héllo" = 68 C3 A9 6C 6C 6F (6 bytes, é → C3 A9)
    assert(out(2L) === (6L, "68C3A96C6C6F",
      0x68L + 0xc3 + 0xa9 + 0x6c + 0x6c + 0x6f, 2L))
    assert(out(3L) === (0L, "", 0L, 0L))
  }

  test("typed mapPartitions decoder agrees with the expression plan row-for-row") {
    val a = Media.mediaFeatures(docs(sample: _*))
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    val b = Media.mediaFeaturesPartitioned(docs(sample: _*))
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("frameSample: stride-samples complete frames; short payloads emit none") {
    // 40-byte payload of 'a'..'(char 40)' → 2 complete 16-byte frames
    // (blocks 0 and 1); stride 4 samples only block 0. 5-byte payload →
    // no complete frame → no rows.
    val text40 = (0 until 40).map(i => ('a' + i % 26).toChar).mkString
    val out = Media.frameSample(docs(
      (1L, text40, "en", "s", 40L), (2L, "hello", "en", "s", 5L)))
      .collect().map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("frame_idx")) ->
        (r.getAs[String]("frame_hex"), r.getAs[Long]("frame_sum")))
    assert(out.length === 1)
    val ((id, idx), (hex16, sum)) = out.head
    assert(id === 1L && idx === 0L)
    val expectBytes = text40.take(16).map(_.toLong)
    assert(hex16 === text40.take(16).map(c => f"${c.toInt}%02X").mkString)
    assert(sum === expectBytes.sum)
  }

  test("mediaResize stride-downsamples bytes; empty payload resizes to empty") {
    val out = Media.mediaResize(docs(
      (1L, "abcdefgh", "en", "s", 8L), (2L, "", "en", "s", 0L)), stride = 4)
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_bytes"), r.getAs[String]("resized_hex"),
          r.getAs[Long]("n_resized_bytes"))).toMap
    // bytes 0 and 4 of "abcdefgh" = 'a' (61), 'e' (65)
    assert(out(1L) === (8L, "6165", 2L))
    assert(out(2L) === (0L, "", 0L))
  }

  test("media table keeps payload opaque binary with typed metadata") {
    val schema = Media.asMediaTable(docs(sample: _*)).schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
  }
}
