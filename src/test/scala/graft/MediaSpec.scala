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
    // ids 2..4: doc_id % 5 ∉ {0, 1} → payloads stay raw text bytes
    (2L, "hello", "en", "src0", 5L),
    (3L, "héllo", "fr", "src1", 5L),   // é = 2 UTF-8 bytes, both ≥ 0x80
    (4L, "", "en", "src2", 0L))

  test("golden: byte features of known raw payloads") {
    val out = Media.mediaFeatures(docs(sample: _*))
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_bytes"), r.getAs[String]("header_hex"),
          r.getAs[Long]("byte_sum"), r.getAs[Long]("n_hi_bytes"),
          r.getAs[String]("kind"))).toMap
    // "hello" = 68 65 6C 6C 6F
    assert(out(2L) === (5L, "68656C6C6F", 0x68L + 0x65 + 0x6c + 0x6c + 0x6f, 0L, "raw"))
    // "héllo" = 68 C3 A9 6C 6C 6F (6 bytes, é → C3 A9)
    assert(out(3L) === (6L, "68C3A96C6C6F",
      0x68L + 0xc3 + 0xa9 + 0x6c + 0x6c + 0x6f, 2L, "raw"))
    assert(out(4L) === (0L, "", 0L, 0L, "raw"))
  }

  test("golden: realDecode parses hand-built BMP and WAV headers") {
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(k => ((v >> (8 * k)) & 0xff).toByte).toArray
    // 54-byte BITMAPINFOHEADER BMP, 640×480 @ 24 bpp, 3 pixel bytes
    val bmp = "BM".getBytes("US-ASCII") ++ le(57, 4) ++ le(0, 4) ++
      le(54, 4) ++ le(40, 4) ++ le(640, 4) ++ le(480, 4) ++ le(1, 2) ++
      le(24, 2) ++ Array.fill[Byte](24)(0) ++ Array[Byte](1, 2, 3)
    assert(bmp.length === 57)
    val db = Media.realDecode(graft.multimodal.MediaRow(1L, bmp, "f"))
    assert(db.kind === Some("bmp"))
    assert((db.width, db.height, db.bpp) ===
      ((Some(640L), Some(480L), Some(24L))))
    assert(db.n_bytes === Some(57L))
    assert(db.header_hex === Some("424D390000000000"))
    // canonical 44-byte WAV: stereo, 44100 Hz, 16-bit, 2 sample bytes
    val wav = "RIFF".getBytes("US-ASCII") ++ le(38, 4) ++
      "WAVE".getBytes("US-ASCII") ++ "fmt ".getBytes("US-ASCII") ++
      le(16, 4) ++ le(1, 2) ++ le(2, 2) ++ le(44100, 4) ++
      le(44100L * 2 * 2, 4) ++ le(4, 2) ++ le(16, 2) ++
      "data".getBytes("US-ASCII") ++ le(2, 4) ++ Array[Byte](9, 9)
    assert(wav.length === 46)
    val dw = Media.realDecode(graft.multimodal.MediaRow(2L, wav, "f"))
    assert(dw.kind === Some("wav"))
    assert((dw.channels, dw.sample_rate, dw.bits) ===
      ((Some(2L), Some(44100L), Some(16L))))
    // neither magic → raw with NULL decode fields
    val dr = Media.realDecode(graft.multimodal.MediaRow(3L, Array[Byte](1, 2), "f"))
    assert(dr.kind === Some("raw") && dr.width.isEmpty && dr.channels.isEmpty)
  }

  test("container round-trip: synthesized BMP/WAV payloads decode to their doc-derived fields") {
    // doc 10 (% 5 = 0) → BMP: width = 1 + 10 % 640 = 11, height = 11,
    // bpp 24; doc 6 (% 5 = 1) → WAV: channels = 1 + 6 % 2 = 1, rate =
    // 8000·(1 + 6 % 6) = 8000, bits = 8·(1 + 6 % 2) = 8
    val out = Media.mediaFeatures(docs(
      (10L, "pixels", "en", "s", 6L), (6L, "samples", "en", "s", 7L)))
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    val b = out(10L)
    assert(b.getAs[String]("kind") === "bmp")
    assert(b.getAs[Long]("width") === 11L)
    assert(b.getAs[Long]("height") === 11L)
    assert(b.getAs[Long]("bpp") === 24L)
    assert(b.getAs[Long]("n_bytes") === 54L + 6L)
    val w = out(6L)
    assert(w.getAs[String]("kind") === "wav")
    assert(w.getAs[Long]("channels") === 1L)
    assert(w.getAs[Long]("sample_rate") === 8000L)
    assert(w.getAs[Long]("bits") === 8L)
    // doc 6 (% 10 = 6) synthesizes the LIST-chunk layout: canonical 44
    // + 18 chunk bytes (8 hdr + 9 payload + 1 pad) before data — the
    // declarative walk must STILL classify and read fields correctly
    assert(w.getAs[Long]("n_bytes") === 44L + 18L + 7L)
  }

  test("property: declarative walk ≡ imperative walk on random chunk soups") {
    // two INDEPENDENT implementations of the bounded RIFF walk — the
    // SQL aggregate fold and realDecode's loop — must agree on wav
    // classification and fmt fields for arbitrary chunk sequences:
    // junk ids, odd sizes (pad hop), fmt after data, runts, missing
    // chunks, declared sizes overrunning the payload, and truncations
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(k => ((v >> (8 * k)) & 0xff).toByte).toArray
    val rnd = new scala.util.Random(31)
    def fmtChunk(): Array[Byte] = {
      val ch = 1 + rnd.nextInt(4); val rate = 4000 + rnd.nextInt(50000)
      val bits = Seq(8, 16, 24)(rnd.nextInt(3))
      "fmt ".getBytes("US-ASCII") ++ le(16, 4) ++ le(1, 2) ++ le(ch, 2) ++
        le(rate, 4) ++ le(rate.toLong * ch * bits / 8, 4) ++
        le(ch * bits / 8, 2) ++ le(bits, 2)
    }
    def randomChunk(): Array[Byte] = rnd.nextInt(6) match {
      case 0 => fmtChunk()
      case 1 =>
        val n = rnd.nextInt(12)
        "data".getBytes("US-ASCII") ++ le(n, 4) ++
          Array.fill[Byte](n)(rnd.nextInt(256).toByte) ++
          (if (n % 2 == 1) Array[Byte](0) else Array.empty[Byte])
      case 2 =>
        val n = rnd.nextInt(15)
        "LIST".getBytes("US-ASCII") ++ le(n, 4) ++
          Array.fill[Byte](n)(rnd.nextInt(256).toByte) ++
          (if (n % 2 == 1) Array[Byte](0) else Array.empty[Byte])
      case 3 => "fact".getBytes("US-ASCII") ++ le(4, 4) ++ le(1, 4)
      case 4 => // short fmt : size < 16 must NOT be trusted
        "fmt ".getBytes("US-ASCII") ++ le(6, 4) ++ Array.fill[Byte](6)(1)
      case _ => // junk id with a size that may overrun the payload
        "J@nk".getBytes("US-ASCII") ++ le(rnd.nextInt(40), 4) ++
          Array.fill[Byte](rnd.nextInt(8))(7)
    }
    val payloads: Seq[(Long, Array[Byte])] = (0 until 200).map { i =>
      val body = (0 until rnd.nextInt(8)).flatMap(_ => randomChunk()).toArray
      val full = "RIFF".getBytes("US-ASCII") ++ le(4L + body.length, 4) ++
        "WAVE".getBytes("US-ASCII") ++ body
      val cut = if (rnd.nextInt(4) == 0 && full.length > 8)
        full.take(8 + rnd.nextInt(full.length - 8)) else full
      (i.toLong, cut)
    }
    import spark.implicits._
    val declared = graft.multimodal.Media.walkColumns(
        payloads.toDF("media_id", "payload"))
      .collect().map(r => r.getAs[Long]("media_id") ->
        ((Option(r.getAs[java.lang.Long]("fmt_off")).isDefined &&
            Option(r.getAs[java.lang.Long]("data_off")).isDefined),
          Option(r.getAs[java.lang.Long]("wav_channels")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("wav_sample_rate")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("wav_bits")).map(_.toLong))).toMap
    for ((id, bytes) <- payloads) {
      val d = Media.realDecode(graft.multimodal.MediaRow(id, bytes, "f"))
      val (isWav, ch, rate, bits) = declared(id)
      assert((d.kind === Some("wav")) === isWav,
        s"payload $id (${bytes.length} B): typed=${d.kind} declarative-wav=$isWav")
      if (isWav) {
        assert(d.channels === ch && d.sample_rate === rate && d.bits === bits,
          s"payload $id fields: typed=(${d.channels},${d.sample_rate},${d.bits}) " +
            s"declarative=($ch,$rate,$bits)")
      }
    }
  }

  test("golden: realDecode walks LIST and fact chunks in front of fmt and data") {
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(k => ((v >> (8 * k)) & 0xff).toByte).toArray
    val list = "LIST".getBytes("US-ASCII") ++ le(9, 4) ++
      "INFOGRAFX".getBytes("US-ASCII") ++ Array[Byte](0) // odd size → pad
    val fact = "fact".getBytes("US-ASCII") ++ le(4, 4) ++ le(1, 4)
    val fmt = "fmt ".getBytes("US-ASCII") ++ le(16, 4) ++ le(1, 2) ++
      le(2, 2) ++ le(44100, 4) ++ le(44100L * 4, 4) ++ le(4, 2) ++ le(16, 2)
    val data = "data".getBytes("US-ASCII") ++ le(4, 4) ++ Array[Byte](1, 2, 3, 4)
    val body = list ++ fact ++ fmt ++ data
    val wav = "RIFF".getBytes("US-ASCII") ++ le(4L + body.length, 4) ++
      "WAVE".getBytes("US-ASCII") ++ body
    val d = Media.realDecode(graft.multimodal.MediaRow(9L, wav, "f"))
    // a canonical-offset parse would read garbage out of the LIST
    // payload (or classify raw); the walk finds fmt at chunk #2
    assert(d.kind === Some("wav"))
    assert((d.channels, d.sample_rate, d.bits) ===
      ((Some(2L), Some(44100L), Some(16L))))
    // truncating mid-walk (inside the fact chunk) degrades to raw
    val cut = Media.realDecode(graft.multimodal.MediaRow(10L, wav.take(48), "f"))
    assert(cut.kind === Some("raw") && cut.channels.isEmpty)
  }

  test("typed mapPartitions decoder agrees with the expression plan row-for-row") {
    // ids 5, 6, 7 cover one of each: BMP-wrapped, WAV-wrapped, raw
    val mixed = sample ++ Seq((5L, "pix", "en", "s", 3L), (6L, "snd", "en", "s", 3L))
    val a = Media.mediaFeatures(docs(mixed: _*))
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    val b = Media.mediaFeaturesPartitioned(docs(mixed: _*))
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

  def hexOf(s: String): String =
    s.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString

  test("audioFrames golden: true frame size, stride sampling, sample-accurate t_us") {
    // doc_id 6 → WAV, channels 1, bits 8, rate 8000 → frame_bytes 1;
    // 10 data bytes → frames 0..9, stride 4 keeps 0, 4, 8
    // doc_id 11 → WAV, channels 2, bits 16, rate 48000 → frame_bytes 4;
    // 10 data bytes → 2 complete frames, stride 4 keeps only frame 0
    // doc_id 2 → raw payload: no rows; doc_id 5 → BMP: no rows
    val out = Media.audioFrames(docs(
      (6L, "abcdefghij", "en", "src0", 10L),
      (11L, "abcdefghij", "en", "src0", 10L),
      (2L, "abcdefghij", "en", "src0", 10L),
      (5L, "abcdefghij", "en", "src0", 10L)))
      .collect().map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("frame_idx")) ->
        (r.getAs[Long]("channels"), r.getAs[Long]("sample_rate"),
          r.getAs[Long]("bits"), r.getAs[Long]("t_us"),
          r.getAs[String]("frame_hex"))).toMap
    assert(out.keySet === Set((6L, 0L), (6L, 4L), (6L, 8L), (11L, 0L)))
    assert(out((6L, 0L)) === (1L, 8000L, 8L, 0L, hexOf("a")))
    assert(out((6L, 4L)) === (1L, 8000L, 8L, 500L, hexOf("e")))
    assert(out((6L, 8L)) === (1L, 8000L, 8L, 1000L, hexOf("i")))
    assert(out((11L, 0L)) === (2L, 48000L, 16L, 0L, hexOf("abcd")))
  }

  test("imageRows golden: aligned row stride, truncation clamp, scanline slices") {
    // doc_id 5 → BMP 6×6 @ 24 bpp → row stride ((24·6+31) div 32)·4 = 20;
    // 45 data bytes hold 2 complete rows of the declared 6 → clamp to 2,
    // stride 4 keeps row 0 only → the first 20 payload bytes verbatim
    val text45 = "0123456789" * 4 + "01234"
    val out = Media.imageRows(docs(
      (5L, text45, "en", "src0", 45L),
      (6L, text45, "en", "src0", 45L),    // WAV → no rows
      (2L, text45, "en", "src0", 45L)))   // raw → no rows
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("media_id") === 5L)
    assert((r.getAs[Long]("width"), r.getAs[Long]("height"),
      r.getAs[Long]("bpp"), r.getAs[Long]("row_bytes")) === (6L, 6L, 24L, 20L))
    assert(r.getAs[Long]("n_rows_avail") === 2L)
    assert(r.getAs[Long]("n_rows_out") === 1L)
    assert(r.getAs[String]("resized_hex") === hexOf(text45.take(20)))
  }

  test("imageRows: a payload holding every declared row keeps ceil(h/stride) rows") {
    // doc_id 10 → BMP 11×11 @ 24 bpp → row stride ((264+31) div 32)·4 = 36;
    // 11 rows × 36 = 396 data bytes supplied exactly → rows 0,4,8
    val full = "x" * 396
    val r = Media.imageRows(docs((10L, full, "en", "src0", full.length.toLong)))
      .collect().head
    assert((r.getAs[Long]("width"), r.getAs[Long]("height"),
      r.getAs[Long]("row_bytes")) === (11L, 11L, 36L))
    assert(r.getAs[Long]("n_rows_avail") === 11L)
    assert(r.getAs[Long]("n_rows_out") === 3L)
    assert(r.getAs[String]("resized_hex").length === 3 * 36 * 2)
  }
}
