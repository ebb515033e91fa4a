package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** One media record as the typed batch-processing surface sees it. */
case class MediaRow(media_id: Long, payload: Array[Byte], fmt: String)

/** Per-record decode output: generic byte statistics plus the REAL
  * container parse — `kind` is the sniffed container, the dimension /
  * sample fields are decoded from the header (NULL when the container
  * doesn't carry them or the payload is neither). */
case class MediaDecoded(media_id: Long, fmt: String,
    n_bytes: Option[Long], header_hex: Option[String],
    byte_sum: Option[Long], n_hi_bytes: Option[Long],
    kind: Option[String], width: Option[Long], height: Option[Long],
    bpp: Option[Long], channels: Option[Long], sample_rate: Option[Long],
    bits: Option[Long])

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus per-record decode and
  * feature extraction.
  *
  * The decode is a REAL parse of two public fixed-layout containers
  * (no codec library needed — the layouts are bytes at documented
  * offsets): BMP (BITMAPINFOHEADER: width/height int32 LE at byte
  * 18/22, bpp uint16 LE at 28) and RIFF WAV via a BOUNDED CHUNK WALK —
  * chunk headers (4-byte id + uint32 LE size, odd payloads padded)
  * read from byte 12 until `fmt ` and `data` are found, so files that
  * carry `LIST`/`fact`/`cue ` chunks in front of `data` parse at their
  * true offsets and the canonical 44-byte layout is just the walk's
  * first-step case. Container sniffing is by magic
  * bytes exactly as production ingest does — a payload that happens to
  * start with a magic is parsed as that container, deterministically
  * in both engines. Payloads that are neither report `kind = raw` with
  * NULL decode fields; pixel/sample DATA decoding beyond the header
  * (the part that genuinely needs a codec) stays out of scope.
  *
  * The plumbing around the decode is the production shape:
  *
  *  - ingestion normalizes to `(media_id, payload BINARY, fmt, meta)` —
  *    the schema a 100 TB media lake stores (payload column prunes away
  *    for metadata-only queries; parquet keeps binaries row-group-local);
  *  - [[Media.mediaFeatures]] runs the decode as pure built-in
  *    expressions over the hex encoding (codegen-friendly,
  *    oracle-checkable in DuckDB byte-for-byte);
  *  - [[Media.mediaFeaturesPartitioned]] runs the SAME decode through
  *    `Dataset.mapPartitions` ([[Media.realDecode]] on actual bytes) —
  *    the Scala twin of Python's `mapInPandas` batch-UDF surface: one
  *    iterator per partition, arbitrary JVM code (JNI codec, model
  *    inference) per record, typed output schema. A spec asserts the
  *    two plans agree row-for-row, so the imperative boundary is pinned
  *    to the declarative semantics.
  *
  * The fixtures ship no binary table, so ingestion derives payloads
  * from `documents.text` (UTF-8 bytes), and
  * [[Media.asContainerTable]] WRAPS a deterministic subset in real BMP
  * / WAV headers (dimensions derived from doc_id) so the decode path
  * round-trips honest container bytes end to end.
  */
object Media {

  /** Ingestion: documents → media-lake schema. `payload` is the opaque
    * binary column; `fmt` plays the role of the container/codec tag. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      col("source").as("fmt"),
      struct(col("n_chars"), col("lang")).as("meta"))

  /** The REAL per-record decoder: generic byte statistics plus the
    * BMP / canonical-WAV header parse, on actual payload bytes. This is
    * the function running inside the [[mediaFeaturesPartitioned]] batch
    * boundary — a pipeline adding a true pixel/sample codec extends it
    * here. NULL payloads report NULL stats (the declarative twin's
    * semantics). */
  def realDecode(m: MediaRow): MediaDecoded = {
    if (m.payload == null)
      return MediaDecoded(m.media_id, m.fmt, None, None, None, None,
        None, None, None, None, None, None, None)
    val bytes = m.payload
    val header = bytes.take(8).map(b => f"${b & 0xff}%02X").mkString
    var sum = 0L; var hi = 0L
    bytes.foreach { b => sum += (b & 0xff); if ((b & 0xff) >= 0x80) hi += 1 }
    def le(off: Int, n: Int): Long =
      (0 until n).map(k => (bytes(off + k) & 0xffL) << (8 * k)).sum
    def ascii(off: Int, s: String): Boolean =
      bytes.length >= off + s.length &&
        s.indices.forall(i => (bytes(off + i) & 0xff) == s.charAt(i).toInt)
    val base = MediaDecoded(m.media_id, m.fmt, Some(bytes.length.toLong),
      Some(header), Some(sum), Some(hi), Some("raw"),
      None, None, None, None, None, None)
    if (bytes.length >= 54 && ascii(0, "BM"))
      base.copy(kind = Some("bmp"), width = Some(le(18, 4)),
        height = Some(le(22, 4)), bpp = Some(le(28, 2)))
    else if (bytes.length >= 44 && ascii(0, "RIFF") && ascii(8, "WAVE")) {
      // bounded RIFF chunk walk — the typed twin of the declarative
      // walk in [[mediaFeatures]]: real files carry LIST/fact/cue
      // chunks before `data`, so `fmt `-at-12/`data`-at-36 is only the
      // canonical SUBSET. First match wins per chunk id; the `fmt `
      // payload must be complete (16 bytes) to be trusted.
      var off = 12L
      var fmtOff = -1L
      var dataOff = -1L
      var k = 0
      while (k < WalkChunks && off >= 0 && bytes.length >= off + 8) {
        val sz = le(off.toInt + 4, 4)
        if (fmtOff < 0 && ascii(off.toInt, "fmt ") && sz >= 16 &&
            bytes.length >= off + 24) fmtOff = off + 8
        if (dataOff < 0 && ascii(off.toInt, "data")) dataOff = off + 8
        off = off + 8 + sz + (sz % 2)
        k += 1
      }
      if (fmtOff >= 0 && dataOff >= 0)
        base.copy(kind = Some("wav"),
          channels = Some(le(fmtOff.toInt + 2, 2)),
          sample_rate = Some(le(fmtOff.toInt + 4, 4)),
          bits = Some(le(fmtOff.toInt + 14, 2)))
      else base
    } else base
  }

  /** Feature extraction as declarative expressions: the payload's hex
    * string is the portable byte-access path (Spark and DuckDB agree on
    * `hex` output), so byte statistics stay inside codegen with no UDF.
    */
  /** Byte value of a 2-hex-char column — the portable byte-access path. */
  private def byteVal(p: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (instr(lit("0123456789ABCDEF"), substring(p, 1, 1)) - 1) * 16L +
      (instr(lit("0123456789ABCDEF"), substring(p, 2, 1)) - 1)

  /** Little-endian unsigned integer at BYTE offset `byteOff` of hex
    * column `h` — the header-field read both engines share. */
  private def leVal(h: org.apache.spark.sql.Column, byteOff: Int,
      nBytes: Int): org.apache.spark.sql.Column =
    (0 until nBytes).map(k =>
      byteVal(substring(h, (byteOff + k) * 2 + 1, 2)) * lit(1L << (8 * k)))
      .reduce(_ + _).cast("long")

  /** DuckDB spelling of [[leVal]]. */
  private def leValSql(h: String, byteOff: Int, nBytes: Int): String =
    (0 until nBytes).map { k =>
      val p = (byteOff + k) * 2 + 1
      s"((strpos('0123456789ABCDEF', substring($h, $p, 1)) - 1) * 16 + " +
        s"(strpos('0123456789ABCDEF', substring($h, ${p + 1}, 1)) - 1)) * " +
        // CAST keeps the positional multiply in int64 (the dynLeSql
        // high-byte overflow, DuckDB spelling)
        s"CAST(${1L << (8 * k)} AS BIGINT)"
    }.mkString("(", " + ", ")")

  /** Hex spelling of `v`'s little-endian `nBytes` bytes — SQL shared by
    * both engines modulo the integer-divide token (`div` / `//`). */
  private def leHexSql(v: String, nBytes: Int, idiv: String): String =
    (0 until nBytes).map { k =>
      val b = s"((($v) $idiv ${1L << (8 * k)}) % 256)"
      s"substr('0123456789ABCDEF', CAST(($b) $idiv 16 AS INT) + 1, 1) || " +
        s"substr('0123456789ABCDEF', CAST(($b) % 16 AS INT) + 1, 1)"
    }.mkString("(", " || ", ")")

  // ---- bounded RIFF chunk walk ------------------------------------------
  //
  // Real-world RIFF files carry `LIST`/`fact`/`cue ` chunks between the
  // header and `data`; assuming the canonical 44-byte layout silently
  // demotes such files to `raw`. The walk below reads (chunk id, chunk
  // size) pairs from byte 12, hopping size+pad bytes, for a BOUNDED
  // number of steps. Two spellings of the same arithmetic: DuckDB gets
  // a chain of per-step CTE columns; Spark gets a single `aggregate`
  // fold (see [[walkAggSql]] for why the column chain is unsafe under
  // Catalyst's substituting predicate pushdown). The per-step SQL
  // fragments (substring/instr/CASE only) are shared where the
  // dialects allow.

  /** Chunks inspected before giving up — covers canonical (data is
    * chunk #1) plus LIST/fact/cue /bext padding in front of it. */
  private val WalkChunks = 6
  private val HexFmt = "666D7420" // 'fmt '
  private val HexData = "64617461" // 'data'

  /** Little-endian read at a DYNAMIC byte offset (`off` is a SQL
    * expression over prior columns, not a constant) of hex column `h`.
    * The positional multiplier is CAST to BIGINT: an INT multiply
    * overflows under ANSI the moment a size field carries a high byte
    * (byte value 255 at position 3 is 255·2²⁴ > 2³¹ — any chunk past
    * 16 MB), which the random-layout walk property caught. */
  private def dynLeSql(off: String, nBytes: Int): String =
    (0 until nBytes).map { k =>
      val hiP = s"CAST((($off) + $k) * 2 + 1 AS INT)"
      val loP = s"CAST((($off) + $k) * 2 + 2 AS INT)"
      s"((instr('0123456789ABCDEF', substring(h, $hiP, 1)) - 1) * 16 + " +
        s"(instr('0123456789ABCDEF', substring(h, $loP, 1)) - 1)) * " +
        s"CAST(${1L << (8 * k)} AS BIGINT)"
    }.mkString("(", " + ", ")")

  /** Walk entry: byte 12 for RIFF/WAVE payloads, NULL otherwise. */
  private val walkOff0Sql: String =
    "CASE WHEN n_bytes >= 44 AND substring(h, 1, 8) = '52494646' " +
      "AND substring(h, 17, 8) = '57415645' THEN CAST(12 AS BIGINT) END"

  /** Step k stage A: chunk id + declared size at off_k (NULL once the
    * walk ran off the end). */
  private def walkIdSz(k: Int): Seq[(String, String)] = Seq(
    s"cid$k" -> (s"CASE WHEN off$k IS NOT NULL AND n_bytes >= off$k + 8 " +
      s"THEN substring(h, CAST(off$k * 2 + 1 AS INT), 8) END"),
    s"csz$k" -> (s"CASE WHEN off$k IS NOT NULL AND n_bytes >= off$k + 8 " +
      s"THEN CAST(${dynLeSql(s"off$k + 4", 4)} AS BIGINT) END"))

  /** Step k stage B: next chunk header offset (RIFF pads odd-sized
    * chunk payloads to even). */
  private def walkNext(k: Int): (String, String) =
    s"off${k + 1}" ->
      s"CASE WHEN cid$k IS NOT NULL THEN off$k + 8 + csz$k + (csz$k % 2) END"

  /** First-match fold over the walked steps: the `fmt ` payload offset
    * (complete 16-byte payload required), the `data` payload offset,
    * and the `data` declared length. */
  private val walkFoundSql: Seq[(String, String)] = Seq(
    "fmt_off" -> (0 until WalkChunks).map(k =>
      s"CASE WHEN cid$k = '$HexFmt' AND csz$k >= 16 " +
        s"AND n_bytes >= off$k + 24 THEN off$k + 8 END")
      .mkString("COALESCE(", ", ", ")"),
    "data_off" -> (0 until WalkChunks).map(k =>
      s"CASE WHEN cid$k = '$HexData' THEN off$k + 8 END")
      .mkString("COALESCE(", ", ", ")"),
    "data_len" -> (0 until WalkChunks).map(k =>
      s"CASE WHEN cid$k = '$HexData' THEN csz$k END")
      .mkString("COALESCE(", ", ", ")"))

  /** The walk as ONE `aggregate` fold on the Spark side — NOT the
    * per-step column chain the DuckDB twin uses. The chain spelling is
    * correct but fatal under Catalyst: any later filter on a walked
    * column (audioFrames' WAV gate) is pushed down through the 19
    * step projections by SUBSTITUTION, and since every step references
    * its predecessor several times the substituted predicate grows
    * ~4^steps — the optimizer itself OOMs. The fold is a single
    * bounded expression evaluated iteratively per row (6 steps of
    * header arithmetic; an interpreted HOF, but constant and tiny —
    * nothing like the Dim×n lambda the dim_shares ban is about), so
    * pushdown duplicates O(1) expression text. Semantics are the CTE
    * chain's exactly: first match per chunk id, walk continues past
    * found chunks, dies when the next header would cross the end. */
  private val walkAggSql: String = {
    val id = "substring(h, CAST(acc.off * 2 + 1 AS INT), 8)"
    val sz = dynLeSql("acc.off + 4", 4)
    s"""aggregate(
       |  sequence(1, $WalkChunks),
       |  named_struct(
       |    'off', $walkOff0Sql,
       |    'fmt_off', CAST(NULL AS BIGINT),
       |    'data_off', CAST(NULL AS BIGINT),
       |    'data_len', CAST(NULL AS BIGINT)),
       |  (acc, step) -> CASE
       |    WHEN acc.off IS NULL OR n_bytes < acc.off + 8 THEN
       |      named_struct('off', CAST(NULL AS BIGINT), 'fmt_off', acc.fmt_off,
       |        'data_off', acc.data_off, 'data_len', acc.data_len)
       |    ELSE named_struct(
       |      'off', acc.off + 8 + $sz + ($sz % 2),
       |      'fmt_off', coalesce(acc.fmt_off, CASE WHEN $id = '$HexFmt'
       |        AND $sz >= 16 AND n_bytes >= acc.off + 24 THEN acc.off + 8 END),
       |      'data_off', coalesce(acc.data_off,
       |        CASE WHEN $id = '$HexData' THEN acc.off + 8 END),
       |      'data_len', coalesce(acc.data_len,
       |        CASE WHEN $id = '$HexData' THEN $sz END))
       |    END,
       |  acc -> named_struct(
       |    'fmt_off', acc.fmt_off,
       |    'data_off', acc.data_off,
       |    'data_len', acc.data_len,
       |    'channels', CASE WHEN acc.fmt_off IS NOT NULL
       |      THEN CAST(${dynLeSql("acc.fmt_off + 2", 2)} AS BIGINT) END,
       |    'sample_rate', CASE WHEN acc.fmt_off IS NOT NULL
       |      THEN CAST(${dynLeSql("acc.fmt_off + 4", 4)} AS BIGINT) END,
       |    'bits', CASE WHEN acc.fmt_off IS NOT NULL
       |      THEN CAST(${dynLeSql("acc.fmt_off + 14", 2)} AS BIGINT) END))""".stripMargin
  }

  /** Spark side: append the walk columns to a frame carrying `h` and
    * `n_bytes`, then CHECKPOINT. The checkpoint is load-bearing twice
    * over: it truncates the lineage so no downstream filter can inline
    * the fold into a pushed-down predicate (re-creating the plan
    * explosion in one copy-per-reference form), and it guarantees the
    * fold — including the `fmt ` field reads in the finish lambda —
    * evaluates exactly ONCE per row, instead of once per consuming
    * expression after project collapse. */
  /** Test seam: the declarative walk over an arbitrary payload frame —
    * what lets MediaSpec cross-check the SQL fold against the
    * imperative [[realDecode]] walk on RANDOM chunk layouts, not just
    * the fixture shapes. */
  private[graft] def walkColumns(payloads: DataFrame): DataFrame =
    withWalk(payloads.select(col("media_id"),
      hex(col("payload")).as("h"),
      length(col("payload")).cast("long").as("n_bytes")))

  private def withWalk(df: DataFrame): DataFrame =
    df.withColumn("wk", expr(walkAggSql)).localCheckpoint()
      .withColumn("fmt_off", col("wk.fmt_off"))
      .withColumn("data_off", col("wk.data_off"))
      .withColumn("data_len", col("wk.data_len"))
      .withColumn("wav_channels", col("wk.channels"))
      .withColumn("wav_sample_rate", col("wk.sample_rate"))
      .withColumn("wav_bits", col("wk.bits"))
      .drop("wk")

  /** DuckDB side: the same walk as chained CTEs over `src` (which must
    * expose `h` and `n_bytes`); the final stage is named `walked`.
    * Every stage is MATERIALIZED — DuckDB inlines CTEs by default, and
    * each stage references its predecessor several times, so uninlined
    * the chain re-evaluates ~4^steps per CONSUMING expression (the
    * kcore-oracle lesson; audioFrames consumes walked columns once per
    * exploded frame, which turned the inlined spelling into a hang).
    * Materialized, each stage evaluates once per row. */
  private def walkCteSql(src: String): String = {
    val sb = new StringBuilder
    sb.append(s"w0 AS MATERIALIZED (SELECT *, $walkOff0Sql AS off0 FROM $src)")
    var prev = "w0"
    for (k <- 0 until WalkChunks) {
      val idsz = walkIdSz(k).map { case (n, e) => s"$e AS $n" }.mkString(", ")
      sb.append(s",\nwa$k AS MATERIALIZED (SELECT *, $idsz FROM $prev)")
      prev = s"wa$k"
      if (k < WalkChunks - 1) {
        val (n, e) = walkNext(k)
        sb.append(s",\nwb$k AS MATERIALIZED (SELECT *, $e AS $n FROM wa$k)")
        prev = s"wb$k"
      }
    }
    val found = walkFoundSql.map { case (n, e) => s"$e AS $n" }.mkString(", ")
    sb.append(s",\nwalked AS MATERIALIZED (SELECT *, $found FROM $prev)")
    sb.toString
  }

  /** The synthesized-container payload as a hex expression over a
    * documents row: doc_id % 5 = 0 → a real 54-byte BMP header
    * (width = 1 + doc_id % 640, height = 1 + doc_id % 480, 24 bpp)
    * with the text bytes as pixel data; doc_id % 5 = 1 → a real
    * canonical 44-byte WAV header (channels = 1 + doc_id % 2, rate =
    * 8000·(1 + doc_id % 6), bits = 8·(1 + doc_id % 2)) with the text
    * bytes as samples; else the raw text bytes. NULL text stays NULL
    * (`||` propagates). One SQL body for both engines — `textHex` /
    * `textBytes` / the divide token are the per-engine seams. */
  private def containerHexSql(textHex: String, textBytes: String,
      idiv: String): String = {
    val w = "(1 + doc_id % 640)"
    val hgt = "(1 + doc_id % 480)"
    val ch = "(1 + doc_id % 2)"
    val bits = "(8 * (1 + doc_id % 2))"
    val rate = "(8000 * (1 + doc_id % 6))"
    val byteRate = s"(($rate * $ch * $bits) $idiv 8)"
    val blockAlign = s"(($ch * $bits) $idiv 8)"
    val bmp = s"'424D' || ${leHexSql(s"54 + $textBytes", 4, idiv)} || " +
      s"'0000000036000000' || '28000000' || ${leHexSql(w, 4, idiv)} || " +
      s"${leHexSql(hgt, 4, idiv)} || '01001800' || repeat('00', 24) || $textHex"
    val fmtChunk = s"'666D7420' || '10000000' || '0100' || " +
      s"${leHexSql(ch, 2, idiv)} || ${leHexSql(rate, 4, idiv)} || " +
      s"${leHexSql(byteRate, 4, idiv)} || ${leHexSql(blockAlign, 2, idiv)} || " +
      s"${leHexSql(bits, 2, idiv)}"
    val dataChunk = s"'64617461' || ${leHexSql(textBytes, 4, idiv)} || $textHex"
    val wav = s"'52494646' || ${leHexSql(s"36 + $textBytes", 4, idiv)} || " +
      s"'57415645' || $fmtChunk || $dataChunk"
    // half the WAVs (doc_id % 10 = 6) carry a 9-byte 'LIST'/INFO chunk
    // (+1 RIFF pad byte — odd size exercises the even-padding hop)
    // BETWEEN fmt and data, so the oracle-gated queries prove the
    // chunk walk on non-canonical layouts in BOTH engines; a quarter of
    // those (doc_id % 20 = 16) ALSO carry an 8-byte 'fact' chunk after
    // the LIST, pushing data to walk step 3 of the 6-step bound
    val listChunk = "'4C495354' || '09000000' || '494E464F4752414658' || '00'"
    val factChunk = "'66616374' || '04000000' || '01000000'"
    val wavList = s"'52494646' || ${leHexSql(s"54 + $textBytes", 4, idiv)} || " +
      s"'57415645' || $fmtChunk || $listChunk || $dataChunk"
    val wavListFact = s"'52494646' || ${leHexSql(s"66 + $textBytes", 4, idiv)} || " +
      s"'57415645' || $fmtChunk || $listChunk || $factChunk || $dataChunk"
    s"""CASE WHEN doc_id % 5 = 0 THEN $bmp
       |     WHEN doc_id % 20 = 16 THEN $wavListFact
       |     WHEN doc_id % 10 = 6 THEN $wavList
       |     WHEN doc_id % 5 = 1 THEN $wav
       |     ELSE $textHex END""".stripMargin
  }

  /** Ingestion with synthesized containers: the media-lake schema where
    * a deterministic subset of payloads carries REAL BMP / WAV headers
    * (see [[containerHexSql]]) — what lets the decode path round-trip
    * honest container bytes on a text-only fixture. */
  def asContainerTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      unhex(expr(containerHexSql("hex(encode(text, 'utf-8'))",
        "octet_length(text)", "div"))).as("payload"),
      col("source").as("fmt"),
      struct(col("n_chars"), col("lang")).as("meta"))
      // checkpoint: the synthesis CASE is past janino's 64 KB method
      // limit, so its stage cannot whole-stage-compile — and without a
      // barrier, project collapse inlines the expression into every
      // downstream consumer (media_features evaluates it 4+ times per
      // row, interpreted). Materializing the payload once bounds the
      // fallback to a single pass and keeps every consumer stage
      // codegen-clean. Real deployments read payloads from storage;
      // this cost is fixture-synthesis-only.
      .localCheckpoint()

  def mediaFeatures(docs: DataFrame): DataFrame = {
    val media = asContainerTable(graft.Tables.widen(docs))
    val h = hex(col("payload"))
    val bytes = regexp_extract_all(h, lit(".."), lit(0))
    // a payload is `wav` when the bounded chunk walk finds BOTH a
    // complete `fmt ` payload and a `data` chunk — canonical 44-byte
    // files resolve at steps 0/1, files with LIST/fact/cue  chunks in
    // front of `data` resolve deeper; fields read at the WALKED
    // offsets, not byte 22/24/34 constants
    val withKind = withWalk(media.select(
        col("media_id"),
        col("fmt"),
        length(col("payload")).cast("long").as("n_bytes"),
        substring(h, 1, 16).as("header_hex"),
        aggregate(bytes, lit(0L), (acc, p) => acc + byteVal(p)).as("byte_sum"),
        size(filter(bytes, p =>
          instr(lit("89ABCDEF"), substring(p, 1, 1)) > 0)).cast("long").as("n_hi_bytes"),
        h.as("h")))
      .withColumn("kind",
        when(col("h").isNull, lit(null).cast("string"))
          .when(col("n_bytes") >= 54L && substring(col("h"), 1, 4) === "424D",
            lit("bmp"))
          .when(col("fmt_off").isNotNull && col("data_off").isNotNull, lit("wav"))
          .otherwise(lit("raw")))
    withKind.select(
      col("media_id"), col("fmt"), col("n_bytes"), col("header_hex"),
      col("byte_sum"), col("n_hi_bytes"), col("kind"),
      when(col("kind") === "bmp", leVal(col("h"), 18, 4)).as("width"),
      when(col("kind") === "bmp", leVal(col("h"), 22, 4)).as("height"),
      when(col("kind") === "bmp", leVal(col("h"), 28, 2)).as("bpp"),
      when(col("kind") === "wav", col("wav_channels")).as("channels"),
      when(col("kind") === "wav", col("wav_sample_rate")).as("sample_rate"),
      when(col("kind") === "wav", col("wav_bits")).as("bits"))
  }

  /** Frame sampling: every `stride`-th complete `frameBytes`-byte block
    * of the payload, as `(media_id, frame_idx, frame_hex, frame_sum)` —
    * the video-frame-sampling batch shape with the frame DECODE faked by
    * byte statistics (same stance as [[mediaFeatures]]: the sampling
    * arithmetic, row explosion, and per-frame schema are the real
    * plumbing a codec would drop into). Payloads shorter than one frame
    * emit no rows in either engine. frame_idx is the block's position in
    * the payload (not the sample ordinal), so downstream code can seek.
    */
  def frameSample(docs: DataFrame, frameBytes: Int = 16, stride: Int = 4): DataFrame = {
    val hexPerFrame = frameBytes * 2
    val media = asMediaTable(graft.Tables.widen(docs))
      .select(col("media_id"), hex(col("payload")).as("h"))
    val nFrames = (length(col("h")) / hexPerFrame).cast("long")
    val sampled = media.filter(nFrames >= 1L)
      .select(col("media_id"), col("h"),
        explode(sequence(lit(0L), nFrames - 1L, lit(stride.toLong))).as("frame_idx"))
    val frame = col("h").substr(
      (col("frame_idx") * hexPerFrame + 1L).cast("int"), lit(hexPerFrame))
    sampled.select(col("media_id"), col("frame_idx"), frame.as("frame_hex"))
      .withColumn("frame_sum", (0 until frameBytes).map(k =>
        byteVal(substring(col("frame_hex"), k * 2 + 1, 2))).reduce(_ + _))
  }

  def frameSampleSql(frameBytes: Int = 16, stride: Int = 4): String = {
    val hexPerFrame = frameBytes * 2
    val sumTerms = (0 until frameBytes).map { k =>
      s"((strpos('0123456789ABCDEF', substring(frame_hex, ${k * 2 + 1}, 1)) - 1) * 16 + (strpos('0123456789ABCDEF', substring(frame_hex, ${k * 2 + 2}, 1)) - 1))"
    }.mkString("(", "\n   + ", ")")
    s"""WITH media AS (
       |  SELECT doc_id AS media_id, hex(encode(text)) AS h FROM documents
       |), frames AS (
       |  SELECT media_id, CAST(u.f AS BIGINT) AS frame_idx,
       |    substring(h, CAST(u.f * $hexPerFrame + 1 AS INT), $hexPerFrame) AS frame_hex
       |  FROM media, UNNEST(range(0, len(h) // $hexPerFrame, $stride)) AS u(f)
       |)
       |SELECT media_id, frame_idx, frame_hex,
       |  CAST($sumTerms AS BIGINT) AS frame_sum
       |FROM frames
       |ORDER BY media_id, frame_idx, frame_hex, frame_sum""".stripMargin
  }

  /** Resize: stride-downsample the payload bytes (every `stride`-th byte,
    * re-encoded as hex) — the image/audio RESAMPLING stub, same stance as
    * the other fakes: a real resampler replaces the byte arithmetic, the
    * schema/row shape/NULL discipline around it is the tested plumbing.
    * NULL payloads stay NULL; empty payloads resize to the empty string.
    */
  def mediaResize(docs: DataFrame, stride: Int = 4): DataFrame = {
    val media = asMediaTable(graft.Tables.widen(docs))
      .select(col("media_id"), col("fmt"), hex(col("payload")).as("h"))
    val nBytes = (length(col("h")) / 2).cast("long")
    val resized = when(col("h").isNull, lit(null).cast("string"))
      .when(nBytes >= 1L, concat_ws("",
        transform(sequence(lit(0L), nBytes - 1L, lit(stride.toLong)),
          k => col("h").substr((k * 2 + 1).cast("int"), lit(2)))))
      .otherwise(lit(""))
    media.select(col("media_id"), col("fmt"),
        nBytes.as("n_bytes"), resized.as("resized_hex"))
      .withColumn("n_resized_bytes", (length(col("resized_hex")) / 2).cast("long"))
  }

  def mediaResizeSql(stride: Int = 4): String =
    s"""WITH media AS (
       |  SELECT doc_id AS media_id, source AS fmt, hex(encode(text)) AS h
       |  FROM documents
       |), resized AS (
       |  SELECT media_id, fmt,
       |    CAST(len(h) // 2 AS BIGINT) AS n_bytes,
       |    CASE WHEN h IS NULL THEN NULL ELSE
       |      coalesce(array_to_string(list_transform(range(0, len(h) // 2, $stride),
       |        k -> substring(h, CAST(k * 2 + 1 AS INT), 2)), ''), '') END AS resized_hex
       |  FROM media
       |)
       |SELECT media_id, fmt, n_bytes, resized_hex,
       |  CAST(len(resized_hex) // 2 AS BIGINT) AS n_resized_bytes
       |FROM resized
       |ORDER BY media_id, fmt, n_bytes, resized_hex, n_resized_bytes""".stripMargin

  /** FORMAT-AWARE audio frame extraction — [[frameSample]] with the
    * container actually decoded: for WAV payloads (and only those), the
    * sample frames of the `data` chunk at their true layout — frame
    * size = channels·bits/8 read from the WALKED `fmt ` chunk, data at
    * its WALKED offset (byte 44 only in the canonical layout),
    * every `stride`-th frame emitted with its SAMPLE-ACCURATE
    * timestamp `t_us = frame_idx·10⁶ div sample_rate`. This retires
    * the "sampling arithmetic is real, the format is not" caveat on
    * [[frameSample]]: here a frame boundary is where the codec says it
    * is, not every 16 bytes. Truncated payloads clamp honestly
    * (`least(declared data length, bytes actually present)`), so a cut
    * upload yields its complete frames and nothing invented.
    *
    * Scale shape: identical to [[frameSample]] — header parse and frame
    * slicing are per-row hex arithmetic inside codegen, the explode is
    * bounded by payload size, no shuffle at all. */
  def audioFrames(docs: DataFrame, stride: Int = 4): DataFrame = {
    val media = asContainerTable(graft.Tables.widen(docs))
      .select(col("media_id"), hex(col("payload")).as("h"),
        length(col("payload")).cast("long").as("n_bytes"))
    // WAV = chunk walk found fmt + data (canonical or chunk-padded);
    // every header field reads at its WALKED offset
    val counted = withWalk(media)
      .filter(col("fmt_off").isNotNull && col("data_off").isNotNull)
      .select(col("media_id"), col("h"), col("data_off"),
        col("wav_channels").as("channels"),
        col("wav_sample_rate").as("sample_rate"),
        col("wav_bits").as("bits"),
        col("data_len").as("declared_len"),
        (col("n_bytes") - col("data_off")).as("avail_len"))
      .withColumn("frame_bytes", expr("(channels * bits) div 8L"))
      .filter(col("frame_bytes") >= 1L)
      .withColumn("n_frames",
        expr("least(declared_len, avail_len) div frame_bytes"))
      .filter(col("n_frames") >= 1L)
    counted
      .select(col("media_id"), col("channels"), col("sample_rate"),
        col("bits"), col("frame_bytes"), col("h"), col("data_off"),
        explode(sequence(lit(0L), col("n_frames") - 1L,
          lit(stride.toLong))).as("frame_idx"))
      .select(col("media_id"), col("channels"), col("sample_rate"),
        col("bits"), col("frame_idx"),
        // greatest(·, 1): a zero-rate fmt chunk is malformed input, not
        // a reason to kill the job in ANSI mode
        expr("(frame_idx * 1000000L) div greatest(sample_rate, 1L)")
          .as("t_us"),
        col("h").substr(
          (col("data_off") * 2L + 1L + col("frame_idx") * col("frame_bytes") * 2L)
            .cast("int"),
          (col("frame_bytes") * 2L).cast("int")).as("frame_hex"))
  }

  /** Oracle twin of [[audioFrames]] — same header reads, same clamp,
    * same frame slicing over the hex payload. */
  def audioFramesSql(stride: Int = 4): String =
    s"""WITH media AS (
       |  SELECT doc_id AS media_id,
       |    ${containerHexSql("hex(encode(text))", "octet_length(encode(text))", "//")} AS h
       |  FROM documents
       |), sized AS (
       |  SELECT media_id, h, len(h) // 2 AS n_bytes FROM media
       |), ${walkCteSql("sized")},
       |wav AS (
       |  SELECT media_id, h, data_off,
       |    CAST(${dynLeSql("fmt_off + 2", 2)} AS BIGINT) AS channels,
       |    CAST(${dynLeSql("fmt_off + 4", 4)} AS BIGINT) AS sample_rate,
       |    CAST(${dynLeSql("fmt_off + 14", 2)} AS BIGINT) AS bits,
       |    CAST(data_len AS BIGINT) AS declared_len,
       |    CAST(n_bytes - data_off AS BIGINT) AS avail_len
       |  FROM walked
       |  WHERE fmt_off IS NOT NULL AND data_off IS NOT NULL
       |), counted AS (
       |  SELECT *, least(declared_len, avail_len) // frame_bytes AS n_frames
       |  FROM (SELECT *, (channels * bits) // 8 AS frame_bytes FROM wav)
       |  WHERE (channels * bits) // 8 >= 1
       |)
       |SELECT media_id, channels, sample_rate, bits,
       |  CAST(u.f AS BIGINT) AS frame_idx,
       |  CAST((u.f * 1000000) // greatest(sample_rate, 1) AS BIGINT) AS t_us,
       |  substring(h, CAST(data_off * 2 + 1 + u.f * frame_bytes * 2 AS INT),
       |    CAST(frame_bytes * 2 AS INT)) AS frame_hex
       |FROM counted, UNNEST(range(0, n_frames, $stride)) AS u(f)
       |ORDER BY media_id, channels, sample_rate, bits, frame_idx, t_us,
       |  frame_hex""".stripMargin

  /** FORMAT-AWARE image downscale — [[mediaResize]] with the container
    * actually decoded: for BMP payloads (and only those), every
    * `stride`-th PIXEL ROW of the bitmap at its true layout — row size
    * = ((bpp·width + 31) div 32)·4 (the 4-byte-aligned BMP row stride,
    * padding included), pixel data at byte 54. A vertical
    * nearest-neighbor resample whose slices are real scanlines, not the
    * format-blind every-4th-byte of [[mediaResize]]. Truncated payloads
    * clamp to the complete rows actually present (`n_rows_avail` ≤
    * declared height), and the output accounts for the clamp
    * explicitly — nothing invented past the last full scanline.
    *
    * Scale shape: per-row hex arithmetic + a bounded array transform
    * inside codegen; no explode (one output row per image), no
    * shuffle. */
  def imageRows(docs: DataFrame, stride: Int = 4): DataFrame = {
    val media = asContainerTable(graft.Tables.widen(docs))
      .select(col("media_id"), hex(col("payload")).as("h"),
        length(col("payload")).cast("long").as("n_bytes"))
    val isBmp = col("n_bytes") >= 54L && substring(col("h"), 1, 4) === "424D"
    val bmp = media.filter(isBmp)
      .select(col("media_id"), col("h"),
        leVal(col("h"), 18, 4).as("width"),
        leVal(col("h"), 22, 4).as("height"),
        leVal(col("h"), 28, 2).as("bpp"),
        (col("n_bytes") - 54L).as("avail"))
      .withColumn("row_bytes", expr("((bpp * width + 31L) div 32L) * 4L"))
      .filter(col("row_bytes") >= 1L)
      .withColumn("n_rows_avail",
        least(col("height"), expr("avail div row_bytes")))
    bmp.select(col("media_id"), col("width"), col("height"), col("bpp"),
        col("row_bytes"), col("n_rows_avail"),
        // sequence(0, n-1, stride) needs n >= 1 (a negative stop flips
        // Spark's inferred step); DuckDB's range(0, 0) is just empty
        when(col("n_rows_avail") >= 1L, concat_ws("",
          transform(
            sequence(lit(0L), col("n_rows_avail") - 1L, lit(stride.toLong)),
            r => col("h").substr(
              (lit(109L) + r * col("row_bytes") * 2L).cast("int"),
              (col("row_bytes") * 2L).cast("int")))))
          .otherwise(lit("")).as("resized_hex"))
      .withColumn("n_rows_out",
        expr("(CAST(length(resized_hex) AS BIGINT) DIV 2L) DIV row_bytes"))
  }

  /** Oracle twin of [[imageRows]] — same header reads, same aligned row
    * stride, same scanline slicing. */
  def imageRowsSql(stride: Int = 4): String =
    s"""WITH media AS (
       |  SELECT doc_id AS media_id,
       |    ${containerHexSql("hex(encode(text))", "octet_length(encode(text))", "//")} AS h
       |  FROM documents
       |), sized AS (
       |  SELECT media_id, h, len(h) // 2 AS n_bytes FROM media
       |), bmp AS (
       |  SELECT media_id, h,
       |    CAST(${leValSql("h", 18, 4)} AS BIGINT) AS width,
       |    CAST(${leValSql("h", 22, 4)} AS BIGINT) AS height,
       |    CAST(${leValSql("h", 28, 2)} AS BIGINT) AS bpp,
       |    CAST(n_bytes - 54 AS BIGINT) AS avail
       |  FROM sized
       |  WHERE n_bytes >= 54 AND substring(h, 1, 4) = '424D'
       |), rowed AS (
       |  SELECT *, least(height, avail // row_bytes) AS n_rows_avail
       |  FROM (SELECT *, ((bpp * width + 31) // 32) * 4 AS row_bytes FROM bmp)
       |  WHERE ((bpp * width + 31) // 32) * 4 >= 1
       |), sliced AS (
       |  SELECT media_id, width, height, bpp, row_bytes, n_rows_avail,
       |    coalesce(array_to_string(list_transform(range(0, n_rows_avail, $stride),
       |      r -> substring(h, CAST(109 + r * row_bytes * 2 AS INT),
       |        CAST(row_bytes * 2 AS INT))), ''), '') AS resized_hex
       |  FROM rowed
       |)
       |SELECT media_id, width, height, bpp, row_bytes, n_rows_avail,
       |  resized_hex,
       |  CAST((len(resized_hex) // 2) // row_bytes AS BIGINT) AS n_rows_out
       |FROM sliced
       |ORDER BY media_id, width, height, bpp, row_bytes, n_rows_avail,
       |  resized_hex, n_rows_out""".stripMargin

  def mediaFeaturesSql: String =
    s"""WITH media AS (
       |  SELECT doc_id AS media_id, source AS fmt,
       |    ${containerHexSql("hex(encode(text))", "octet_length(encode(text))", "//")} AS h
       |  FROM documents
       |), sized AS (
       |  SELECT media_id, fmt, len(h) // 2 AS n_bytes, h FROM media
       |), ${walkCteSql("sized")},
       |hexed AS (
       |  SELECT *,
       |    CASE WHEN h IS NULL THEN NULL
       |         WHEN n_bytes >= 54 AND substring(h, 1, 4) = '424D' THEN 'bmp'
       |         WHEN fmt_off IS NOT NULL AND data_off IS NOT NULL THEN 'wav'
       |         ELSE 'raw' END AS kind
       |  FROM walked
       |)
       |SELECT media_id, fmt,
       |  CAST(n_bytes AS BIGINT) AS n_bytes,
       |  substring(h, 1, 16) AS header_hex,
       |  CAST(CASE WHEN h IS NULL THEN NULL
       |    ELSE COALESCE(list_sum(list_transform(regexp_extract_all(h, '..'),
       |      p -> (strpos('0123456789ABCDEF', substring(p, 1, 1)) - 1) * 16
       |         + (strpos('0123456789ABCDEF', substring(p, 2, 1)) - 1))), 0)
       |    END AS BIGINT) AS byte_sum,
       |  CAST(len(list_filter(regexp_extract_all(h, '..'),
       |    p -> strpos('89ABCDEF', substring(p, 1, 1)) > 0)) AS BIGINT) AS n_hi_bytes,
       |  kind,
       |  CAST(CASE WHEN kind = 'bmp' THEN ${leValSql("h", 18, 4)} END AS BIGINT) AS width,
       |  CAST(CASE WHEN kind = 'bmp' THEN ${leValSql("h", 22, 4)} END AS BIGINT) AS height,
       |  CAST(CASE WHEN kind = 'bmp' THEN ${leValSql("h", 28, 2)} END AS BIGINT) AS bpp,
       |  CAST(CASE WHEN kind = 'wav' THEN ${dynLeSql("fmt_off + 2", 2)} END AS BIGINT) AS channels,
       |  CAST(CASE WHEN kind = 'wav' THEN ${dynLeSql("fmt_off + 4", 4)} END AS BIGINT) AS sample_rate,
       |  CAST(CASE WHEN kind = 'wav' THEN ${dynLeSql("fmt_off + 14", 2)} END AS BIGINT) AS bits
       |FROM hexed
       |ORDER BY media_id, fmt, n_bytes, header_hex, byte_sum, n_hi_bytes,
       |  kind, width, height, bpp, channels, sample_rate, bits""".stripMargin

  /** The same features through the typed per-partition batch surface —
    * the seam where a real pipeline hangs JNI codecs or model inference.
    * One decoder instance per partition (mapPartitions, not map: codec
    * init is per-task, not per-record), streaming iterator in/out so a
    * partition never materializes in memory.
    */
  def mediaFeaturesPartitioned(docs: DataFrame): DataFrame = {
    val media: Dataset[MediaRow] = asContainerTable(docs)
      .select("media_id", "payload", "fmt")
      .as(Encoders.product[MediaRow])
    media.mapPartitions { rows =>
      // real pipeline: initialize the codec/model HERE, once per task
      rows.map(realDecode)
    }(Encoders.product[MediaDecoded]).toDF()
  }
}
