package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** One media record as the typed batch-processing surface sees it. */
case class MediaRow(media_id: Long, payload: Array[Byte], fmt: String)

/** Extracted features — what a real decoder would emit per record. */
case class MediaFeatures(media_id: Long, fmt: String, n_bytes: Long,
    header_hex: String, byte_sum: Long, n_hi_bytes: Long)

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus per-record feature
  * extraction.
  *
  * The container has no media codecs, so the DECODE STEP IS A
  * DETERMINISTIC FAKE — byte-level statistics stand in for "decode the
  * JPEG and measure it" (see [[Media.fakeDecode]], the single function a
  * real pipeline would swap for a codec call). Everything AROUND the
  * decode is the real production shape and is what's tested:
  *
  *  - ingestion normalizes to `(media_id, payload BINARY, fmt, meta)` —
  *    the schema a 100 TB media lake stores (payload column prunes away
  *    for metadata-only queries; parquet keeps binaries row-group-local);
  *  - [[Media.mediaFeatures]] runs the fake decode as pure built-in
  *    expressions over the hex encoding (codegen-friendly, oracle-checkable
  *    in DuckDB byte-for-byte);
  *  - [[Media.mediaFeaturesPartitioned]] runs the SAME decode through
  *    `Dataset.mapPartitions` — the Scala twin of Python's `mapInPandas`
  *    batch-UDF surface: one iterator per partition, arbitrary JVM code
  *    (JNI codec, model inference) per record, typed output schema.
  *    A spec asserts the two plans agree row-for-row, so the imperative
  *    boundary is pinned to the declarative semantics.
  *
  * The fixtures ship no binary table, so ingestion derives payloads from
  * `documents.text` (UTF-8 bytes) — deterministic and schema-faithful.
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

  /** The deterministic fake decoder (WHERE A REAL CODEC WOULD GO): byte
    * count, 8-byte header as hex, unsigned byte sum, count of high bytes
    * (≥ 0x80 — multi-byte UTF-8 sequences in the faked payloads). */
  def fakeDecode(m: MediaRow): MediaFeatures = {
    val bytes = m.payload
    val header = bytes.take(8).map(b => f"${b & 0xff}%02X").mkString
    var sum = 0L; var hi = 0L
    bytes.foreach { b => sum += (b & 0xff); if ((b & 0xff) >= 0x80) hi += 1 }
    MediaFeatures(m.media_id, m.fmt, bytes.length.toLong, header, sum, hi)
  }

  /** Feature extraction as declarative expressions: the payload's hex
    * string is the portable byte-access path (Spark and DuckDB agree on
    * `hex` output), so byte statistics stay inside codegen with no UDF.
    */
  /** Byte value of a 2-hex-char column — the portable byte-access path. */
  private def byteVal(p: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (instr(lit("0123456789ABCDEF"), substring(p, 1, 1)) - 1) * 16L +
      (instr(lit("0123456789ABCDEF"), substring(p, 2, 1)) - 1)

  def mediaFeatures(docs: DataFrame): DataFrame = {
    val media = asMediaTable(graft.Tables.widen(docs))
    val h = hex(col("payload"))
    val bytes = regexp_extract_all(h, lit(".."), lit(0))
    media.select(
      col("media_id"),
      col("fmt"),
      length(col("payload")).cast("long").as("n_bytes"),
      substring(h, 1, 16).as("header_hex"),
      aggregate(bytes, lit(0L), (acc, p) => acc + byteVal(p)).as("byte_sum"),
      size(filter(bytes, p =>
        instr(lit("89ABCDEF"), substring(p, 1, 1)) > 0)).cast("long").as("n_hi_bytes"))
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
       |    array_to_string(list_transform(range(0, len(h) // 2, $stride),
       |      k -> substring(h, CAST(k * 2 + 1 AS INT), 2)), '') AS resized_hex
       |  FROM media
       |)
       |SELECT media_id, fmt, n_bytes, resized_hex,
       |  CAST(len(resized_hex) // 2 AS BIGINT) AS n_resized_bytes
       |FROM resized
       |ORDER BY media_id, fmt, n_bytes, resized_hex, n_resized_bytes""".stripMargin

  def mediaFeaturesSql: String =
    s"""WITH media AS (
       |  SELECT doc_id AS media_id, encode(text) AS payload, source AS fmt
       |  FROM documents
       |), hexed AS (
       |  SELECT media_id, fmt, octet_length(payload) AS n_bytes, hex(payload) AS h
       |  FROM media
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
       |    p -> strpos('89ABCDEF', substring(p, 1, 1)) > 0)) AS BIGINT) AS n_hi_bytes
       |FROM hexed
       |ORDER BY media_id, fmt, n_bytes, header_hex, byte_sum, n_hi_bytes""".stripMargin

  /** The same features through the typed per-partition batch surface —
    * the seam where a real pipeline hangs JNI codecs or model inference.
    * One decoder instance per partition (mapPartitions, not map: codec
    * init is per-task, not per-record), streaming iterator in/out so a
    * partition never materializes in memory.
    */
  def mediaFeaturesPartitioned(docs: DataFrame): DataFrame = {
    val media: Dataset[MediaRow] = asMediaTable(docs)
      .select("media_id", "payload", "fmt")
      .as(Encoders.product[MediaRow])
    media.mapPartitions { rows =>
      // real pipeline: initialize the codec/model HERE, once per task
      rows.map(fakeDecode)
    }(Encoders.product[MediaFeatures]).toDF()
  }
}
