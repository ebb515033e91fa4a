package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.multimodal.{Hamming64, ImageHash}

/** Streaming MEDIA-dedup admission gates — the
  * [[DocStream.dedupAgainstCorpus]] discipline for ALL THREE media
  * content families (image / audio / video, one shape each): each
  * arriving payload is content-hashed at ingest (the family hash in
  * its checkpoint-free spelling — pure per-row expression work, no
  * barrier a stream cannot run) and its 4 Hamming bands probe
  * the PERSISTED corpus `(media_id, ahash)` sketch relation by a
  * stream-static equi-join. Corpus history never enters streaming
  * state — the static side is a parquet relation probed per
  * micro-batch, which is what makes "is this upload a near-copy of
  * anything in 100 TB of history" answerable at ingest at all.
  * Matches are exact `bit_count(xor)` rescored; multi-band collisions
  * of one (upload, corpus) pair collapse via
  * `dropDuplicatesWithinWatermark` exactly as
  * [[EmbedStream.annMatchesAgainstCorpus]] does, so state is the
  * watermark horizon of emitted matches, nothing more. An upload
  * matching nothing passes silently (emit-matches semantics).
  *
  * Intra-stream pairs (two near-identical uploads in one horizon) are
  * deliberately NOT emitted — the nightly batch
  * ([[graft.multimodal.ImageHash.incrementalImagePairs]]) catches
  * them, exactly as `dedupAgainstCorpus` defers its history to the
  * batch pass. */
object MediaStream {

  /** `(media_id, corpus_id, hamming, event_time)` — arriving payloads
    * (`media_id, payload, ts` epoch-ns) whose image content lands
    * within `maxHamming` of a persisted corpus sketch row. */
  def imageMatchStream(payloads: DataFrame, corpusSketch: DataFrame,
      maxHamming: Int = 3,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val hashed = ImageHash.ahashOfPayloadsStream(
        payloads.select(col("media_id"), col("payload"),
          EventStream.eventTime.as("event_time")),
        keep = Seq("event_time"))
      .withWatermark("event_time", watermarkDelay)
    val streamB = Hamming64.bands(
      hashed.select(col("media_id"), col("ahash"), col("event_time")),
      keep = Seq("event_time"))
    val corpusB = Hamming64.bands(
        corpusSketch.select(col("media_id"), col("ahash")))
      .select(col("media_id").as("corpus_id"), col("ahash").as("cahash"),
        col("band"), col("nibble"))
    streamB.join(corpusB, Seq("band", "nibble"))
      .select(col("media_id"), col("corpus_id"),
        bit_count(col("ahash").bitwiseXOR(col("cahash")))
          .cast("long").as("hamming"),
        col("event_time"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicatesWithinWatermark("media_id", "corpus_id")
  }

  /** The AUDIO twin — arriving clips amplitude-hashed at ingest
    * ([[graft.multimodal.AudioHash]], checkpoint-free spelling) and
    * probed against the persisted corpus clip sketch. Same stateless
    * contract, same watermark collapse. */
  def audioMatchStream(payloads: DataFrame, corpusSketch: DataFrame,
      maxHamming: Int = 3,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val hashed = graft.multimodal.AudioHash.ahashOfPayloadsStream(
        payloads.select(col("media_id"), col("payload"),
          EventStream.eventTime.as("event_time")),
        keep = Seq("event_time"))
      .withWatermark("event_time", watermarkDelay)
    val streamB = Hamming64.bands(
      hashed.select(col("media_id"), col("ahash"), col("event_time")),
      keep = Seq("event_time"))
    val corpusB = Hamming64.bands(
        corpusSketch.select(col("media_id"), col("ahash")))
      .select(col("media_id").as("corpus_id"), col("ahash").as("cahash"),
        col("band"), col("nibble"))
    streamB.join(corpusB, Seq("band", "nibble"))
      .select(col("media_id"), col("corpus_id"),
        bit_count(col("ahash").bitwiseXOR(col("cahash")))
          .cast("long").as("hamming"),
        col("event_time"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicatesWithinWatermark("media_id", "corpus_id")
  }

  /** The VIDEO twin — arriving MP4s content-hashed over their walked
    * `mdat` payload at ingest ([[graft.multimodal.VideoHash]],
    * checkpoint-free spelling) and probed against the persisted corpus
    * video sketch. Same stateless contract, same watermark collapse —
    * a metadata-edited re-upload (`moov` churn) matches its original
    * at Hamming 0 because only the coded stream is hashed. */
  def videoMatchStream(payloads: DataFrame, corpusSketch: DataFrame,
      maxHamming: Int = 3,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val hashed = graft.multimodal.VideoHash.ahashOfPayloadsStream(
        payloads.select(col("media_id"), col("payload"),
          EventStream.eventTime.as("event_time")),
        keep = Seq("event_time"))
      .withWatermark("event_time", watermarkDelay)
    val streamB = Hamming64.bands(
      hashed.select(col("media_id"), col("ahash"), col("event_time")),
      keep = Seq("event_time"))
    val corpusB = Hamming64.bands(
        corpusSketch.select(col("media_id"), col("ahash")))
      .select(col("media_id").as("corpus_id"), col("ahash").as("cahash"),
        col("band"), col("nibble"))
    streamB.join(corpusB, Seq("band", "nibble"))
      .select(col("media_id"), col("corpus_id"),
        bit_count(col("ahash").bitwiseXOR(col("cahash")))
          .cast("long").as("hamming"),
        col("event_time"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicatesWithinWatermark("media_id", "corpus_id")
  }

  /** The COMPRESSED-IMAGE twin — arriving PNGs/JPEGs span-hashed at
    * ingest ([[graft.multimodal.CompressedImageHash]], checkpoint-free
    * spelling) and probed against the persisted corpus `(media_id,
    * kind, ahash)` sketch. The band probe carries `kind`, so a PNG
    * upload can only match PNG history (the family's per-format
    * discipline). Same stateless contract, same watermark collapse. */
  def cimageMatchStream(payloads: DataFrame, corpusSketch: DataFrame,
      maxHamming: Int = 3,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val hashed = graft.multimodal.CompressedImageHash.ahashOfHexMaybeCk(
        payloads.select(col("media_id"), col("payload"),
            EventStream.eventTime.as("event_time"))
          .select(col("media_id"), hex(col("payload")).as("h"),
            length(col("payload")).cast("long").as("n_bytes"),
            col("event_time")),
        checkpoint = false, keep = Seq("event_time"))
      .withWatermark("event_time", watermarkDelay)
    val streamB = Hamming64.bands(
      hashed.select(col("media_id"), col("ahash"), col("kind"),
        col("event_time")),
      keep = Seq("kind", "event_time"))
    val corpusB = Hamming64.bands(
        corpusSketch.select(col("media_id"), col("ahash"), col("kind")),
        keep = Seq("kind"))
      .select(col("media_id").as("corpus_id"), col("ahash").as("cahash"),
        col("kind"), col("band"), col("nibble"))
    streamB.join(corpusB, Seq("kind", "band", "nibble"))
      .select(col("media_id"), col("corpus_id"),
        bit_count(col("ahash").bitwiseXOR(col("cahash")))
          .cast("long").as("hamming"),
        col("event_time"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicatesWithinWatermark("media_id", "corpus_id")
  }
}
