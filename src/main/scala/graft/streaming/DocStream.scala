package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Structured Streaming twin of the exact-dedup operator
  * ([[graft.text.Dedup.exactDupClusters]]): an incoming document stream
  * deduplicated on the same whitespace-normalized md5 key, keeping the
  * first arrival.
  *
  * State discipline is the design point: unbounded-stream exact dedup
  * with `dropDuplicates` would hold every key ever seen. This uses
  * `dropDuplicatesWithinWatermark`, so state is evicted once the
  * watermark passes — the contract becomes "no duplicate within the
  * watermark horizon", which is how production ingest dedup actually
  * runs (the full-history pass stays a batch job; see
  * [[graft.text.Dedup]]). Same key expression as batch, so a document
  * admitted here and later exact-deduped in batch hashes identically.
  */
object DocStream {

  /** Event-time from an epoch-ns BIGINT `ts` — the same shared ns→µs
    * floor as every other time consumer ([[EventStream.eventTime]]). */
  private val eventTime: Column = EventStream.eventTime

  /** `(doc_id, fp_md5, event_time)` stream with duplicates (by normalized
    * content hash) dropped within the watermark horizon. */
  def dedupDocs(docs: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    docs.select(col("doc_id"),
        TextAnalysis.normMd5(col("text")).as("fp_md5"),
        eventTime.as("event_time"))
      .withWatermark("event_time", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp_md5")
}
