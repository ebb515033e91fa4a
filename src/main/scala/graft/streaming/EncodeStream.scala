package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.{TextAnalysis, Unigram}

/** Streaming FROZEN-TOKENIZER encode — the admission-time twin the
  * tokenizer lifecycle lacked: every other per-doc admission transform
  * has a stream face (classifier, PII scrub, mix gate, blocklist,
  * exact/near dedup, PQ encode), but tokenizing under the frozen
  * artifact only ran as the nightly batch. This closes it for the
  * unigram family: a stream of documents encoded to their token-id
  * arrays under the RELOADED persisted vocabulary.
  *
  * Statelessness is the design point (the
  * [[EmbedStream.pqEncodeStream]] discipline): after the one
  * stream-static broadcast join that attaches the artifact's two maps
  * (smoothed piece costs + vocab-rank ids — each a pure function of
  * the persisted vocabulary, [[Unigram.frozenEncodeMaps]]), the whole
  * encode is per-row expression work — tokenize, per-word Viterbi
  * under the cost map, id lookup — so there is no watermark, no state
  * store, nothing to evict, and a doc encoded at ingest matches the
  * nightly batch re-encode BIT-IDENTICALLY (spec-pinned, including
  * unseen words and never-seen bytes taking the deterministic
  * miss-cost path to id 0).
  *
  * Scale shape: the artifact is ≤ vocab-size rows collapsed to one
  * broadcast row; the stream pays per-occurrence segmentation (the
  * price of statelessness — a micro-batch has no distinct-word
  * relation worth building), bounded per word by the same dp the
  * batch runs. */
object EncodeStream {

  /** `(doc_id, ids, event_time)` — each arriving document's unigram
    * token-id array under the frozen `vocab` artifact (`(piece, cnt)`
    * rows, e.g. the persisted [[Unigram.unigramVocab]] relation). */
  def unigramEncodeStream(docs: DataFrame, vocab: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        TextAnalysis.tokens(col("text")).as("toks"),
        EventStream.eventTime.as("event_time"))
      .withColumn("k", lit(1))
      .join(broadcast(Unigram.frozenEncodeMaps(vocab)), Seq("k"))
      .select(col("doc_id"),
        expr(Unigram.docIdsPerRowSql).as("ids"),
        col("event_time"))

  /** The BPE twin — `(doc_id, ids, event_time)` under the frozen
    * persisted MERGE TABLE ([[TextAnalysis.bpeMerges]]' relation): the
    * merge array and the symbol id map collapse to one broadcast row,
    * then per word the byte symbols fold through the ordered rewrites
    * exactly as the batch apply does. Same stateless contract as
    * [[unigramEncodeStream]]; both tokenizer families now encode at
    * ingest under their reloaded artifacts. */
  def bpeEncodeStream(docs: DataFrame, merges: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        TextAnalysis.tokens(col("text")).as("toks"),
        EventStream.eventTime.as("event_time"))
      .withColumn("k", lit(1))
      .join(broadcast(TextAnalysis.frozenBpeMaps(merges)), Seq("k"))
      .select(col("doc_id"),
        expr(TextAnalysis.bpeDocIdsPerRowSql).as("ids"),
        col("event_time"))
}
