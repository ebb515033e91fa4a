package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The curation decision — the composite a training-data pipeline
  * actually ships: per document, the keep/drop verdict plus the reasons,
  * composed from the primitive operators (exact-dup keeper, near-dup
  * component survivor, quality threshold). Keeping the reason columns
  * (not just the filtered corpus) is deliberate: curation runs are
  * audited, thresholds get re-tuned, and a drop-reason log turns a
  * re-tune into a cheap re-filter instead of a full recompute.
  *
  * Plan shape: three independent per-doc relations (each already
  * scale-shaped — see their operators) equi-joined back on doc_id.
  * No new shuffles beyond the components' own.
  */
object Curation {

  def corpusKeep(docs: DataFrame, minQuality: Double = 0.5): DataFrame = {
    // ONE documents scan and ONE tokenize pass feed every component: the
    // eagerly-checkpointed base carries (doc_id, text, toks, char_count),
    // and fingerprints, quality stats, and minhash signatures all derive
    // from it (PlanAuditSpec pins that the final plan re-scans no
    // documents parquet). This replaces round 3's lazy persist(), which
    // held corpus-sized cache blocks until session end — checkpoint
    // blocks are dropped by the ContextCleaner once the result stops
    // referencing them. Tradeoff (accepted project-wide, same as the
    // dedup checkpoints): executor-local non-replicated blocks mean an
    // executor loss fails the query instead of recomputing.
    val base = graft.Tables.widen(docs).select(col("doc_id"), col("text"),
      TextAnalysis.tokens(col("text")).as("toks"),
      length(col("text")).cast("long").as("char_count"))
      .localCheckpoint()
    // fp is consumed four times (cluster agg, per-doc join, keeper
    // derivation, exact edges) — checkpoint the 40-byte rows once.
    val fp = base.select(col("doc_id"), TextAnalysis.normMd5(col("text")).as("fp_md5"))
      .localCheckpoint()
    // The keep-first policy is defined ONCE, in Dedup.exactDupClusters —
    // joining against it (rather than re-deriving min(doc_id) here) means
    // a future change to the survivor policy cannot desynchronize
    // corpus_keep from exact_dup_clusters.
    val exactDup = fp.join(Dedup.exactDupClustersFromFp(fp), "fp_md5")
      .select(col("doc_id"), (col("doc_id") =!= col("keeper_doc_id")).as("is_exact_dup"))
    val nearDup = Dedup.dedupClustersFromParts(base, fp, Dedup.signaturesFromToks(base))
      .select(col("doc_id"), (!col("is_survivor")).as("is_near_dup"))
    val quality = TextAnalysis.textStatsFromToks(base)
      .select(col("doc_id"), (col("quality_score") >= lit(minQuality)).as("quality_ok"))
    exactDup.join(nearDup, "doc_id").join(quality, "doc_id")
      .select(col("doc_id"), col("is_exact_dup"), col("is_near_dup"), col("quality_ok"),
        (!col("is_exact_dup") && !col("is_near_dup") && col("quality_ok")).as("keep"))
  }

  def corpusKeepSql(minQuality: Double = 0.5, minMatch: Long = 8L): String = {
    val statsBody = TextAnalysis.textStatsSql
      .replaceAll("(?s)ORDER BY.*$", "")
    s"""WITH RECURSIVE ${Dedup.componentCtes(minMatch)},
       |exd AS (
       |  SELECT doc_id, doc_id <> keeper_id AS is_exact_dup
       |  FROM fp JOIN keepers USING (fp_md5)
       |),
       |q AS (
       |  SELECT doc_id, quality_score >= ${minQuality}e0 AS quality_ok
       |  FROM ($statsBody)
       |)
       |SELECT exd.doc_id AS doc_id, is_exact_dup,
       |  rep.rep_id <> exd.doc_id AS is_near_dup, quality_ok,
       |  NOT is_exact_dup AND rep.rep_id = exd.doc_id AND quality_ok AS keep
       |FROM exd
       |JOIN rep ON rep.doc_id = exd.doc_id
       |JOIN q ON q.doc_id = exd.doc_id
       |ORDER BY doc_id, is_exact_dup, is_near_dup, quality_ok, keep""".stripMargin
  }
}
