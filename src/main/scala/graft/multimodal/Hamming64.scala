package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ONE banded-Hamming pairing body every 64-bit sketch family
  * rides — image aHash ([[ImageHash]]), audio amplitude hash
  * ([[AudioHash]]), video content hash ([[VideoHash]]), and the text
  * SimHash family ([[graft.text.Dedup.simhashPairs]], converged here
  * in r14 behind a column-rename seam) — 64-bit sketch, 4 × 16-bit
  * bands (complete for Hamming ≤ 3 by pigeonhole), candidates from a
  * (band, nibble) equi-join, exact `bit_count(xor)` rescore. Extracted
  * so a banding change (band count, tie normalization, rescore) can
  * never desynchronize the families.
  *
  * Scale shape (shared by every caller): the sketch relation
  * checkpoints ONCE (8 bytes/row), bands explode map-side (4 rows/row),
  * the self-equi-join expands in codegen with AQE skew-splitting —
  * never all-pairs. */
private[graft] object Hamming64 {

  val Bands = 4
  private val BandBits = 64 / Bands
  private val BandMask = (1L << BandBits) - 1

  /** `(media_id, ahash, band, nibble)` — the 4 band rows of a
    * `(media_id, ahash)` sketch (arithmetic shift + mask keeps the top
    * band non-negative when bit 63 is set). */
  def bands(sk: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val kc = keep.map(col)
    val bandStructs = array((0 until Bands).map(m =>
      struct(lit(m.toLong).as("band"),
        shiftright(col("ahash"), m * BandBits).bitwiseAND(lit(BandMask))
          .as("nibble"))): _*)
    // `keep` preserves caller passthrough columns (the stream gate needs
    // event_time riding along for its watermark — the Dedup
    // bandedFromKeeping discipline)
    sk.select(Seq(col("media_id"), col("ahash")) ++ kc :+
        explode(bandStructs).as("b"): _*)
      .select(Seq(col("media_id"), col("ahash")) ++ kc ++ Seq(
        col("b.band").as("band"), col("b.nibble").as("nibble")): _*)
  }

  /** Within-corpus pairs of a `(media_id, ahash)` sketch relation. */
  def pairsOfSketch(sk: DataFrame, aCol: String, bCol: String,
      maxHamming: Int): DataFrame = {
    val b = bands(sk.localCheckpoint())
    b.as("x").join(b.as("y"),
        col("x.band") === col("y.band") && col("x.nibble") === col("y.nibble") &&
        col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as(aCol), col("y.media_id").as(bCol),
        bit_count(col("x.ahash").bitwiseXOR(col("y.ahash")))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Shard-vs-corpus pairs: only the (already hashed) shard sketch is
    * fresh; the corpus side replays its persisted 8-byte sketch.
    * Disjoint-id precondition, pair direction normalized by
    * least/greatest (the incremental sketch-family shape). */
  def pairsIncremental(newSk: DataFrame, corpusSk: DataFrame,
      aCol: String, bCol: String, maxHamming: Int): DataFrame = {
    val newB = bands(newSk.localCheckpoint())
    val allB = bands(corpusSk.select("media_id", "ahash")).union(newB)
    newB.as("x").join(allB.as("y"),
        col("x.band") === col("y.band") && col("x.nibble") === col("y.nibble") &&
        col("x.media_id") =!= col("y.media_id"))
      .select(least(col("x.media_id"), col("y.media_id")).as(aCol),
        greatest(col("x.media_id"), col("y.media_id")).as(bCol),
        bit_count(col("x.ahash").bitwiseXOR(col("y.ahash")))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Re-mark the canonical copy on a `(doc_id, rep_id)` cluster
    * relation so the kept member MAXIMIZES `metrics.metric` (media_id
    * asc tie-break) — the [[graft.text.Dedup]] bestSurvivor discipline
    * for the media families: components and cluster ids are identical
    * to the keep-first face (rep_id stays the component minimum — the
    * stable cluster identifier), only `is_canonical` moves to the BEST
    * copy (highest resolution / longest duration / most content), which
    * is what production dedup actually keeps. One ≤16-byte-row agg +
    * equi-join on the labeled relation — nothing re-touches payloads. */
  private[graft] def bestCanonical(clusters: DataFrame,
      metrics: DataFrame): DataFrame = {
    val best = clusters.join(metrics, col("doc_id") === col("media_id"))
      .groupBy("rep_id")
      .agg(min(struct((-col("metric")).as("o"), col("doc_id").as("d")))
        .getField("d").as("best_id"))
    clusters.select("doc_id", "rep_id").join(best, "rep_id")
      .select(col("doc_id").as("media_id"), col("rep_id").as("cluster_id"),
        (col("doc_id") === col("best_id")).as("is_canonical"))
  }

  /** The 4-way band explosion of a `hashed(media_id, ahash)` CTE — the
    * DuckDB side every pairing/occupancy oracle shares. */
  def nibbleSelectsSql: String = nibbleSelectsSqlFrom("hashed")

  /** [[nibbleSelectsSql]] over an arbitrary `(media_id, ahash)` CTE —
    * for composed oracles banding several modality sketches in one
    * query ([[MediaKeep]]). */
  def nibbleSelectsSqlFrom(table: String): String =
    (0 until Bands).map(m =>
      s"SELECT media_id, ahash, CAST($m AS BIGINT) AS band, " +
        s"(ahash >> ${m * BandBits}) & $BandMask AS nibble FROM $table")
      .mkString("\n  UNION ALL\n  ")
}
