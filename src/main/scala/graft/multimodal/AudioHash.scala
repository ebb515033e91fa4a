package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Audio CONTENT fingerprinting — [[ImageHash]]'s sibling, closing the
  * multimodal dedup story: a corpus that dedups its text and its
  * images still leaves re-encoded-except-metadata AUDIO untouched (a
  * WAV whose `LIST` tag or declared-but-absent tail bytes changed has
  * a new exact fingerprint and identical samples).
  *
  * The hash reads the sample stream a real decoder exposes — the SAME
  * bounded RIFF chunk walk [[Media.audioFrames]] uses (`fmt ` and
  * `data` at their WALKED offsets, frame size = channels·bits/8, the
  * honest truncation clamp) — and sketches its amplitude shape:
  *
  *  1. 64 probe points by integer striding over the CLAMPED frame
  *     count — probe k reads the MOST-significant byte of channel 0's
  *     sample in frame `(k · n_frames) div 64` (`+ bits div 8 − 1`
  *     past the frame start: the sample itself at 8 bits, the
  *     sign/amplitude byte of 16-bit little-endian PCM — the
  *     [[ImageHash]] nearest-neighbor downsample stance on the time
  *     axis, reading the byte that actually carries the envelope);
  *  2. bit k is set iff `64 · a_k > Σ a` — strictly above the mean
  *     amplitude byte, ties → 0, never divides.
  *
  * This is the codec-free integer analog of an envelope fingerprint:
  * a production acoustic fingerprint (spectral landmarks) replaces the
  * per-probe byte read; the sketch width, banding, pairing join, and
  * incremental shape around it — the parts that cost anything at
  * 100 TB — are exactly what ships here and are shared with the
  * SimHash/aHash families. Eligibility is explicit: a complete walked
  * `fmt `+`data`, frame size ≥ 1, and ≥ 64 clamped frames; anything
  * else emits no row.
  *
  * Scale shape: per-row hex arithmetic (one bounded walk fold + 64
  * fixed probes — cost per CLIP, independent of clip length), an
  * 8-byte/clip sketch, and the proven checkpoint-sketch →
  * band-explode → equi-self-join pairing (AQE-splittable, never
  * all-pairs).
  */
object AudioHash {

  /** 64 probe points → 64-bit hash; banding via [[Hamming64]]. */
  val Probes = 64

  /** Byte value at DYNAMIC byte offset `off` of hex column `h` —
    * [[Media.dynLeSql]] at width 1 (weight 1). */
  private def byteAtSql(off: String): String = Media.dynLeSql(off, 1)

  /** Probe k's amplitude byte over columns `h`, `data_off`,
    * `n_frames`, `frame_bytes`, `bits` (the walked WAV layout): the
    * MOST-significant byte of channel 0's sample — `+ (bits div 8 − 1)`
    * past the frame start. For 8-bit PCM that is the sample itself; for
    * 16-bit little-endian PCM it is the sign/amplitude byte, so the
    * envelope analog holds on the dominant real-world format instead of
    * degenerating to noise-like low-byte matching (r13 verdict nit #1
    * — the LOW byte of a 16-bit sample carries no envelope). */
  private def probeSql(k: String, idiv: String): String =
    // greatest(·, 0): malformed sub-byte bit widths (bits < 8 with
    // enough channels to clear the frame_bytes gate) must not probe
    // BEFORE the frame — clamped identically in both engines
    byteAtSql(s"data_off + ((($k) * n_frames) $idiv 64) * frame_bytes" +
      s" + greatest((bits $idiv 8) - 1, 0)")

  /** Fixture synthesis: every document as a REAL canonical 44-byte
    * WAV (mono, 8-bit, rate 8000·(1 + doc_id % 4)) — the
    * [[ImageHash.imagesHexSql]] two-population discipline on the audio
    * axis: doc_id % 3 ≠ 2 carries the doc's own text bytes as samples;
    * doc_id % 3 = 2 is the PLANTED near-dup population — each 30-id
    * group g shares one base clip (a 16-byte multiplicative-hash
    * pattern of g repeated to 256 + 32·(doc_id % 5) samples, constant
    * within the d/d+15 pair) with ONE sample edited at a
    * doc-dependent position, so ids d and d+15 pair at small Hamming
    * distance while groups and text clips don't. */
  private[multimodal] def wavHexSql(textHex: String, textBytes: String,
      idiv: String): String = {
    def leHex(v: String, nBytes: Int): String =
      Media.leHexSql(v, nBytes, idiv)
    val base = Media.groupPatternSql(
      s"CAST((256 + 32 * (doc_id % 5)) $idiv 16 AS INT)", idiv)
    val edited = Media.editedPatternSql(base, 97, idiv)
    val pixHex = s"CASE WHEN doc_id % 3 = 2 THEN $edited ELSE $textHex END"
    val nb = s"CASE WHEN doc_id % 3 = 2 THEN 256 + 32 * (doc_id % 5) ELSE $textBytes END"
    val rate = "(8000 * (1 + doc_id % 4))"
    s"'52494646' || ${leHex(s"36 + $nb", 4)} || '57415645' || " +
      s"'666D7420' || '10000000' || '0100' || '0100' || ${leHex(rate, 4)} || " +
      s"${leHex(rate, 4)} || '0100' || '0800' || " +
      s"'64617461' || ${leHex(nb, 4)} || $pixHex"
  }

  /** The hash over `(media_id, h, n_bytes)` — eligibility and layout
    * from the REAL walk, probes and vote as one bounded HOF pair (the
    * [[ImageHash.ahashOfHex]] codegen rationale). */
  private def ahashOfHex(sized: DataFrame): DataFrame =
    ahashOfHexMaybeCk(sized, checkpoint = true)

  /** `checkpoint = false` is the STREAM spelling — the
    * [[ImageHash.ahashOfHexMaybeCk]] rationale: the walk struct is a
    * non-cheap multi-use alias, so CollapseProject never duplicates
    * the fold and the barrier is only a batch amortization. `keep`
    * threads passthrough columns (event_time for the stream gate). */
  private[graft] def ahashOfHexMaybeCk(sized: DataFrame,
      checkpoint: Boolean, keep: Seq[String] = Nil): DataFrame = {
    val walked0 = sized
      // eligibility-filter BEFORE the checkpoint: on a mixed media lake
      // most payloads are not RIFF/WAVE, and the gate is the fold's own
      // entry condition (gated-off rows carry NULL wk and would drop at
      // the next filter anyway) — so the 2x-payload hex materialization
      // is bounded to candidate WAVs (the ImageHash.ahashOfHex shape)
      .filter(Media.riffMagic)
      .withColumn("wk", Media.gatedWalk(Media.riffMagic, Media.walkAggSql))
    val walked = if (checkpoint) walked0.localCheckpoint() else walked0
    val wav = walked
      .filter(col("wk.fmt_off").isNotNull && col("wk.data_off").isNotNull)
      .select(keep.map(col) ++ Seq(col("media_id"), col("h"),
        col("wk.data_off").as("data_off"),
        col("wk.channels").as("channels"),
        col("wk.sample_rate").as("sample_rate"),
        col("wk.bits").as("bits"),
        col("wk.data_len").as("declared_len"),
        (col("n_bytes") - col("wk.data_off")).as("avail_len")): _*)
      .withColumn("frame_bytes", expr("(channels * bits) div 8L"))
      .filter(col("frame_bytes") >= 1L)
      .withColumn("n_frames",
        expr("least(declared_len, avail_len) div frame_bytes"))
      .filter(col("n_frames") >= Probes.toLong)
    // probe + vote ride the shared Hamming64 body
    Hamming64.probeVote(wav, Probes, k => probeSql(k, "div"),
      keep.map(col) ++ Seq(col("media_id"), col("sample_rate"),
        col("frame_bytes"), col("n_frames")))
  }

  /** Payload-level seam for the spec's hand-built WAVs. */
  private[graft] def ahashOfPayloads(payloads: DataFrame): DataFrame =
    ahashOfHex(payloads.select(col("media_id"),
      hex(col("payload")).as("h"),
      length(col("payload")).cast("long").as("n_bytes")))

  /** Checkpoint-free payload hash for STREAMS. */
  private[graft] def ahashOfPayloadsStream(payloads: DataFrame,
      keep: Seq[String] = Nil): DataFrame =
    ahashOfHexMaybeCk(payloads.select(Seq(col("media_id"),
      hex(col("payload")).as("h"),
      length(col("payload")).cast("long").as("n_bytes")) ++
      keep.map(col): _*), checkpoint = false, keep = keep)

  /** Session-scoped reuse of the decoded clip sketch (the
    * [[ImageHash]] sketchCache discipline): the persisted
    * 8-byte-sketch relation every face and the incremental corpus side
    * replay — decoded once per (session, corpus plan). */
  private val sketchCache = new graft.SessionCache[Int, DataFrame](2)
  private[graft] def sketchBuilds = sketchCache.builds

  /** `(media_id, sample_rate, frame_bytes, n_frames, ahash)` per
    * eligible clip of the synthesized corpus. */
  def audioAhash(docs: DataFrame): DataFrame =
    sketchCache.getOrBuild(docs.sparkSession,
        docs.queryExecution.analyzed.semanticHash()) {
      audioAhashBuild(docs).localCheckpoint()
    }

  private def audioAhashBuild(docs: DataFrame): DataFrame = {
    val h = expr("element_at(transform(sequence(0, 0), fixture_once -> " +
      wavHexSql("hex(encode(text, 'utf-8'))", "octet_length(text)", "div") +
      "), 1)")
    ahashOfHex(graft.Tables.widen(docs)
      .select(col("doc_id").as("media_id"), h.as("h"))
      .filter(col("h").isNotNull)
      .withColumn("n_bytes", (length(col("h")) / 2).cast("long"))
      .localCheckpoint())
  }

  /** Near-duplicate AUDIO pairs — the shared [[Hamming64]] body on the
    * clip sketch. */
  def audioDupPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    Hamming64.pairsOfSketch(audioAhash(docs).select("media_id", "ahash"),
      "clip_a", "clip_b", maxHamming)

  /** Payload-level pairing twin for planted-fixture specs. */
  private[graft] def dupPairsOfPayloads(payloads: DataFrame,
      maxHamming: Int = 3): DataFrame =
    Hamming64.pairsOfSketch(
      ahashOfPayloads(payloads).select("media_id", "ahash"),
      "clip_a", "clip_b", maxHamming)

  /** Occupancy report for the audio band space — the cost-prediction
    * symmetry every sketch family here ships (shared
    * [[graft.text.Dedup.occupancyRollup]] body). */
  def audioOccupancy(docs: DataFrame): DataFrame =
    graft.text.Dedup.occupancyRollup(
      Hamming64.bands(
          audioAhash(docs).select("media_id", "ahash").localCheckpoint())
        .groupBy("band", "nibble").agg(count(lit(1)).as("sz")),
      "band")

  def audioOccupancySql: String =
    s"""WITH ${ahashCtesSql},
       |bands AS (
       |  ${Hamming64.nibbleSelectsSql}
       |),
       |occ AS (
       |  SELECT band, nibble, CAST(count(*) AS BIGINT) AS sz
       |  FROM bands GROUP BY band, nibble
       |)
       |${graft.text.Dedup.occupancySelectSql("band")}""".stripMargin

  /** Nightly-ingest twin — shard clips hashed fresh, corpus replays
    * its persisted 8-byte sketch ([[Hamming64.pairsIncremental]]). */
  def incrementalAudioPairs(newDocs: DataFrame, corpusSketch: DataFrame,
      maxHamming: Int = 3): DataFrame =
    Hamming64.pairsIncremental(
      audioAhash(newDocs).select("media_id", "ahash"), corpusSketch,
      "clip_a", "clip_b", maxHamming)

  /** Oracle twin for the driver's fixture split (shard = media_id %
    * 10 = 9): the hash is a pure per-clip function, one chain feeds
    * both sides. */
  def incrementalAudioPairsSql(maxHamming: Int = 3,
      shardPred: String = "media_id % 10 = 9"): String =
    s"""WITH ${ahashCtesSql},
       |bands AS (
       |  ${Hamming64.nibbleSelectsSql}
       |),
       |newb AS (
       |  SELECT * FROM bands WHERE $shardPred
       |),
       |pairs AS (
       |  SELECT DISTINCT least(a.media_id, b.media_id) AS clip_a,
       |    greatest(a.media_id, b.media_id) AS clip_b,
       |    CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
       |  FROM newb a JOIN bands b
       |    ON a.band = b.band AND a.nibble = b.nibble
       |    AND a.media_id <> b.media_id
       |)
       |SELECT clip_a, clip_b, hamming FROM pairs
       |WHERE hamming <= $maxHamming
       |ORDER BY clip_a, clip_b, hamming""".stripMargin

  /** Duplicate-clip CLUSTERS — the [[ImageHash.imageDupClusters]]
    * detect → pair → cluster loop on the audio sketch (star
    * contraction, singletons self-canonical, cluster id = min). */
  def audioDupClusters(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sk = audioAhash(docs) // session-cached, checkpoint-backed
    Hamming64.clustersOfPairs(sk, maxHamming,
      Hamming64.pairsOfSketch(sk.select("media_id", "ahash"),
        "doc_a", "doc_b", maxHamming))
  }

  /** [[audioDupClusters]] with the BEST-COPY survivor policy:
    * `is_canonical` marks the LONGEST clip —
    * `duration_us = n_frames · 10⁶ div sample_rate` over the CLAMPED
    * frame count, so a truncated re-upload loses to its intact
    * original even at a different sample rate — media_id asc on ties;
    * components and `cluster_id` are [[audioDupClusters]]' exactly.
    * A malformed header declaring `sample_rate ≤ 0` gets metric 0
    * (r14 advice: the old `div greatest(rate, 1)` spelling made a
    * zero-rate clone's duration read as n_frames·10⁶ and CROWNED the
    * corrupt copy), so a corrupt member can never outrank a healthy
    * one. The shared [[Hamming64.bestCanonical]] body. */
  def audioDupClustersBest(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    bestOfSketch(audioAhash(docs), maxHamming)

  private def bestOfSketch(sk: DataFrame, maxHamming: Int): DataFrame =
    Hamming64.bestOfPairs(sk, maxHamming,
      Hamming64.pairsOfSketch(sk.select("media_id", "ahash"),
        "doc_a", "doc_b", maxHamming),
      expr("CASE WHEN sample_rate >= 1L THEN " +
        "(n_frames * 1000000L) div sample_rate ELSE 0L END"))

  /** Payload-level twin for planted-fixture specs. */
  private[graft] def dupClustersBestOfPayloads(payloads: DataFrame,
      maxHamming: Int = 3): DataFrame =
    bestOfSketch(ahashOfPayloads(payloads).localCheckpoint(), maxHamming)

  /** Oracle twin of [[audioDupClustersBest]] — the cluster closure
    * with the canonical flag re-ranked by clip duration. */
  def audioDupClustersBestSql(maxHamming: Int = 3): String =
    s"""WITH RECURSIVE ${ahashCtesSql},
       |bands AS (
       |  ${Hamming64.nibbleSelectsSql}
       |),
       |${Hamming64.closureCtesSql(maxHamming)},
       |${Hamming64.bestFinalSql(
            "(CASE WHEN h.sample_rate >= 1\n" +
            "          THEN (h.n_frames * 1000000) // h.sample_rate\n" +
            "          ELSE 0 END)")}""".stripMargin

  /** Oracle twin of [[audioDupClusters]] — recursive-CTE closure. */
  def audioDupClustersSql(maxHamming: Int = 3): String =
    s"""WITH RECURSIVE ${ahashCtesSql},
       |bands AS (
       |  ${Hamming64.nibbleSelectsSql}
       |),
       |${Hamming64.closureCtesSql(maxHamming)}
       |${Hamming64.clustersFinalSql}""".stripMargin

  // ---- DuckDB oracle twins ---------------------------------------------------

  /** synthesis → walk → eligibility → 64 probes → hash, as CTEs ending
    * in `hashed`. Probes unrolled per column (the [[ImageHash]] DuckDB
    * spelling); the walk is [[Media.walkCteSql]] verbatim. */
  private def ahashCtesSql: String =
    s"""media AS (
       |  SELECT doc_id AS media_id,
       |    ${wavHexSql("hex(encode(text))", "octet_length(encode(text))", "//")} AS h
       |  FROM documents
       |), sized AS (
       |  SELECT media_id, h, len(h) // 2 AS n_bytes FROM media
       |  WHERE h IS NOT NULL
       |), ${ahashBodyCtesSql("sized", "")}""".stripMargin

  /** The walk → eligibility → 64-probe → hash chain over an ARBITRARY
    * `(media_id, h, n_bytes)` source CTE, stage names prefixed — the
    * reuse seam for composed oracles ([[MediaKeep]]). The RIFF walk
    * CTEs ([[Media.walkCteSql]]) keep their fixed names: only the
    * audio chain walks RIFF in any composed query. `pfx = ""`
    * reproduces the standalone spelling byte-for-byte. */
  private[multimodal] def ahashBodyCtesSql(src: String, pfx: String): String =
    s"""${Media.walkCteSql(src)},
       |${pfx}wav AS (
       |  SELECT media_id, h, data_off,
       |    CAST(${Media.dynLeSql("fmt_off + 4", 4)} AS BIGINT) AS sample_rate,
       |    CAST(${Media.dynLeSql("fmt_off + 14", 2)} AS BIGINT) AS bits,
       |    (CAST(${Media.dynLeSql("fmt_off + 2", 2)} AS BIGINT)
       |      * CAST(${Media.dynLeSql("fmt_off + 14", 2)} AS BIGINT)) // 8
       |      AS frame_bytes,
       |    CAST(data_len AS BIGINT) AS declared_len,
       |    CAST(n_bytes - data_off AS BIGINT) AS avail_len
       |  FROM walked
       |  WHERE fmt_off IS NOT NULL AND data_off IS NOT NULL
       |), ${pfx}elig AS (
       |  SELECT media_id, h, data_off, sample_rate, bits, frame_bytes,
       |    least(declared_len, avail_len) // frame_bytes AS n_frames
       |  FROM ${pfx}wav
       |  WHERE frame_bytes >= 1
       |    AND least(declared_len, avail_len) // frame_bytes >= $Probes
       |), ${Hamming64.voteCtesSql(s"${pfx}elig", pfx, Probes,
            k => probeSql(k.toString, "//"),
            Seq("sample_rate", "frame_bytes", "n_frames"))}""".stripMargin

  def audioAhashSql: String =
    s"""WITH ${ahashCtesSql}
       |SELECT media_id, sample_rate, frame_bytes, n_frames, ahash FROM hashed
       |ORDER BY media_id, sample_rate, frame_bytes, n_frames, ahash""".stripMargin

  def audioDupPairsSql(maxHamming: Int = 3): String = {
    val nibbleSelects = Hamming64.nibbleSelectsSql
    s"""WITH ${ahashCtesSql},
       |bands AS (
       |  $nibbleSelects
       |),
       |pairs AS (
       |  SELECT DISTINCT a.media_id AS clip_a, b.media_id AS clip_b,
       |    CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.nibble = b.nibble
       |    AND a.media_id < b.media_id
       |)
       |SELECT clip_a, clip_b, hamming FROM pairs
       |WHERE hamming <= $maxHamming
       |ORDER BY clip_a, clip_b, hamming""".stripMargin
  }
}
