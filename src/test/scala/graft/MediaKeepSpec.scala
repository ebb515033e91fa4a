package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.MediaKeep

/** Pins the composed media-lake keep verdict: kind sniff, decode
  * eligibility, exact payload dup, per-modality content clusters with
  * copy→keeper edges, and keep as the conjunction. */
class MediaKeepSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def le(v: Long, n: Int): Array[Byte] =
    (0 until n).map(k => ((v >> (8 * k)) & 0xff).toByte).toArray
  private def be(v: Long, n: Int): Array[Byte] =
    (0 until n).map(k => ((v >> (8 * (n - 1 - k))) & 0xff).toByte).toArray

  private def bmp(w: Int, h: Int, pix: Array[Byte]): Array[Byte] =
    "BM".getBytes("US-ASCII") ++ le(54L + pix.length, 4) ++ le(0, 4) ++
      le(54, 4) ++ le(40, 4) ++ le(w, 4) ++ le(h, 4) ++ le(1, 2) ++
      le(24, 2) ++ Array.fill[Byte](24)(0) ++ pix
  private def rowBytes(w: Int): Int = ((24 * w + 31) / 32) * 4

  private def wav(rate: Int, samples: Array[Byte]): Array[Byte] =
    "RIFF".getBytes("US-ASCII") ++ le(36L + samples.length, 4) ++
      "WAVE".getBytes("US-ASCII") ++ "fmt ".getBytes("US-ASCII") ++
      le(16, 4) ++ le(1, 2) ++ le(1, 2) ++ le(rate, 4) ++ le(rate, 4) ++
      le(1, 2) ++ le(8, 2) ++
      "data".getBytes("US-ASCII") ++ le(samples.length, 4) ++ samples

  private val matrix: Array[Byte] =
    be(0x00010000L, 4) ++ be(0, 4) ++ be(0, 4) ++ be(0, 4) ++
      be(0x00010000L, 4) ++ be(0, 4) ++ be(0, 4) ++ be(0, 4) ++
      be(0x40000000L, 4)
  private def mp4(content: Array[Byte], mdur: Long): Array[Byte] = {
    val mvhd = be(108, 4) ++ "mvhd".getBytes("US-ASCII") ++ be(0, 4) ++
      be(0, 4) ++ be(0, 4) ++ be(600, 4) ++ be(mdur, 4) ++
      be(0x00010000L, 4) ++ be(0x0100L, 2) ++ Array.fill[Byte](10)(0) ++
      matrix ++ Array.fill[Byte](24)(0) ++ be(2, 4)
    val tkhd = be(92, 4) ++ "tkhd".getBytes("US-ASCII") ++ be(7, 4) ++
      be(0, 4) ++ be(0, 4) ++ be(1, 4) ++ be(0, 4) ++ be(0, 4) ++
      Array.fill[Byte](16)(0) ++ matrix ++ be(640L << 16, 4) ++
      be(480L << 16, 4)
    be(16, 4) ++ "ftyp".getBytes("US-ASCII") ++
      "isom".getBytes("US-ASCII") ++ be(0, 4) ++
      be(216, 4) ++ "moov".getBytes("US-ASCII") ++ mvhd ++
      be(100, 4) ++ "trak".getBytes("US-ASCII") ++ tkhd ++
      be(8L + content.length, 4) ++ "mdat".getBytes("US-ASCII") ++ content
  }

  private def fill(n: Int, seed: Long): Array[Byte] = {
    var s = seed
    Array.fill(n) { s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33).toByte }
  }

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)
  private def chunk(typ: String, payload: Array[Byte]): Array[Byte] =
    be(payload.length, 4) ++ typ.getBytes("US-ASCII") ++ payload ++ be(0, 4)
  private def png(w: Int, h: Int, content: Array[Byte],
      anc: Boolean = false): Array[Byte] = {
    val ihdr = chunk("IHDR", be(w, 4) ++ be(h, 4) ++
      Array[Byte](8, 2, 0, 0, 0))
    val anc0 = if (anc) chunk("tEXt", "keyA1".getBytes("US-ASCII"))
      else Array.emptyByteArray
    PngSig ++ anc0 ++ ihdr ++ chunk("IDAT", content) ++
      chunk("IEND", Array.emptyByteArray)
  }
  private def jpg(w: Int, h: Int, content: Array[Byte],
      com: Boolean = false, eoi: Boolean = true): Array[Byte] = {
    val app0 = be(0xFFE0L, 2) ++ be(16, 2) ++
      "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0) ++
      be(0x48, 2) ++ be(0x48, 2) ++ be(0, 2)
    val comSeg = if (com) be(0xFFFEL, 2) ++ be(9, 2) ++
      "graft15".getBytes("US-ASCII") else Array.emptyByteArray
    val sof = be(0xFFC0L, 2) ++ be(11, 2) ++ Array[Byte](8) ++
      be(h, 2) ++ be(w, 2) ++ Array[Byte](1, 1, 0x11, 0)
    val sos = be(0xFFDAL, 2) ++ be(8, 2) ++
      Array[Byte](1, 1, 0, 0, 0x3F, 0)
    be(0xFFD8L, 2) ++ app0 ++ comSeg ++ sof ++ sos ++ content ++
      (if (eoi) be(0xFFD9L, 2) else Array.emptyByteArray)
  }
  private def gif(content: Array[Byte]): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++ le(240, 2) ++ le(180, 2) ++
      Array[Byte](0x91.toByte, 0, 0) ++ content ++ Array[Byte](0x3b)

  test("kind, eligibility, exact dup, content dup, keep — all gates on one lake") {
    val w = 16; val h = 16; val rb = rowBytes(w)
    val pixA = fill(rb * h, 3L)
    val pixEdit = pixA.clone(); pixEdit(rb * 4 + 9) = 55
    val vidContent = fill(500, 17L)
    val rows = Seq[(Long, Array[Byte])](
      1L -> bmp(w, h, pixA), // keeper of the exact pair + cluster root
      2L -> bmp(w, h, pixA), // byte-identical copy → exact dup
      3L -> bmp(w, h, pixEdit), // one-pixel edit → content dup of 1
      4L -> wav(8000, fill(400, 7L)), // distinct clip → clean keep
      5L -> "just some text, no container".getBytes("UTF-8"), // raw
      7L -> mp4(vidContent, 1000L), // keeper of the video pair
      8L -> mp4(vidContent, 99999L), // metadata-edited → EXACT differs,
        // content identical → content dup of 7
      9L -> wav(8000, fill(20, 9L)), // wav magic but < 64 frames
      10L -> png(32, 32, fill(300, 40L)), // keeper of the PNG pair
      11L -> png(640, 480, fill(300, 40L), anc = true), // tEXt churn +
        // new dims over the same coded stream → content dup of 10
      12L -> jpg(32, 32, fill(300, 40L)), // SAME span bytes as 10 — but
        // a JPEG: per-format pairing must keep it a clean keep
      13L -> gif(fill(100, 50L)), // GIF: sniffed, never eligible
      14L -> gif(fill(100, 50L))) // byte-identical GIF → exact dup
    val withNull = rows.toDF("media_id", "payload")
      .unionByName(Seq((6L, null.asInstanceOf[Array[Byte]]))
        .toDF("media_id", "payload"))
    val got = MediaKeep.mediaKeepOfPayloads(withNull).collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[String]("kind"), r.getAs[Boolean]("eligible"),
          r.getAs[Boolean]("is_exact_dup"), r.getAs[Boolean]("is_content_dup"),
          r.getAs[Boolean]("keep")))).toMap
    assert(got(1L) === (("bmp", true, false, false, true)),
      "the exact keeper / cluster root is the one kept copy")
    assert(got(2L) === (("bmp", true, true, true, false)),
      "a byte-identical copy is an exact dup AND a content-cluster member")
    assert(got(3L) === (("bmp", true, false, true, false)),
      "a one-pixel edit is a content dup without being an exact dup")
    assert(got(4L) === (("wav", true, false, false, true)))
    assert(got(5L) === (("raw", false, false, false, false)),
      "a raw payload is ineligible but not any kind of dup")
    assert(got(6L)._1 === null)
    assert(got(6L) === ((null, false, false, false, false)))
    assert(got(7L) === (("mp4", true, false, false, true)))
    assert(got(8L) === (("mp4", true, false, true, false)),
      "a metadata-edited re-upload is a CONTENT dup (exact fp differs)")
    assert(got(9L) === (("wav", false, false, false, false)),
      "a sniffable but too-short clip is ineligible")
    assert(got(10L) === (("png", true, false, false, true)),
      "the PNG keeper is a clean keep")
    assert(got(11L) === (("png", true, false, true, false)),
      "tEXt churn + new dims over the same coded stream is a content dup")
    assert(got(12L) === (("jpeg", true, false, false, true)),
      "identical span bytes in a DIFFERENT format never pair " +
        "(per-format discipline inside the composed verdict)")
    assert(got(13L) === (("gif", false, false, false, false)),
      "GIF is sniffed by kind but never content-eligible")
    assert(got(14L) === (("gif", false, true, true, false)),
      "a byte-identical GIF is an exact dup — the gate that covers the " +
        "kind whose content identity is deliberately absent")
  }

  test("best-copy policy in the composed verdict: the intact copy beats its truncated re-upload") {
    // constant content bytes: every probe reads the same value whatever
    // the span length, so intact and truncated hash EQUAL and pair —
    // but their quality metrics differ (the CimageHashSpec plant,
    // composed). Ids are arranged so the two policies DISAGREE: the
    // truncated copy holds the smaller id in both clusters.
    val cutJpg = jpg(32, 32, Array.fill[Byte](256)(100), eoi = false)
    val intactJpg = jpg(32, 32, Array.fill[Byte](320)(100))
    val cutWav = wav(8000, Array.fill[Byte](250)(55))
    val intactWav = wav(8000, Array.fill[Byte](400)(55))
    val rows = Seq[(Long, Array[Byte])](
      1L -> cutJpg,    // min-policy survivor (component min)…
      2L -> intactJpg, // …but the BEST copy (n_units 320 > 256)
      3L -> intactJpg, // byte-identical copy of 2: exact dup under both
      4L -> cutWav,    // min-policy survivor of the wav cluster…
      5L -> intactWav) // …but the longer clip wins under best
    def verdictMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Boolean]("is_content_dup"), r.getAs[Boolean]("keep"))))
        .toMap
    val minP = verdictMap(MediaKeep.mediaKeepOfPayloads(
      rows.toDF("media_id", "payload")))
    val bestP = verdictMap(MediaKeep.mediaKeepBestOfPayloads(
      rows.toDF("media_id", "payload")))
    assert(minP(1L) === ((false, true)) && minP(2L) === ((true, false)),
      "min policy crowns the truncated smaller id")
    assert(bestP(1L) === ((true, false)) && bestP(2L) === ((false, true)),
      "best policy crowns the intact copy despite its larger id")
    assert(bestP(3L)._2 === false,
      "an exact copy of the best member still never survives")
    assert(minP(4L) === ((false, true)) && minP(5L) === ((true, false)))
    assert(bestP(4L) === ((true, false)) && bestP(5L) === ((false, true)),
      "the longer clip wins the wav cluster under the duration metric")
  }

  test("incremental shard verdict equals batch restricted to the shard") {
    // the incremental contract verbatim — including the corners a real
    // nightly ingest hits: a shard id SMALLER than the corpus keeper of
    // its fingerprint group (id 5 below: the merged keeper moves to the
    // shard side, yet no decode is needed because the bytes are the
    // corpus keeper's), a shard near-dup bridging INTO a corpus cluster
    // (41 pairs 10's content), a brand-new fingerprint paying the only
    // decode, and a raw shard payload
    val w = 16; val h = 16; val rb = rowBytes(w)
    val pixA = fill(rb * h, 3L)
    val pixEdit = pixA.clone(); pixEdit(rb * 4 + 9) = 55
    val corpus = Seq[(Long, Array[Byte])](
      10L -> bmp(w, h, pixA), // corpus keeper + content-cluster rep
      20L -> bmp(w, h, pixA), // corpus exact copy
      30L -> bmp(w, h, pixEdit), // corpus content dup of 10
      32L -> wav(8000, fill(400, 7L)), // unrelated corpus clip
      34L -> jpg(32, 32, Array.fill[Byte](256)(100), eoi = false))
      // 34: truncated JPEG keeper — the shard's intact re-upload must
      // dethrone it under the best policy (and only there)
    val shard = Seq[(Long, Array[Byte])](
      5L -> bmp(w, h, pixA), // fp matches corpus; shard id < keeper 10
      41L -> bmp(w, h, pixEdit), // bridges into 10's corpus cluster
      43L -> wav(8000, fill(380, 21L)), // new fingerprint → clean keep
      45L -> "no container here".getBytes("UTF-8"), // raw
      47L -> jpg(32, 32, Array.fill[Byte](320)(100))) // intact twin of 34
    import org.apache.spark.sql.functions.col
    def sixCols(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[String]("kind"), r.getAs[Boolean]("eligible"),
          r.getAs[Boolean]("is_exact_dup"), r.getAs[Boolean]("is_content_dup"),
          r.getAs[Boolean]("keep")))).toMap
    val st =
      MediaKeep.corpusStateOfPayloads(corpus.toDF("media_id", "payload"))
    val got = sixCols(MediaKeep.incrementalOfPayloads(
      shard.toDF("media_id", "payload"), st))
    val shardIds = shard.map(_._1).toSet
    val merged = (corpus ++ shard).toDF("media_id", "payload")
    val batch = sixCols(MediaKeep.mediaKeepOfPayloads(merged)
      .filter(col("media_id").isin(shardIds.toSeq: _*)))
    assert(got === batch,
      "the shard verdict must equal the batch verdict restricted to shard ids")
    // the BEST-policy face inherits the identical contract (r16): shard
    // output ≡ batch best verdict restricted to shard ids, via the
    // persisted per-cluster rollup — no corpus payload re-decoded
    val gotBest = sixCols(MediaKeep.incrementalBestOfPayloads(
      shard.toDF("media_id", "payload"), st))
    val batchBest = sixCols(MediaKeep.mediaKeepBestOfPayloads(merged)
      .filter(col("media_id").isin(shardIds.toSeq: _*)))
    assert(gotBest === batchBest,
      "the best-policy shard verdict must equal batch-best restricted")
    assert(got(47L)._5 === false && gotBest(47L)._5 === true,
      "the intact shard re-upload loses to the truncated min-id corpus " +
        "keeper under min policy but dethrones it under best")
    // and the corners landed where designed, not vacuously
    assert(got(5L) === (("bmp", true, false, false, true)),
      "id 5 becomes BOTH the merged exact keeper (5 < 10) and the " +
        "content-cluster minimum, so the shard copy supersedes the " +
        "corpus original — retroactively dropping corpus row 10 is the " +
        "batch sweep's job, like every incremental face")
    assert(got(41L)._4 === true, "the shard bridge is a content dup")
    assert(got(43L) === (("wav", true, false, false, true)))
    assert(got(45L) === (("raw", false, false, false, false)))
    // the state survives a parquet round-trip: the shard verdict
    // against the RELOADED seven tables is identical under both
    // policies (the incremental_media_keep_persisted lifecycle)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-media-state").toString
    MediaKeep.writeCorpusState(st, dir)
    val reloaded = MediaKeep.readCorpusState(spark, dir)
    assert(sixCols(MediaKeep.incrementalOfPayloads(
        shard.toDF("media_id", "payload"), reloaded)) === got,
      "the reloaded state must reproduce the in-session shard verdict")
    assert(sixCols(MediaKeep.incrementalBestOfPayloads(
        shard.toDF("media_id", "payload"), reloaded)) === gotBest,
      "the reloaded state must reproduce the best-policy verdict too")
  }

  test("the three verdict faces share one session-scoped checkpoint") {
    // the lake synthesis + keeper pass + four hash chains + star
    // contraction are the media surface's most expensive relation —
    // keep, stats, and card must build it ONCE per (session, corpus)
    val docs = (0L until 120L).map(i => (i, s"payload text $i body " * 8))
      .toDF("doc_id", "text")
    val before = MediaKeep.verdictBuilds.get()
    val keepRows = MediaKeep.mediaKeep(docs).count()
    val statsRows = MediaKeep.mediaKeepStats(docs).count()
    val cardRows = MediaKeep.mediaCard(docs).count()
    assert(keepRows === 120L && statsRows >= 1L && cardRows === 1L)
    assert(MediaKeep.verdictBuilds.get() === before + 1,
      "stats and card must reuse the keep face's checkpointed verdict")
    // a DIFFERENT corpus replaces the entry (one build, not zero)
    val docs2 = (0L until 60L).map(i => (i, s"other corpus $i " * 9))
      .toDF("doc_id", "text")
    MediaKeep.mediaKeep(docs2).count()
    assert(MediaKeep.verdictBuilds.get() === before + 2,
      "a new corpus must rebuild (the cache is not a stale-answer hole)")
    // the corpus STATE gets the same discipline: two shard ingests
    // against one corpus derive the persisted-infrastructure side once
    val sBefore = MediaKeep.stateBuilds.get()
    val st = MediaKeep.mediaCorpusState(docs)
    val st2 = MediaKeep.mediaCorpusState(docs)
    assert(st eq st2, "the second ingest must reuse the state")
    assert(MediaKeep.stateBuilds.get() === sBefore + 1)
  }

  test("the incremental faces share one session-scoped shard verdict") {
    // verdict + best + stats + card over one shard must run the shard
    // decode/pairing/contraction ONCE (the r16 incremental cache — the
    // verdictCache discipline applied to the nightly-ingest face)
    val all = (0L until 100L).map(i => (i, s"ingest text $i body " * 8))
    val corpus = all.filterNot(_._1 % 10 == 9).toDF("doc_id", "text")
    val shard = all.filter(_._1 % 10 == 9).toDF("doc_id", "text")
    val st = MediaKeep.mediaCorpusState(corpus)
    val before = MediaKeep.incrBuilds.get()
    val n1 = MediaKeep.incrementalMediaKeep(shard, st).count()
    val n2 = MediaKeep.incrementalMediaKeepBest(shard, st).count()
    val nS = MediaKeep.incrementalMediaKeepStats(shard, st).count()
    val nC = MediaKeep.incrementalMediaCard(shard, st).count()
    assert(n1 === 10L && n2 === 10L && nS >= 1L && nC === 1L)
    assert(MediaKeep.incrBuilds.get() === before + 1,
      "best/stats/card must reuse the keep face's cached shard verdict")
    // a different shard replaces the entry (one build, not zero)
    val shard2 = all.filter(_._1 % 10 == 4).toDF("doc_id", "text")
    MediaKeep.incrementalMediaKeep(shard2, st).count()
    assert(MediaKeep.incrBuilds.get() === before + 2)
  }

  test("persisted media sketch bands bucketed by (band, nibble): the shard probe is co-located") {
    // r16 directive #3 — the corpus-state docstring claim ("the
    // relation a production pipeline persists verbatim") proven the
    // DedupSpec/GraphSkewSpec way: write the persisted keeper sketch's
    // band relation bucketed on the pairing-probe join key, probe it
    // with a shard's banded rows, walk the plan — the bucketed corpus
    // subtree must hold ZERO shuffles; the (small) shard side carries
    // the join's exchange. AQE off so the tree is walkable, broadcast
    // off so the corpus-sized join shape is the one planned.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.functions.{bit_count, col}
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s2.implicits._
    val w = 16; val h = 16; val rb = rowBytes(w)
    val pixA = fill(rb * h, 3L)
    val nearCopy = pixA.clone(); nearCopy(rb * 4 + 9) = 55
    val corpusSk = graft.multimodal.ImageHash.ahashOfPayloads(
        Seq(1L -> bmp(w, h, pixA), 2L -> bmp(w, h, fill(rb * h, 5L)))
          .toDF("media_id", "payload"))
      .select("media_id", "ahash")
    try {
      graft.multimodal.Hamming64.bands(corpusSk).write
        .bucketBy(8, "band", "nibble").sortBy("band", "nibble")
        .mode("overwrite").saveAsTable("media_bands_bkt")
      val shardB = graft.multimodal.Hamming64.bands(
        graft.multimodal.ImageHash.ahashOfPayloads(
            Seq(100L -> bmp(w, h, nearCopy)).toDF("media_id", "payload"))
          .select("media_id", "ahash").localCheckpoint())
      val probe = shardB.join(
          s2.table("media_bands_bkt").select(
            col("media_id").as("corpus_id"), col("ahash").as("cahash"),
            col("band"), col("nibble")),
          Seq("band", "nibble"))
        .filter(bit_count(col("ahash").bitwiseXOR(col("cahash")))
          .cast("long") <= 3L)
      val plan = probe.queryExecution.executedPlan
      val smj = plan.collectFirst { case j: SortMergeJoinExec => j }
      assert(smj.isDefined, s"expected a sort-merge join:\n$plan")
      def shuffles(p: SparkPlan): Int =
        p.collect { case _: ShuffleExchangeExec => 1 }.sum
      def isCorpusSide(p: SparkPlan): Boolean = p.collectLeaves().exists {
        case f: FileSourceScanExec => f.relation.bucketSpec.isDefined
        case _ => false
      }
      val (corpusSide, shardSide) =
        if (isCorpusSide(smj.get.left)) (smj.get.left, smj.get.right)
        else (smj.get.right, smj.get.left)
      assert(isCorpusSide(corpusSide),
        s"no bucketed scan under either side:\n$plan")
      assert(shuffles(corpusSide) === 0,
        s"bucketed corpus side still shuffles:\n$corpusSide")
      assert(shuffles(shardSide) >= 1,
        s"shard side should carry the join's exchange:\n$shardSide")
      // the co-located probe really matches: the near-copy shard image
      // band-collides with (and rescores against) its corpus original
      assert(probe.collect().map(_.getAs[Long]("corpus_id")).contains(1L))
    } finally {
      s2.sql("DROP TABLE IF EXISTS media_bands_bkt")
    }
  }
}
