package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Build-once evidence for the r16 optimization round's session caches
  * (the `token_rarity` / media-verdict discipline extended to the
  * other build-once artifacts): each family's expensive artifact —
  * curation keep verdicts, the kept corpus, BPE merge rounds, the
  * unigram induction, k-means centroids, PQ codebooks + codes, the
  * per-family media sketches, the shared cluster contraction — builds
  * ONCE per (session, corpus plan, params) and every face reuses it.
  * Counters are asserted as DELTAS (the shared test session may have
  * warmed a cache already), and reuse is additionally pinned by result
  * equality across the reusing faces where the faces differ. */
class SessionCacheReuseSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String): Long = {
    SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    0L
  }

  test("curation keep verdicts and the kept corpus build once per corpus") {
    run("corpus_keep") // seed
    val k0 = graft.text.Curation.keepBuilds.get()
    val f0 = graft.text.Curation.fullKeepBuilds.get()
    val t0 = graft.text.Curation.keptBuilds.get()
    run("corpus_keep") // same corpus plan: no rebuild
    assert(graft.text.Curation.keepBuilds.get() === k0,
      "second corpus_keep rebuilt the three-gate verdict")
    run("corpus_keep_full"); run("corpus_keep_stats")
    // stats rolls up the SAME cached seven-gate relation — at most the
    // one build corpus_keep_full itself triggered
    assert(graft.text.Curation.fullKeepBuilds.get() <= f0 + 1,
      "corpus_keep_stats rebuilt the seven-gate verdict")
    run("pipeline_manifest"); run("pipeline_manifest_chunked")
    assert(graft.text.Curation.keptBuilds.get() <= t0 + 1,
      "the two manifests built the kept corpus twice")
  }

  test("BPE merge rounds learn once per word relation and nMerges") {
    run("bpe_merges") // seed the full-corpus learn
    val b0 = graft.text.TextAnalysis.bpeBuilds.get()
    run("bpe_encode"); run("bpe_tokenize")
    assert(graft.text.TextAnalysis.bpeBuilds.get() === b0,
      "encode/tokenize re-learned the merges the merge face already built")
  }

  test("unigram induction runs once per word relation") {
    run("unigram_vocab") // seed
    val u0 = graft.text.Unigram.induceBuilds.get()
    run("unigram_encode"); run("unigram_tokenize"); run("unigram_fertility")
    assert(graft.text.Unigram.induceBuilds.get() === u0,
      "a unigram face re-ran the induction the vocab face already built")
  }

  test("ANN quantizers train once per corpus; PQ artifacts encode once") {
    run("ivf_occupancy") // seed the full-corpus centroids
    val c0 = graft.ml.Similarity.centBuilds.get()
    run("embed_ivf_knn")
    assert(graft.ml.Similarity.centBuilds.get() === c0,
      "embed_ivf_knn re-trained the quantizer ivf_occupancy already built")
    run("pq_codes") // seed codebooks + coded corpus
    val p0 = graft.ml.Similarity.pqBuilds.get()
    run("pq_occupancy"); run("embed_pq_knn"); run("pq_recall")
    assert(graft.ml.Similarity.pqBuilds.get() === p0,
      "a PQ face re-trained the codebooks pq_codes already built")
    // the incremental corpus is a DIFFERENT plan: its own single build
    run("incremental_pq")
    val p1 = graft.ml.Similarity.pqBuilds.get()
    run("incremental_pq")
    assert(graft.ml.Similarity.pqBuilds.get() === p1,
      "the second incremental_pq re-trained the shard codebooks")
  }

  test("media sketches decode once; both survivor faces share one contraction") {
    run("audio_ahash") // seed the decoded sketch
    val s0 = graft.multimodal.AudioHash.sketchBuilds.get()
    run("audio_dup_pairs"); run("audio_dup_clusters")
    assert(graft.multimodal.AudioHash.sketchBuilds.get() === s0,
      "an audio face re-decoded the sketch audio_ahash already built")
    run("audio_dup_clusters") // seed the contraction
    val h0 = graft.multimodal.Hamming64.clusterBuilds.get()
    run("audio_dup_clusters_best")
    assert(graft.multimodal.Hamming64.clusterBuilds.get() === h0,
      "the best face re-ran the star contraction the keep-first face built")
    // shared contraction = identical components: the two faces may only
    // disagree on which member is crowned, never on cluster_id
    val keepFirst = graft.multimodal.AudioHash
      .audioDupClusters(Tables.documents(spark, dir))
      .select("media_id", "cluster_id")
    val best = graft.multimodal.AudioHash
      .audioDupClustersBest(Tables.documents(spark, dir))
      .select("media_id", "cluster_id")
    assert(keepFirst.exceptAll(best).isEmpty && best.exceptAll(keepFirst).isEmpty,
      "keep-first and best-copy faces disagree on cluster membership")
  }
}
