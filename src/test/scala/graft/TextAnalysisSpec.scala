package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  def docs(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "text", "lang")

  test("textStats counts tokens, distinct tokens, stopword hits") {
    val row = TextAnalysis.textStats(
      docs((1L, "the cat and the hat", "en"))).first()
    assert(row.getAs[Long]("n_tokens") === 5L)
    assert(row.getAs[Long]("n_distinct_tokens") === 4L)
    assert(row.getAs[Double]("stopword_ratio") === 0.6) // the, and, the
    assert(row.getAs[Double]("avg_token_len") === 15.0 / 5)
  }

  test("langId picks max-hit profile with alphabetical tie-break") {
    val out = TextAnalysis.langId(docs(
      (1L, "the cat and of to", "en"),
      (2L, "le chat et la de", "fr"),
      (3L, "blorp zzz qqq", "de"),
      (4L, "de de y el", "es"))) // fr 'de' x2+... es: el+y+de? overlap
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    assert(out(1L) === "en")
    assert(out(2L) === "fr")
    assert(out(3L) === "und")
    // doc 4: es hits = el,y = 2; fr hits = de,de = 2 → tie → 'es' (alphabetical)
    assert(out(4L) === "es")
  }

  test("tokenProfile splits alpha / numeric / symbol runs") {
    val row = TextAnalysis.tokenProfile(
      docs((1L, "abc 123 x-y 7", "en"))).first()
    assert(row.getAs[Long]("n_alpha_tokens") === 3L) // abc, x, y
    assert(row.getAs[Long]("n_num_tokens") === 2L)   // 123, 7
    assert(row.getAs[Long]("n_sym_tokens") === 1L)   // -
    assert(row.getAs[Long]("n_bpe_tokens") === 6L)
  }

  test("fingerprints: md5 ignores extra whitespace, rolling hash is order-sensitive") {
    val out = TextAnalysis.fingerprints(docs(
      (1L, "alpha beta gamma", "en"),
      (2L, "alpha   beta\tgamma", "en"),
      (3L, "gamma beta alpha", "en")))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("fp_md5"), r.getAs[Long]("fp_rolling"))).toMap
    assert(out(1L)._1 === out(2L)._1) // normalized md5 equal
    assert(out(1L)._2 === out(2L)._2)
    assert(out(1L)._1 !== out(3L)._1)
    assert(out(1L)._2 !== out(3L)._2) // order-sensitive
  }

  test("langIdNgram: characteristic grams pick the language; zero hits = und") {
    val out = TextAnalysis.langIdNgram(docs(
      (1L, "the thing is singing there and everywhere", "en"),
      (2L, "die entscheidung der verschiedenen schönen scheine", "de"),
      (3L, "xyz 123", "xx")))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("lang_pred_ngram"), r.getAs[Long]("ngram_hits"))).toMap
    assert(out(1L)._1 === "en")
    assert(out(2L)._1 === "de")
    assert(out(3L) === (("und", 0L)))
    // overlapping-count sanity: "the thing..." has th×3 ("the","thing","there")
    assert(out(1L)._2 >= 3L)
  }

  test("corpusStats rolls up per (lang, source) with exact dup counts") {
    val d = Seq(
      (1L, "alpha beta gamma", "en", "web"),
      (2L, "alpha  beta\tgamma", "en", "web"), // whitespace dup of 1
      (3L, "one two", "en", "web"),
      (4L, "uno dos tres", "es", "book"))
      .toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.corpusStats(d).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Long]("n_distinct_docs"), r.getAs[Long]("n_dup_docs"))).toMap
    assert(out(("en", "web")) === (3L, 8L, 2L, 1L))
    assert(out(("es", "book")) === (1L, 3L, 1L, 0L))
  }

  test("vocabTopK ranks by occurrence count with doc frequency, ties cut by token") {
    val out = TextAnalysis.vocabTopK(docs(
      (1L, "apple apple banana cherry", "en"),
      (2L, "apple banana banana date", "en"),
      (3L, "apple elder", "en")), k = 3)
      .collect().map(r => (r.getAs[String]("token"),
        r.getAs[Long]("n_occurrences"), r.getAs[Long]("n_docs")))
    // apple: 4 occ / 3 docs; banana: 3 occ / 2 docs; then the 1-occ tie
    // {cherry, date, elder} cuts alphabetically → cherry
    assert(out.toSeq === Seq(("apple", 4L, 3L), ("banana", 3L, 2L),
      ("cherry", 1L, 1L)))
  }

  test("qualityRules: each Gopher rule fires on its planted violation") {
    import org.apache.spark.sql.Row
    // a healthy doc: 60 plain words incl. stopwords, no symbols/bullets
    val healthy = ("the quick brown fox and the lazy dog ran to town " * 6).trim
    val out = TextAnalysis.qualityRules(docs(
      (1L, healthy, "en"),
      (2L, "too short of a doc", "en"),                      // word count
      (3L, healthy + " " + Seq.fill(12)("#").mkString(" "), "en"), // symbols
      (4L, (1 to 60).map(i => s"line$i...").mkString("\n"), "en"), // ellipsis lines
      (5L, (1 to 60).map(i => s"- item$i").mkString("\n"), "en"),  // bullets
      (6L, healthy.replaceAll("[a-z]", "7"), "en"),          // no alpha words
      (7L, ("zz " * 60).trim, "en"),                         // no stopwords
      (8L, null, "en")))                                     // empty
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    def keep(id: Long) = out(id).getAs[Boolean]("gopher_keep")
    assert(keep(1L), s"healthy doc must pass: ${out(1L)}")
    assert(!out(2L).getAs[Boolean]("r_word_count") && !keep(2L))
    assert(!out(3L).getAs[Boolean]("r_symbol") && !keep(3L))
    assert(!out(4L).getAs[Boolean]("r_ellipsis") && !keep(4L))
    assert(!out(5L).getAs[Boolean]("r_bullet") && !keep(5L))
    assert(!out(6L).getAs[Boolean]("r_alpha") && !keep(6L))
    assert(!out(7L).getAs[Boolean]("r_stopwords") && !keep(7L))
    // empty doc: word-count rule carries the kill; line rules vacuous-true
    assert(!out(8L).getAs[Boolean]("r_word_count"))
    assert(out(8L).getAs[Boolean]("r_bullet") && out(8L).getAs[Boolean]("r_ellipsis"))
    assert(!keep(8L))
  }

  test("vocabCoverage reports per-doc OOV occurrences and types against the induced vocab") {
    // minCount=3 vocab over this corpus = {apple (4 occ), banana (3)};
    // everything else is OOV
    val out = TextAnalysis.vocabCoverage(docs(
      (1L, "apple apple banana cherry", "en"),  // 4 occ, 1 oov; 3 types, 1 oov
      (2L, "apple banana banana date", "en"),   // 4 occ, 1 oov; 3 types, 1 oov
      (3L, "apple elder elder", "en"),          // 3 occ, 2 oov; 2 types, 1 oov
      (4L, null, "en")), minCount = 3L)         // empty: zeros, NULL frac
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_tokens") === 4L)
    assert(out(1L).getAs[Long]("n_oov") === 1L)
    assert(out(1L).getAs[Long]("n_types") === 3L)
    assert(out(1L).getAs[Long]("n_oov_types") === 1L)
    assert(out(1L).getAs[Double]("oov_frac") === 0.25)
    assert(out(3L).getAs[Long]("n_oov") === 2L)
    assert(out(3L).getAs[Long]("n_oov_types") === 1L)
    assert(out(3L).getAs[Double]("oov_frac") === 2.0 / 3.0)
    assert(out(4L).getAs[Long]("n_tokens") === 0L)
    assert(out(4L).isNullAt(out(4L).fieldIndex("oov_frac")))
  }

  test("vocabCoverageExt: per-doc OOV exposes the minority slice the corpus scalar hides") {
    // external vocab = the English tokenizer's training corpus; the
    // judged corpus is mostly English plus ONE fully-uncovered
    // minority-language doc. Corpus-level OOV ≈ 11% reads as healthy;
    // the per-doc rows locate the 100%-OOV slice a scalar would mask.
    val trainers = docs(
      (100L, "the cat sat on the mat with the hat", "en"),
      (101L, "the cat and the mat and the hat", "en"))
    val vocab = TextAnalysis.vocabByMinCount(trainers, minCount = 2L)
    // vocab = {the, cat, mat, hat, and} (each >= 2 occurrences)
    val out = TextAnalysis.vocabCoverageExt(docs(
      (1L, "the cat and the hat", "en"),      // fully covered
      (2L, "the mat the cat the hat", "en"),  // fully covered
      (3L, "koira juoksi nopeasti metsässä", "en"), // minority slice: 100% OOV
      (4L, null, "en")), vocab)               // empty: zeros, NULL frac
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_oov") === 0L)
    assert(out(1L).getAs[Double]("oov_frac") === 0.0)
    assert(out(2L).getAs[Long]("n_oov") === 0L)
    assert(out(3L).getAs[Long]("n_tokens") === 4L)
    assert(out(3L).getAs[Long]("n_oov") === 4L)
    assert(out(3L).getAs[Long]("n_oov_types") === 4L)
    assert(out(3L).getAs[Double]("oov_frac") === 1.0)
    assert(out(4L).getAs[Long]("n_tokens") === 0L)
    assert(out(4L).isNullAt(out(4L).fieldIndex("oov_frac")))
    // the scalar the per-doc rows refute: 4 OOV of 15 total ≈ 27%... at
    // realistic corpus sizes this dilutes arbitrarily while doc 3 stays 100%
    val totalOov = out.values.map(_.getAs[Long]("n_oov")).sum
    val totalTok = out.values.map(_.getAs[Long]("n_tokens")).sum
    assert(totalOov.toDouble / totalTok < 0.3)
  }

  test("docRepetition flags pasted-loop text, passes varied text") {
    // doc 1: "spam ham eggs" pasted 50× — 150 tokens, 148 3-grams but
    // only 3 distinct (the cycle's rotations); top gram covers 50/148
    val loop = Seq.fill(50)("spam ham eggs").mkString(" ")
    val out = TextAnalysis.docRepetition(docs(
      (1L, loop, "en"),
      (2L, "one two three four five six", "en")))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_ngrams") === 148L)
    assert(r1.getAs[Long]("n_distinct_ngrams") === 3L)
    assert(r1.getAs[Long]("top_ngram_count") === 50L)
    assert(r1.getAs[Double]("top_ngram_frac") === 50.0 / 148.0)
    assert(r1.getAs[Boolean]("repetitive"))
    val r2 = out(2L)
    assert(r2.getAs[Long]("n_ngrams") === 4L)
    assert(r2.getAs[Double]("dup_ngram_frac") === 0.0)
    assert(r2.getAs[Long]("top_ngram_count") === 1L)
    assert(!r2.getAs[Boolean]("repetitive"))
  }

  test("docRepetition: short and NULL-text docs report zeros, not errors") {
    val out = TextAnalysis.docRepetition(docs(
      (1L, "two tokens", "en"),
      (2L, null, "en")))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    for (id <- Seq(1L, 2L)) {
      assert(out(id).getAs[Long]("n_ngrams") === 0L)
      assert(out(id).getAs[Long]("n_distinct_ngrams") === 0L)
      assert(out(id).getAs[Double]("dup_ngram_frac") === 0.0)
      assert(out(id).getAs[Long]("top_ngram_count") === 0L)
      assert(!out(id).getAs[Boolean]("repetitive"))
    }
  }

  test("docRepetition: top-run fold survives a shingle hashing to any value") {
    // duplicate runs split across distinct grams: a b a b a b → 3-grams
    // (a,b,a) ×2, (b,a,b) ×2 — top 2 of 4, dup frac 1/2
    val r = TextAnalysis.docRepetition(docs((1L, "a b a b a b", "en"))).first()
    assert(r.getAs[Long]("n_ngrams") === 4L)
    assert(r.getAs[Long]("n_distinct_ngrams") === 2L)
    assert(r.getAs[Double]("dup_ngram_frac") === 0.5)
    assert(r.getAs[Long]("top_ngram_count") === 2L)
  }

  test("tokenRarity: corpus frequencies weight by occurrence; hapaxes and empty docs") {
    // corpus term frequencies: the=3, cat=2, ran=2, sat=1 (hapax)
    val out = TextAnalysis.tokenRarity(docs(
      (1L, "the cat sat", "en"),
      (2L, "the cat ran ran", "en"),
      (3L, "the", "en"),
      (4L, "", "en")))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_tokens") === 3L)
    assert(out(1L).getAs[Long]("min_tok_freq") === 1L) // sat
    assert(out(1L).getAs[Double]("avg_tok_freq") === (3.0 + 2.0 + 1.0) / 3)
    assert(out(1L).getAs[Double]("hapax_frac") === 1.0 / 3)
    assert(out(2L).getAs[Long]("n_tokens") === 4L)
    assert(out(2L).getAs[Long]("min_tok_freq") === 2L)
    assert(out(2L).getAs[Double]("avg_tok_freq") === (3.0 + 2.0 + 2.0 + 2.0) / 4)
    assert(out(2L).getAs[Double]("hapax_frac") === 0.0)
    assert(out(3L).getAs[Double]("avg_tok_freq") === 3.0)
    // empty doc: zero count, NULL rarity stats (not fabricated zeros)
    assert(out(4L).getAs[Long]("n_tokens") === 0L)
    assert(out(4L).isNullAt(out(4L).fieldIndex("min_tok_freq")))
    assert(out(4L).isNullAt(out(4L).fieldIndex("avg_tok_freq")))
    assert(out(4L).isNullAt(out(4L).fieldIndex("hapax_frac")))
  }

  test("classifierScore: margin = exact sum of hashed-bucket weights; empty/NULL zero") {
    // independent model of tokHash (ASCII tokens, <8 chars padded with
    // '.') — same formulation HashExprProps pins against the native expr
    val pow31s = (0 until 9).scanLeft(1L)((a, _) => a * 31L).toArray
    def tokHash(s: String): Long = {
      val first8 = (s + "." * 8).take(8)
      s.length.toLong * pow31s(8) +
        first8.zipWithIndex.map { case (c, i) => c.toLong * pow31s(i) }.sum
    }
    def margin(text: String): Long =
      text.toLowerCase.split("\\s+").filter(_.nonEmpty).map(t =>
        TextAnalysis.ClassifierWeights(
          (tokHash(t) % TextAnalysis.ClassifierFeatures).toInt)).sum
    val out = TextAnalysis.classifierScore(docs(
      (1L, "The cat AND the hat", "en"),
      (2L, "", "en"),
      (3L, null, "en")))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val m1 = margin("The cat AND the hat")
    assert(out(1L).getAs[Long]("n_tokens") === 5L)
    assert(out(1L).getAs[Long]("margin") === m1)
    assert(out(1L).getAs[Boolean]("pred_keep") === (m1 > 0L))
    for (id <- Seq(2L, 3L)) {
      assert(out(id).getAs[Long]("n_tokens") === 0L)
      assert(out(id).getAs[Long]("margin") === 0L)
      assert(!out(id).getAs[Boolean]("pred_keep"))
    }
  }

  test("classifierScore: weight table is fixed, bounded, and wide enough to discriminate") {
    val w = TextAnalysis.ClassifierWeights
    assert(w.size === TextAnalysis.ClassifierFeatures)
    assert(w.forall(x => x >= -8L && x <= 8L))
    assert(w.distinct.size > 5) // not a degenerate constant table
  }

  // 8 tokens exactly — one full boilerplate block when aligned
  private val footer = "subscribe to our newsletter terms of service apply"

  test("boilerplateBlocks flags a shared aligned footer, not unique text") {
    val out = TextAnalysis.boilerplateBlocks(docs(
      // docs 1-3: shared 8-token header block + 8 unique tokens
      (1L, footer + " u1 u2 u3 u4 u5 u6 u7 u8", "en"),
      (2L, footer + " v1 v2 v3 v4 v5 v6 v7 v8", "en"),
      (3L, footer + " w1 w2 w3 w4 w5 w6 w7 w8", "en"),
      // doc 4: all unique — zero shared blocks
      (4L, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12 q13 q14 q15 q16", "en")))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    for (id <- Seq(1L, 2L, 3L)) {
      assert(out(id).getAs[Long]("n_blocks") === 2L)
      assert(out(id).getAs[Long]("n_boiler_blocks") === 1L)
      assert(out(id).getAs[Double]("boiler_frac") === 0.5)
      assert(out(id).getAs[Boolean]("boiler_heavy")) // 0.5 > 0.3
    }
    assert(out(4L).getAs[Long]("n_blocks") === 2L)
    assert(out(4L).getAs[Long]("n_boiler_blocks") === 0L)
    assert(!out(4L).getAs[Boolean]("boiler_heavy"))
  }

  test("boilerplateBlocks: tiling is offset-sensitive by design") {
    // doc 2 carries the same footer shifted one token right — its tiling
    // cuts the footer across two blocks, so nothing matches doc 1/3's
    // aligned block (the documented trade vs paying k× with overlaps)
    val out = TextAnalysis.boilerplateBlocks(docs(
      (1L, footer + " u1 u2 u3 u4 u5 u6 u7 u8", "en"),
      (2L, "pad " + footer + " v1 v2 v3 v4 v5 v6 v7", "en"),
      (3L, footer + " w1 w2 w3 w4 w5 w6 w7 w8", "en")))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_boiler_blocks") === 1L) // still pairs with doc 3
    assert(out(2L).getAs[Long]("n_boiler_blocks") === 0L)
  }

  test("boilerplateBlocks: doc frequency not occurrence count; short/NULL zeros") {
    val out = TextAnalysis.boilerplateBlocks(docs(
      // doc 1 repeats its own block twice — intra-doc repetition is
      // docRepetition's signal, NOT boilerplate (doc frequency = 1)
      (1L, footer + " " + footer, "en"),
      // doc 2 shares it once → now BOTH of doc 1's occurrences flag
      (2L, footer + " z1 z2 z3 z4 z5 z6 z7 z8", "en"),
      (3L, "seven tokens only here not eight yet", "en"),
      (4L, null, "en"),
      // doc 5: repeats its own (globally unique) block — occurrence count
      // 2 but doc frequency 1 → must NOT flag
      (5L, "p1 p2 p3 p4 p5 p6 p7 p8 p1 p2 p3 p4 p5 p6 p7 p8", "en")))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_blocks") === 2L)
    assert(out(1L).getAs[Long]("n_boiler_blocks") === 2L)
    assert(out(1L).getAs[Double]("boiler_frac") === 1.0)
    assert(out(5L).getAs[Long]("n_blocks") === 2L)
    assert(out(5L).getAs[Long]("n_boiler_blocks") === 0L)
    for (id <- Seq(3L, 4L)) {
      assert(out(id).getAs[Long]("n_blocks") === 0L)
      assert(out(id).getAs[Long]("n_boiler_blocks") === 0L)
      assert(out(id).getAs[Double]("boiler_frac") === 0.0)
      assert(!out(id).getAs[Boolean]("boiler_heavy"))
    }
  }

  test("boilerplateScrub removes only the shared tile, keeps tails and NULLs intact") {
    val out = TextAnalysis.boilerplateScrub(docs(
      // shared first tile + unique second tile + 2-token tail (tail is
      // never part of a tile → always kept)
      (1L, footer + " u1 u2 u3 u4 u5 u6 u7 u8 tail keep", "en"),
      (2L, footer + " v1 v2 v3 v4 v5 v6 v7 v8", "en"),
      (3L, "short unique doc", "en"),
      (4L, null, "en"),
      // docs 5/6: nothing BUT the shared tile — fully scrubbed docs must
      // come back as '' (not NULL; the oracle coalesces DuckDB's
      // array_to_string([]) = NULL to match)
      (5L, footer, "en"),
      (6L, footer, "en")))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_tokens") === 18L)
    assert(out(1L).getAs[Long]("n_removed_tokens") === 8L)
    assert(out(1L).getAs[String]("clean_text")
      === "u1 u2 u3 u4 u5 u6 u7 u8 tail keep")
    assert(out(2L).getAs[String]("clean_text") === "v1 v2 v3 v4 v5 v6 v7 v8")
    // untouched docs come back normalized but whole
    assert(out(3L).getAs[Long]("n_removed_tokens") === 0L)
    assert(out(3L).getAs[String]("clean_text") === "short unique doc")
    // NULL text stays NULL (the Pii policy), counts report zero
    assert(out(4L).getAs[Long]("n_tokens") === 0L)
    assert(out(4L).getAs[Long]("n_removed_tokens") === 0L)
    assert(out(4L).getAs[String]("clean_text") === null)
    assert(out(5L).getAs[Long]("n_removed_tokens") === 8L)
    assert(out(5L).getAs[String]("clean_text") === "")
  }

  test("boilerplateScrub: scrub counts agree with boilerplateBlocks' flags") {
    val fixture = docs(
      (1L, footer + " u1 u2 u3 u4 u5 u6 u7 u8", "en"),
      (2L, footer + " v1 v2 v3 v4 v5 v6 v7 v8", "en"),
      (3L, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12 q13 q14 q15 q16", "en"))
    val sig = TextAnalysis.boilerplateBlocks(fixture)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_boiler_blocks")).toMap
    val scrub = TextAnalysis.boilerplateScrub(fixture)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_removed_tokens")).toMap
    // every flagged block occurrence removes exactly its k tokens
    for ((id, nb) <- sig)
      assert(scrub(id) === nb * TextAnalysis.BoilerWindow)
  }

  test("bpeMerges golden: weighted top pair per round, greedy rewrite, early exhaustion") {
    // words: "aa"x3, "ab"x1, "b"x1 (hex: a=61, b=62)
    // r0: pair (61,61) weight 3 wins -> "aa" becomes one symbol 6161
    // r1: only (61,62) weight 1 remains
    // r2: no adjacent pairs left anywhere -> round absent (BPE exhausts)
    val out = TextAnalysis.bpeMerges(docs(
      (1L, "aa aa ab", "en"), (2L, "aa b", "en")), nMerges = 3)
      .collect().map(r => r.getAs[Long]("round") ->
        ((r.getAs[String]("lhs"), r.getAs[String]("rhs"),
          r.getAs[String]("merged"), r.getAs[Long]("pair_count")))).toMap
    assert(out === Map(
      0L -> (("61", "61", "6161", 3L)),
      1L -> (("61", "62", "6162", 1L))))
  }

  test("bpeEncode golden: symbol counts shrink with merges, exhaustion leaves counts intact") {
    // same corpus as the merges golden: after r0 (61,61) and r1 (61,62),
    // "aa" is 1 symbol, "ab" is 1, "b" is 1
    val fixture = docs((1L, "aa aa ab", "en"), (2L, "aa b", "en"),
      (3L, "", "en"), (4L, null, "en"))
    val out = TextAnalysis.bpeEncode(fixture, nMerges = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_bpe_tokens")).toMap
    assert(out === Map(1L -> 3L, 2L -> 2L, 3L -> 0L, 4L -> 0L))
    // zero merges = raw byte counts: "aa aa ab" = 6 bytes, "aa b" = 3
    val raw = TextAnalysis.bpeEncode(fixture, nMerges = 0)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_bpe_tokens")).toMap
    assert(raw === Map(1L -> 6L, 2L -> 3L, 3L -> 0L, 4L -> 0L))
  }

  test("bpeEncode invariants on the fixture: counts fall monotonically with merges") {
    val fixture = graft.Tables.documents(SparkTestSession.spark, "/root/testdata/sf0.001")
    def counts(n: Int) = TextAnalysis.bpeEncode(fixture, nMerges = n)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bpe_tokens")).toMap
    val c0 = counts(0)
    val c4 = counts(4)
    val c8 = counts(8)
    assert(c0.keySet === c4.keySet && c4.keySet === c8.keySet)
    for (id <- c0.keys) {
      assert(c0(id) >= c4(id), s"doc $id grew under 4 merges")
      assert(c4(id) >= c8(id), s"doc $id grew under 8 merges")
    }
    // zero merges = UTF-8 byte count of the tokens (fixture is ASCII)
    import org.apache.spark.sql.functions._
    val bytes = fixture.select(col("doc_id"),
        coalesce(aggregate(TextAnalysis.tokens(col("text")),
          lit(0L), (acc, t) => acc + length(t)), lit(0L)).as("nb"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("nb")).toMap
    assert(c0 === bytes)
    // 8 merges genuinely compress something on real text
    assert(c8.values.sum < c0.values.sum)
  }

  test("bpeDocIdsFromToksUnderRounds: frozen merges equal the learn path; unseen words fall back to bytes") {
    import org.apache.spark.sql.functions.col
    val corpus = docs((1L, "aa aa ab", "en"), (2L, "aa b", "en"))
    val toks = corpus.select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("toks"))
    // the production reconstitute path: persisted merge table → rounds
    val rounds = TextAnalysis.bpeRoundsFromMergeTable(
      TextAnalysis.bpeMerges(corpus, nMerges = 3), nMerges = 3)
    def idsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Seq[Long]]("ids").toList).toMap
    // apply-after-learn == the learn path on the corpus the rounds came
    // from (the rewrite chains are the same chain)
    assert(idsOf(TextAnalysis.bpeDocIdsFromToksUnderRounds(toks, rounds)) ===
      idsOf(TextAnalysis.bpeDocIdsFromToks(toks, nMerges = 3)))
    // a batch with words the corpus never saw: "aab" = 61 61 62 — r0's
    // (61,61) merge applies inside it (→ id 256), r1's (61,62) no longer
    // matches; "cd" is fully unseen → raw byte ids, exactly a frozen BPE
    // tokenizer's treatment of novel text
    val batch = docs((10L, "aab cd", "en"), (11L, "", "en"))
    val out = idsOf(TextAnalysis.bpeDocIdsFromToksUnderRounds(
      batch.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks")),
      rounds))
    assert(out(10L) === List(256L, 0x62L, 0x63L, 0x64L))
    assert(out(11L) === Nil) // empty doc keeps its empty array
  }

  test("tokenRarity and vocabCoverage share one checkpointed pair relation per session") {
    import org.apache.spark.sql.functions.col
    // a docs relation no other test uses, so the first build is a miss
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") % 7 === 1)
    val b0 = TextAnalysis.pairBuilds.get()
    TextAnalysis.tokenRarity(d).count()
    TextAnalysis.vocabCoverage(d).count()
    assert(TextAnalysis.pairBuilds.get() - b0 === 1L,
      "second query rebuilt the pair relation instead of reusing it")
    // a different corpus replaces the entry (bounded cache, no stale hit)
    TextAnalysis.tokenRarity(d.filter(col("doc_id") > 100)).count()
    assert(TextAnalysis.pairBuilds.get() - b0 === 2L)
  }

  test("bpeCoverageExt golden: byte-fallback rate under a frozen out-of-domain tokenizer") {
    import org.apache.spark.sql.functions.col
    // tokenizer trained on the aa/ab corpus: r0 merges (61,61)→256,
    // r1 merges (61,62)→257
    val rounds = TextAnalysis.bpeRoundsFromMergeTable(
      TextAnalysis.bpeMerges(docs((1L, "aa aa ab", "en"), (2L, "aa b", "en")),
        nMerges = 3), nMerges = 3)
    // judged docs: "aa cc" → [256, 63, 63] (1 merged, 2 byte-fallback);
    // "zz zz" → all byte ids (fully out of domain); empty → NULL frac
    val out = TextAnalysis.bpeCoverageExt(docs(
        (10L, "aa cc", "en"), (11L, "zz zz", "en"), (12L, "", "en")), rounds)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_ids"), r.getAs[Long]("n_byte_ids"),
          r.getAs[Long]("n_merged_ids"), Option(r.get(4)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(out(10L) === ((3L, 2L, 1L, Some(2.0 / 3.0))))
    assert(out(11L) === ((4L, 4L, 0L, Some(1.0))))
    assert(out(12L) === ((0L, 0L, 0L, None)))
  }

  test("bpeMerges: ties break by symbol text; hex symbols are uppercase") {
    // (61,62) and (63,64) both weigh 2 -> lexicographic lhs wins round 0
    val tied = TextAnalysis.bpeMerges(docs(
      (1L, "ab cd", "en"), (2L, "ab cd", "en")), nMerges = 1).first()
    assert(tied.getAs[String]("lhs") === "61")
    assert(tied.getAs[String]("rhs") === "62")
    // 'z' = 0x7A: the alpha hex digit must be uppercase on both engines
    val z = TextAnalysis.bpeMerges(docs((1L, "zz", "en")), nMerges = 1).first()
    assert(z.getAs[String]("merged") === "7A7A")
  }

  test("bpeTokenize golden: byte ids at zero merges, 256+round ids after merges") {
    // zero merges: the sequence is the raw UTF-8 bytes of the tokens in
    // document order ("ab"=0x61,0x62; "ba"=0x62,0x61)
    val raw = TextAnalysis.bpeTokenize(docs((1L, "ab ba", "en")), nMerges = 0)
      .collect().map(r => (r.getAs[Long]("pos"), r.getAs[Long]("token_id"))).sorted
    assert(raw.toList === List((0L, 0x61L), (1L, 0x62L), (2L, 0x62L), (3L, 0x61L)))
    // merges golden corpus: r0 merges (61,61)→6161 (id 256), r1 merges
    // (61,62)→6162 (id 257); "aa aa ab" encodes to [256, 256, 257],
    // "aa b" to [256, 62]; empty/NULL docs emit no rows
    val out = TextAnalysis.bpeTokenize(docs(
      (1L, "aa aa ab", "en"), (2L, "aa b", "en"),
      (3L, "", "en"), (4L, null, "en")), nMerges = 3)
      .collect().groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(r =>
        (r.getAs[Long]("pos"), r.getAs[Long]("token_id"))).sorted.toList).toMap
    assert(out === Map(
      1L -> List((0L, 256L), (1L, 256L), (2L, 257L)),
      2L -> List((0L, 256L), (1L, 0x62L))))
  }

  test("cmsTokenCounts: total cell mass per row = total occurrences; merge = cell-wise sum") {
    import org.apache.spark.sql.functions.{col, sum => fsum}
    val a = docs((1L, "x x y z", "en"), (2L, "x y", "en"))
    val b = docs((3L, "y z z q", "en"))
    val whole = docs((1L, "x x y z", "en"), (2L, "x y", "en"),
      (3L, "y z z q", "en"))
    // every row of the sketch holds the full occurrence mass (10 tokens)
    val perRow = TextAnalysis.cmsTokenCounts(whole)
      .groupBy("row").agg(fsum("n").as("t")).collect()
      .map(r => r.getAs[Long]("row") -> r.getAs[Long]("t")).toMap
    assert(perRow === (0 until TextAnalysis.CmsDepth)
      .map(r => r.toLong -> 10L).toMap)
    // shard sketches merge by cell-wise sum into the whole-corpus sketch
    val merged = TextAnalysis.cmsTokenCounts(a)
      .union(TextAnalysis.cmsTokenCounts(b))
      .groupBy("row", "cell").agg(fsum("n").as("n"))
      .collect().map(r => (r.getAs[Long]("row"), r.getAs[Long]("cell")) ->
        r.getAs[Long]("n")).toMap
    val direct = TextAnalysis.cmsTokenCounts(whole)
      .collect().map(r => (r.getAs[Long]("row"), r.getAs[Long]("cell")) ->
        r.getAs[Long]("n")).toMap
    assert(merged === direct)
  }

  test("cmsHeavyHitters: never undercounts, exact in the collision-free regime") {
    // 12 distinct tokens « 512 cells — with no collisions every
    // estimate is exact; the >= property must hold regardless
    val rows = (0 until 12).map(i =>
      (i.toLong, Seq.fill(i + 1)(s"tok$i").mkString(" "), "en"))
    val out = TextAnalysis.cmsHeavyHitters(docs(rows: _*), minCount = 5L)
      .collect().map(r => r.getAs[String]("token") ->
        ((r.getAs[Long]("n_exact"), r.getAs[Long]("n_est")))).toMap
    assert(out.keySet === (4 until 12).map(i => s"tok$i").toSet)
    out.foreach { case (t, (exact, est)) =>
      assert(est >= exact, s"$t undercounted: $est < $exact")
    }
    assert(out("tok7") === ((8L, 8L)))
  }

  test("bpeFertility golden: byte fertility at zero merges, unit fertility on a merged word") {
    // zero merges: ids = UTF-8 bytes, so fertility = bytes per token in
    // millionths ("ab cd" → 4 ids / 2 tokens = 2.0); per-lang split and
    // NULL-text zero-fill both exercised
    val raw = TextAnalysis.bpeFertility(docs(
        (1L, "ab cd", "en"), (2L, "abc", "fr"), (3L, null, "fr")),
        nMerges = 0)
      .collect().map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_ids"), r.getAs[Long]("ids_per_token_millionths"))))
      .toMap
    assert(raw("en") === ((1L, 2L, 4L, 2000000L)))
    assert(raw("fr") === ((2L, 1L, 3L, 3000000L)))
    // a 2-byte word fully merged by round 0 → exactly one id per token
    val merged = TextAnalysis.bpeFertility(docs(
        (1L, "aa aa aa", "en")), nMerges = 3)
      .collect().map(r => r.getAs[String]("lang") ->
        r.getAs[Long]("ids_per_token_millionths")).toMap
    assert(merged("en") === 1000000L)
  }

  test("bpeFertility: per-lang id mass tiles bpeTokenize exactly") {
    val fixture = docs(
      (1L, "the cat sat on the mat", "en"), (2L, "le chat le chat", "fr"),
      (3L, "the the the", "en"), (4L, "", "und"))
    val fert = TextAnalysis.bpeFertility(fixture)
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_ids"))
      .toMap
    val byLang = TextAnalysis.bpeTokenize(fixture)
      .join(fixture.select($"doc_id", $"lang"), "doc_id")
      .groupBy("lang").count()
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("count"))
      .toMap
    assert(fert("en") === byLang("en"))
    assert(fert("fr") === byLang("fr"))
    assert(fert("und") === 0L)
  }

  test("bpeTokenize tiles bpeEncode: dense positions, per-doc counts agree") {
    // the sequences ARE the counts' expansion: for every doc,
    // bpe_tokenize's rows number exactly n_bpe_tokens and positions are
    // 0..n-1 with no gap (the written-artifact contract training_shards
    // slices against)
    val fixture = graft.Tables.documents(SparkTestSession.spark, "/root/testdata/sf0.001")
    val enc = TextAnalysis.bpeEncode(fixture)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bpe_tokens")).toMap
    val seqs = TextAnalysis.bpeTokenize(fixture)
      .collect().groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[Long]("pos")).sorted.toSeq).toMap
    for ((id, n) <- enc) {
      val ps = seqs.getOrElse(id, Seq.empty)
      assert(ps.size.toLong === n, s"doc $id: ${ps.size} rows vs n_bpe_tokens $n")
      assert(ps === (0L until n), s"doc $id: positions not dense")
    }
  }

  test("bpeDocIdsFromToks assembles exactly bpeTokenize's sequence per doc") {
    import org.apache.spark.sql.functions._
    val fixture = docs((1L, "aa aa ab", "en"), (2L, "aa b", "en"),
      (3L, "", "en"), (4L, null, "en"), (5L, "zz aa zz", "en"))
    val t = fixture.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    val arrays = TextAnalysis.bpeDocIdsFromToks(t, nMerges = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Seq[Long]]("ids").toList).toMap
    val exploded = TextAnalysis.bpeTokenizeFromToks(t, nMerges = 3)
      .collect().groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.sortBy(_.getAs[Long]("pos"))
        .map(_.getAs[Long]("token_id")).toList).toMap
    assert(arrays.keySet === Set(1L, 2L, 3L, 4L, 5L), "one row per input doc")
    for ((id, ids) <- arrays)
      assert(ids === exploded.getOrElse(id, Nil), s"doc $id arrays diverge")
  }

  test("corpusHistogram bands by the largest power of two <= token count") {
    val out = TextAnalysis.corpusHistogram(docs(
      (1L, "", "en"),                       // 0 tokens → band 0
      (2L, "one", "en"),                    // 1 → band 1
      (3L, "a b c", "en"),                  // 3 → band 2
      (4L, Seq.fill(9)("t").mkString(" "), "en"),     // 9 → band 8
      (5L, Seq.fill(5000)("t").mkString(" "), "en"),  // 5000 → capped 4096
      (6L, "un deux trois quatre", "fr")))  // 4 → band 4, other lang
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("band_lo")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens")))).toMap
    assert(out(("en", 0L)) === ((1L, 0L)))
    assert(out(("en", 1L)) === ((1L, 1L)))
    assert(out(("en", 2L)) === ((1L, 3L)))
    assert(out(("en", 8L)) === ((1L, 9L)))
    assert(out(("en", 4096L)) === ((1L, 5000L)))
    assert(out(("fr", 4L)) === ((1L, 4L)))
    assert(out.size === 6)
  }

  test("corpusHistogram conserves mass: band doc counts and token totals sum to the corpus") {
    val docsDf = graft.Tables.documents(SparkTestSession.spark, "/root/testdata/sf0.001")
    val hist = TextAnalysis.corpusHistogram(docsDf).collect()
    val nDocs = hist.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs === docsDf.count())
    val tokTotal = TextAnalysis.classifierScore(docsDf)
      .agg(org.apache.spark.sql.functions.sum("n_tokens")).collect()(0).getLong(0)
    assert(hist.map(_.getAs[Long]("total_tokens")).sum === tokTotal)
    // every row sits on a real band edge
    val bands = (0L +: TextAnalysis.HistogramBands).toSet
    assert(hist.forall(r => bands.contains(r.getAs[Long]("band_lo"))))
  }

  test("sourceQuality: per-source rollup agrees with per-doc classifier margins") {
    val fixture = Seq(
      (1L, "the cat and the hat", "en", "webA"),
      (2L, "alpha beta gamma delta", "en", "webA"),
      (3L, "one two three", "en", "webB"),
      (4L, null.asInstanceOf[String], "en", "webB"))
      .toDF("doc_id", "text", "lang", "source")
    val perDoc = TextAnalysis.classifierScore(fixture)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("margin")).toMap
    val out = TextAnalysis.sourceQuality(fixture)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val aMargins = Seq(perDoc(1L), perDoc(2L))
    val bMargins = Seq(perDoc(3L), perDoc(4L))
    assert(out("webA").getAs[Long]("n_docs") === 2L)
    assert(out("webA").getAs[Long]("n_keep") === aMargins.count(_ > 0L))
    assert(out("webA").getAs[Double]("mean_margin") === aMargins.sum.toDouble / 2)
    assert(out("webB").getAs[Long]("n_keep") === bMargins.count(_ > 0L))
    assert(out("webB").getAs[Double]("keep_frac")
      === bMargins.count(_ > 0L).toDouble / 2)
    assert(perDoc(4L) === 0L) // NULL text contributes margin 0, still counted
  }

  test("tfidfTerms golden: lift score, per-source rank, top-k cut") {
    val fixture = Seq(
      (1L, "zebra zebra common", "en", "srcA"),
      (2L, "zebra common", "en", "srcA"),
      (3L, "yak common", "en", "srcB"),
      (4L, "common common", "en", "srcB"))
      .toDF("doc_id", "text", "lang", "source")
    // corpus df: zebra 2 docs, yak 1, common 4
    val all = TextAnalysis.tfidfTerms(fixture, k = 10).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("token")) -> r).toMap
    val za = all(("srcA", "zebra"))
    assert(za.getAs[Long]("tf") === 3L)
    assert(za.getAs[Long]("df") === 2L)
    assert(za.getAs[Long]("score_millionths") === 1500000L)
    assert(za.getAs[Long]("rnk") === 1L)
    assert(all(("srcA", "common")).getAs[Long]("score_millionths") === 500000L)
    assert(all(("srcB", "yak")).getAs[Long]("score_millionths") === 1000000L)
    assert(all(("srcB", "yak")).getAs[Long]("rnk") === 1L)
    assert(all(("srcB", "common")).getAs[Long]("score_millionths") === 750000L)
    // k = 1 keeps exactly the per-source winner
    val top = TextAnalysis.tfidfTerms(fixture, k = 1).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[String]("token")).toMap
    assert(top === Map("srcA" -> "zebra", "srcB" -> "yak"))
  }

  test("tfidfTerms ranks a source-specific term above a universal one regardless of raw tf") {
    // 'noise' has more raw occurrences in srcA than 'signal', but appears
    // in every doc corpus-wide; 'signal' is srcA-only.
    val fixture = Seq(
      (1L, "noise noise noise signal", "en", "srcA"),
      (2L, "noise signal", "en", "srcA"),
      (3L, "noise", "en", "srcB"),
      (4L, "noise", "en", "srcB"),
      (5L, "noise", "en", "srcB"),
      (6L, "noise", "en", "srcB"))
      .toDF("doc_id", "text", "lang", "source")
    // srcA: tf(noise)=4, df(noise)=6 → 666666; tf(signal)=2, df=2 → 1000000
    val a = TextAnalysis.tfidfTerms(fixture, k = 2).collect()
      .filter(_.getAs[String]("source") == "srcA")
      .sortBy(_.getAs[Long]("rnk"))
    assert(a.map(_.getAs[String]("token")).toSeq === Seq("signal", "noise"))
    assert(a.head.getAs[Long]("score_millionths") === 1000000L)
    assert(a(1).getAs[Long]("score_millionths") === 666666L)
  }

  test("lengthQuartiles golden: disc-lower picks on even, odd, and tied value sets") {
    val fixture = Seq(
      // en: values 1,2,3,4 → q1=1, med=2, q3=3
      (1L, "en", 1L), (2L, "en", 2L), (3L, "en", 3L), (4L, "en", 4L),
      // fr: values 5,10,20 → q1=5, med=10, q3=20
      (5L, "fr", 5L), (6L, "fr", 10L), (7L, "fr", 20L),
      // de: 7,7,7,9 → q1=med=q3=7
      (8L, "de", 7L), (9L, "de", 7L), (10L, "de", 7L), (11L, "de", 9L))
      .toDF("doc_id", "lang", "n_chars")
    val out = TextAnalysis.lengthQuartiles(fixture).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    def quart(l: String) = {
      val r = out(l)
      (r.getAs[Long]("n_docs"), r.getAs[Long]("min_chars"),
        r.getAs[Long]("q1_chars"), r.getAs[Long]("median_chars"),
        r.getAs[Long]("q3_chars"), r.getAs[Long]("max_chars"))
    }
    assert(quart("en") === ((4L, 1L, 1L, 2L, 3L, 4L)))
    assert(quart("fr") === ((3L, 5L, 5L, 10L, 20L, 20L)))
    assert(quart("de") === ((4L, 7L, 7L, 7L, 7L, 9L)))
  }

  test("lengthQuartiles property: ordered and bounded on the fixture corpus") {
    val docsDf = graft.Tables.documents(SparkTestSession.spark, "/root/testdata/sf0.001")
    val rows = TextAnalysis.lengthQuartiles(docsDf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (mn, q1, md, q3, mx) = (r.getAs[Long]("min_chars"),
        r.getAs[Long]("q1_chars"), r.getAs[Long]("median_chars"),
        r.getAs[Long]("q3_chars"), r.getAs[Long]("max_chars"))
      assert(mn <= q1 && q1 <= md && md <= q3 && q3 <= mx,
        s"${r.getAs[String]("lang")}: $mn $q1 $md $q3 $mx out of order")
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docsDf.count())
  }

  test("approx length quartiles: members of the input with bounded rank error") {
    val rows = (1 to 5000).map(i => (i.toLong, "x", "en", i.toLong)) ++
      (1 to 100).map(i => (5000L + i, "y", "de", (i * 7).toLong))
    val df = rows.toDF("doc_id", "text", "lang", "n_chars")
    val out = TextAnalysis.lengthQuartilesApprox(df).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    val byLang = rows.groupBy(_._3).view.mapValues(_.map(_._4).sorted).toMap
    for ((lang, r) <- out) {
      val vs = byLang(lang); val n = vs.size
      val qs = Seq(r.getAs[Long]("q1_chars"), r.getAs[Long]("median_chars"),
        r.getAs[Long]("q3_chars"))
      assert(r.getAs[Long]("n_docs") === n.toLong)
      assert(r.getAs[Long]("min_chars") === vs.head)
      assert(r.getAs[Long]("max_chars") === vs.last)
      // ordered, and every quartile is a REAL member of the input
      assert(qs == qs.sorted && qs.forall(vs.contains), s"$lang: $qs")
      // rank error ≤ n/accuracy + 1 around the target rank
      for ((q, p) <- qs.zip(Seq(0.25, 0.5, 0.75))) {
        val lo = vs.count(_ < q); val hi = vs.count(_ <= q)
        val target = p * n; val slack = n / 10000.0 + 1
        assert(lo - slack <= target && target <= hi + slack,
          s"$lang p=$p: value $q has rank [$lo,$hi], target $target")
      }
    }
  }

  test("lmScore golden: hand-computed bigram transition probabilities") {
    // corpus bigrams: (a,b)×2 from d1, (b,a)×1 from d1, (a,c)×1 from d2
    // prefix counts: a·=3, b·=1
    // P(b|a) = 2e6 div 3 = 666666;  P(a|b) = 1e6;  P(c|a) = 1e6 div 3
    val out = TextAnalysis.lmScore(docs(
      (1L, "a b a b", "en"),
      (2L, "a c", "en"),
      (3L, "solo", "en"),
      (4L, "", "en")))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"),
          Option(r.getAs[java.lang.Long]("mean_prob_millionths")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("min_prob_millionths")).map(_.toLong)))
      .toMap
    assert(out.size === 4)
    // d1: occurrences ab, ba, ab → sum = 666666·2 + 1000000 = 2333332
    assert(out(1L) === (3L, Some(2333332L / 3L), Some(666666L)))
    assert(out(2L) === (1L, Some(333333L), Some(333333L)))
    assert(out(3L) === (0L, None, None))
    assert(out(4L) === (0L, None, None))
  }

  test("lmScore: n_bigrams mass equals sum of per-doc max(len-1, 0)") {
    val rows = (0L until 30L).map(i =>
      (i, Seq.fill((i % 5).toInt)(s"w${i % 7}").mkString(" "), "en"))
    val out = TextAnalysis.lmScore(docs(rows: _*))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bigrams"))
      .toMap
    for ((id, text, _) <- rows) {
      val n = text.split("\\s+").count(_.nonEmpty)
      assert(out(id) === math.max(n - 1, 0).toLong, s"doc $id '$text'")
    }
  }

  test("lmScore ranks a formulaic doc above incoherent token soup") {
    // ten copies of the same sentence vs one doc of corpus-unique
    // transitions: the LM is trained on this corpus itself, so the
    // repeated phrasing has high transition mass and the soup is all
    // hapax transitions over a shared prefix vocabulary
    val formula = (0L until 10L).map(i =>
      (i, "the cat sat on the mat", "en"))
    val soup = (10L, "the mat cat the sat on mat sat the on cat mat", "en")
    val out = TextAnalysis.lmScore(docs((formula :+ soup): _*))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[java.lang.Long]("mean_prob_millionths")).toMap
    assert(out(0L).toLong > out(10L).toLong)
  }
}
