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
}
