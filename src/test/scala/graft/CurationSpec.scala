package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Curation

class CurationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  def docs(rows: (Long, String)*) =
    rows.toSeq.map { case (id, t) => (id, t, "en") }.toDF("doc_id", "text", "lang")

  val base: String = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
    "juliet kilo lima mike november oscar papa quebec romeo sierra tango " +
    "uniform victor whiskey xray yankee zulu one two three four five six " +
    "seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen")
  val nearDup: String = base.replace("oscar", "OSCARX")
  val unrelated: String = "red green blue cyan magenta yellow black white " +
    "purple orange pink brown gray silver gold bronze copper iron lead zinc"
  // degenerate repetition → low distinct ratio + short → low quality score
  val lowQuality: String = "spam spam spam spam spam"

  test("corpusKeep: flags exact dups, near dups, and low quality; keeps the rest") {
    val out = Curation.corpusKeep(docs(
      (1L, base), (2L, base), (3L, nearDup), (4L, unrelated), (5L, lowQuality)))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("is_exact_dup"), r.getAs[Boolean]("is_near_dup"),
          r.getAs[Boolean]("quality_ok"), r.getAs[Boolean]("keep")))).toMap
    // 1 is the keeper of the {1,2} exact family and the {1,2,3} component
    assert(out(1L)._1 === false && out(1L)._2 === false)
    assert(out(1L)._4 === true)
    // 2 = exact dup of 1 (also a near-dup component member) → dropped
    assert(out(2L) === ((true, true, true, false)))
    // 3 = near dup only → dropped, but not an exact dup
    assert(out(3L) === ((false, true, true, false)))
    // 4 = unique and decent quality → kept
    assert(out(4L) === ((false, false, true, true)))
    // 5 = unique but low quality → dropped
    assert(out(5L)._1 === false && out(5L)._2 === false)
    assert(out(5L)._3 === false && out(5L)._4 === false)
  }

  test("splitAssign: deterministic, stable under corpus growth, near-nominal proportions") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ids = (0L until 2000L).toDF("doc_id")
    def asg(df: org.apache.spark.sql.DataFrame) =
      graft.text.Curation.splitAssign(df).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val full = asg(ids)
    // determinism + growth stability: the first 500 docs' assignments are
    // unchanged when the other 1500 exist — the anti-leakage property a
    // count-proportional split does not have
    val prefix = asg(ids.filter(col("doc_id") < 500L))
    assert(prefix === full.filter { case (id, _) => id < 500L })
    // statistical proportions: 5%/5%/90% nominal, generous tolerance
    val n = full.size.toDouble
    val frac = full.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("test") - 0.05) < 0.03, s"test frac ${frac("test")}")
    assert(math.abs(frac("val") - 0.05) < 0.03, s"val frac ${frac("val")}")
    assert(frac("train") > 0.85)
  }

  test("pipelineManifest = the manual keep → split → pack composition") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(3)
    def words(n: Int) = Seq.fill(n)("w" + rnd.nextInt(500)).mkString(" ")
    val texts = (0L until 40L).map(i => i -> words(30 + rnd.nextInt(30)))
    // doc 100 exactly duplicates doc 0 → dropped by the keep verdict
    val d = (texts ++ Seq(100L -> texts.head._2))
      .map { case (i, t) => (i, t, "en") }
      .toDF("doc_id", "text", "lang")
    val kept = graft.text.Curation.corpusKeep(d)
      .filter(col("keep")).select("doc_id")
    val keptDocs = d.join(kept, "doc_id")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"), r.getAs[Long]("tok_count"),
        r.getAs[Long]("seq_id"), r.getAs[String]("split"))).toSet
    val expected = rows(graft.text.Curation.packSequences(keptDocs)
      .join(graft.text.Curation.splitAssign(keptDocs).select("doc_id", "split"), "doc_id")
      .select("doc_id", "shard", "tok_count", "seq_id", "split"))
    val got = rows(graft.text.Curation.pipelineManifest(d))
    assert(got === expected)
    assert(got.nonEmpty)
    assert(!got.exists(_._1 == 100L), "dropped docs must not reach the manifest")
  }

  test("packSequences: contiguous bins fill to the token budget in doc_id order") {
    import spark.implicits._
    // 10 docs of exactly 10 tokens each, one shard, budget 25: running
    // sums 0,10,...,90 → seq ids 0,0,0,1,1,2,2,2,3,3 (a doc straddling a
    // boundary stays in the bin its first token lands in)
    val docs = (0L until 10L)
      .map(i => (i, "a b c d e f g h i j", "en"))
      .toDF("doc_id", "text", "lang")
    val out = graft.text.Curation.packSequences(docs, budget = 25L, nShards = 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("shard"), r.getAs[Long]("tok_count"), r.getAs[Long]("seq_id")))
      .toMap
    assert(out.values.forall { case (shard, tok, _) => shard == 0L && tok == 10L })
    val seqByDoc = (0L until 10L).map(i => out(i)._3)
    assert(seqByDoc === Seq(0L, 0L, 0L, 1L, 1L, 2L, 2L, 2L, 3L, 3L))
  }

  test("keep implies: not exact dup, not near dup, quality ok (decision consistency)") {
    val out = Curation.corpusKeep(docs(
      (1L, base), (2L, base), (3L, nearDup), (4L, unrelated), (5L, lowQuality)))
      .collect()
    out.foreach { r =>
      val keep = r.getAs[Boolean]("keep")
      val expect = !r.getAs[Boolean]("is_exact_dup") &&
        !r.getAs[Boolean]("is_near_dup") && r.getAs[Boolean]("quality_ok")
      assert(keep === expect, s"doc ${r.getAs[Long]("doc_id")}")
    }
  }
}
