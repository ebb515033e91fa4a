package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PortableHash
import graft.text.{Dedup, TextAnalysis}

/** Pins the native [[graft.functions.MinhashOfHashes]] expression to the
  * declarative formulation it replaced (16 × array_min(transform(...))).
  */
class MinhashSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  /** The replaced declarative formulation, kept verbatim as the test
    * reference. */
  private def declarativeSignatures(docs: org.apache.spark.sql.DataFrame) = {
    val th = transform(TextAnalysis.tokens(col("text")),
      t => PortableHash.tokHash(t))
    val t = docs.select(col("doc_id"), th.as("th")).filter(size(col("th")) >= 3)
    val shingles = transform(
      sequence(lit(1), size(col("th")) - 2),
      i => PortableHash.shingle3(
        element_at(col("th"), i),
        element_at(col("th"), i + 1),
        element_at(col("th"), i + 2)))
    val withSh = t.select(col("doc_id"), shingles.as("sh"))
    val mh = array(Dedup.perms.map { case (a, b) =>
      array_min(transform(col("sh"), s => PortableHash.permHash(s, a, b)))
    }: _*)
    withSh.select(col("doc_id"), mh.as("mh"))
  }

  private def collectSigs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](r.fieldIndex("mh")).toList).toMap

  test("native expression matches the declarative formulation on fixture docs") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    assert(collectSigs(Dedup.minhashSignatures(docs))
      === collectSigs(declarativeSignatures(docs)))
  }

  test("native expression matches on random synthetic docs") {
    val rnd = new scala.util.Random(11L)
    val words = Vector("alpha", "beta", "gamma", "delta", "x1", "x2", "x3", "zz")
    val synth = (1L to 300L).map { i =>
      val n = 3 + rnd.nextInt(40)
      (i, Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" "), "en")
    }.toDF("doc_id", "text", "lang")
    assert(collectSigs(Dedup.minhashSignatures(synth))
      === collectSigs(declarativeSignatures(synth)))
  }

  test("expression lands in the physical plan") {
    val plan = Dedup.minhashSignatures(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("minhash_of_hashes") || plan.contains("MinhashOfHashes"),
      s"expression missing from plan:\n$plan")
  }
}
