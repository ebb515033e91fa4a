package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PortableHash
import graft.text.{Dedup, TextAnalysis}

/** Pins the native [[graft.functions.SimhashOfHashes]] expression to the
  * declarative formulation it replaced (4 × transform + 64 × size/filter
  * majority votes): same arithmetic, one codegen'd pass. Runs on the
  * fixture documents AND on adversarial synthetic docs (empty, 1-token,
  * tie-heavy repetitions, unicode) so both the interpreted eval and the
  * generated-code path are exercised against the reference formulation.
  */
class SimhashSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  /** The replaced declarative formulation, kept verbatim as the test
    * reference. */
  private def declarativeSimhash(docs: org.apache.spark.sql.DataFrame) = {
    val toks = TextAnalysis.tokens(col("text"))
    val permCols = Dedup.simPerms.zipWithIndex.map { case ((a, b), p) =>
      transform(toks, t => PortableHash.permHash(PortableHash.tokHash(t), a, b)).as(s"th$p")
    }
    val t = docs.select(col("doc_id") +: permCols: _*)
    val n = size(col("th0"))
    val sim = Dedup.simPerms.indices.flatMap { p =>
      (0 until 16).map { j =>
        val ones = size(filter(col(s"th$p"),
          h => (shiftright(h, j) % 2) === 1L))
        when(ones * 2 > n, lit(1L << (p * 16 + j))).otherwise(lit(0L))
      }
    }.reduce(_ + _)
    t.select(col("doc_id"), n.cast("long").as("n_tokens"), sim.as("simhash"))
  }

  private def assertAgree(docs: org.apache.spark.sql.DataFrame): Unit = {
    val expect = declarativeSimhash(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = Dedup.docSimhash(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expect)
  }

  test("native expression matches the declarative formulation on fixture docs") {
    assertAgree(graft.Tables.documents(spark, "/root/testdata/sf0.001"))
  }

  test("native expression matches on adversarial docs (empty, ties, unicode, long)") {
    val rnd = new scala.util.Random(7L)
    val words = Vector("alpha", "beta", "Gamma", "δδδ", "x", "1234567890abc", "..", "日本語")
    val synth = (1L to 200L).map { i =>
      val n = rnd.nextInt(50)
      (i, Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" "), "en")
    } ++ Seq(
      (900L, "", "en"),                     // empty
      (901L, "solo", "en"),                 // single token
      (902L, "tie tie other other", "en"),  // exact vote ties
      (903L, ("verylongtoken" * 40) + " " + ("z" * 500), "en"))
    assertAgree(synth.toDF("doc_id", "text", "lang"))
  }

  test("registered functions reject wrong arity with a clear message") {
    val e = intercept[Exception] {
      spark.sql("SELECT simhash_of_hashes(array(1L, 2L), 3)").collect()
    }
    assert(e.getMessage.contains("exactly 1 argument"))
  }

  test("generated code path is actually exercised (no codegen fallback)") {
    val df = Dedup.docSimhash(graft.Tables.documents(spark, "/root/testdata/sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("simhash_of_hashes") || plan.contains("SimhashOfHashes"),
      s"expression missing from plan:\n$plan")
  }
}
