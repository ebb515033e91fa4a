package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PortableHash

/** Property checks for the overflow-safety bounds PortableHash's docs
  * claim — the invariants the whole cross-engine determinism story rests
  * on (an int64 overflow would be silent wraparound in Spark and a hard
  * error in DuckDB). Evaluated through the real Column expressions over
  * generated adversarial tokens, not a reimplementation.
  */
class PortableHashSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val P = PortableHash.P

  // adversarial token pool: empty-ish, max-codepoint chars, long runs
  private def tokens: Seq[String] = {
    val rnd = new scala.util.Random(3L)
    val alphabets = Seq("az09", "￿￾", "日本語中文한국어", ".,;!?")
    (1 to 2000).map { _ =>
      val a = alphabets(rnd.nextInt(alphabets.length))
      (1 to (1 + rnd.nextInt(30))).map(_ => a(rnd.nextInt(a.length))).mkString
    } ++ Seq("", "￿" * 8, "x" * 10000,
      // an unbroken ~12M-char token (minified-JS class) — overflowed
      // int64 before the 1e6 length cap; under default ANSI mode that
      // was a job-killing ARITHMETIC_OVERFLOW, not a wrong number
      "y" * 12000000)
  }

  test("tokHash stays within the documented bound for adversarial tokens") {
    val df = tokens.toDF("t").select(PortableHash.tokHash(col("t")).as("h"))
    val r = df.agg(min("h").as("lo"), max("h").as("hi")).head()
    // doc claim: codepoints ≤ 65535 ⇒ h < 3e15 for sane lengths; with the
    // 10k-char token, h = len·31^8 + poly < 1e4·8.53e11 + 5.7e13 < 2^62
    assert(r.getAs[Long]("lo") >= 0L)
    assert(r.getAs[Long]("hi") < (1L << 62))
  }

  test("shingle3 and permHash outputs stay in [0, P) for in-range inputs") {
    val rnd = new scala.util.Random(5L)
    val hs = (1 to 3000).map(_ => math.abs(rnd.nextLong()) % (1L << 52))
    val df = hs.toDF("h")
    val (a, b) = PortableHash.minhashPerms(1, seed = 123L).head
    val out = df.select(
      PortableHash.shingle3(col("h"), col("h") + 1L, col("h") + 2L).as("sh"),
      PortableHash.permHash(col("h"), a, b).as("ph"))
      .agg(min("sh").as("shLo"), max("sh").as("shHi"),
        min("ph").as("phLo"), max("ph").as("phHi")).head()
    assert(out.getAs[Long]("shLo") >= 0L && out.getAs[Long]("shHi") < P)
    assert(out.getAs[Long]("phLo") >= 0L && out.getAs[Long]("phHi") < P)
  }
}
