package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Mixture

class MixtureSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))

  /** n tokens of one char each. */
  def toks(n: Int): String = Seq.fill(n)("t").mkString(" ")

  lazy val fixture = graft.Tables.documents(spark, "/root/testdata/sf0.001")

  test("mixPlan invariants: rates capped, expected <= target, shortfall exact") {
    val out = Mixture.mixPlan(fixture).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val (t, target, rate, exp, short) = (r.getAs[Long]("total_tokens"),
        r.getAs[Long]("target_tokens"), r.getAs[Long]("rate_millionths"),
        r.getAs[Long]("expected_tokens"), r.getAs[Long]("shortfall_tokens"))
      assert(rate >= 0L && rate <= 1000000L)
      assert(exp <= target && exp <= t)
      assert(short === math.max(target - exp, 0L))
      // a capped source is exactly the one with inventory below target
      if (rate === 1000000L) assert(t <= target)
    }
  }

  test("waterfill golden: tiny source saturates, re-flow lands on the big one") {
    // two sources; weights are hash-derived, so read them back and
    // assert the closed form: alloc_small = T_small (saturates when
    // its inventory is far below any share), alloc_big = the final
    // fair share (rem * w_big) div w_big = rem
    val small = (1L to 3L).map(i => (i, toks(10), "alpha"))
    val big = (10L to 19L).map(i => (i, toks(500), "beta"))
    val out = Mixture.mixWaterfill(docs(small ++ big: _*), budget = 2000L)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val tSmall = out("alpha").getAs[Long]("total_tokens")
    assert(tSmall === 30L)
    assert(out("beta").getAs[Long]("total_tokens") === 5000L)
    // alpha's 30 tokens sit far below any share of 2000 → saturates
    assert(out("alpha").getAs[Long]("alloc_tokens") === 30L)
    // beta takes the whole remainder (sole unsaturated source)
    assert(out("beta").getAs[Long]("alloc_tokens") === 2000L - 30L)
    assert(out("beta").getAs[Long]("rate_millionths") ===
      (1970L * 1000000L) / 5000L)
  }

  test("waterfill ≡ one-shot targets when nothing saturates") {
    // budget far below every inventory → round 1 saturates nobody and
    // the final fair share IS the plan's weighted target, exactly
    val plan = Mixture.mixPlan(fixture, budget = 100L).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("target_tokens")).toMap
    val wf = Mixture.mixWaterfill(fixture, budget = 100L).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("alloc_tokens")).toMap
    assert(wf === plan)
  }

  test("waterfill: fixture saturates sources at the default budget and has converged") {
    val at8 = Mixture.mixWaterfill(fixture).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("alloc_tokens"))).toSet
    val at9 = Mixture.mixWaterfill(fixture, rounds = 9).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("alloc_tokens"))).toSet
    assert(at8 === at9, "one more round must be a no-op (converged)")
    val rows = Mixture.mixWaterfill(fixture).collect()
    val saturated = rows.count(r =>
      r.getAs[Long]("alloc_tokens") === r.getAs[Long]("total_tokens"))
    assert(saturated >= 1, "default budget must exercise the saturation branch")
    assert(saturated < rows.length, "and must leave survivors to re-flow into")
    // allocation never exceeds inventory, and the total stays in budget
    assert(rows.forall(r =>
      r.getAs[Long]("alloc_tokens") <= r.getAs[Long]("total_tokens")))
    assert(rows.map(_.getAs[Long]("alloc_tokens")).sum <= Mixture.MixBudget)
  }

  test("waterfill convergence gate: too few rounds fails loudly, enough rounds is exact") {
    // sequential saturation: round 1 saturates a (10 <= 100/3), the
    // re-flow then saturates b (40 <= 90/2) — so rounds=1 leaves b
    // unsaturated at/below its fair share, which must now THROW
    // instead of silently matching an equally-unconverged oracle
    val inv = Seq(("a", 1L, 10L, 1L), ("b", 1L, 40L, 1L), ("c", 1L, 1000L, 1L))
      .toDF("source", "n_docs", "total_tokens", "weight")
    val ok = Mixture.mixWaterfillFromInventory(inv, budget = 100L, rounds = 2)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("alloc_tokens"))
      .toMap
    assert(ok === Map("a" -> 10L, "b" -> 40L, "c" -> 50L))
    val e = intercept[IllegalArgumentException] {
      Mixture.mixWaterfillFromInventory(inv, budget = 100L, rounds = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("merge theorem: shard-merged inventory plan is bit-identical to the whole-corpus plan") {
    // overlapping sources across shards (row split, not source split) +
    // a shard-B-only source exercising the full outer branch
    val whole = (1L to 40L).map(i =>
      (i, toks(5 + (i % 7).toInt), s"s${i % 3}")) ++
      (100L to 104L).map(i => (i, toks(20), "only_b"))
    val shardA = whole.filter { case (id, _, s) => s != "only_b" && id % 2 == 0 }
    val shardB = whole.filterNot(shardA.contains)
    val merged = Mixture.incrementalMixPlan(docs(shardA: _*), docs(shardB: _*))
      .collect().map(_.toSeq).toSet
    val direct = Mixture.mixPlan(docs(whole: _*)).collect().map(_.toSeq).toSet
    assert(merged === direct)
    // and the waterfill rides the same theorem through its inventory face
    val wfMerged = Mixture.mixWaterfillFromInventory(
        Mixture.inventoryMerge(
          Mixture.inventoryOf(docs(shardA: _*)),
          Mixture.inventoryOf(docs(shardB: _*))),
        budget = 150L)
      .collect().map(_.toSeq).toSet
    val wfDirect = Mixture.mixWaterfill(docs(whole: _*), budget = 150L)
      .collect().map(_.toSeq).toSet
    assert(wfMerged === wfDirect)
  }

  test("inventory streams: complete-mode micro-batches equal the batch rollup") {
    // the mixture family's stream face: the per-source inventory is a
    // plain streamable count/sum aggregate (weight is per-row), so a
    // live mixture plan can sit on a complete-mode inventory — pinned
    // against the batch build across two triggers with source overlap
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val b1 = (1L to 30L).map(i => (i, toks(3 + (i % 5).toInt), s"s${i % 2}"))
    val b2 = (31L to 50L).map(i => (i, toks(7), s"s${i % 3}"))
    val src = MemoryStream[(Long, String, String)]
    val name = s"mix_inv_${System.nanoTime()}"
    val q = Mixture.inventoryOf(src.toDF().toDF("doc_id", "text", "source"))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    try {
      src.addData(b1: _*)
      q.processAllAvailable()
      src.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val live = spark.table(name).collect().map(_.toSeq).toSet
    val batch = Mixture.inventoryOf(docs(b1 ++ b2: _*)).collect()
      .map(_.toSeq).toSet
    assert(live === batch)
  }

  test("mixSample: deterministic, bounded by inventory, tracks expectation") {
    val a = Mixture.mixSample(fixture).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("docs_kept"), r.getAs[Long]("tokens_kept"))).toMap
    val b = Mixture.mixSample(fixture).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("docs_kept"), r.getAs[Long]("tokens_kept"))).toMap
    assert(a === b, "the hash gate must keep the same documents every run")
    val inv = Mixture.mixPlan(fixture).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"))).toMap
    for ((s, (dk, tk)) <- a) {
      assert(dk <= inv(s)._1 && tk <= inv(s)._2)
    }
    // a saturated source (rate 10⁶) keeps EVERYTHING — exact, not approximate
    val rates = Mixture.mixPlan(fixture).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("rate_millionths")).toMap
    for ((s, rate) <- rates if rate == 1000000L)
      assert(a(s) === inv(s), s"saturated source $s must keep all docs")
  }

  test("mixGate admits exactly the batch-planned set — batch and stream faces") {
    import org.apache.spark.sql.functions.col
    val rates = Mixture.mixPlan(fixture)
      .select(col("source"), col("rate_millionths")).localCheckpoint()
    // batch face: every row flagged (none dropped), per-source admitted
    // counts equal mixSample's docs_kept on the same corpus
    val gated = Mixture.mixGate(fixture, rates)
    assert(gated.count() === fixture.count())
    val kept = gated.filter(col("mix_keep")).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sample = Mixture.mixSample(fixture).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("docs_kept")).toMap
    for ((s, n) <- sample) assert(kept.getOrElse(s, 0L) === n, s"source $s")
    assert(kept.values.sum === sample.values.sum)
    // a source absent from the plan admits nothing (conservative default)
    val alien = Seq((999999L, "txt", "unplanned-feed"))
      .toDF("doc_id", "text", "source")
    assert(Mixture.mixGate(alien, rates)
      .filter(col("mix_keep")).count() === 0L)
    // stream face: the same rows through an unbounded source admit the
    // SAME doc ids — stateless, so no watermark, and batch ≡ stream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val rows = fixture.select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val src = MemoryStream[(Long, String)]
    src.addData(rows: _*)
    val name = s"mix_gate_out_${System.nanoTime()}"
    val q = Mixture.mixGate(src.toDF().toDF("doc_id", "source"), rates)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(name).filter(col("mix_keep"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batchIds = gated.filter(col("mix_keep"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed === batchIds, "stream admission diverged from batch")
  }
}
