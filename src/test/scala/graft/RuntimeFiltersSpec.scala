package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.relational.RuntimeFilters
import graft.functions.PortableHash

class RuntimeFiltersSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // 200 orders, every 5th urgent; 1000 lineitem rows over 250 keys, so
  // keys 200..249 match no order at all and most others match non-urgent
  def ordersDf = (0L until 200L)
    .map(k => (k, if (k % 5 == 0) "1-URGENT" else "5-LOW"))
    .toDF("o_orderkey", "o_orderpriority")
  def lineitemDf = (0L until 1000L).map(i => Tuple1(i % 250L))
    .toDF("l_orderkey")

  /** Scala twin of the engine's Bloom positions. */
  def positions(key: Long): Seq[Long] =
    RuntimeFilters.hashParams.map { case (a, b) =>
      ((key % PortableHash.P) * a + b) % PortableHash.P % RuntimeFilters.NumBits
    }

  val urgentKeys: Set[Long] = (0L until 200L).filter(_ % 5 == 0).toSet
  val bitsSet: Set[Long] = urgentKeys.flatMap(positions)

  test("bloomPrefilter: no false negatives; pass set equals the Scala-twin bitmap test") {
    val bits = RuntimeFilters.bloomBuild(
      ordersDf.filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey".as("bkey")), "bkey")
    val passed = RuntimeFilters.bloomPrefilter(lineitemDf, "l_orderkey", bits)
      .collect().map(_.getAs[Long]("l_orderkey")).sorted.toSeq
    val expected = (0L until 1000L).map(_ % 250L)
      .filter(k => positions(k).forall(bitsSet)).sorted
    assert(passed === expected)
    // the Bloom guarantee: every truly matching row survives
    val matches = (0L until 1000L).map(_ % 250L).filter(urgentKeys)
    assert(matches.toSet.subsetOf(passed.toSet))
    // and the filter actually filters (non-members exist that fail)
    assert(passed.size < 1000)
  }

  test("bloomAudit equals a Scala recount of pass/match/false-positive") {
    val row = RuntimeFilters.bloomAudit(ordersDf, lineitemDf).collect().head
    val keys = (0L until 1000L).map(_ % 250L)
    val nPass = keys.count(k => positions(k).forall(bitsSet)).toLong
    val nMatch = keys.count(urgentKeys).toLong
    val nFp = keys.count(k => positions(k).forall(bitsSet) && !urgentKeys(k)).toLong
    assert(row.getAs[Long]("n_probe") === 1000L)
    assert(row.getAs[Long]("n_pass") === nPass)
    assert(row.getAs[Long]("n_match") === nMatch)
    assert(row.getAs[Long]("n_false_pos") === nFp)
    assert(row.getAs[Long]("pass_millionths") === nPass * 1000000L / 1000L)
    assert(row.getAs[Long]("fpr_millionths") === nFp * 1000000L / (1000L - nMatch))
  }

  test("joinSkew: golden on a planted hot key; uniform data reports ratio ≈ 1") {
    import spark.implicits._
    // 90 rows on key 7, one row each on keys 0..9 except 7 → 99 rows,
    // 10 keys, max 90
    val hot = (Seq.fill(90)(7L) ++ (0L until 10L).filter(_ != 7L))
      .map(Tuple1(_)).toDF("l_orderkey")
    val r = RuntimeFilters.joinSkew(hot, "l_orderkey").collect().head
    assert(r.getAs[Long]("n_rows") === 99L)
    assert(r.getAs[Long]("n_keys") === 10L)
    assert(r.getAs[Long]("max_key_rows") === 90L)
    assert(r.getAs[Long]("top1_share_millionths") === 90L * 1000000L / 99L)
    assert(r.getAs[Long]("skew_ratio_millionths") === 90L * 1000000L * 10L / 99L)
    // perfectly uniform: ratio exactly 1.0 in millionths
    val uni = (0L until 100L).flatMap(k => Seq.fill(4)(k)).map(Tuple1(_))
      .toDF("l_orderkey")
    val u = RuntimeFilters.joinSkew(uni, "l_orderkey").collect().head
    assert(u.getAs[Long]("skew_ratio_millionths") === 1000000L)
  }

  test("bloomPrefilter runs unchanged on a stream: stateless admission gate") {
    // stream-static LEFT SEMI joins against the (static, tiny) bits
    // relation are stateless map work — the batch operator IS the
    // streaming admission gate, same rows pass, no state store.
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val bits = RuntimeFilters.bloomBuild(
      (0L until 200L).filter(_ % 5 == 0).map(Tuple1(_)).toDF("bkey"), "bkey")
      .localCheckpoint()
    val src = MemoryStream[Long]
    src.addData(0L until 1000L map (_ % 250L): _*)
    val name = s"bloom_stream_${System.nanoTime()}"
    val q = RuntimeFilters.bloomPrefilter(
        src.toDF().toDF("l_orderkey"), "l_orderkey", bits)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(name).collect()
      .map(_.getAs[Long]("l_orderkey")).sorted.toSeq
    val batch = RuntimeFilters.bloomPrefilter(lineitemDf, "l_orderkey", bits)
      .collect().map(_.getAs[Long]("l_orderkey")).sorted.toSeq
    assert(streamed === batch)
    assert(q.lastProgress.stateOperators.isEmpty, "the gate must be stateless")
  }

  test("bloomPrefilter adds ZERO shuffles to the probe side") {
    // the whole point of a runtime filter: it prunes BEFORE any shuffle.
    // With the (tiny) bits relation checkpointed — as a deployment would
    // persist/broadcast it — the entire prefilter plan must be broadcast
    // semi joins over the streaming probe scan: no ShuffleExchange
    // anywhere, one BroadcastHashJoin per hash.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    import s2.implicits._
    val li = (0L until 1000L).map(i => Tuple1(i % 250L)).toDF("l_orderkey")
    val bits = RuntimeFilters.bloomBuild(
      (0L until 200L).filter(_ % 5 == 0).map(Tuple1(_)).toDF("bkey"), "bkey")
      .localCheckpoint()
    val plan = RuntimeFilters.bloomPrefilter(li, "l_orderkey", bits)
      .queryExecution.executedPlan
    assert(plan.collect { case _: ShuffleExchangeExec => 1 }.sum === 0,
      s"probe-side shuffle in:\n$plan")
    assert(plan.collect { case _: BroadcastHashJoinExec => 1 }.sum
      === RuntimeFilters.NumHashes, s"expected 3 broadcast semi joins:\n$plan")
  }

  test("routedBits: a selective filter passes through as-is, a saturated one as the full domain") {
    val small = RuntimeFilters.bloomBuild(
      urgentKeys.toSeq.map(Tuple1(_)).toDF("bkey"), "bkey")
    val routedSmall = RuntimeFilters.routedBits(small)
      .collect().map(_.getLong(0)).toSet
    assert(routedSmall === bitsSet, "selective filter must route unchanged")
    // 30k distinct keys × 3 hashes ≈ 75% occupancy → pass-through
    val big = RuntimeFilters.bloomBuild(
      (0L until 30000L).map(Tuple1(_)).toDF("bkey"), "bkey")
    val routedBig = RuntimeFilters.routedBits(big)
    assert(routedBig.count() === RuntimeFilters.NumBits,
      "saturated filter must route to the full position domain")
    // pass-through really passes: a probe key matching NO build key
    // survives the semi-joins under the routed-big relation
    val alien = Seq(Tuple1(999999L)).toDF("l_orderkey")
    assert(RuntimeFilters.bloomPrefilter(alien, "l_orderkey",
      routedBig).count() === 1L)
  }

  test("bloomAutoRevenue is result-identical to the plain join, enabled or saturated") {
    import org.apache.spark.sql.functions._
    val orders = ordersDf
      .withColumn("o_orderdate", lit(null).cast("timestamp_ntz"))
    val li = lineitemDf
      .withColumn("l_extendedprice", (col("l_orderkey") % 97 + 1).cast("double"))
      .withColumn("l_discount", lit(0.0))
    val plain = li.join(
        orders.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey")).distinct(),
        col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)), sum(floor(col("l_extendedprice") * lit(100.0)
        + lit(0.5)).cast("long")))
      .collect().head
    val auto = RuntimeFilters.bloomAutoRevenue(orders, li).collect().head
    assert((auto.getLong(0), auto.getLong(1)) ===
      ((plain.getLong(0), plain.getLong(1))))
    // force the saturated branch (ceiling 0 → never enabled): identical
    val sat = RuntimeFilters.bloomAutoRevenue(orders, li,
      maxOccupancyMillionths = 0L).collect().head
    assert((sat.getLong(0), sat.getLong(1)) ===
      ((plain.getLong(0), plain.getLong(1))))
    // and the whole routed plan stays free of nested-loop joins
    val plan = RuntimeFilters.bloomAutoRevenue(orders, li)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"forbidden join in:\n$plan")
  }

  test("bloomSizeVerdict picks the exact power-of-two rung at planted build sizes") {
    def mFor(n: Long): Long = RuntimeFilters.bloomSizeVerdict(
      (0L until n).map(Tuple1(_)).toDF("bkey"), "bkey")
      .collect().head.getLong(1)
    // 16 bits/key, next pow2, clamped to [64, 65536]
    assert(mFor(1L) === 64L)      // 16 → floor 64
    assert(mFor(2L) === 64L)      // 32 → floor 64
    assert(mFor(20L) === 512L)    // 320 → 512
    assert(mFor(100L) === 2048L)  // 1600 → 2048
    assert(mFor(128L) === 2048L)  // 2048 exactly → 2048 (no overshoot)
    assert(mFor(129L) === 4096L)  // 2064 → 4096
    assert(mFor(10000L) === RuntimeFilters.NumBits) // 160k → ceiling
  }

  test("sizedBits: the lift is exact — static-probe membership IS width-m membership") {
    val keys = (0L until 20L).map(_ * 13L + 5L)
    val m = 512L // bloomSizeVerdict's rung for 20 keys
    val lifted = RuntimeFilters.sizedBits(
      keys.map(Tuple1(_)).toDF("bkey"), "bkey")
      .collect().map(_.getLong(0)).toSet
    // Scala twin of the width-m filter, lifted: q set ⟺ (q % m) set
    val setM = keys.flatMap(k => RuntimeFilters.hashParams.map { case (a, b) =>
      ((k % PortableHash.P) * a + b) % PortableHash.P % m }).toSet
    val expected = (0L until RuntimeFilters.NumBits)
      .filter(q => setM.contains(q % m)).toSet
    assert(lifted === expected)
    // |lifted| = |S_m| × NumBits/m — the bounded broadcast size
    assert(lifted.size.toLong === setM.size * (RuntimeFilters.NumBits / m))
    // no false negatives through the STATIC probe: every build key's
    // own static positions are present
    for (k <- keys; p <- positions(k)) assert(lifted.contains(p), s"key $k pos $p")
    // occupancy is invariant under the lift, so routedBits composes:
    // 60/512 ≈ 11.7% < 50% ceiling → routed unchanged
    val routed = RuntimeFilters.routedBits(RuntimeFilters.sizedBits(
      keys.map(Tuple1(_)).toDF("bkey"), "bkey"))
      .collect().map(_.getLong(0)).toSet
    assert(routed === expected)
  }

  test("bloomSizedRevenue is result-identical to the plain join at every rung and route") {
    import org.apache.spark.sql.functions._
    val orders = ordersDf
      .withColumn("o_orderpriority",
        when(col("o_orderkey") % 5 === 1, "2-HIGH")
          .otherwise(col("o_orderpriority")))
    val li = lineitemDf
      .withColumn("l_extendedprice", (col("l_orderkey") % 97 + 1).cast("double"))
      .withColumn("l_discount", lit(0.0))
    val plain = li.join(
        orders.filter(col("o_orderpriority") === "2-HIGH")
          .select(col("o_orderkey")).distinct(),
        col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)), sum(floor(col("l_extendedprice") * lit(100.0)
        + lit(0.5)).cast("long")))
      .collect().head
    val sized = RuntimeFilters.bloomSizedRevenue(orders, li).collect().head
    assert((sized.getLong(0), sized.getLong(1)) ===
      ((plain.getLong(0), plain.getLong(1))))
    // saturated route forced: still identical
    val sat = RuntimeFilters.bloomSizedRevenue(orders, li,
      maxOccupancyMillionths = 0L).collect().head
    assert((sat.getLong(0), sat.getLong(1)) ===
      ((plain.getLong(0), plain.getLong(1))))
    // no nested-loop anywhere in the sized+routed plan
    val plan = RuntimeFilters.bloomSizedRevenue(orders, li)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"forbidden join in:\n$plan")
  }
}
