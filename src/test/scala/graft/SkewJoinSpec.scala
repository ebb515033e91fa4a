package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.relational.{Sales, SkewJoin}

class SkewJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("salted rewrites are result-identical to the unsalted queries on the fixture") {
    val li = graft.Tables.lineitem(spark, dir)
    val part = graft.Tables.table(spark, dir, "part")
    val salted = SkewJoin.saltedBrandRevenue(li, part).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val plain = Sales.brandRevenue(li, part).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(salted === plain)
    val rollS = SkewJoin.saltedOrderRollup(li).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rollP = li.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * lit(100.0) + lit(0.5)).cast("long")).as("c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rollS === rollP)
  }

  test("a celebrity key really scatters across all salts and the join keys carry the salt") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s2.implicits._
    // one hot key with 10k distinct rows + a cold key
    val fact = (1L to 10000L).map(i => (7L, i)).toDF("k", "payload")
      .union(Seq((8L, 0L)).toDF("k", "payload"))
    val dim = Seq((7L, "hot"), (8L, "cold")).toDF("dk", "name")
    // first-stage spread: the hot key's rows land on every sub-key
    val spread = fact
      .withColumn("_salt", pmod(xxhash64(col("k"), col("payload")),
        lit(SkewJoin.Salts)))
      .filter(col("k") === 7L).select("_salt").distinct().count()
    assert(spread === SkewJoin.Salts.toLong,
      s"hot key occupies $spread/${SkewJoin.Salts} salts")
    // the salted join plans a sort-merge join whose keys include the salt
    val j = SkewJoin.saltedJoin(fact, dim, "k", "dk")
    val smj = j.queryExecution.executedPlan
      .collectFirst { case x: SortMergeJoinExec => x }
    assert(smj.isDefined, s"expected SMJ:\n${j.queryExecution.executedPlan}")
    assert(smj.get.leftKeys.map(_.sql).exists(_.contains("_salt")),
      s"join keys lack the salt: ${smj.get.leftKeys.map(_.sql)}")
    // and the rewrite still returns exactly the unsalted join's rows
    assert(j.count() === 10001L)
    assert(j.filter(col("name") === "cold").count() === 1L)
  }

  test("the audit-driven join routes a planted celebrity hot and the tail cold") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s2.implicits._
    // one celebrity key (10k rows) over a 10-key uniform tail (10 each)
    val fact = ((1L to 10000L).map(i => (7L, i)) ++
      (for (k <- 10L to 19L; i <- 1L to 10L) yield (k, i)))
      .toDF("k", "payload")
    val dim = ((7L to 19L).map(k => (k, s"name$k"))).toDF("dk", "name")
    // the audit flags exactly the celebrity
    val hot = graft.relational.SkewJoin.hotKeys(fact, "k",
      SkewJoin.hotThresholdMillionths(SkewJoin.Salts))
      .collect().map(_.getLong(0)).toSeq
    assert(hot === Seq(7L), s"hot set was $hot")
    val j = SkewJoin.autoSaltedJoin(fact, dim, "k", "dk")
    // plan flip, per key: the hot key scatters across every salt on the
    // fact side and meets Salts dim replicas; a cold key stays on salt 0
    // with exactly ONE replica (no replication tax on the tail)
    val salted = fact
      .join(broadcast(Seq(Tuple1(7L)).toDF("_hotf")),
        col("k") === col("_hotf"), "left")
      .withColumn("_salt", when(col("_hotf").isNotNull,
          pmod(xxhash64(col("k"), col("payload")), lit(SkewJoin.Salts)))
        .otherwise(lit(0)).cast("int"))
    assert(salted.filter(col("k") === 7L).select("_salt").distinct().count()
      === SkewJoin.Salts.toLong)
    assert(salted.filter(col("k") === 10L).select("_salt").distinct().count()
      === 1L)
    // no nested-loop anywhere (the constant-key attach stayed a hash join)
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"forbidden join in:\n$plan")
    // and the routing is result-identical to the plain join
    val plain = fact.join(dim, col("k") === col("dk"))
      .groupBy("name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val auto = j.groupBy("name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(auto === plain)
  }

  test("an exactly-uniform fact produces zero hot keys at threshold 1.0") {
    val fact = (for (k <- 1L to 8L; i <- 1L to 5L) yield (k, i))
      .toDF("k", "payload")
    // every key sits exactly AT the mean; strict > must flag none
    assert(graft.relational.SkewJoin.hotKeys(fact, "k", 1000000L).count() === 0L)
    // and the auto join then IS the plain path: every row on salt 0
    val dim = (1L to 8L).map(k => (k, s"n$k")).toDF("dk", "name")
    val j = SkewJoin.autoSaltedJoin(fact, dim, "k", "dk")
    assert(j.count() === 40L)
  }

  test("autoSaltedBrandRevenue is result-identical to brandRevenue on the fixture") {
    val li = graft.Tables.lineitem(spark, dir)
    val part = graft.Tables.table(spark, dir, "part")
    val auto = SkewJoin.autoSaltedBrandRevenue(li, part).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val plain = Sales.brandRevenue(li, part).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(auto === plain)
  }

  test("the audit-driven rollup routes a planted celebrity through the pre-agg and stays exact") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    import s2.implicits._
    // a celebrity order (5k lines) over a 10-key uniform tail (10 each)
    val li = ((1L to 5000L).map(i => (7L, i.toDouble, 0.0)) ++
      (for (k <- 10L to 19L; i <- 1L to 10L) yield (k, i.toDouble, 0.0)))
      .toDF("l_orderkey", "l_extendedprice", "l_discount")
    // the audit flags exactly the celebrity…
    val hot = SkewJoin.hotKeys(
      li.select(col("l_orderkey"),
        floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long")
          .as("cents")),
      "l_orderkey", SkewJoin.hotThresholdMillionths(SkewJoin.Salts))
      .collect().map(_.getLong(0)).toSeq
    assert(hot === Seq(7L), s"hot set was $hot")
    val auto = SkewJoin.saltedRollupAuto(li)
    // …and the plan routes it through the salted pre-agg: a (key, salt)
    // aggregate exists, and nothing nested-loops
    val plan = auto.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), s"no salted pre-agg in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"forbidden join in:\n$plan")
    // result identity with the plain single-phase rollup
    val got = auto.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = li.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * lit(100.0) + lit(0.5)).cast("long")).as("c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === want)
    // the persisted-hot overload: identical under the real artifact, an
    // empty one, a bogus one, and a DUPLICATED one (an artifact appended
    // twice must not multiply fact rows) — stale or dirty sets
    // mis-route, never mis-answer
    for (h <- Seq(Seq(7L), Seq.empty[Long], Seq(10L), Seq(7L, 7L, 10L, 10L))) {
      val viaHot = SkewJoin.saltedRollupAutoWithHot(li,
          h.toDF("l_orderkey"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(viaHot === want, s"hot set $h")
    }
  }

  test("zero hot keys: the auto rollup's salted branch is empty and the result is the plain rollup") {
    import spark.implicits._
    // exactly uniform: every key AT the mean — strict > flags none, so
    // the whole rollup collapses to the single-phase branch
    val li = (for (k <- 1L to 8L; i <- 1L to 5L) yield (k, i.toDouble, 0.0))
      .toDF("l_orderkey", "l_extendedprice", "l_discount")
    val fact = li.select(col("l_orderkey"),
      floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long")
        .as("cents"))
    assert(SkewJoin.hotKeys(fact, "l_orderkey", 1000000L).count() === 0L)
    val got = SkewJoin.saltedRollupAuto(li, hotMillionths = 1000000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size === 8 && got.values.forall(_._1 == 5L))
  }

  test("the persisted-hot overload routes identically to the self-audited path") {
    import spark.implicits._
    val fact = ((1L to 10000L).map(i => (7L, i)) ++
      (for (k <- 10L to 19L; i <- 1L to 10L) yield (k, i)))
      .toDF("k", "payload")
    val dim = ((7L to 19L).map(k => (k, s"name$k"))).toDF("dk", "name")
    // "persist" the audit artifact (a nightly writes this next to its
    // zone maps); the overload consumes the reloaded relation
    val hotPath = java.nio.file.Files
      .createTempDirectory("hotkeys").toString + "/hot"
    SkewJoin.hotKeys(fact, "k",
        SkewJoin.hotThresholdMillionths(SkewJoin.Salts))
      .write.mode("overwrite").parquet(hotPath)
    val persisted = SkewJoin.autoSaltedJoinWithHot(fact, dim, "k", "dk",
      spark.read.parquet(hotPath))
    val audited = SkewJoin.autoSaltedJoin(fact, dim, "k", "dk")
    val byName = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy("name").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName(persisted) === byName(audited))
    // a STALE hot set only mis-routes, never mis-answers: route with an
    // empty artifact (no key salts) and with a bogus hot key
    val empty = Seq.empty[Long].toDF("k")
    assert(byName(SkewJoin.autoSaltedJoinWithHot(fact, dim, "k", "dk", empty))
      === byName(audited))
    val bogus = Seq(10L).toDF("k")
    assert(byName(SkewJoin.autoSaltedJoinWithHot(fact, dim, "k", "dk", bogus))
      === byName(audited))
    // a DUPLICATED artifact (appended twice) must not multiply rows
    val dup = Seq(7L, 7L, 10L, 10L).toDF("k")
    assert(byName(SkewJoin.autoSaltedJoinWithHot(fact, dim, "k", "dk", dup))
      === byName(audited))
  }

  test("the auto join's hot branch honors a caller-supplied salt (duplicate-rows escape hatch)") {
    import spark.implicits._
    // a hot key of EXACT duplicate rows: the default whole-row hash
    // cannot spread it, a positional salt can — and the auto path now
    // accepts the same override its manual twin takes
    val fact = Seq.fill(10000)((7L, 1L)).toDF("k", "payload").repartition(8)
      .union(Seq((8L, 2L)).toDF("k", "payload"))
    val dim = Seq((7L, "hot"), (8L, "cold")).toDF("dk", "name")
    val positional: (org.apache.spark.sql.DataFrame, Int) =>
        org.apache.spark.sql.Column =
      (_, s) => pmod(spark_partition_id().cast("long"), lit(s.toLong))
    val j = SkewJoin.autoSaltedJoin(fact, dim, "k", "dk",
      salt = positional)
    assert(j.count() === 10001L)
    assert(j.filter(col("name") === "cold").count() === 1L)
  }

  test("byte-identical duplicate rows need a caller-keyed salt to spread") {
    // a degenerate hot key made of 10k EXACT duplicate rows: the
    // default whole-row hash maps them all to ONE salt (documented
    // caveat), while a physical-position salt spreads them
    val fact = Seq.fill(10000)((7L, 1L)).toDF("k", "payload")
      .repartition(8)
    val defaultSpread = fact
      .withColumn("_s", SkewJoin.rowSalt(fact, SkewJoin.Salts))
      .select("_s").distinct().count()
    assert(defaultSpread === 1L, "identical rows share the row hash")
    val positional: (org.apache.spark.sql.DataFrame, Int) =>
        org.apache.spark.sql.Column =
      (_, s) => pmod(spark_partition_id().cast("long"), lit(s.toLong))
    val keyedSpread = fact.withColumn("_s", positional(fact, SkewJoin.Salts))
      .select("_s").distinct().count()
    assert(keyedSpread === SkewJoin.Salts.toLong,
      s"positional salt spread $keyedSpread/${SkewJoin.Salts}")
    // the caller-keyed salted join stays result-identical: every dup
    // row still matches exactly one dim replica
    val dim = Seq((7L, "hot")).toDF("dk", "name")
    val j = SkewJoin.saltedJoin(fact, dim, "k", "dk",
      salt = positional)
    assert(j.count() === 10000L)
    assert(j.select("name").distinct().collect().map(_.getString(0)).toSeq
      === Seq("hot"))
  }

  test("incremental hot audit: merged artifact + shard == whole-fact audit") {
    // corpus: key 1 appears 6x (hot alone), key 2 appears 3x (borderline),
    // keys 3..8 once each; shard: key 2 appears 3x more (hot ONLY in the
    // union), key 9 once. threshold 2x mean.
    val corpus = (Seq.fill(6)(1L) ++ Seq.fill(3)(2L) ++ (3L to 8L)).toDF("k")
    val shard = (Seq.fill(3)(2L) :+ 9L).toDF("k")
    val hm = 2000000L
    val direct = SkewJoin.hotKeys(corpus.union(shard), "k", hm)
      .collect().map(_.getLong(0)).toSet
    val merged = SkewJoin.incrementalHotKeys(
        SkewJoin.keyCounts(corpus, "k").localCheckpoint(), shard, "k", hm)
      .collect().map(_.getLong(0)).toSet
    assert(merged === direct)
    assert(direct.contains(2L), "key 2 must be hot only via the union")
    // and key 2 was NOT hot on the corpus alone (each side under the bar)
    val corpusOnly = SkewJoin.hotKeys(corpus, "k", hm)
      .collect().map(_.getLong(0)).toSet
    assert(!corpusOnly.contains(2L))
    // a shard of pure uniform tail can also demote: adding 12 distinct
    // cold keys raises n_keys faster than n_rows for key 2's ratio
    val tail = (100L to 111L).toDF("k")
    val demoted = SkewJoin.incrementalHotKeys(
        SkewJoin.keyCounts(corpus.union(shard), "k").localCheckpoint(),
        tail, "k", hm).collect().map(_.getLong(0)).toSet
    val demotedDirect = SkewJoin.hotKeys(corpus.union(shard).union(tail),
        "k", hm).collect().map(_.getLong(0)).toSet
    assert(demoted === demotedDirect)
  }
}
