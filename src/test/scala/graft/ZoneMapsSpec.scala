package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Sinks, ZoneMaps}

class ZoneMapsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // skewed keys: zone 0 dense, zone 1 sparse, zone 3 present, zone 2 EMPTY
  def keysDf = (Seq.fill(50)(7L) ++ (0L until 200L) ++ Seq(600L, 700L) ++
    (1536L until 1600L)).map(Tuple1(_)).toDF("l_orderkey")

  test("zoneMap golden: zones carry true min/max/count; empty zones absent") {
    val zm = ZoneMaps.zoneMap(keysDf, "l_orderkey").collect()
      .map(r => r.getAs[Long]("zone") ->
        ((r.getAs[Long]("min_key"), r.getAs[Long]("max_key"),
          r.getAs[Long]("n_rows")))).toMap
    assert(zm === Map(
      0L -> ((0L, 199L, 250L)),
      1L -> ((600L, 700L, 2L)),
      3L -> ((1536L, 1599L, 64L))))
  }

  test("zoneMap property: every zone's bounds sit inside its width; counts tile the table") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val zm = ZoneMaps.zoneMap(li, "l_orderkey").collect()
    zm.foreach { r =>
      val (z, lo, hi) = (r.getAs[Long]("zone"), r.getAs[Long]("min_key"),
        r.getAs[Long]("max_key"))
      assert(lo >= z * ZoneMaps.ZoneWidth && hi < (z + 1) * ZoneMaps.ZoneWidth)
      assert(lo <= hi)
    }
    assert(zm.map(_.getAs[Long]("n_rows")).sum === li.count())
  }

  test("zoneSkip: scanned bounds match from above (no false negatives); Scala recount agrees") {
    val row = ZoneMaps.zoneSkip(keysDf, "l_orderkey").collect().head
    val keys = Seq.fill(50)(7L) ++ (0L until 200L) ++ Seq(600L, 700L) ++
      (1536L until 1600L)
    val byZone = keys.groupBy(_ / ZoneMaps.ZoneWidth)
    val hitZones = byZone.filter { case (_, ks) =>
      ks.max >= ZoneMaps.SkipLo && ks.min <= ZoneMaps.SkipHi }
    val nMatch = keys.count(k => k >= ZoneMaps.SkipLo && k <= ZoneMaps.SkipHi).toLong
    assert(row.getAs[Long]("n_zones") === byZone.size.toLong)
    assert(row.getAs[Long]("n_zones_hit") === hitZones.size.toLong)
    assert(row.getAs[Long]("n_rows_total") === keys.size.toLong)
    assert(row.getAs[Long]("n_rows_scanned") === hitZones.values.map(_.size).sum.toLong)
    assert(row.getAs[Long]("n_rows_match") === nMatch)
    assert(row.getAs[Long]("n_rows_scanned") >= nMatch)
    assert(row.getAs[Long]("skip_millionths") ===
      (keys.size - hitZones.values.map(_.size).sum).toLong * 1000000L / keys.size)
  }

  test("zoneMapMerge theorem: manifest(A ∪ B) = merge(manifest(A), manifest(B))") {
    val a = (Seq.fill(30)(7L) ++ (0L until 100L)).map(Tuple1(_)).toDF("l_orderkey")
    val b = ((50L until 200L) ++ Seq(600L) ++ (1536L until 1560L))
      .map(Tuple1(_)).toDF("l_orderkey")
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("zone") -> ((r.getAs[Long]("min_key"),
        r.getAs[Long]("max_key"), r.getAs[Long]("n_rows")))).toMap
    val merged = m(ZoneMaps.zoneMapMerge(
      ZoneMaps.zoneMap(a, "l_orderkey"), ZoneMaps.zoneMap(b, "l_orderkey")))
    val full = m(ZoneMaps.zoneMap(a.unionByName(b), "l_orderkey"))
    assert(merged === full)
    // overlap zone 0 really merged (counts added, bounds widened)
    assert(merged(0L)._3 === 130L + 150L)
  }

  test("compactionPlan: monotone contiguous shards, balanced to one zone's granularity") {
    val plan = ZoneMaps.compactionPlan(keysDf, "l_orderkey", nShards = 2L)
      .collect().sortBy(_.getAs[Long]("zone"))
      .map(r => (r.getAs[Long]("zone"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("shard")))
    // golden: zones (0,1,3) with 250/2/64 rows, 2 shards of ideal 158:
    // zone 0 starts at cum 0 → shard 0; zone 1 at cum 250 → shard 1;
    // zone 3 at cum 252 → shard 1
    assert(plan.toSeq === Seq((0L, 250L, 0L), (1L, 2L, 1L), (3L, 64L, 1L)))
    // properties: shard ids are monotone in zone order (contiguity) and
    // in [0, nShards)
    assert(plan.map(_._3).toSeq === plan.map(_._3).sorted.toSeq)
    assert(plan.forall(t => t._3 >= 0L && t._3 < 2L))
    // every shard's rows ≥ 0 and the heaviest exceeds ideal by at most
    // the largest single zone (the bin granularity bound)
    val byShard = plan.groupBy(_._3).map { case (s, zs) => s -> zs.map(_._2).sum }
    val ideal = plan.map(_._2).sum / 2
    val maxZone = plan.map(_._2).max
    assert(byShard.values.forall(_ <= ideal + maxZone))
  }

  test("zoneMap runs unchanged on a stream (complete mode): live manifest = batch manifest") {
    // the manifest-maintenance story for a streaming ingest: the BATCH
    // operator is the streaming operator (the classifyDocs discipline) —
    // a per-zone min/max/count aggregate whose state is bounded by the
    // ZONE COUNT (keyspace/width), not the stream's history, in complete
    // mode. The lake writer updates the persisted manifest from it.
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val src = MemoryStream[Long]
    src.addData(Seq.fill(50)(7L) ++ (0L until 200L): _*)
    val name = s"zone_stream_${System.nanoTime()}"
    val q = ZoneMaps.zoneMap(src.toDF().toDF("l_orderkey"), "l_orderkey")
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    try {
      q.processAllAvailable()
      src.addData(600L, 700L)
      src.addData(1536L until 1600L: _*)
      q.processAllAvailable()
    } finally q.stop()
    val live = spark.table(name).collect()
      .map(r => r.getAs[Long]("zone") -> ((r.getAs[Long]("min_key"),
        r.getAs[Long]("max_key"), r.getAs[Long]("n_rows")))).toMap
    val batch = ZoneMaps.zoneMap(keysDf, "l_orderkey").collect()
      .map(r => r.getAs[Long]("zone") -> ((r.getAs[Long]("min_key"),
        r.getAs[Long]("max_key"), r.getAs[Long]("n_rows")))).toMap
    assert(live === batch)
  }

  test("zone-partitioned write: manifest-driven zone selection prunes the physical scan") {
    // the end-to-end layout claim: write partitioned by zone, consult the
    // manifest for the predicate's zones, read ONLY those partitions —
    // PartitionFilters in the plan, fewer files touched, identical rows
    // to the full-scan filter.
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_quantity")
    val path = java.nio.file.Files.createTempDirectory("graft_zones").toString
    Sinks.writePartitioned(
      li.withColumn("zone", ZoneMaps.zoneExpr("l_orderkey")), path, Seq("zone"))

    // the reader's routing step: manifest → zone list (an index read —
    // the manifest is ≤ keyspace/width rows, collect is the point)
    val zones = ZoneMaps.zoneMap(li, "l_orderkey")
      .filter(col("max_key") >= ZoneMaps.SkipLo && col("min_key") <= ZoneMaps.SkipHi)
      .collect().map(_.getAs[Long]("zone"))
    val read = spark.read.parquet(path)
      .filter(col("zone").isin(zones: _*) &&
        col("l_orderkey").between(ZoneMaps.SkipLo, ZoneMaps.SkipHi))
    val plan = read.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*zone[^\\]]*\\]".r.findFirstIn(plan).isDefined,
      s"zone routing not applied as a partition filter:\n$plan")
    val expected = li.filter(col("l_orderkey")
      .between(ZoneMaps.SkipLo, ZoneMaps.SkipHi)).count()
    assert(read.collect().length.toLong === expected)
    val allFiles = spark.read.parquet(path).inputFiles.length
    val scan = read.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val pruned = scan.metrics("numFiles").value
    assert(pruned > 0, "scan metric never populated — assertion would be vacuous")
    assert(pruned < allFiles, s"no files pruned ($pruned of $allFiles)")
  }
}
