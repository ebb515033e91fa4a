package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zone maps — file/partition-level min-max data skipping, the lake
  * layout primitive that lets a 100 TB range query touch only the bytes
  * that can match.
  *
  * The layout: rows land in fixed-width key ZONES (`zone =
  * key div [[ZoneWidth]]` — pure map-side arithmetic, no sampling, no
  * global sort, deterministic at any scale; contrast
  * `repartitionByRange`, whose sampled boundaries change run to run and
  * could never hash-match an oracle). The MANIFEST ([[zoneMap]]) records
  * per zone the actual min/max/count — the same per-file statistics
  * parquet footers and table formats (Iceberg/Delta manifests) carry.
  * A reader with a `key BETWEEN lo AND hi` predicate consults the
  * manifest, keeps only zones whose [min,max] intersects the range, and
  * scans nothing else; ZoneMapsSpec proves the physical version
  * end-to-end (zone-partitioned write → manifest-driven zone selection →
  * `PartitionFilters` pruned scan → identical result to the full scan).
  *
  * Fixed-width zones inherit the key distribution's skew in their row
  * counts — which [[zoneMap]] SHOWS (it doubles as the occupancy-family
  * report for the layout: a hot zone is visible as its `n_rows`), and
  * [[zoneSkip]] prices: for a given predicate, how many zones and rows
  * the manifest skips vs the exact match count. No false negatives by
  * construction: a zone whose [min,max] misses the range can hold no
  * matching row.
  *
  * Keys are assumed non-negative (orderkeys, doc ids, epoch days —
  * every key here): Spark's `div` truncates toward zero while DuckDB's
  * `//` floors, so negative keys would zone differently cross-engine. */
object ZoneMaps {

  /** 512 keys per zone: ≥3 zones at the smallest fixture, ~300 at
    * sf0.1; a production lake picks width from target file size
    * (rows·bytes/row ≈ 128 MB–1 GB per zone), same operator. */
  val ZoneWidth = 512L

  /** The audited range predicate of the `zone_skip` entry — chosen to
    * hit the key space's low end at every fixture SF so some zones
    * always prune. */
  val SkipLo = 300L
  val SkipHi = 899L

  /** The zone id of a key expression — exposed so writers and specs
    * derive the partition column from ONE definition. */
  def zoneExpr(key: String): Column = expr(s"$key div $ZoneWidth")

  /** `(zone, min_key, max_key, n_rows)` — the manifest: ONE map-side
    * zone computation + a partial-aggregated rollup to ≤|key range|/width
    * rows. THIS tiny relation is what a deployment persists next to the
    * data and consults before every range scan. */
  def zoneMap(df: DataFrame, key: String): DataFrame =
    df.groupBy(zoneExpr(key).as("zone"))
      .agg(min(col(key)).as("min_key"), max(col(key)).as("max_key"),
        count(lit(1)).as("n_rows"))

  /** The skipping audit, one row: for `key BETWEEN [[SkipLo]] AND
    * [[SkipHi]]`, how many zones/rows the manifest keeps vs skips, and
    * the exact match count inside the kept zones — `n_rows_scanned ≥
    * n_rows_match` always (no false negatives), and the gap is the
    * zone-granularity overshoot a narrower width would shrink. Cost:
    * the manifest rollup + ONE exact-count scan; the two one-row sides
    * attach via the checkpointed constant-key broadcast (the bpeMerges
    * idiom — never a foldable-literal nested loop). */
  def zoneSkip(df: DataFrame, key: String): DataFrame = {
    val hit = col("max_key") >= SkipLo && col("min_key") <= SkipHi
    val zstats = zoneMap(df, key)
      .agg(count(lit(1)).as("n_zones"),
        sum(when(hit, 1L).otherwise(0L)).as("n_zones_hit"),
        sum(col("n_rows")).as("n_rows_total"),
        sum(when(hit, col("n_rows")).otherwise(0L)).as("n_rows_scanned"))
      .withColumn("k", lit(1)).localCheckpoint()
    val mstats = df.filter(col(key).between(SkipLo, SkipHi))
      .agg(count(lit(1)).as("n_rows_match"))
      .withColumn("k", lit(1)).localCheckpoint()
    zstats.join(broadcast(mstats), Seq("k"))
      .select(col("n_zones"), col("n_zones_hit"), col("n_rows_total"),
        col("n_rows_scanned"), col("n_rows_match"),
        expr("((n_rows_total - n_rows_scanned) * 1000000L) div n_rows_total")
          .as("skip_millionths"))
  }

  /** Merge two zone manifests — the MERGEABILITY that makes the zone
    * map a nightly-maintainable artifact (the HLL/CMS/KMV discipline:
    * min, max and count are all mergeable, so a shard's manifest folds
    * into the persisted one without rescanning the lake):
    * zoneMap(A ∪ B) = zoneMapMerge(zoneMap(A), zoneMap(B)) EXACTLY —
    * the `incremental_zone_map` entry's oracle is the whole-table
    * manifest, so the hash match IS the merge theorem (the
    * incremental_cms precedent). Cost: a ≤zones-sized union + rollup —
    * the new shard is the only data scanned. */
  def zoneMapMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("zone")
      .agg(min("min_key").as("min_key"), max("max_key").as("max_key"),
        sum("n_rows").as("n_rows"))

  /** Target shard count for [[compactionPlan]]. */
  val CompactShards = 8L

  /** The compaction planner — equi-depth re-sharding FROM THE MANIFEST:
    * fixed-width zones inherit the key distribution's skew in their row
    * counts, and a lake compactor periodically rebins them into
    * [[CompactShards]] contiguous, roughly equal-row shards. Assignment
    * is closed-form from the manifest alone: shard(zone) =
    * rows_before(zone)·S div total — a running-sum window over the
    * ≤|keyspace/width|-row manifest (NEVER the data; the plan costs an
    * index read), monotone in zone order so every shard is a contiguous
    * key range and stays zone-map-prunable after the rewrite. The
    * output is the instruction list a rewrite job executes with
    * [[Sinks.overwritePartitionsDynamic]].
    *
    * Exact-int discipline: cum·S div total ∈ [0, S), floors absorb the
    * remainder; a shard's row total deviates from ideal by at most one
    * zone's rows (the bin-packing granularity the width choice sets). */
  def compactionPlan(df: DataFrame, key: String,
      nShards: Long = CompactShards): DataFrame = {
    // running sum over the tiny manifest: an unpartitioned window is
    // deliberate here — the manifest is zones-sized, not corpus-sized
    // (the corpusMix scalar-window precedent)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("zone").rowsBetween(Long.MinValue, -1)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    zoneMap(df, key)
      .withColumn("cum", coalesce(sum("n_rows").over(w), lit(0L)))
      .withColumn("total", sum("n_rows").over(wAll))
      .select(col("zone"), col("min_key"), col("max_key"), col("n_rows"),
        expr(s"(cum * ${nShards}L) div total").as("shard"))
  }

  /** Oracle twin of [[compactionPlan]]. */
  def compactionPlanSql(table: String = "lineitem", key: String = "l_orderkey",
      nShards: Long = CompactShards): String =
    s"""WITH zm AS (
       |  SELECT $key // $ZoneWidth AS zone,
       |    min($key) AS min_key, max($key) AS max_key,
       |    CAST(count(*) AS BIGINT) AS n_rows
       |  FROM $table GROUP BY 1
       |),
       |c AS (
       |  SELECT zone, min_key, max_key, n_rows,
       |    CAST(coalesce(sum(n_rows) OVER (ORDER BY zone
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum,
       |    CAST(sum(n_rows) OVER () AS BIGINT) AS total
       |  FROM zm
       |)
       |SELECT zone, min_key, max_key, n_rows,
       |  CAST((cum * $nShards) // total AS BIGINT) AS shard
       |FROM c
       |ORDER BY zone, min_key, max_key, n_rows, shard""".stripMargin

  /** Oracle twin of [[zoneMap]] over the lineitem key. */
  def zoneMapSql(table: String = "lineitem", key: String = "l_orderkey"): String =
    s"""SELECT $key // $ZoneWidth AS zone,
       |  min($key) AS min_key, max($key) AS max_key,
       |  CAST(count(*) AS BIGINT) AS n_rows
       |FROM $table GROUP BY 1
       |ORDER BY zone, min_key, max_key, n_rows""".stripMargin

  /** Oracle twin of [[zoneSkip]]. */
  def zoneSkipSql(table: String = "lineitem", key: String = "l_orderkey"): String =
    s"""WITH zm AS (
       |  SELECT $key // $ZoneWidth AS zone,
       |    min($key) AS min_key, max($key) AS max_key,
       |    CAST(count(*) AS BIGINT) AS n_rows
       |  FROM $table GROUP BY 1
       |),
       |zstats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_zones,
       |    CAST(sum(CASE WHEN max_key >= $SkipLo AND min_key <= $SkipHi THEN 1 ELSE 0 END) AS BIGINT) AS n_zones_hit,
       |    CAST(sum(n_rows) AS BIGINT) AS n_rows_total,
       |    CAST(sum(CASE WHEN max_key >= $SkipLo AND min_key <= $SkipHi THEN n_rows ELSE 0 END) AS BIGINT) AS n_rows_scanned
       |  FROM zm
       |),
       |mstats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_rows_match
       |  FROM $table WHERE $key BETWEEN $SkipLo AND $SkipHi
       |)
       |SELECT n_zones, n_zones_hit, n_rows_total, n_rows_scanned, n_rows_match,
       |  CAST(((n_rows_total - n_rows_scanned) * 1000000) // n_rows_total AS BIGINT)
       |    AS skip_millionths
       |FROM zstats CROSS JOIN mstats""".stripMargin
}
