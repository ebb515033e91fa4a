package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink helpers for the layouts a 100 TB deployment stores.
  *
  * The fixture tables are flat single files (fine for the correctness
  * gate); at scale a documents/events lake is directory-partitioned so
  * queries filtering on the partition key scan only the matching
  * directories — the read path's `PartitionFilters`, proven in
  * `SinksSpec`, is what keeps a per-language or per-day query from
  * touching unrelated bytes.
  */
object Sinks {

  /** Partitioned parquet: one directory level per partition column, e.g.
    * `path/lang=en/...`. Low-cardinality keys only (each value is a
    * directory): lang/source/date, never doc_id.
    *
    * `mode` defaults to Overwrite, WHICH DELETES THE ENTIRE TARGET TREE —
    * appending a shard to an existing lake must pass `SaveMode.Append`
    * (or set `spark.sql.sources.partitionOverwriteMode=dynamic` to
    * overwrite only the partitions present in `df`). */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(cols: _*).parquet(path)
}
