package graft.sources

import org.apache.spark.sql.DataFrame

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
    * directory): lang/source/date, never doc_id. */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)
}
