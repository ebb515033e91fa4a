package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated fixture tables (TESTDATA.md).
  *
  * All tables are parquet; reads are schema-on-file so Catalyst can push
  * column pruning + predicates into the vectorized parquet scan. At 100 TB
  * these would be partitioned/bucketed tables behind a catalog — the
  * functions here keep the access path narrow (one place to add partition
  * pruning keys) without changing call sites.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /** `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS); Spark has no
    * nanosecond timestamp type and rejects the file outright
    * ([PARQUET_TYPE_ILLEGAL]). The legacy conf reads it as epoch-nanos
    * BIGINT — set here (runtime-settable SQLConf) so every session that
    * reaches events gets it, however the session was built. Downstream
    * operators treat time as integer epoch-µs (see graft.events.Events).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, sfDir, "events")
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
