package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries take `(spark, sfDir)` and resolve tables through here so the
  * whole engine reads through one place. At 100 TB the same API would point
  * at `s3a://` lake paths (the reference downloads chunks from S3,
  * /root/reference/src/data_manager.rs:195-209); locally it is the testdata
  * dir. Parquet scans are columnar + predicate-pushdown-friendly, replacing
  * the reference's row-oriented RocksDB point reads
  * (/root/reference/src/rocksdb_storage_engine.rs:48).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map
    * to its µs TimestampType. Read it as raw nanos (legacy conf) and
    * truncate to µs explicitly — the same truncation DuckDB applies when
    * casting TIMESTAMP_NS to TIMESTAMP, keeping oracle parity (FIXTURES.md).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
