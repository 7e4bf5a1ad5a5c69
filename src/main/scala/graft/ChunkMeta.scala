package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed catalog row — mirrors the reference's `DataChunk`
  * (/root/reference/src/lib.rs:17-28) with the operational fields the
  * reference stubs (`sizeBytes`: get_total_allocated_size TODO at
  * /root/reference/src/rocksdb_storage_engine.rs:143-148; `path`:
  * chunk_path todo!() at :138-141). FIXTURES.md §B; SURVEY.md §1.4.
  *
  * Ids are hex strings at this API edge (the reference prints hex,
  * /root/reference/src/bin/main.rs:74-77); `[blockStart, blockEnd)` is
  * half-open (code-wins rule, SURVEY.md §1.1).
  */
final case class ChunkMeta(
    id: String,
    datasetId: String,
    blockStart: Long,
    blockEnd: Long,
    files: Map[String, String],
    sizeBytes: Long,
    path: String) {
  /** Containment probe, the reference's find semantics (A7/A12). */
  def contains(blockNumber: Long): Boolean =
    blockStart <= blockNumber && blockNumber < blockEnd
}

object ChunkMeta {
  /** The orders-derived catalog as a typed Dataset — compile-time field
    * checks for engine code paths (the `Encoders.product` surface), while
    * the DataFrame view serves dynamic queries. */
  def catalog(spark: SparkSession, dir: String): Dataset[ChunkMeta] = {
    import spark.implicits._
    operators.ChunkCatalog.catalog(spark, dir)
      .select(
        col("chunk_id").as("id"),
        col("dataset_id").as("datasetId"),
        col("block_start").as("blockStart"),
        col("block_end").as("blockEnd"),
        map(lit("data.parquet"),
          concat(lit("lake://chunks/"), col("chunk_id"))).as("files"),
        col("size_bytes").as("sizeBytes"),
        concat(lit("/lake/chunks/"), col("chunk_id")).as("path"))
      .as[ChunkMeta]
  }
}
