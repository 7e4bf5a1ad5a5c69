package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** The reference's chunk-catalog query surface re-expressed relationally
  * (SURVEY.md §2 Part B rows B5-B9).
  *
  * The reference (goshawk-3/datalake-worker) keeps a RocksDB range index
  * `(dataset_id ∥ block_start ∥ block_end) → chunk_id`
  * (/root/reference/src/rocksdb_storage_engine.rs:110-116, README.md:38-42)
  * plus an in-memory catalog (/root/reference/src/data_manager.rs:21-22).
  * Here the catalog is a DataFrame derived deterministically from `orders`
  * (FIXTURES.md §B): one chunk per (o_orderstatus = dataset, 100-orderkey
  * bucket = block range), half-open `[start, end)` ranges (code-wins rule,
  * SURVEY.md §1.1).
  *
  * Scale note: at 100 TB the catalog itself is small (1 row per chunk ≈
  * millions of rows for billions of blocks) — every op below is a narrow
  * aggregate/filter over it; the heavy table (`orders`) is touched once with
  * only 3 columns read (columnar pruning replaces the reference's
  * cf_chunks/index column-family split,
  * /root/reference/src/rocksdb_storage_engine.rs:13).
  */
object ChunkCatalog {

  /** Derived chunk catalog. Columns:
    * dataset_id, chunk_id, block_start, block_end (half-open), n_rows,
    * size_bytes. Decimal-exact size arithmetic so the DuckDB oracle hashes
    * identically (SURVEY.md §7.3 float discipline).
    */
  def catalog(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(
        col("o_orderstatus").as("dataset_id"),
        expr("o_orderkey div 100").as("bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        expr("CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(18,2)))) AS BIGINT)")
          .as("size_bytes"))
      .select(
        col("dataset_id"),
        concat_ws("_", col("dataset_id"), col("bucket")).as("chunk_id"),
        (col("bucket") * 100).as("block_start"),
        (col("bucket") * 100 + 100).as("block_end"),
        col("n_rows"),
        col("size_bytes"))

  /** Shared oracle CTE matching [[catalog]] exactly. */
  val catalogSql: String =
    """WITH catalog AS (
      |  SELECT dataset_id,
      |         dataset_id || '_' || CAST(bucket AS VARCHAR) AS chunk_id,
      |         bucket * 100 AS block_start,
      |         bucket * 100 + 100 AS block_end,
      |         n_rows, size_bytes
      |  FROM (
      |    SELECT o_orderstatus AS dataset_id, o_orderkey // 100 AS bucket,
      |           CAST(COUNT(*) AS BIGINT) AS n_rows,
      |           CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(18,2)))) AS BIGINT) AS size_bytes
      |    FROM orders GROUP BY 1, 2
      |  )
      |)""".stripMargin

  /** B5 `chunk_list` — the reference's `list_chunks` full catalog scan
    * (/root/reference/src/data_manager.rs:83-91). */
  def chunkList(spark: SparkSession, dir: String): DataFrame =
    catalog(spark, dir).orderBy("dataset_id", "block_start")

  /** B6 `chunk_find` — interval-containment lookup, the intent of
    * `find_chunk`/`find_chunk_id` (/root/reference/src/data_manager.rs:93-121,
    * /root/reference/src/rocksdb_storage_engine.rs:34-50 — the literal code
    * only probes exact `[n, n+1)` keys; we implement the README's containment
    * semantics, SURVEY.md Part A row A12). At scale: partition pruning on
    * dataset_id + parquet min/max skipping on block_start do the index's job.
    */
  def chunkFind(spark: SparkSession, dir: String): DataFrame = {
    val n = lit(150L) // probe block present at every scale factor
    catalog(spark, dir)
      .filter(col("block_start") <= n && n < col("block_end"))
      .select("dataset_id", "chunk_id", "block_start", "block_end")
      .orderBy("dataset_id")
  }

  /** B7 `chunk_delete` — cascading delete as an anti-join rewrite: catalog
    * minus a deleted-id set (/root/reference/src/rocksdb_storage_engine.rs:79-103
    * does a full-scan reverse-index cleanup; the left_anti join is its
    * relational form, SURVEY.md Part A row A14). Deleted set: every chunk
    * whose bucket ≡ 3 (mod 7). */
  def chunkDelete(spark: SparkSession, dir: String): DataFrame = {
    val cat = catalog(spark, dir)
    val deleted = cat
      .filter(expr("pmod(block_start div 100, 7) = 3"))
      .select("chunk_id")
    cat.join(broadcast(deleted), Seq("chunk_id"), "left_anti")
      .orderBy("dataset_id", "block_start")
  }

  /** B8 `chunk_quota` — quota admission (`MAX_SIZE_ON_DISK` check,
    * /root/reference/src/data_manager.rs:19, :229-239): chunks are admitted
    * in block order while the running size stays within half the dataset's
    * total (a relative cap so the query is meaningful at every sf). */
  def chunkQuota(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("dataset_id").orderBy("block_start")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    catalog(spark, dir)
      .withColumn("cum_bytes", sum("size_bytes").over(w))
      .withColumn("cap_bytes",
        expr("CAST(FLOOR(CAST(SUM(size_bytes) OVER (PARTITION BY dataset_id) AS DOUBLE) / 2) AS BIGINT)"))
      .withColumn("admitted", col("cum_bytes") <= col("cap_bytes"))
      .select("dataset_id", "chunk_id", "block_start", "cum_bytes", "cap_bytes", "admitted")
      .orderBy("dataset_id", "block_start")
  }

  /** B9 `chunk_dedup` — idempotent ingest: the catalog unioned with itself
    * (a replayed ingest batch) deduped back to one row per chunk id
    * (`Entry::Vacant` gate, /root/reference/src/data_manager.rs:223-256). */
  def chunkDedup(spark: SparkSession, dir: String): DataFrame = {
    val cat = catalog(spark, dir)
    cat.unionByName(cat)
      .groupBy("dataset_id", "chunk_id")
      .agg(
        count(lit(1)).as("n_ingested"),
        first("block_start").as("block_start"),
        first("size_bytes").as("size_bytes"))
      .select("dataset_id", "chunk_id", "n_ingested", "block_start", "size_bytes")
      .orderBy("dataset_id", "block_start")
  }

  /** Compaction PLANNER — the planning phase of Delta `OPTIMIZE` /
    * Iceberg `rewrite_data_files`, and the maintenance the reference's
    * quota daemon implies but never built (its cap check is the
    * admission half, /root/reference/src/data_manager.rs:229-239; a
    * real lake worker must also merge the small files the cap admits).
    * Greedy packing of block-ADJACENT chunks (order by block_start so
    * merged files keep contiguous ranges and the range index stays
    * prunable) into ≈ total/8 target-size groups per dataset. All
    * integer arithmetic (running sum, `div`) so both engines agree
    * exactly. Scale: the running-sum and per-dataset-total window
    * passes share one dataset_id exchange, then one aggregate — all
    * over catalog METADATA; the planner never touches chunk payloads,
    * and the rewrite it emits is embarrassingly parallel per group. */
  def chunkCompact(spark: SparkSession, dir: String): DataFrame = {
    val run = Window.partitionBy("dataset_id").orderBy("block_start")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    catalog(spark, dir)
      .withColumn("cum", sum("size_bytes").over(run))
      .withColumn("target",
        greatest(expr("SUM(size_bytes) OVER (PARTITION BY dataset_id) div 8"),
          lit(1L)))
      .withColumn("group_id",
        expr("(cum - size_bytes) div target").cast("int"))
      .groupBy("dataset_id", "group_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum("size_bytes").as("total_bytes"),
        min("block_start").as("block_start"),
        max("block_end").as("block_end"))
      .orderBy("dataset_id", "group_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "chunk_list"    -> (chunkList(_, _)),
    "chunk_find"    -> (chunkFind(_, _)),
    "chunk_delete"  -> (chunkDelete(_, _)),
    "chunk_quota"   -> (chunkQuota(_, _)),
    "chunk_dedup"   -> (chunkDedup(_, _)),
    "chunk_compact" -> (chunkCompact(_, _))
  )

  def oracles: Map[String, String] = Map(
    "chunk_list" ->
      s"""$catalogSql
         |SELECT dataset_id, chunk_id, block_start, block_end, n_rows, size_bytes
         |FROM catalog ORDER BY dataset_id, block_start""".stripMargin,
    "chunk_find" ->
      s"""$catalogSql
         |SELECT dataset_id, chunk_id, block_start, block_end FROM catalog
         |WHERE block_start <= 150 AND 150 < block_end ORDER BY dataset_id""".stripMargin,
    "chunk_delete" ->
      s"""$catalogSql
         |SELECT chunk_id, dataset_id, block_start, block_end, n_rows, size_bytes
         |FROM catalog
         |WHERE chunk_id NOT IN (
         |  SELECT chunk_id FROM catalog WHERE (block_start // 100) % 7 = 3)
         |ORDER BY dataset_id, block_start""".stripMargin,
    "chunk_quota" ->
      s"""$catalogSql
         |SELECT dataset_id, chunk_id, block_start,
         |       CAST(SUM(size_bytes) OVER (PARTITION BY dataset_id ORDER BY block_start
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_bytes,
         |       CAST(FLOOR(CAST(SUM(size_bytes) OVER (PARTITION BY dataset_id) AS DOUBLE) / 2) AS BIGINT) AS cap_bytes,
         |       CAST(SUM(size_bytes) OVER (PARTITION BY dataset_id ORDER BY block_start
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |         <= CAST(FLOOR(CAST(SUM(size_bytes) OVER (PARTITION BY dataset_id) AS DOUBLE) / 2) AS BIGINT) AS admitted
         |FROM catalog ORDER BY dataset_id, block_start""".stripMargin,
    "chunk_dedup" ->
      s"""$catalogSql
         |SELECT dataset_id, chunk_id, CAST(COUNT(*) AS BIGINT) AS n_ingested,
         |       MIN(block_start) AS block_start, MIN(size_bytes) AS size_bytes
         |FROM (SELECT * FROM catalog UNION ALL SELECT * FROM catalog)
         |GROUP BY dataset_id, chunk_id ORDER BY dataset_id, block_start""".stripMargin,
    "chunk_compact" ->
      s"""$catalogSql
         |SELECT dataset_id, group_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
         |       CAST(SUM(size_bytes) AS BIGINT) AS total_bytes,
         |       MIN(block_start) AS block_start, MAX(block_end) AS block_end
         |FROM (
         |  SELECT dataset_id, block_start, block_end, size_bytes,
         |    CAST((cum - size_bytes) // target AS INT) AS group_id
         |  FROM (
         |    SELECT dataset_id, block_start, block_end, size_bytes,
         |      SUM(size_bytes) OVER (PARTITION BY dataset_id ORDER BY block_start
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |      GREATEST(SUM(size_bytes) OVER (PARTITION BY dataset_id) // 8, 1) AS target
         |    FROM catalog))
         |GROUP BY dataset_id, group_id ORDER BY dataset_id, group_id""".stripMargin
  )
}
