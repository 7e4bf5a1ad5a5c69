package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's ingest pipeline (SURVEY.md §2 Part A rows A2-A5, A15,
  * A18) re-expressed as one Spark batch job.
  *
  * Reference flow (/root/reference/src/data_manager.rs:188-276): download
  * chunk → decode → dedup-on-id (`Entry::Vacant` gate, :223-256) → quota
  * admission (`MAX_SIZE_ON_DISK`, :19, :229-239) → transactional persist
  * (/root/reference/src/rocksdb_storage_engine.rs:105-136) with rollback
  * on error (:258-275).
  *
  * Spark restatement: source read → `left_anti` dedup against the catalog
  * → cumulative-size quota gate → atomic `append` write (Spark's job
  * commit protocol plays the optimistic transaction, SURVEY.md §3.1).
  * Immutable files make the reference's semaphore pinning/rollback
  * machinery unnecessary (SURVEY.md §1.4).
  *
  * Scale: the anti-join ships only 32-byte ids; the quota check is one
  * aggregate over the (small) catalog, mirroring the reference's "fast
  * (a bit inaccurate)" pre-check comment (:229-231) — admission is
  * evaluated against the catalog total at job start, not re-checked
  * per-row.
  */
object Ingest {

  /** Engine error ADT — models `Error` (/root/reference/src/lib.rs:47-59). */
  sealed trait IngestError
  /** `Error::MaxSizeAllocated` (/root/reference/src/lib.rs:51-52). */
  final case class MaxSizeAllocated(wouldBe: Long, cap: Long) extends IngestError

  final case class IngestResult(
      ingested: Long, deduped: Long, rejected: Option[IngestError])

  /** Hadoop FileSystem for `path` — resolves by URI scheme, so the same
    * code serves `file://` (local, tested) and `s3a://`/`hdfs://` (cluster)
    * without change; raw `java.io.File` would pin the catalog to local
    * disk, which has no 100 TB analog. */
  private def fsFor(spark: SparkSession, path: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Atomically promote a rewritten catalog at `tmp` over `dst` by
    * renaming the live catalog ASIDE first (never delete-then-rename: a
    * crash between those two steps would leave no live catalog at all).
    * Every crash window leaves a complete catalog at `dst` or at the
    * aside path, so recovery is a single rename — and on `s3a://`,
    * where rename is itself a non-atomic copy, the live data is still
    * never the thing mid-copy. A fresh (not-yet-created) `dst` promotes
    * without an aside step; `FileSystem.delete` returning false for a
    * missing path must not read as failure. Package-visible so
    * IngestSpec can drive the failure branches through a FileSystem
    * wrapper that vetoes the target rename. */
  private[graft] def promote(fs: org.apache.hadoop.fs.FileSystem,
      tmp: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path,
      what: String): Unit = {
    val aside = new org.apache.hadoop.fs.Path(dst.toString + "_old")
    if (fs.exists(aside) && !fs.delete(aside, true))
      throw new IllegalStateException(
        s"$what: could not clear stale aside $aside; rewrite left at $tmp")
    if (fs.exists(dst) && !fs.rename(dst, aside))
      throw new IllegalStateException(
        s"$what: could not move live catalog $dst aside; rewrite left at $tmp")
    if (!fs.rename(tmp, dst)) {
      // restore the previous catalog so the failure is non-destructive
      if (fs.exists(aside)) fs.rename(aside, dst)
      throw new IllegalStateException(
        s"$what: rename $tmp -> $dst failed; previous catalog restored")
    }
    // best-effort: a leftover aside is cleared by the next promote
    if (fs.exists(aside)) fs.delete(aside, true)
  }

  /** Expected catalog schema: chunk_id, dataset_id, block_start,
    * block_end, size_bytes (+ free columns). */
  def readCatalog(spark: SparkSession, catalogPath: String): DataFrame = {
    // partitionBy nests files under dataset_id=<v>/ dirs — probe with a
    // recursive listing (on object stores this is one LIST call, not a
    // directory walk)
    val (fs, p) = fsFor(spark, catalogPath)
    def hasParquet: Boolean = {
      val it = fs.listFiles(p, true)
      var found = false
      while (!found && it.hasNext) found = it.next().getPath.getName.endsWith(".parquet")
      found
    }
    if (fs.exists(p) && hasParquet)
      spark.read.parquet(catalogPath)
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "chunk_id STRING, dataset_id STRING, block_start BIGINT, " +
            "block_end BIGINT, size_bytes BIGINT"))
  }

  /** Ingest a batch of chunk rows into the catalog at `catalogPath`.
    *
    * 1. dedup within the batch (first occurrence per chunk_id wins) and
    *    against already-persisted ids (idempotent replay, A4);
    * 2. quota: if existing + incoming total exceeds `maxSizeOnDisk`,
    *    reject the whole batch with [[MaxSizeAllocated]] (the reference
    *    rejects per-chunk; batch-level is the job-granularity analog);
    * 3. atomic append, partitioned by dataset_id so lookups prune.
    */
  def ingest(spark: SparkSession, catalogPath: String, batch: DataFrame,
      maxSizeOnDisk: Long = 1000000000000L): IngestResult = {
    val catalog = readCatalog(spark, catalogPath)
    val fresh = batch
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("chunk_id")
          // order by every column so the kept row is deterministic even
          // when a batch re-sends a chunk_id with corrected fields
          .orderBy("dataset_id", "block_start", "block_end", "size_bytes")))
      .filter(col("rn") === 1).drop("rn")
      .join(catalog.select("chunk_id"), Seq("chunk_id"), "left_anti")
      .cache()
    try {
      val freshCount = fresh.count()
      val deduped = batch.count() - freshCount
      val existing = catalog.agg(coalesce(sum("size_bytes"), lit(0L))).head.getLong(0)
      val incoming = fresh.agg(coalesce(sum("size_bytes"), lit(0L))).head.getLong(0)
      if (existing + incoming > maxSizeOnDisk) {
        IngestResult(0, deduped, Some(MaxSizeAllocated(existing + incoming, maxSizeOnDisk)))
      } else {
        if (freshCount > 0)
          // sortWithinPartitions(block_start) at write time: tight parquet
          // min/max row-group stats per file — the columnar replacement for
          // the reference's order-preserving big-endian key clustering
          // (/root/reference/src/rocksdb_storage_engine.rs:180-192)
          fresh.sortWithinPartitions("dataset_id", "block_start")
            .write.mode(SaveMode.Append)
            .partitionBy("dataset_id").parquet(catalogPath)
        IngestResult(freshCount, deduped, None)
      }
    } finally fresh.unpersist()
  }

  /** A7 read path over the persisted catalog: interval-containment lookup
    * with dataset partition pruning (replaces the RocksDB range-index
    * probe, /root/reference/src/rocksdb_storage_engine.rs:34-50). */
  /** Dead-letter decode lane: split a raw text batch into typed good
    * rows and quarantined rows WITH a reason, in ONE cached scan — the
    * production answer to the reference ingest's per-chunk decode
    * `Result` (/root/reference/src/data_manager.rs): at 100 TB a single
    * malformed row must neither kill the job (ANSI throw) nor vanish
    * silently (permissive-null), it must land in a quarantine table a
    * human can replay. All parse lanes are `try_cast` (NULL, never
    * throw); reason precedence is fixed (arity → field casts → range)
    * so the verdict is deterministic per line.
    *
    * The two lanes share ONE cached parse; the cache is owned by the
    * returned [[DecodedBatch]] — call `release()` once both lanes are
    * written, or repeated ingest batches accrete cached partitions for
    * the session lifetime. */
  def decodeWithQuarantine(raw: DataFrame): DecodedBatch = {
    // get() (not [i]) — ANSI mode makes [i] THROW on a short split, the
    // exact failure class this lane exists to absorb
    val f = split(col("line"), ",")
    val parsed = raw
      .select(col("line"), coalesce(get(f, lit(0)), lit("")).as("chunk_id"),
        expr("try_cast(get(split(line, ','), 1) AS BIGINT)").as("dataset_id"),
        expr("try_cast(get(split(line, ','), 2) AS BIGINT)").as("block_start"),
        expr("try_cast(get(split(line, ','), 3) AS BIGINT)").as("block_end"),
        expr("try_cast(get(split(line, ','), 4) AS BIGINT)").as("size_bytes"),
        size(f).as("arity"))
      .withColumn("reason",
        when(col("arity") =!= 5, "wrong_arity")
          .when(length(col("chunk_id")) === 0, "empty_chunk_id")
          .when(col("dataset_id").isNull, "bad_dataset_id")
          .when(col("block_start").isNull || col("block_end").isNull, "bad_block_range")
          .when(col("size_bytes").isNull, "bad_size")
          .when(col("block_end") < col("block_start"), "inverted_range")
          .when(col("size_bytes") < 0, "negative_size")
          .otherwise(lit(null)))
      .cache() // one scan feeds both lanes; never parse the batch twice
    val good = parsed.filter(col("reason").isNull)
      .select("chunk_id", "dataset_id", "block_start", "block_end", "size_bytes")
    val quarantined = parsed.filter(col("reason").isNotNull)
      .select("line", "reason")
    DecodedBatch(good, quarantined, parsed)
  }

  /** Result of [[decodeWithQuarantine]]: both lanes derive from the one
    * cached `parsed` scan; the caller must [[release]] after writing
    * both lanes (the lanes stay usable, recomputed from source). */
  final case class DecodedBatch(good: DataFrame, quarantined: DataFrame,
      private val parsed: DataFrame) {
    def release(): Unit = { parsed.unpersist(blocking = false); () }
  }

  def findChunk(spark: SparkSession, catalogPath: String,
      datasetId: String, blockNumber: Long): DataFrame =
    readCatalog(spark, catalogPath)
      .filter(col("dataset_id") === datasetId &&
        col("block_start") <= blockNumber && lit(blockNumber) < col("block_end"))

  /** Catalog compaction: rewrite each dataset partition's accumulated
    * small append files into one sorted file (the small-files problem —
    * every append job adds files; scans degrade as file count grows).
    * Atomic directory swap like [[deleteChunk]]; readers on the old
    * snapshot are unaffected. Returns the row count. */
  def compact(spark: SparkSession, catalogPath: String): Long = {
    val cat = readCatalog(spark, catalogPath)
    val n = cat.count()
    val tmp = catalogPath + "_compact"
    cat.repartition(col("dataset_id"))
      .sortWithinPartitions("dataset_id", "block_start")
      .write.mode(SaveMode.Overwrite).partitionBy("dataset_id").parquet(tmp)
    val (fs, dst) = fsFor(spark, catalogPath)
    promote(fs, new org.apache.hadoop.fs.Path(tmp), dst, "compact")
    n
  }

  /** A8/A14 delete path: rewrite the catalog without the chunk id —
    * atomic overwrite; concurrent readers keep their snapshot (the
    * drain-readers semantics for free, SURVEY.md §3.3). */
  def deleteChunk(spark: SparkSession, catalogPath: String, chunkId: String): Long = {
    val remaining = readCatalog(spark, catalogPath).filter(col("chunk_id") =!= chunkId)
    val n = remaining.count()
    val tmp = catalogPath + "_rewrite"
    remaining.write.mode(SaveMode.Overwrite).partitionBy("dataset_id").parquet(tmp)
    val (fs, dst) = fsFor(spark, catalogPath)
    promote(fs, new org.apache.hadoop.fs.Path(tmp), dst, "deleteChunk")
    n
  }
}
