package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2 Part B row B47).
  *
  * Media assets are opaque `binary` columns plus a typed metadata struct —
  * the Spark-native form of the reference's `files: HashMap<String,String>`
  * chunk directory (/root/reference/src/lib.rs:24-27): the engine moves
  * and catalogs payloads it does not interpret.
  *
  * The decode/feature-extract step is a clearly marked STUB (this
  * container has no image/audio codecs): [[stubDecode]] produces a
  * deterministic fake feature vector from the bytes. The Spark-side
  * plumbing — schema, binary payloads, batch-shaped feature extraction,
  * partition-friendly layout — is real and tested; swapping the stub for
  * a true decoder (e.g. a pandas-UDF/`mapInPandas`-style batch decode in
  * PySpark, or a JNI codec here) changes one function.
  *
  * Scale: payloads stay in columnar storage next to their metadata;
  * feature extraction is embarrassingly parallel per partition; metadata
  * predicates (mime, size) push down so the binary column is never read
  * for filtered-out rows.
  */
object Multimodal {

  /** Derive a media-asset table: documents' text bytes play the payload
    * (deterministic stand-in for image/audio blobs). */
  def assets(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id").as("asset_id"),
        col("text").cast("binary").as("payload"),
        struct(
          when(pmod(col("doc_id"), lit(3)) === 0, "image/png")
            .when(pmod(col("doc_id"), lit(3)) === 1, "audio/wav")
            .otherwise("video/mp4").as("mime"),
          length(col("text").cast("binary")).cast("long").as("n_bytes"),
          (pmod(col("doc_id"), lit(4)) * 90).cast("int").as("rotation"))
          .as("meta"))

  /** STUB decoder: a real implementation would decode the media payload
    * (image pixels / audio samples) — unavailable in this container.
    * Deterministic fake: 8 features from byte-group sums, so tests and
    * oracles stay stable. The signature (binary → fixed-dim float
    * vector) is the real contract a codec drop-in must satisfy. */
  def stubDecode(payload: Column, dim: Int = 8): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (crc32(concat(payload, i.cast("string").cast("binary"))) % 1000).cast("double") / 1000.0)

  /** B47 `llm_multimodal`: metadata projection + stub feature extraction;
    * metadata-only predicates never touch the payload bytes. */
  def multimodal(s: SparkSession, d: String): DataFrame =
    assets(s, d)
      .filter(col("meta.n_bytes") > 50)
      .select(
        col("asset_id"),
        col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"),
        col("meta.rotation").as("rotation"),
        size(stubDecode(col("payload"))).as("feat_dim"))
      .orderBy("asset_id")

  /** `binaryFile` source demo: the lake directory itself as rows of
    * (path, length, content) — how raw media directories enter the
    * engine before cataloging. Rows-only (paths are environment-local).
    */
  def binaryFiles(s: SparkSession, d: String): DataFrame =
    s.read.format("binaryFile").load(d + "/*.parquet")
      .select(
        element_at(split(col("path"), "/"), -1).as("file_name"),
        col("length"))
      .orderBy("file_name")

  /** Frame sampling: treat each payload as fixed-size 32-byte "frames"
    * and keep every 4th frame — the Spark-side plumbing (offset math,
    * per-frame rows, batch shape) of video frame extraction with the
    * codec stubbed. One explode, no shuffle until the final ordering. */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    val frameSize = 32
    val stride = 4
    assets(s, d)
      .filter(col("asset_id") < 100)
      .select(col("asset_id"), col("payload"),
        floor(col("meta.n_bytes") / frameSize).cast("int").as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("asset_id"), col("payload"),
        explode(sequence(lit(0),
          greatest(expr(s"(n_frames - 1) div $stride"), lit(0)))).as("fidx"))
      .select(col("asset_id"),
        (col("fidx") * stride).as("frame_no"),
        length(col("payload").substr(
          col("fidx") * stride * frameSize + 1, lit(frameSize))).as("frame_len"))
      .orderBy("asset_id", "frame_no")
  }

  /** Batched decode contract — the Scala analog of a pandas-UDF
    * `mapInPandas` decode: rows stream through mapPartitions in
    * fixed-size batches (the shape a vectorized codec / model-inference
    * library wants), each batch "decoded" at once. The codec itself is
    * the [[stubDecode]]-equivalent STUB (no media libs in this
    * container); the partitioning, batch grouping, and output schema are
    * the real contract. */
  final case class DecodedAsset(assetId: Long, mime: String, featNorm: Double)
  def decodeBatched(s: SparkSession, d: String, batchSize: Int = 64):
      org.apache.spark.sql.Dataset[DecodedAsset] = {
    import s.implicits._
    assets(s, d)
      .select(col("asset_id"), col("payload"), col("meta.mime").as("mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // STUB batch decode: a real impl hands `batch.map(_._2)` to a
          // vectorized codec in one call; here: deterministic per-byte sum
          batch.map { case (id, payload, mime) =>
            val checksum = payload.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 997)
            DecodedAsset(id, mime, checksum / 997.0)
          }
        }
      }
  }

  /** Resize plumbing: strided downsample of the payload (every 4th byte)
    * plus the target-dimension metadata arithmetic — the offset/shape
    * math of an image resize with the pixel kernel stubbed. Exact
    * integer output → oracle-able. */
  def resize(s: SparkSession, d: String): DataFrame = {
    val stride = 4
    assets(s, d)
      .filter(col("asset_id") < 200)
      .select(
        col("asset_id"),
        col("meta.n_bytes").as("orig_bytes"),
        // ceil-div: bytes kept by an every-stride-th sample
        floor((col("meta.n_bytes") + stride - 1) / stride).cast("long").as("resized_bytes"),
        (col("meta.n_bytes") * 3).cast("long").as("est_rgb_bytes"),
        when(col("meta.rotation").isin(90, 270),
          concat_ws("x", lit(32), floor(col("meta.n_bytes") / 32).cast("long")))
          .otherwise(
            concat_ws("x", floor(col("meta.n_bytes") / 32).cast("long"), lit(32)))
          .as("target_shape"))
      .orderBy("asset_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_multimodal"   -> (multimodal(_, _)),
    "llm_frames"       -> (frameSample(_, _)),
    "llm_resize"       -> (resize(_, _)),
    "source_binaryfile" -> (binaryFiles(_, _))
  )

  def oracles: Map[String, String] = Map(
    // metadata plumbing is SQL-expressible; the stub decode contract is
    // covered by MultimodalSpec instead (crc32 not available in DuckDB)
    "llm_frames" ->
      """WITH a AS (
        |  SELECT doc_id AS asset_id, text,
        |    CAST(octet_length(CAST(text AS BLOB)) // 32 AS INT) AS n_frames
        |  FROM documents WHERE doc_id < 100 AND octet_length(CAST(text AS BLOB)) // 32 > 0),
        |f AS (
        |  SELECT asset_id, text,
        |    unnest(generate_series(0, greatest((n_frames - 1) // 4, 0))) AS fidx
        |  FROM a)
        |SELECT asset_id, CAST(fidx * 4 AS INT) AS frame_no,
        |  CAST(length(substring(text, CAST(fidx * 4 * 32 + 1 AS INT), 32)) AS INT) AS frame_len
        |FROM f ORDER BY asset_id, frame_no""".stripMargin,
    "llm_resize" ->
      """SELECT doc_id AS asset_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS orig_bytes,
        |  CAST((octet_length(CAST(text AS BLOB)) + 3) // 4 AS BIGINT) AS resized_bytes,
        |  CAST(octet_length(CAST(text AS BLOB)) * 3 AS BIGINT) AS est_rgb_bytes,
        |  CASE WHEN (doc_id % 4) * 90 IN (90, 270)
        |       THEN '32x' || CAST(octet_length(CAST(text AS BLOB)) // 32 AS VARCHAR)
        |       ELSE CAST(octet_length(CAST(text AS BLOB)) // 32 AS VARCHAR) || 'x32'
        |  END AS target_shape
        |FROM documents WHERE doc_id < 200 ORDER BY asset_id""".stripMargin,
    "llm_multimodal" ->
      """SELECT doc_id AS asset_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |       WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |       ELSE 'video/mp4' END AS mime,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  CAST((doc_id % 4) * 90 AS INT) AS rotation,
        |  8 AS feat_dim
        |FROM documents WHERE octet_length(CAST(text AS BLOB)) > 50
        |ORDER BY asset_id""".stripMargin
  )
}
