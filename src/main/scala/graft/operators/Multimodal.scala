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
          length(col("text")).cast("long").as("n_bytes"),
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_multimodal"   -> (multimodal(_, _)),
    "source_binaryfile" -> (binaryFiles(_, _))
  )

  def oracles: Map[String, String] = Map(
    // metadata plumbing is SQL-expressible; the stub decode contract is
    // covered by MultimodalSpec instead (crc32 not available in DuckDB)
    "llm_multimodal" ->
      """SELECT doc_id AS asset_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |       WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |       ELSE 'video/mp4' END AS mime,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  CAST((doc_id % 4) * 90 AS INT) AS rotation,
        |  8 AS feat_dim
        |FROM documents WHERE length(text) > 50
        |ORDER BY asset_id""".stripMargin
  )
}
