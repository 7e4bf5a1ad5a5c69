package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: binary payloads survive the round trip, stub
  * decode is deterministic with a fixed dim, binaryFile source reads. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("assets: payload bytes equal the source text bytes") {
    val a = Multimodal.assets(spark, sf)
      .select(col("asset_id"), col("payload").cast("string").as("t"))
      .as[(Long, String)].collect().toMap
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(a == docs)
  }

  test("stub decode: fixed dim, values in [0,1), deterministic") {
    val f1 = Multimodal.assets(spark, sf).limit(10)
      .select(Multimodal.stubDecode(col("payload")).as("f")).as[Seq[Double]].collect()
    val f2 = Multimodal.assets(spark, sf).limit(10)
      .select(Multimodal.stubDecode(col("payload")).as("f")).as[Seq[Double]].collect()
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(_.length == 8))
    assert(f1.flatten.forall(v => v >= 0.0 && v < 1.0))
  }

  test("metadata filter does not read payload bytes (column pruning)") {
    val df = Multimodal.assets(spark, sf)
      .filter(col("meta.n_bytes") > 50)
      .select("asset_id", "meta.mime")
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("documents")).getOrElse(fail("no scan"))
    // payload derives from text; only doc_id + text needed — but the
    // projected output needs no payload column materialized
    assert(!df.columns.contains("payload"))
    assert(scan.contains("ReadSchema"))
  }

  test("batched decode: every asset decoded once, deterministic, batch-size independent") {
    val a = Multimodal.decodeBatched(spark, sf, batchSize = 64).collect()
      .map(r => r.assetId -> r.featNorm).toMap
    val b = Multimodal.decodeBatched(spark, sf, batchSize = 7).collect()
      .map(r => r.assetId -> r.featNorm).toMap
    assert(a == b) // batch grouping must not change results
    assert(a.size == Tables.documents(spark, sf).count())
    assert(a.values.forall(v => v >= 0.0 && v < 1.0))
  }

  test("corrupt JSON records surface in PERMISSIVE mode instead of failing the job") {
    import spark.implicits._
    val raw = Seq("""{"k": 1}""", """{"k": broken""", """{"k": 3}""")
      .toDF("props")
    val parsed = raw.select(
      from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("j"))
    val ks = parsed.select($"j.k").as[Option[Int]].collect()
    // PERMISSIVE (default): malformed row → null struct, job completes
    assert(ks.count(_.isDefined) == 2 && ks.count(_.isEmpty) == 1)
  }

  test("binaryFile source lists the lake directory deterministically") {
    val rows = Multimodal.binaryFiles(spark, sf)
      .as[(String, Long)].collect()
    assert(rows.length == 10) // ten testdata tables
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
    assert(rows.forall(_._2 > 0))
  }
}
