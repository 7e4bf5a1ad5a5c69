package graft

/** Typed-catalog surface: encoder round-trip, containment semantics,
  * typed transformations agree with the DataFrame catalog. */
class ChunkMetaSpec extends SparkSpec {
  import spark.implicits._

  test("typed catalog equals the DataFrame catalog row-for-row") {
    val typed = ChunkMeta.catalog(spark, sf).collect()
    val df = operators.ChunkCatalog.catalog(spark, sf).count()
    assert(typed.length.toLong == df)
    assert(typed.forall(c => c.blockStart < c.blockEnd))
    assert(typed.forall(c => c.id == s"${c.datasetId}_${c.blockStart / 100}"))
    assert(typed.forall(c => c.files.keySet == Set("data.parquet")))
  }

  test("typed containment matches the relational predicate") {
    val cat = ChunkMeta.catalog(spark, sf)
    val typedHits = cat.filter(_.contains(150L)).map(_.id).collect().sorted
    val dfHits = operators.ChunkCatalog.chunkFind(spark, sf)
      .select("chunk_id").as[String].collect().sorted
    assert(typedHits.toSeq == dfHits.toSeq)
  }

  test("typed groupByKey aggregation (per-dataset chunk count)") {
    val counts = ChunkMeta.catalog(spark, sf)
      .groupByKey(_.datasetId)
      .count()
      .collect().toMap
    assert(counts.keySet == Set("F", "O", "P"))
    assert(counts.values.forall(_ > 0))
  }
}
