package graft

import org.apache.spark.sql.functions._
import graft.operators.ChunkCatalog

/** Catalog-op semantics on tiny literal fixtures (FIXTURES.md §B edge
  * cases): containment at start / end-1 / end, dedup idempotence,
  * quota monotonicity, delete-then-find = None. */
class ChunkCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val cat = Seq(
    // (dataset_id, chunk_id, block_start, block_end, size_bytes)
    ("D1", "D1_0", 0L, 100L, 10L),
    ("D1", "D1_1", 100L, 120L, 20L),
    ("D1", "D1_2", 120L, 1000L, 30L),
    ("D2", "D2_0", 50L, 60L, 40L)
  ).toDF("dataset_id", "chunk_id", "block_start", "block_end", "size_bytes")

  private def find(ds: String, n: Long): Seq[String] =
    cat.filter($"dataset_id" === ds && $"block_start" <= n && lit(n) < $"block_end")
      .select("chunk_id").as[String].collect().toSeq

  test("containment: half-open [start, end) — probe at start hits") {
    assert(find("D1", 0L) == Seq("D1_0"))
    assert(find("D1", 100L) == Seq("D1_1"))
  }

  test("containment: probe at end-1 hits, at end misses") {
    assert(find("D1", 99L) == Seq("D1_0"))
    assert(find("D1", 119L) == Seq("D1_1"))
    assert(find("D1", 1000L).isEmpty) // past last chunk
    assert(find("D2", 60L).isEmpty)   // exactly at end → next chunk's territory
  }

  test("containment: absent dataset → empty (reference find_chunk None)") {
    assert(find("NOPE", 10L).isEmpty)
  }

  test("dedup is idempotent: dedup(cat ∪ cat) has the same ids as cat") {
    val doubled = cat.union(cat)
    val deduped = doubled.dropDuplicates("chunk_id")
    assert(deduped.count() == cat.count())
    assert(deduped.select("chunk_id").as[String].collect().sorted.toSeq ==
      cat.select("chunk_id").as[String].collect().sorted.toSeq)
  }

  test("delete-then-find: removed chunk no longer found") {
    val afterDelete = cat.filter($"chunk_id" =!= "D1_1")
    val hit = afterDelete
      .filter($"dataset_id" === "D1" && $"block_start" <= 110L && lit(110L) < $"block_end")
    assert(hit.count() == 0)
  }

  test("quota admission is prefix-monotone: once over, never admitted again") {
    val q = ChunkCatalog.chunkQuota(spark, sf)
      .select("dataset_id", "admitted").as[(String, Boolean)].collect()
    q.groupBy(_._1).foreach { case (_, rows) =>
      val flags = rows.map(_._2)
      // admitted must be a prefix of true then all false (cum sums rise)
      assert(!flags.dropWhile(identity).contains(true))
    }
  }

  test("derived catalog covers every order key (no orphan points)") {
    val orphans = Relat.orphanPoints(spark, sf)
    assert(orphans == 0L)
  }

  test("compaction plan: complete, block-contiguous, greedy-bounded groups") {
    val chunks = ChunkCatalog.catalog(spark, sf)
      .select("dataset_id", "block_start", "size_bytes")
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val plan = ChunkCatalog.chunkCompact(spark, sf)
      .as[(String, Int, Long, Long, Long, Long)].collect()
    plan.groupBy(_._1).foreach { case (ds, gs) =>
      val sorted = gs.sortBy(_._2)
      // completeness: groups partition the dataset's chunks and bytes
      assert(sorted.map(_._3).sum == chunks(ds).size, s"$ds chunk count")
      assert(sorted.map(_._4).sum == chunks(ds).map(_._3).sum, s"$ds bytes")
      // contiguity: group ranges ascend without interleaving
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._6 <= b._5, s"$ds groups overlap: $a $b")
        case _ =>
      }
      // greedy bound: a group exceeds target only by its LAST chunk —
      // total < target + max single chunk size
      val total = chunks(ds).map(_._3).sum
      val target = math.max(total / 8, 1L)
      val maxChunk = chunks(ds).map(_._3).max
      sorted.foreach { g =>
        assert(g._4 < target + maxChunk, s"$ds group $g busts greedy bound")
      }
    }
  }

  private object Relat {
    def orphanPoints(s: org.apache.spark.sql.SparkSession, d: String): Long = {
      val pts = Tables.orders(s, d)
        .select(col("o_orderstatus").as("dataset_id"), col("o_orderkey").as("pt"))
      val ivs = ChunkCatalog.catalog(s, d)
      pts.join(ivs,
          pts("dataset_id") === ivs("dataset_id") &&
            ivs("block_start") <= pts("pt") && pts("pt") < ivs("block_end"),
          "left_anti")
        .count()
    }
  }
}
