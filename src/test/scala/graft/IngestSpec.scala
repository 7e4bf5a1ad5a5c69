package graft

import java.nio.file.Files
import graft.sources.Ingest

/** Ingest-pipeline semantics (reference A2-A5/A15): idempotent replay,
  * in-batch dedup, quota rejection, delete rewrite. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def batch(rows: (String, String, Long, Long, Long)*) =
    rows.toDF("chunk_id", "dataset_id", "block_start", "block_end", "size_bytes")

  private def tmpCatalog(): String =
    Files.createTempDirectory("graft_cat").resolve("catalog").toString

  test("fresh ingest persists all; replay ingests nothing (idempotent)") {
    val path = tmpCatalog()
    val b = batch(("c1", "D1", 0, 100, 10), ("c2", "D1", 100, 200, 20))
    val r1 = Ingest.ingest(spark, path, b)
    assert(r1.ingested == 2 && r1.deduped == 0 && r1.rejected.isEmpty)
    val r2 = Ingest.ingest(spark, path, b) // replay — A4 Entry::Vacant gate
    assert(r2.ingested == 0 && r2.deduped == 2)
    assert(Ingest.readCatalog(spark, path).count() == 2)
  }

  test("in-batch duplicate ids collapse to one row") {
    val path = tmpCatalog()
    val b = batch(("c1", "D1", 0, 100, 10), ("c1", "D1", 0, 100, 10))
    val r = Ingest.ingest(spark, path, b)
    assert(r.ingested == 1 && r.deduped == 1)
  }

  test("quota: batch pushing total over cap is rejected with MaxSizeAllocated") {
    val path = tmpCatalog()
    assert(Ingest.ingest(spark, path, batch(("c1", "D1", 0, 100, 600))).rejected.isEmpty)
    val r = Ingest.ingest(spark, path, batch(("c2", "D1", 100, 200, 500)),
      maxSizeOnDisk = 1000L)
    r.rejected match {
      case Some(Ingest.MaxSizeAllocated(wouldBe, cap)) =>
        assert(wouldBe == 1100L && cap == 1000L)
      case other => fail(s"expected MaxSizeAllocated, got $other")
    }
    // rejected batch must not have been persisted (reference rollback,
    // data_manager.rs:258-275)
    assert(Ingest.readCatalog(spark, path).count() == 1)
  }

  test("compact: many append files collapse, data and lookups unchanged") {
    val path = tmpCatalog()
    // 5 separate ingests → ≥5 files under the D1 partition
    (0 until 5).foreach { i =>
      Ingest.ingest(spark, path,
        batch((s"c$i", "D1", i * 100L, i * 100L + 100L, 10L)))
    }
    def parquetFiles(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] = {
        val kids = Option(f.listFiles()).getOrElse(Array.empty).toSeq
        kids.filter(_.isFile) ++ kids.filter(_.isDirectory).flatMap(walk)
      }
      walk(new java.io.File(path)).count(_.getName.endsWith(".parquet"))
    }
    val before = parquetFiles()
    assert(before >= 5)
    val n = Ingest.compact(spark, path)
    assert(n == 5)
    assert(parquetFiles() < before)
    assert(Ingest.readCatalog(spark, path).count() == 5)
    assert(Ingest.findChunk(spark, path, "D1", 250).count() == 1)
  }

  test("find/delete round-trip: delete drains the chunk from lookups") {
    val path = tmpCatalog()
    Ingest.ingest(spark, path,
      batch(("c1", "D1", 0, 100, 1), ("c2", "D1", 100, 200, 1)))
    assert(Ingest.findChunk(spark, path, "D1", 150).count() == 1)
    assert(Ingest.deleteChunk(spark, path, "c2") == 1)
    assert(Ingest.findChunk(spark, path, "D1", 150).count() == 0)
    assert(Ingest.findChunk(spark, path, "D1", 50).count() == 1)
  }

  // ------------------------------------------------- promote crash paths

  import org.apache.hadoop.fs.{FileSystem, FilterFileSystem, Path => HPath}

  /** Wrapper that vetoes the FIRST rename whose source ends with
    * `failSrcSuffix` — the fault injection for promote's
    * rename(tmp,dst)-fails branch. */
  private class VetoRenameFs(underlying: FileSystem, failSrcSuffix: String)
      extends FilterFileSystem(underlying) {
    var vetoed = 0
    override def rename(src: HPath, dst: HPath): Boolean =
      if (vetoed == 0 && src.toString.endsWith(failSrcSuffix)) {
        vetoed += 1; false
      } else super.rename(src, dst)
  }

  private def rawFs(): FileSystem =
    new HPath("file:///").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def mkDirWithMarker(fs: FileSystem, dir: HPath, marker: String): Unit = {
    fs.mkdirs(dir)
    fs.create(new HPath(dir, marker), true).close()
  }

  test("promote: failed target rename restores the previous catalog") {
    val root = new HPath("file://" + Files.createTempDirectory("graft_promote"))
    val fs = rawFs()
    val dst = new HPath(root, "catalog")
    val tmp = new HPath(root, "catalog_tmp")
    mkDirWithMarker(fs, dst, "OLD")
    mkDirWithMarker(fs, tmp, "NEW")
    val veto = new VetoRenameFs(fs, "catalog_tmp")
    val e = intercept[IllegalStateException] {
      Ingest.promote(veto, tmp, dst, "test")
    }
    assert(e.getMessage.contains("previous catalog restored"))
    assert(veto.vetoed == 1)
    // the live catalog is back at dst with its ORIGINAL content, the
    // aside slot is drained, and the rewrite is still intact at tmp
    assert(fs.exists(new HPath(dst, "OLD")), "previous catalog not restored")
    assert(!fs.exists(new HPath(root, "catalog_old")), "aside left behind")
    assert(fs.exists(new HPath(tmp, "NEW")), "rewrite lost")
  }

  test("promote: fresh dst (no live catalog) promotes without an aside") {
    val root = new HPath("file://" + Files.createTempDirectory("graft_promote"))
    val fs = rawFs()
    val dst = new HPath(root, "catalog")
    val tmp = new HPath(root, "catalog_tmp")
    mkDirWithMarker(fs, tmp, "NEW")
    Ingest.promote(fs, tmp, dst, "test")
    assert(fs.exists(new HPath(dst, "NEW")))
    assert(!fs.exists(tmp))
    assert(!fs.exists(new HPath(root, "catalog_old")))
  }

  test("promote: success over a live catalog clears the aside") {
    val root = new HPath("file://" + Files.createTempDirectory("graft_promote"))
    val fs = rawFs()
    val dst = new HPath(root, "catalog")
    val tmp = new HPath(root, "catalog_tmp")
    mkDirWithMarker(fs, dst, "OLD")
    mkDirWithMarker(fs, tmp, "NEW")
    Ingest.promote(fs, tmp, dst, "test")
    assert(fs.exists(new HPath(dst, "NEW")) && !fs.exists(new HPath(dst, "OLD")))
    assert(!fs.exists(new HPath(root, "catalog_old")), "aside not cleared")
    assert(!fs.exists(tmp))
  }

  test("promote: stale aside from a prior crash is cleared, not fatal") {
    val root = new HPath("file://" + Files.createTempDirectory("graft_promote"))
    val fs = rawFs()
    val dst = new HPath(root, "catalog")
    val tmp = new HPath(root, "catalog_tmp")
    mkDirWithMarker(fs, dst, "OLD")
    mkDirWithMarker(fs, tmp, "NEW")
    mkDirWithMarker(fs, new HPath(root, "catalog_old"), "STALE")
    Ingest.promote(fs, tmp, dst, "test")
    assert(fs.exists(new HPath(dst, "NEW")))
    assert(!fs.exists(new HPath(root, "catalog_old")))
  }

  test("quarantine lane: every malformed line lands with its first-failing reason") {
    import spark.implicits._
    val lines = Seq(
      "c1,1,0,100,512",          // good
      "c2,1,100,200,1024",       // good
      "c3,1,5",                  // wrong_arity
      ",1,0,100,512",            // empty_chunk_id
      "c4,x,0,100,512",          // bad_dataset_id
      "c5,1,zero,100,512",       // bad_block_range
      "c6,1,0,100,big",          // bad_size
      "c7,1,200,100,512",        // inverted_range
      "c8,1,0,100,-9",           // negative_size
      "c9,x,y,z",                // wrong_arity wins over later lanes
      "c10,1,0,100,512,extra")   // wrong_arity (too many)
    val batch = Ingest.decodeWithQuarantine(lines.toDF("line"))
    val (good, bad) = (batch.good, batch.quarantined)
    val goodIds = good.select("chunk_id").as[String].collect().sorted.toSeq
    assert(goodIds == Seq("c1", "c2"))
    // typed columns survive the lane intact
    val g = good.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(g("c1") == ((1L, 0L, 100L, 512L)))
    val reasons = bad.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(reasons.size == lines.size - 2) // nothing dropped silently
    assert(reasons("c3,1,5") == "wrong_arity")
    assert(reasons(",1,0,100,512") == "empty_chunk_id")
    assert(reasons("c4,x,0,100,512") == "bad_dataset_id")
    assert(reasons("c5,1,zero,100,512") == "bad_block_range")
    assert(reasons("c6,1,0,100,big") == "bad_size")
    assert(reasons("c7,1,200,100,512") == "inverted_range")
    assert(reasons("c8,1,0,100,-9") == "negative_size")
    assert(reasons("c9,x,y,z") == "wrong_arity")
    assert(reasons("c10,1,0,100,512,extra") == "wrong_arity")
    batch.release() // cache ownership: caller frees after both lanes read
  }
}
