package graft

import graft.sources.Formats

/** Pins for the z-order machinery: encode/decode, the column
  * interleave vs the driver-side math, the quadtree z-range splitter
  * vs brute-force cell enumeration over EVERY box in the grid, and
  * BIGMIN vs brute force over every (box, zcur) pair. The pruning
  * these enable is asserted on real files in ScaleSpec
  * ("z-order layout"). */
class ZOrderSpec extends SparkSpec {

  test("zEncode/zDecode round-trip every cell of the 16×16 grid") {
    for (x <- 0L until 16L; y <- 0L until 16L) {
      val z = Formats.zEncode(x, y, 4)
      assert(z >= 0 && z < 256)
      assert(Formats.zDecode(z, 4) == ((x, y)), s"cell ($x,$y)")
    }
    // every z hit exactly once (bijection)
    val all = for (x <- 0L until 16L; y <- 0L until 16L)
      yield Formats.zEncode(x, y, 4)
    assert(all.toSet.size == 256)
  }

  test("zEncode matches the documented layout query runs") {
    // users 4-7 × days 9-16 ⇒ ub=1, tb∈4..7 ⇒ z ∈ {33,35,41,43}
    assert((4L to 7L).map(Formats.zEncode(1L, _, 4)) == Seq(33L, 35L, 41L, 43L))
    assert(Formats.zRangesFor(1, 1, 4, 7) ==
      Seq((33, 33), (35, 35), (41, 41), (43, 43)))
  }

  test("zInterleaveCol (codegen'd) agrees with driver-side zEncode on all 256 cells") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val got = (for (x <- 0 until 16; y <- 0 until 16) yield (x, y))
      .toDF("x", "y")
      .withColumn("z", Formats.zInterleaveCol(col("x"), col("y"), 4))
      .as[(Int, Int, Int)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == Formats.zEncode(x, y, 4), s"cell ($x,$y)")
    }
    assert(got.length == 256)
  }

  private def bruteCells(xLo: Long, xHi: Long, yLo: Long, yHi: Long,
      bits: Int): Set[Long] =
    (for (x <- xLo to xHi; y <- yLo to yHi)
      yield Formats.zEncode(x, y, bits)).toSet

  test("zRanges == brute-force enumeration for ALL boxes in the 16×16 grid") {
    val n = 16L
    for (xLo <- 0L until n; xHi <- xLo until n;
         yLo <- 0L until n; yHi <- yLo until n) {
      val ranges = Formats.zRanges(xLo, xHi, yLo, yHi, 4)
      // exact cover
      val expanded = ranges.flatMap { case (lo, hi) => lo to hi }
      assert(expanded.toSet == bruteCells(xLo, xHi, yLo, yHi, 4),
        s"box ($xLo..$xHi)×($yLo..$yHi)")
      // sorted, disjoint, and minimal (no two adjacent runs unmerged)
      ranges.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) =>
          assert(l2 > h1 + 1, s"unmerged/overlapping runs in box " +
            s"($xLo..$xHi)×($yLo..$yHi): ($h1)+(${l2})")
        case _ => ()
      }
    }
  }

  test("zRanges visits O(perimeter) quads, not the cell space, at depth 16") {
    // 65536×65536 grid: a full-width thin band would be astronomically
    // expensive to enumerate cell-by-cell; the splitter must return
    // quickly with merged runs whose total cell count matches the box.
    val bits = 16
    val side = 1L << bits
    val ranges = Formats.zRanges(0L, side - 1, 12345L, 12348L, bits)
    val cells = ranges.map { case (lo, hi) => hi - lo + 1 }.sum
    assert(cells == side * 4)
    ranges.sliding(2).foreach {
      case Seq((_, h1), (l2, _)) => assert(l2 > h1 + 1)
      case _ => ()
    }
    // spot-check membership at the extremes
    val (lo0, _) = ranges.head
    assert(Formats.zDecode(lo0, bits)._2 >= 12345L)
  }

  test("bigMin == brute force for every (box, zcur) on the 8×8 grid") {
    val bits = 3
    val n = 1L << bits
    val zSpace = 0L until (n * n)
    for (xLo <- 0L until n; xHi <- xLo until n;
         yLo <- 0L until n; yHi <- yLo until n) {
      val inBox = bruteCells(xLo, xHi, yLo, yHi, bits)
      val zmin = Formats.zEncode(xLo, yLo, bits)
      val zmax = Formats.zEncode(xHi, yHi, bits)
      for (zcur <- zSpace) {
        val expect = inBox.filter(_ > zcur) match {
          case s if s.isEmpty => -1L
          case s => s.min
        }
        assert(Formats.bigMin(zcur, zmin, zmax, bits) == expect,
          s"box ($xLo..$xHi)×($yLo..$yHi) zcur=$zcur")
      }
    }
  }
}
