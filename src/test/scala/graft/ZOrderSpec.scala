package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def z(x: Long, y: Long, bits: Int = 16): Long =
    Seq((x, y)).toDF("x", "y")
      .select(Layout.zorder2(col("x"), col("y"), bits)).head().getLong(0)

  test("zorder2: hand-computed interleaves") {
    // x = 0b11, y = 0b10 → even bits 1,1 (1+4); odd bits 0,1 (8) → 13
    assert(z(3L, 2L) == 13L)
    assert(z(0L, 0L) == 0L)
    assert(z(1L, 0L) == 1L)
    assert(z(0L, 1L) == 2L)
    // max 16-bit inputs fill all 32 bits
    assert(z(0xFFFFL, 0xFFFFL) == 0xFFFFFFFFL)
    // out-of-domain input is masked, not overflowed
    assert(z(0x10003L, 0L) == z(3L, 0L))
  }

  test("zorder2 matches its generated SQL oracle on random inputs") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)((rnd.nextLong().abs % 100000, rnd.nextLong().abs % 100000))
    val df = rows.toDF("x", "y")
    val viaExpr = df.select(Layout.zorder2(col("x"), col("y")))
      .as[Long].collect().toSeq
    val viaSql = df.selectExpr(Layout.zorder2Sql("x", "y"))
      .as[Long].collect().toSeq
    assert(viaExpr == viaSql)
  }

  test("z-order chunks prune 1-D selective queries on BOTH dimensions") {
    // the data-skipping claim, measured the way footer stats are used: a
    // chunk is READ iff its (x, y) bbox intersects the predicate. A 1-D
    // (x-major) sort prunes x-predicates perfectly but a y-predicate
    // touches one chunk per x column; z-order pays a little on each
    // dimension and wins on the sum
    val pts = for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong)
    val zmap = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zorder2(col("x"), col("y"), 5).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // bbox of [xmn, xmx] intersects x ∈ [0, 7] iff xmn ≤ 7 (and same for y)
    def touched(sorted: Seq[(Long, Long)], onX: Boolean): Int =
      sorted.grouped(16).count { c =>
        (if (onX) c.map(_._1) else c.map(_._2)).min <= 7
      }
    val zSorted = pts.sortBy(zmap)
    val rowMajor = pts.sortBy(identity)
    val zTouched = touched(zSorted, onX = true) + touched(zSorted, onX = false)
    val rmTouched = touched(rowMajor, onX = true) + touched(rowMajor, onX = false)
    // z: 4x4 blocks → 16 + 16 = 32; x-major: 16 (perfect on x) + 32 (every
    // column's low chunk) = 48
    assert(zTouched < rmTouched, s"z touched $zTouched, row-major $rmTouched")
  }

  test("writeZOrdered: file footer stats prune both dimensions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val pts = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    Layout.writeZOrdered(pts, "x", "y", s"$dir/t", numFiles = 16, bits = 6)
    val files = new java.io.File(s"$dir/t").listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.length > 0)
    // repartitionByRange samples its boundaries, so an unlucky sample can
    // leave a range empty (an empty partition writes no part file) —
    // assert a band, not exactly 16, consistent with the slack on the
    // span-pruning bound below
    assert(files.length >= 8 && files.length <= 16,
      s"expected 8..16 part files, got ${files.length}")
    assert(spark.read.parquet(s"$dir/t").count() == 64L * 64L)
    val spans = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("x"), max("x"), min("y"), max("y")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // x ∈ [0, 7] any y, and y ∈ [0, 7] any x: a 1-D stripe layout reads
    // all 16 files on its cross dimension + ≥1 on its own (≥ 17 total);
    // z-range files are ~16x16 blocks → ~4 + ~4, ≤ 12 even with
    // repartitionByRange's sampled (approximate) boundaries
    val xTouch = spans.count { case (xmn, _, _, _) => xmn <= 7 }
    val yTouch = spans.count { case (_, _, ymn, _) => ymn <= 7 }
    assert(xTouch + yTouch <= 12, s"x=$xTouch y=$yTouch spans=${spans.toSeq}")
  }
}
