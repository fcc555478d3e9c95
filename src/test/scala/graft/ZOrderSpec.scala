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

  // ------------------------------------------------------- N-dimensional

  private def z3(x: Long, y: Long, t: Long, bits: Int): Long =
    Seq((x, y, t)).toDF("x", "y", "t")
      .select(Layout.zorderN(Seq(col("x"), col("y"), col("t")), bits))
      .head().getLong(0)

  test("zorderN: hand-computed 3-D interleaves; N=2 equals zorder2") {
    // bit i of column j lands at position i*3 + j
    assert(z3(1L, 1L, 1L, 1) == 7L)
    // x=0b10: bit1→pos3 (8); y=0b01: bit0→pos1 (2); t=0b11: bit0→pos2
    // (4), bit1→pos5 (32) → 46
    assert(z3(2L, 1L, 3L, 2) == 46L)
    assert(z3(0L, 0L, 0L, 8) == 0L)
    // out-of-domain input masked, not overflowed
    assert(z3(0x103L, 0L, 0L, 4) == z3(3L, 0L, 0L, 4))
    // the N=2 lane layout is exactly zorder2's
    val rnd = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val (a, b) = (rnd.nextLong().abs % 100000, rnd.nextLong().abs % 100000)
      val two = Seq((a, b)).toDF("x", "y")
        .select(Layout.zorder2(col("x"), col("y")),
          Layout.zorderN(Seq(col("x"), col("y")))).head()
      assert(two.getLong(0) == two.getLong(1))
    }
  }

  test("zorderN matches its generated SQL oracle at N=3 and N=4") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(200)((rnd.nextLong().abs % 100000,
      rnd.nextLong().abs % 100000, rnd.nextLong().abs % 100000,
      rnd.nextLong().abs % 100000))
    val df = rows.toDF("a", "b", "c", "d")
    val e3 = df.select(Layout.zorderN(Seq(col("a"), col("b"), col("c")), 20))
      .as[Long].collect().toSeq
    val s3 = df.selectExpr(Layout.zorderNSql(Seq("a", "b", "c"), 20))
      .as[Long].collect().toSeq
    assert(e3 == s3)
    val e4 = df.select(Layout.zorderN(
      Seq(col("a"), col("b"), col("c"), col("d")), 15))
      .as[Long].collect().toSeq
    val s4 = df.selectExpr(Layout.zorderNSql(Seq("a", "b", "c", "d"), 15))
      .as[Long].collect().toSeq
    assert(e4 == s4)
  }

  test("3-D z-order chunks prune selective predicates on ALL THREE " +
    "dimensions; any 1-D sort loses on the sum") {
    // 16^3 grid, 16 chunks of 256 rows. A chunk is READ iff its bbox
    // intersects the predicate (dim <= 3). x-major sort: x perfect (4),
    // y and t full scans (16 + 16) = 36. Z-order blocks fix x/y bit 3
    // and t bits 3..2 → 8 + 8 + 4 = 20.
    val pts = for (x <- 0 until 16; y <- 0 until 16; t <- 0 until 16)
      yield (x.toLong, y.toLong, t.toLong)
    val zmap = pts.toDF("x", "y", "t")
      .select(col("x"), col("y"), col("t"),
        Layout.zorderN(Seq(col("x"), col("y"), col("t")), 4).as("z"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    def touched(sorted: Seq[(Long, Long, Long)],
                dim: ((Long, Long, Long)) => Long): Int =
      sorted.grouped(256).count(c => c.map(dim).min <= 3)
    val zSorted = pts.sortBy(zmap)
    val xMajor = pts.sortBy(identity)
    val zTot = touched(zSorted, _._1) + touched(zSorted, _._2) +
      touched(zSorted, _._3)
    val rmTot = touched(xMajor, _._1) + touched(xMajor, _._2) +
      touched(xMajor, _._3)
    assert(zTot == 20 && rmTot == 36, s"z=$zTot x-major=$rmTot")
  }

  test("writeZOrderedN: footer stats prune all three dimensions vs the " +
    "1-D stripe bound") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder3").toString
    val pts = (for (x <- 0 until 16; y <- 0 until 16; t <- 0 until 16)
      yield (x.toLong, y.toLong, t.toLong)).toDF("x", "y", "t")
    Layout.writeZOrderedN(pts, Seq("x", "y", "t"), s"$dir/t",
      numFiles = 16, bits = 4)
    assert(spark.read.parquet(s"$dir/t").count() == 16L * 16L * 16L)
    val files = new java.io.File(s"$dir/t").listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.length > 0)
    val spans = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("x"), min("y"), min("t")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val tot = spans.count(_._1 <= 3) + spans.count(_._2 <= 3) +
      spans.count(_._3 <= 3)
    // ideal z-blocks: 8 + 8 + 4 = 20; an x-major stripe layout reads
    // 4 + 16 + 16 = 36. Allow slack for repartitionByRange's sampled
    // boundaries but stay firmly below the stripe bound.
    assert(tot <= 28, s"touched $tot of ${3 * files.length}; " +
      s"spans=${spans.toSeq}")
  }

  test("writeWithBloomFilters: the footer carries a bloom filter that " +
    "admits every present key and rejects (almost) every absent one") {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    val ids = (0L until 1000L).toDF("id")
      .select(col("id"), (col("id") * 37 % 101).as("payload"))
      .coalesce(1)
    Layout.writeWithBloomFilters(ids, Seq("id"), s"$dir/t", ndv = 1000L)
    val file = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.getAbsolutePath),
        spark.sparkContext.hadoopConfiguration))
    try {
      val block = reader.getRowGroups.get(0)
      val meta = block.getColumns.asScala
        .find(_.getPath.toDotString == "id").get
      val bloom = reader.getBloomFilterDataReader(block)
        .readBloomFilter(meta)
      assert(bloom != null, "id column must carry a bloom filter")
      // zero false negatives by construction
      (0L until 1000L).foreach { v =>
        assert(bloom.findHash(bloom.hash(v)), s"present key $v rejected")
      }
      // absent keys reject at ~the configured fpp (1% default) — allow
      // a generous band so the gate never flakes
      val fp = (1000000L until 1000200L).count(v =>
        bloom.findHash(bloom.hash(v)))
      assert(fp < 40, s"$fp of 200 absent keys admitted — filter is " +
        "missing or catastrophically undersized")
      // the payload column did NOT pay for a filter it didn't ask for
      val payloadMeta = block.getColumns.asScala
        .find(_.getPath.toDotString == "payload").get
      assert(reader.getBloomFilterDataReader(block)
        .readBloomFilter(payloadMeta) == null)
    } finally reader.close()
  }

  test("bloom READ path: a point lookup skips row groups that min/max " +
    "stats cannot (hash-ordered keys span every group's range)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloomrd").toString
    // hash order ⇒ every row group's [min, max] covers ~the full id
    // domain, so the stats filter prunes NOTHING on a point lookup —
    // exactly the unsorted-high-cardinality shape q285 reads; a small
    // block size gives the file many groups to skip
    val n = 100000L
    val df = spark.range(n).toDF("id")
      .orderBy(org.apache.spark.sql.functions.hash(col("id")))
      .coalesce(1)
    Layout.writeWithBloomFilters(df, Seq("id"), s"$dir/t", ndv = 20000L,
      extraOptions = Map("parquet.block.size" -> "65536"))
    val file = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    def groups(useBloom: Boolean): Int = {
      val pred = org.apache.parquet.filter2.predicate.FilterApi.eq(
        org.apache.parquet.filter2.predicate.FilterApi.longColumn("id"),
        java.lang.Long.valueOf(777L))
      val opts = org.apache.parquet.HadoopReadOptions
        .builder(spark.sparkContext.hadoopConfiguration)
        .withRecordFilter(
          org.apache.parquet.filter2.compat.FilterCompat.get(pred))
        .useStatsFilter(true)
        .useDictionaryFilter(false) // isolate the bloom contribution
        .useBloomFilter(useBloom)
        .build()
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(file.getAbsolutePath),
          spark.sparkContext.hadoopConfiguration), opts)
      try reader.getRowGroups.size() finally reader.close()
    }
    val statsOnly = groups(useBloom = false)
    val withBloom = groups(useBloom = true)
    assert(statsOnly >= 5,
      s"fixture needs many stats-unprunable groups, got $statsOnly")
    assert(withBloom >= 1, "present key must survive (no false negatives)")
    assert(withBloom <= 2,
      s"bloom should reduce $statsOnly groups to ~1, got $withBloom")
  }
}
