package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout tooling: Morton (z-order) clustering keys for
  * multi-dimensional data skipping. Sorting a table by the bit-interleaved
  * key of two scan dimensions makes every contiguous file/row-group cover a
  * small RECTANGLE of the (x, y) space instead of a thin stripe, so
  * min/max footer stats prune selective 2-D predicates on EITHER dimension
  * — the layout trick behind Delta/Iceberg OPTIMIZE ZORDER, here as a
  * plain column expression any `repartitionByRange` + write can use.
  *
  * The interleave is unrolled at PLAN-BUILD time over a Scala loop (bits
  * is a compile-side constant): the result is a single codegen'd
  * arithmetic expression — no UDF, no lambda-capture, exact integer math
  * (bits ≤ 31 keeps every term and the sum inside a non-negative long, so
  * ANSI mode never overflows).
  */
object Layout {

  /** Bit-interleaved z-value of N non-negative ints binned to `bits` bits
    * each: bit i of column j lands at position i·N + j (column 0 gets the
    * lowest lane — for N = 2 that is the classic even/odd interleave).
    * Inputs are masked to the bin domain first, so any long column is
    * safe to pass. N·bits ≤ 62 keeps every term and the sum inside a
    * non-negative long, so ANSI mode never overflows. Real layout tuning
    * wants 3–4 scan dimensions (the OPTIMIZE ZORDER shape); the unroll
    * is still one codegen'd arithmetic expression, no UDF.
    */
  def zorderN(cols: Seq[Column], bits: Int = 16): Column = {
    val n = cols.length
    require(n >= 2, s"zorderN needs at least 2 columns, got $n")
    require(bits >= 1 && n * bits <= 62,
      s"need bits >= 1 and n*bits <= 62: n=$n bits=$bits")
    val masked = cols.map(_.bitwiseAND(lit((1L << bits) - 1)))
    (for { i <- 0 until bits; (c, j) <- masked.zipWithIndex } yield
      shiftright(c, i).bitwiseAND(lit(1L)) * lit(1L << (i * n + j))
    ).reduce(_ + _)
  }

  /** Bit-interleaved z-value of two non-negative ints — the N = 2 case of
    * [[zorderN]] (x even bits, y odd).
    */
  def zorder2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    zorderN(Seq(x, y), bits)
  }

  /** The SAME unrolled interleave as ANSI SQL over `>>`/`&` — generated
    * from one loop so the Spark expression and a SQL oracle cannot drift.
    */
  def zorderNSql(cols: Seq[String], bits: Int = 16): String = {
    val n = cols.length
    require(n >= 2 && bits >= 1 && n * bits <= 62,
      s"need n >= 2, bits >= 1, n*bits <= 62: n=$n bits=$bits")
    val mask = (1L << bits) - 1
    (for { i <- 0 until bits; (c, j) <- cols.zipWithIndex } yield
      s"((($c & $mask) >> $i) & 1) * ${1L << (i * n + j)}"
    ).mkString("(", ") + (", ")")
  }

  /** [[zorderNSql]] for the two-column case. */
  def zorder2Sql(x: String, y: String, bits: Int = 16): String = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    zorderNSql(Seq(x, y), bits)
  }

  /** Write `df` clustered by the z-order of N columns: range-partition on
    * the z-key (each output file owns a contiguous z-range = a compact
    * hyper-rectangle of the key space), sort within partitions so
    * row-group min/max stats are tight, then drop the helper column.
    * `numFiles` bounds output file count — at corpus scale pick
    * input-size / target file size.
    */
  def writeZOrderedN(df: DataFrame, zCols: Seq[String], path: String,
                     numFiles: Int = 8, bits: Int = 16): Unit =
    df.withColumn("__z", zorderN(zCols.map(col), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** [[writeZOrderedN]] for the two-column case. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, path: String,
                    numFiles: Int = 8, bits: Int = 16): Unit =
    writeZOrderedN(df, Seq(xCol, yCol), path, numFiles, bits)

  /** Write `df` with parquet BLOOM FILTERS on `bloomCols` — the
    * point-lookup complement to z-order's range pruning: min/max footer
    * stats cannot skip a row group for `key = X` when keys are
    * high-cardinality and unsorted (every group's [min, max] spans X),
    * but a bloom filter answers "definitely not here" per row group with
    * ~1% false positives at the default NDV. At 100 TB this turns a
    * needle-in-haystack id lookup from a full scan into a handful of
    * group reads. `ndv` sizes the filter (set it to the expected
    * distinct keys PER FILE, not globally — oversizing wastes footer
    * bytes on every file).
    */
  // ----------------------------------------------- managed z-order layout

  /** Manifest location of a MANAGED z-ordered table: one `file_name`
    * column listing the data files written by the last clustering pass.
    * Underscore-prefixed, so Spark's file index treats it as hidden and
    * plain `spark.read.parquet(path)` never picks it up as data.
    */
  def zorderManifestPath(path: String): String = s"$path/_zorder_manifest"

  private def fsOf(spark: org.apache.spark.sql.SparkSession,
                   path: String): org.apache.hadoop.fs.FileSystem =
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)

  /** Top-level data files of a layout dir (hidden `_*` entries excluded). */
  def dataFiles(spark: org.apache.spark.sql.SparkSession,
                path: String)
      : Seq[org.apache.hadoop.fs.FileStatus] = {
    val fs = fsOf(spark, path)
    val p = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(f =>
      f.isFile && f.getPath.getName.endsWith(".parquet") &&
        !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))
  }

  private def writeManifest(spark: org.apache.spark.sql.SparkSession,
                            path: String): Unit = {
    import spark.implicits._
    graft.io.IO.writeDir(
      dataFiles(spark, path).map(_.getPath.getName).sorted.toDF("file_name"),
      zorderManifestPath(path))
  }

  /** [[writeZOrderedN]] plus a manifest naming the clustered files — the
    * MANAGED form [[graft.ops.Maintenance.maintainZOrderedTable]] watches.
    * Later plain `mode("append")` writes land as UNCLUSTERED files (not
    * in the manifest); the maintenance sweep measures their byte share
    * and re-clusters when it crosses the threshold — the OPTIMIZE ZORDER
    * lifecycle, manifest-tracked the way table formats do it.
    */
  def writeZOrderedManaged(df: DataFrame, zCols: Seq[String], path: String,
                           numFiles: Int = 8, bits: Int = 16): Unit = {
    writeZOrderedN(df, zCols, path, numFiles, bits)
    writeManifest(df.sparkSession, path)
  }

  /** `extraOptions` pass through to the parquet writer (e.g.
    * `parquet.block.size` to bound row-group height so a point lookup
    * has groups to SKIP — one giant group per file gives a bloom filter
    * nothing to prune).
    */
  def writeWithBloomFilters(df: DataFrame, bloomCols: Seq[String],
                            path: String, ndv: Long = 100000L,
                            extraOptions: Map[String, String] =
                              Map.empty): Unit = {
    require(bloomCols.nonEmpty, "need at least one bloom column")
    val w0 = df.write.mode("overwrite").options(extraOptions)
    val w = bloomCols.foldLeft(w0) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }
    w.parquet(path)
  }
}
