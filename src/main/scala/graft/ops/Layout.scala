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

  /** Bit-interleaved z-value of two non-negative ints binned to `bits`
    * bits each: x occupies even bit positions, y odd. Inputs are masked to
    * the bin domain first, so any long column is safe to pass.
    */
  def zorder2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val xm = x.bitwiseAND(lit((1L << bits) - 1))
    val ym = y.bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).map { i =>
      shiftright(xm, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(ym, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** The SAME unrolled interleave as ANSI SQL over `>>`/`&` — generated
    * from one loop so the Spark expression and a SQL oracle cannot drift.
    */
  def zorder2Sql(x: String, y: String, bits: Int = 16): String = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val mask = (1L << bits) - 1
    (0 until bits).map { i =>
      s"((($x & $mask) >> $i) & 1) * ${1L << (2 * i)}" +
        s" + ((($y & $mask) >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString("(", ") + (", ")")
  }

  /** Write `df` clustered by the z-order of two columns: range-partition on
    * the z-key (each output file owns a contiguous z-range = a compact
    * rectangle of (x, y) space), sort within partitions so row-group
    * min/max stats are tight, then drop the helper column. `numFiles`
    * bounds output file count — at corpus scale pick input-size / target
    * file size.
    */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, path: String,
                    numFiles: Int = 8, bits: Int = 16): Unit =
    df.withColumn("__z", zorder2(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
