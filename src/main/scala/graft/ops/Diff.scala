package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot differencing — the pipeline-ops primitive behind incremental
  * corpus updates: given two versions of a keyed table, classify every key
  * as added / removed / changed (content hash differs) / unchanged.
  *
  * Scale shape: each side is reduced to (keys, content-hash) BEFORE the
  * join, so the full-outer shuffle moves a few bytes per row instead of
  * the document payload (the q84/exactByHash discipline — wide columns
  * never shuffle). The join keys are the table's primary key: well-spread,
  * no skew amplification; AQE handles any residual imbalance. Classifying
  * 10^11 rows is one narrow shuffle + a map-side CASE.
  *
  * `hashFn` is pluggable exactly like `fingerprint`'s tokenHash: two-lane
  * xxhash64 in production (collision odds documented at
  * [[Dedup.exactByHash]]); `graft.functions.md5Hash31` where a DuckDB
  * oracle must recompute the hash bit-for-bit.
  */
object Diff {

  def defaultHash(cols: Seq[Column]): Column =
    struct(xxhash64(cols: _*), xxhash64(lit(0x9e3779b9L) +: cols: _*))

  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keyCols: Seq[String], compareCols: Seq[String],
                   hashFn: Seq[Column] => Column = defaultHash,
                   includeUnchanged: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty)
    val o = oldDf.select(keyCols.map(col) :+
      hashFn(compareCols.map(col)).as("__oh"): _*)
    val n = newDf.select(keyCols.map(col) :+
      hashFn(compareCols.map(col)).as("__nh"): _*)
    val status = when(col("__oh").isNull, "added")
      .when(col("__nh").isNull, "removed")
      // null-safe: hashFn output is non-null when the row exists, but a
      // pluggable hash over null columns may be null — <=> keeps those
      // rows classified instead of silently dropped
      .when(!(col("__oh") <=> col("__nh")), "changed")
      .otherwise("unchanged")
    val res = o.join(n, keyCols, "full_outer")
      .select(keyCols.map(col) :+ status.as("status"): _*)
    if (includeUnchanged) res else res.filter(col("status") =!= "unchanged")
  }
}
